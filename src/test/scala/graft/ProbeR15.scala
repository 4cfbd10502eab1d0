package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 phase probe: times the CONSTRUCTION phases of the ingest
  * loop queries (evalGrams build, inventory clone, model loads, each
  * processBatch, report read) so optimization effort lands where the
  * wall actually goes. Usage:
  *   sbt "Test/runMain graft.ProbeR15 <sfDir> <runs>"
  */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val d = dir

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"    $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (0 until runs).foreach { run =>
      println(s"== pipeline_pack_incr phases (run $run) ==")
      val segLen = 16
      val docs = Tables.load(s, d, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      def grams(c: org.apache.spark.sql.Column) = {
        val w = split(lower(c), " ")
        when(size(w) >= 3, transform(sequence(lit(0), size(w) - 3),
          i => concat_ws(" ", element_at(w, i + 1),
            element_at(w, i + 2), element_at(w, i + 3))))
          .otherwise(array(array_join(w, " ")))
      }
      val evalGrams = time("evalGrams ckpt") {
        corpus.filter(pmod(col("doc_id"), lit(50)) === 1)
          .select(explode(array_distinct(grams(col("text")))).as("g"))
          .distinct().localCheckpoint(true)
      }
      val runId = java.util.UUID.randomUUID().toString.take(12)
      val key = s"probe_$runId"
      val baseKey = time("cachedInventory") {
        ops.IngestOps.cachedInventory(s,
          s"$d/documents.parquet", "ingsbase", corpus, "text", segLen)
      }
      time("cloneInventory") { ops.IngestOps.cloneInventory(baseKey, key) }
      val bpe = time("bpe cachedTrain") {
        ops.BpeOps.cachedTrain(s, s"$d/documents.parquet", docs,
          col("text"), numMerges = 64)
      }
      val packDir = ops.StorageOps.scratchPath(s"probe_pack_$runId")
      val loop = new graft.streaming.IngestLoop(s, key, "doc_id",
        "text", Some(evalGrams), segLen, wp = None, bpe = Some(bpe),
        packManifestDir = Some(packDir))
      time("processBatch b0") {
        loop.processBatch(
          docs.filter(pmod(col("doc_id"), lit(10)) === 0), "b0")
      }
      time("processBatch b1") {
        loop.processBatch(
          docs.filter(pmod(col("doc_id"), lit(10)) === 5 ||
            pmod(col("doc_id"), lit(20)) === 0), "b1")
      }
      val res = time("manifest read+pin") {
        loop.packManifest
          .orderBy(col("batch"), col("doc_id")).localCheckpoint(true)
      }
      time("toRdd.count") { res.queryExecution.toRdd.count() }
      ops.IngestOps.dropInventory(key)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(packDir))
    }
    spark.stop()
  }
}
