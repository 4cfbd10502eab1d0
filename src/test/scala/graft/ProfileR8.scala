package graft.ops

import graft.Tables

/** Stage-by-stage profiling for round-8 hot queries (dev utility, the
  * ProfileR4/R5/R7 pattern). */
object ProfileR8 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config(Tables.sessionConf).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ops.DedupOps._
    import graft.functions.HashFunctions
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"[prof] $tag%-22s ${(System.nanoTime - t0) / 1e9}%8.2f s   rows=$n")
    }
    val withS = docs.select(col("doc_id"),
      array_distinct(wordShingles(tokens(col("text")), 3)).as("sd"))
    time("shingles")(withS.count())
    time("shingles2")(withS.count())
    val sigd = withS.select(col("doc_id"),
      HashFunctions.portableMinhashSignature(col("sd"), 16).as("sig"))
    time("sig")(sigd.select(explode(col("sig"))).count())
    val sigSpread = docs.repartition(8).select(col("doc_id"),
      HashFunctions.portableMinhashSignature(
        tokens(col("text")), 16, 3).as("sig"))
    time("sigSpread")(sigSpread.select(explode(col("sig"))).count())
    time("sigSpread2")(sigSpread.select(explode(col("sig"))).count())
    val banded = sigd.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => concat_ws("|", transform(
          slice(col("sig"), b * lit(2) + 1, lit(2)),
          v => v.cast("string"))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    time("banded")(banded.count())
    // stage breakdown mirroring portableMinhashPairs internals
    val banded8 = sigSpread
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(7)),
          b => concat_ws("|", transform(
            slice(col("sig"), b * lit(2) + 1, lit(2)),
            v => v.cast("string"))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    time("banded8")(banded8.count())
    val cand8 = graft.ops.DedupOps.bucketPairs(
      banded8, Seq(col("band_id"), col("band_key")), "doc_id", 2, 1000)
    time("cand8")(cand8.count())
    val cand8c = cand8.localCheckpoint(true)
    val candDocs = cand8c.select(col("a").as("doc_id"))
      .union(cand8c.select(col("b").as("doc_id"))).distinct()
    val candS = docs.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        array_distinct(wordShingles(tokens(col("text")), 3)).as("sd"))
    time("candS")(candS.count())
    val verified = cand8c
      .join(candS.select(col("doc_id").as("a"), col("sd").as("sa")), Seq("a"))
      .join(candS.select(col("doc_id").as("b"), col("sd").as("sb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
    time("verify")(verified.filter(col("inter") >= 0).count())
    time("pairs")(graft.ops.DedupOps.portableMinhashPairs(
      docs, "doc_id", "text").count())
    time("pairs2")(graft.ops.DedupOps.portableMinhashPairs(
      docs, "doc_id", "text").count())
    time("setsim")(graft.ops.DedupOps.setSimPairsExact(
      docs, "doc_id", "text").count())
    time("setsim2")(graft.ops.DedupOps.setSimPairsExact(
      docs, "doc_id", "text").count())
    spark.stop()
  }
}
