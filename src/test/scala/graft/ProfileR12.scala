package graft

import org.apache.spark.sql.SparkSession

/** Round-12 idle re-measure of the r11 bench watch list
  * (graph_pagerank / graph_ppr / pipeline_quality_classifier — each
  * read ~2x its r10 median on the loaded r11 driver record): runs
  * each declared query verbatim at sf0.1 under the quiet-window
  * protocol and prints per-run walls + the median. Run:
  * `sbt "Test/runMain graft.ProfileR12"`. */
object ProfileR12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val watch = Seq("graph_pagerank", "graph_ppr",
      "pipeline_quality_classifier", "multimodal_jpeg",
      "multimodal_mixed4", "pipeline_quarantine", "source_warc",
      "source_zstd", "pipeline_shard_budget",
      "pipeline_ingest_quarantine")
    watch.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (1 to 4).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"$name%-32s run$i $w%6.2f s  ($n rows)")
        w
      }
      val med = walls.drop(1).sorted.apply(walls.drop(1).length / 2)
      println(f"$name%-32s MEDIAN(warm) $med%6.2f s")
    }
    spark.stop()
  }
}
