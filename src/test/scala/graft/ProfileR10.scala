package graft

import org.apache.spark.sql.SparkSession

/** Warm in-JVM timing of the round-10 streaming-loop queries at sf0.1
  * (`sbt "Test/runMain graft.ProfileR10"`): two timed repetitions per
  * query after a warmup, so sbt/Spark startup stays out of the
  * numbers. */
object ProfileR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Seq("pipeline_ingest_stream", "pipeline_ingest_drift",
      "pipeline_pack_incr", "pipeline_mix_pack",
      "pipeline_soft_dedup", "pipeline_fim_spans").foreach { q =>
      time(s"$q warmup")(SparkEntry.queries(q)(spark, d).collect())
      time(s"$q run1")(SparkEntry.queries(q)(spark, d).collect())
      time(s"$q run2")(SparkEntry.queries(q)(spark, d).collect())
    }
    spark.stop()
  }
}
