package graft

import org.apache.spark.sql.SparkSession

/** Round-5 spot timings of the new queries at sf0.1. */
object ProfileR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[prof] $label: ${runs(1)}%.2f s (min ${runs(0)}%.2f)")
    }
    args.foreach { name =>
      time(name)(SparkEntry.queries(name)(spark, d)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
