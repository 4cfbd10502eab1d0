package graft

import org.apache.spark.sql.SparkSession

/** Warm per-query timing for round-7 hot spots
  * (`sbt "Test/runMain graft.ProfileR7 <query> [query...]"`). */
object ProfileR7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("multimodal_phash")
    names.foreach { name =>
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sf).queryExecution.toRdd.count()
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
