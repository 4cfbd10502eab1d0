package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the round-11 codec family: isolates the
  * generator (encode) and decode sides of each new op at sf0.1 so a
  * slow bench median can be attributed. Run:
  * `sbt "Test/runMain graft.ProfileR11"`. */
object ProfileR11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops._

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
      }
    }

    val docs = Tables.documents(spark, dir)
    println(s"docs: ${docs.count()}, partitions: ${docs.rdd.getNumPartitions}")

    time("gzipTable encode only") {
      CompressedOps.gzipTable(spark, docs)
        .selectExpr("sum(length(content))").head.getLong(0)
    }
    time("source_gzip full") {
      CompressedOps.gunzipAll(spark,
        CompressedOps.gzipTable(spark, docs)).toDF().count()
    }
    time("tarShardTable encode only") {
      Multimodal.tarShardTable(spark, docs)
        .selectExpr("sum(length(content))").head.getLong(0)
    }
    time("source_tar full") {
      Multimodal.decodeTarAll(spark,
        Multimodal.tarShardTable(spark, docs)).toDF().count()
    }
    time("pngImageTable encode only") {
      Multimodal.pngImageTable(spark, docs)
        .selectExpr("sum(length(content))").head.getLong(0)
    }
    time("multimodal_png full") {
      Multimodal.decodePngAll(spark,
        Multimodal.pngImageTable(spark, docs)).toDF().count()
    }
    spark.stop()
  }
}
