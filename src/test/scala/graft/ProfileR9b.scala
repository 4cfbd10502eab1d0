package graft.ops

import graft.Tables

/** Timing probe for the round-9 setsim size-frame reuse (dev utility,
  * the ProfileR8 pattern). */
object ProfileR9b {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config(Tables.sessionConf).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"[prof] $tag%-12s ${(System.nanoTime - t0) / 1e9}%8.2f s   rows=$n")
    }
    (1 to 4).foreach { i =>
      time(s"setsim$i")(graft.ops.DedupOps.setSimPairsExact(
        docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
