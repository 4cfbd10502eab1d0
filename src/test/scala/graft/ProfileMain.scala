package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-wise profiling of the dedup pipelines at sf0.1
  * (`sbt "Test/runMain graft.ProfileMain"`). */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.ops.DedupOps._
    import graft.functions.HashFunctions
    val withSig = docs.select(col("doc_id"),
      HashFunctions.minhashSignature(tokens(col("text")), 64, 3).as("sig"))
    time("signatures only")(withSig.queryExecution.toRdd.count())
    val cand = minhashCandidates(docs, "doc_id", "text")
    println("candidates: " + time("candidate gen")(cand.count()))
    val pairs = minhashPairs(docs, "doc_id", "text")
    println("verified pairs: " + time("pairs+verify")(pairs.count()))
    time("full summary")(
      minhashDedupSummary(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    time("ngram pairs")(
      ngramJaccardPairs(docs, "doc_id", "text").count())
    time("ngram pairs full")(
      ngramJaccardPairs(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    val np = time("ngram pairs construct+checkpoint")(
      ngramJaccardPairs(docs, "doc_id", "text"))
    time("ngram verified pairs materialize")(
      np.queryExecution.toRdd.count())
    time("ngram summary")(
      ngramJaccardSummary(docs, "doc_id", "text")
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
