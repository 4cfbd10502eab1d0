package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 stage profile of the two ~2s cluster pipelines at sf0.1. */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    graft.SparkEntry.queries("dedup_clusters")(spark, d).queryExecution.toRdd.count()
    // stages of dedup_clusters
    val pairs = time("minhashPairs >= 0.8")(
      ops.DedupOps.minhashPairs(docs, "doc_id", "text")
        .filter(col("jaccard") >= 0.8).select(col("a"), col("b")))
    time("pairs count")(pairs.count())
    val edges = pairs
    time("CC only")(ops.ClusterOps.connectedComponents(edges).count())
    time("clusterAssignments full")(
      ops.ClusterOps.clusterAssignments(docs, "doc_id", edges).count())
    time("dedup_clusters query")(
      graft.SparkEntry.queries("dedup_clusters")(spark, d)
        .queryExecution.toRdd.count())
    time("curateSurvivors-ish quality pass")(
      ops.TextOps.quality(docs, col("text"), col("n_chars"))
        .filter(col("quality_score") >= 0.3).queryExecution.toRdd.count())
    time("pipeline_curate_neardup query")(
      graft.SparkEntry.queries("pipeline_curate_neardup")(spark, d)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
