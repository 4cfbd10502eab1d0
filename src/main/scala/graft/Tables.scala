package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table.
  *
  * At cluster scale these would be partitioned/bucketed tables; the API
  * deliberately stays `spark.read.parquet` so Catalyst's pushdown
  * (PushedFilters / ReadSchema pruning) applies unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf every graft session needs: events.parquet carries
    * TIMESTAMP(NANOS), which Spark's vectorized parquet reader rejects;
    * with this conf ts arrives as a nanosecond-epoch long and callers
    * convert explicitly (see SparkEntry events queries). Set once at
    * session build — loaders are pure. */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // custom planner surface (as-of join strategy + pruning rule)
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
