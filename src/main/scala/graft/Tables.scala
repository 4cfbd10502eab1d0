package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Session conf every graft session needs. `nanosAsLong` keeps
    * TIMESTAMP(NANOS) parquet layouts readable (older driver testdata);
    * micros-precision layouts are unaffected by it and are normalized in
    * [[events]]. Set once at session build — loaders are pure. */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // custom planner surface (as-of join strategy + pruning rule)
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(raw) else raw
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Events with `ts` normalized to the internal contract: epoch
    * nanoseconds as LONG. The driver's testdata has shipped `ts` both as
    * TIMESTAMP(NANOS) (read as long via `nanosAsLong`) and as
    * micros-precision timestamp (read as TIMESTAMP_NTZ / TIMESTAMP);
    * all downstream event queries and the DuckDB oracles assume one
    * representation, so branch on the arriving type here. Sessions pin
    * `spark.sql.session.timeZone=UTC`, making the NTZ cast exact. */
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  private def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw
      case _: TimestampNTZType =>
        raw.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _: TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => sys.error(s"unsupported events.ts type: $other")
    }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
