package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = Seq(
    (1L, ts("2024-01-01 10:00:00"), "t1"),
    (1L, ts("2024-01-01 10:05:00"), "t2"),
    (2L, ts("2024-01-01 09:00:00"), "t3"),
    (3L, ts("2024-01-01 12:00:00"), "t4")
  ).toDF("k", "t", "tag")

  private def quotes = Seq(
    (1L, ts("2024-01-01 09:59:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0), // exact tie with t2 → matches
    (1L, ts("2024-01-01 10:06:00"), 999.0), // after t2 → never matches
    (2L, ts("2024-01-01 09:30:00"), 55.0)   // after t3 → no match for k=2
  ).toDF("k", "t", "price")

  test("custom as-of join: semantics on a hand-checked example") {
    val res = AsofJoin.asofJoin(spark, trades, quotes,
      "k", "k", "t", "t", Seq("price"))
      .select(col("tag"), col("asof_price"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(res == Map("t1" -> 100.0, "t2" -> 101.0, "t3" -> null,
      "t4" -> null))
  }

  test("plan shows the custom exec with one exchange+sort per side") {
    val df = AsofJoin.asofJoin(spark, trades, quotes,
      "k", "k", "t", "t", Seq("price"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan) // AsofJoinExec prints as AsofJoin
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert("Sort \\[".r.findAllIn(plan).length == 2, plan)
  }

  test("pruning rule pushes payload columns into the right-side scan") {
    // full orders table on the right: only o_custkey/o_orderdate(ts)/
    // o_orderkey may reach the scan
    val ev = graft.Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"))
    val ord = graft.Tables.orders(spark, Sf0001)
      .withColumn("o_ts", col("o_orderdate").cast("timestamp"))
    val df = AsofJoin.asofJoin(spark, ev, ord, "user_id", "o_custkey",
      "ts", "o_ts", Seq("o_orderkey"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("AsofJoinPlan"), optimized)
    val scanSchemas = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("orders.parquet")).mkString("\n")
    assert(scanSchemas.contains("o_custkey") &&
      scanSchemas.contains("o_orderkey"), scanSchemas)
    assert(!scanSchemas.contains("o_totalprice"),
      s"right scan must be pruned to the join's needs:\n$scanSchemas")
  }

  test("native as-of join is byte-identical to the composed version on driver data") {
    val native = graft.SparkEntry.queries("q_asof_join_native")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val composed = graft.SparkEntry.queries("q_asof_join")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(native.length == composed.length && native.nonEmpty)
    assert(native.sameElements(composed))
  }
}
