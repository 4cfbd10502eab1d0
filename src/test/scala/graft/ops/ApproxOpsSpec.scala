package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy + determinism gates for the approximate operators — the
  * same pattern as the dedup recall gates: no cross-engine oracle
  * exists (sketch algorithms differ), so each approximation is bounded
  * against the EXACT answer computed on the same data. */
class ApproxOpsSpec extends SparkSpec {

  private lazy val li = graft.Tables.lineitem(spark, Sf0001)

  test("approx_count_distinct within declared rsd of exact (per group)") {
    val joined = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val rel = math.abs(a - e) / e
      // rsd 0.02 → 3-sigma bound 6%; generous but non-vacuous
      assert(rel <= 0.06, s"group ${r.getString(0)}: approx $a exact $e rel $rel")
    }
  }

  test("approx_percentile brackets the exact percentile") {
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50a"),
        expr("percentile(l_extendedprice, 0.5)").as("p50e"),
        expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .collect()
    rows.foreach { r =>
      val p50a = r.getDouble(1)
      assert(p50a >= r.getDouble(3) && p50a <= r.getDouble(4),
        s"approx p50 $p50a outside exact [p45, p55] for ${r.getString(0)}")
    }
  }

  test("stratified sample: deterministic, correct strata, plausible fractions") {
    val orders = graft.Tables.orders(spark, Sf0001)
    val fractions = Map("1-URGENT" -> 0.2, "2-HIGH" -> 0.1)
    def sample() = orders.stat.sampleBy("o_orderpriority", fractions, 42L)
    val s1 = sample().select("o_orderkey").collect().map(_.getLong(0)).toSet
    val s2 = sample().select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must give the same sample (resume-safe)")
    // only requested strata appear
    val strata = sample().select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).toSet
    assert(strata.subsetOf(fractions.keySet))
    // fractions land near the target (binomial 4-sigma)
    val totals = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sample().groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val n = totals(k).toDouble
      val expected = n * f
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(got.getOrElse(k, 0L) - expected) <= 4 * sigma + 1,
        s"stratum $k: got ${got.getOrElse(k, 0L)}, expected ~$expected")
    }
  }
}
