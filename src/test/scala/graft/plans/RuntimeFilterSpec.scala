package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Runtime bloom-filter join pruning: at cluster scale (default
  * thresholds: creation side <= 10 MB after a selective filter,
  * application side scan >= 10 GB) Spark injects a bloom filter built
  * from the dimension side's join keys into the fact-side scan, so
  * most fact rows die before the join shuffle. Our join shapes are
  * plain equi-joins with pushed filters, so the injection composes
  * with them unchanged — this spec proves it by shrinking the
  * thresholds to testdata scale and gating the optimized plan and the
  * result identity. */
class RuntimeFilterSpec extends SparkSpec {

  test("runtime bloom filter injects into the fact scan and preserves results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "100KB")
      // force a shuffle join: a broadcast join needs no runtime filter
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def q = {
        val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
        val o = Tables.load(spark, "/root/testdata/sf0.01", "orders")
          .filter(col("o_orderdate") < lit("1995-06-01").cast("date"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      }
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom-filter probe in:\n$plan")
      val withFilter = q.collect().map(r => (r.getString(0), r.getLong(1)))
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = q.collect().map(r => (r.getString(0), r.getLong(1)))
      assert(withFilter.sameElements(without),
        "bloom-filter pruning changed query results")
      assert(withFilter.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
