package graft

/** Every declared query must run and return rows on sf0.001 — the same
  * smoke the driver applies, kept in-tree so a regression is caught at
  * `sbt test` time rather than at round scoring. */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      assert(fn(spark, Sf0001).count() > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("tpch flagship plans: pushed filters, broadcast dims, top-k without a full sort") {
    // the plan properties that make these queries survive 100x data:
    // selective predicates reach the parquet scan, global top-k plans
    // as TakeOrderedAndProject (K rows per partition, never a full
    // sort), and O(10)-row dims broadcast
    val p3 = SparkEntry.queries("q_tpch3")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(p3.contains("TakeOrderedAndProject"), p3)
    assert(p3.contains("PushedFilters") &&
      p3.contains("EqualTo(c_mktsegment,BUILDING)"), p3)
    assert(p3.contains("GreaterThan(l_shipdate"), p3)

    val p10 = SparkEntry.queries("q_tpch10")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(p10.contains("TakeOrderedAndProject"), p10)
    assert(p10.contains("EqualTo(l_returnflag,R)"), p10)

    val p5 = SparkEntry.queries("q_tpch5")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastHashJoin") ||
      p5.contains("BroadcastExchange"), p5)
    assert(p5.contains("EqualTo(r_name,EUROPE)"), p5)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
