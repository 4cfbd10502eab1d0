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

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
