package graft

/** Round-8 gates.
  *
  * TPC-H plan-shape gates for the queries the round-7 bench record
  * showed regressed (q_tpch7 0.82→3.27s, q_tpch5 0.60→2.42s, q_upsert
  * 0.46→1.45s vs round 6). Root cause (PLANS.md "r7 bench regression"
  * note): a same-code rerun reproduced round-6-level timings exactly
  * (T7 0.63s, T5 0.60s, ups 0.41s, total 97.1s), and the regressed
  * keys — T4 T5 T6 T7 T8 ups wsm — are CONTIGUOUS in the bench's
  * sorted execution order, i.e. a transient external load window
  * swept the record run, not a plan change. These gates pin the plan
  * shapes anyway, so a FUTURE regression of the real kind (lost
  * broadcast, lost pushdown, accidental cartesian) fails loudly at
  * test time instead of surfacing as a bench mystery. */
class Round8Spec extends SparkSpec {

  private def executedPlan(q: String): String = {
    val qe = SparkEntry.queries(q)(spark, Sf0001).queryExecution
    qe.toRdd.count() // materialize so AQE finalizes runtime decisions
    qe.executedPlan.toString
  }

  test("q_tpch7 plan: dims broadcast, shipdate pushed, no cartesian") {
    val plan = executedPlan("q_tpch7")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate lower bound not pushed to the lineitem scan: $plan")
    assert(plan.contains("LessThan(l_shipdate"),
      s"shipdate upper bound not pushed to the lineitem scan: $plan")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4,
      s"expected >= 4 broadcast joins (nation/region on both sides), " +
        s"got $broadcasts")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_tpch5 plan: dims broadcast, orderdate pushed, no cartesian") {
    val plan = executedPlan("q_tpch5")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date window not pushed to the orders scan: $plan")
    assert(plan.contains("LessThan(o_orderdate"),
      s"order-date window not pushed to the orders scan: $plan")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4,
      s"expected >= 4 broadcast joins in the 6-table star, got $broadcasts")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_upsert plan: one co-keyed full-outer merge, no global window") {
    val plan = executedPlan("q_upsert")
    assert(plan.contains("FullOuter"),
      s"upsert must merge via a full-outer join: $plan")
    assert(plan.contains("hashpartitioning(o_orderkey"),
      s"merge sides must co-key on o_orderkey: $plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"),
      s"upsert must not sort through a window: $plan")
  }
}
