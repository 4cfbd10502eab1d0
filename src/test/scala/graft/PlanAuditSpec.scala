package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Whole-suite structural anti-pattern gate: builds EVERY declared
  * query and rejects the two scale-killers a plan can silently grow —
  * a cartesian product and a GLOBAL (no partition keys) window over
  * unbounded input. This automates the per-round plan audit that
  * previously lived in PLANS.md prose; a future query (or an operator
  * edit) that introduces either fails `sbt test` rather than
  * surfacing as a 100-TB incident.
  *
  * The physical plan is taken pre-AQE (`queryExecution.sparkPlan`):
  * structural shape — join strategies aside — is decided here, and the
  * tree is traversable (the AQE wrapper hides its children until
  * execution). Iterative operators (pagerank, LPA, suffix array) build
  * their loop state through eager checkpoints at CONSTRUCTION time, so
  * what this spec sees for them is the final read — their per-round
  * plans are gated by their own specs.
  *
  * Allowlisted global windows run over aggregate-sized inputs by
  * construction (a languages-count table, a top-20 list) — documented
  * in PLANS.md; everything else must partition.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose (only) global windows run over provably tiny inputs:
    * pipeline_mix_temperature's scalars live on the per-language
    * aggregate (≤5 rows); text_vocab_coverage's cumulative share on
    * its top-20 list. */
  private val tinyGlobalWindowOk =
    Set("pipeline_mix_temperature", "text_vocab_coverage")

  test("no query plans a cartesian product or an unlisted global window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, Sf0001).queryExecution.sparkPlan
        val carts = plan.collect { case c: CartesianProductExec => c }
        val globalWins = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }
        val bad = Seq(
          if (carts.nonEmpty) Some(s"$name: CartesianProduct") else None,
          if (globalWins.nonEmpty && !tinyGlobalWindowOk(name))
            Some(s"$name: global Window (no partition keys)")
          else None).flatten
        bad
    }
    assert(offenders.isEmpty,
      s"structural anti-patterns found:\n${offenders.mkString("\n")}")
  }
}
