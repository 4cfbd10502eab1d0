package graft.api

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions.udf

import graft.SparkSpec
import graft.api.{exprs => e}

/** Fidelity to the reference's test corpus beyond the canonical query:
  * plan-shape goldens from its optimizer tests, error-path semantics,
  * and the UDF extension point (SURVEY §2.5).
  */
class FidelitySpec extends SparkSpec {

  lazy val ctx = new GraftContext(spark)

  // Mirror of the reference's aggregate-pushdown optimizer test
  // (optimizer/mod.rs:207-236: aggregate query scans
  // projection=[salary, state]): the scan must read exactly the two
  // referenced columns. Column SETS, not order — SURVEY §7.4 item 3.
  /** Columns the physical file scan actually reads (`ReadSchema`). */
  private def readSchemaCols(f: GraftFrame): Set[String] = {
    val plan = f.df.queryExecution.executedPlan.toString
    val re = "ReadSchema: struct<([^>]*)>".r
    re.findFirstMatchIn(plan) match {
      case Some(m) =>
        m.group(1).split(",").map(_.split(":")(0).trim).filter(_.nonEmpty)
          .toSet
      case None => fail(s"no ReadSchema in plan:\n$plan")
    }
  }

  test("aggregate query prunes scan to {salary, state}") {
    val f = ctx.csv(resource("employee.csv"))
      .aggregate(Seq(e.col("state")),
        Seq(e.max(e.cast(e.col("salary"), "int")).as("max_sal")))
    assert(readSchemaCols(f) == Set("state", "salary"))
  }

  // Mirror of the filter+project pushdown test
  // (optimizer/mod.rs:181-205: projection=[first_name, id, last_name,
  // state] — filter column included because the filter needs it).
  test("filter+project query prunes scan to referenced columns") {
    val f = ctx.csv(resource("employee.csv"))
      .filter(e.eq(e.col("state"), e.lit("CO")))
      .project(e.col("id"), e.col("first_name"), e.col("last_name"))
    assert(readSchemaCols(f) ==
      Set("id", "first_name", "last_name", "state"))
  }

  // The reference panics on unknown columns at planning time
  // (logical_plan/mod.rs to_field paths); we surface Spark's
  // AnalysisException at analysis time instead — same phase, an error
  // instead of a crash.
  test("unknown column is an analysis error, not a crash") {
    val ex = intercept[AnalysisException] {
      ctx.csv(resource("employee.csv"))
        .project(e.col("no_such_column")).collect()
    }
    assert(ex.getMessage.contains("no_such_column"))
  }

  // Cross-type equality: the reference returns false for mismatched
  // ScalarValue types (datatypes/mod.rs:190); Spark type-coerces at
  // analysis (SURVEY §2.6 item 12) — '1' = 1 is true after coercion.
  // Document the deliberate divergence.
  test("cross-type equality coerces (divergence from reference, by design)") {
    val n = ctx.csv(resource("employee.csv"))
      .filter(e.eq(e.col("id"), e.lit(1)))
      .count()
    assert(n == 1)
  }

  // UDF extension point (SURVEY §2.5: reference Expression trait →
  // Spark udf()). Native expressions are preferred in the hot path;
  // this proves the escape hatch works end-to-end.
  test("scala udf registers and evaluates") {
    val initials = udf((first: String, last: String) =>
      s"${first.head}${last.head}")
    spark.udf.register("initials", initials)
    val got = ctx.csv(resource("employee.csv"))
      .filter(e.eq(e.col("state"), e.lit("CO")))
      .project(initials(e.col("first_name"), e.col("last_name"))
        .as("ini"))
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("BB", "MV"))
    // and via SQL
    ctx.csv(resource("employee.csv")).df.createOrReplaceTempView("emp")
    val viaSql = spark.sql(
      "SELECT initials(first_name, last_name) AS i FROM emp WHERE state = 'CO'")
      .collect().map(_.getString(0)).sorted
    assert(viaSql.toSeq == Seq("BB", "MV"))
  }
}
