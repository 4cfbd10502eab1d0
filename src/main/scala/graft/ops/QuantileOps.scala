package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT global quantiles without a global sort — the 100-TB path for
  * `percentile(x, q)` when x has billions of rows (beyond-reference;
  * the reference — athultr1997/rust-query-engine — has no aggregate
  * beyond min/max/sum/count/avg).
  *
  * A full exact quantile needs a total order; a naive formulation is
  * one global sort (single-partition window) — the canonical
  * scale-killer. This operator is the classic two-pass
  * sketch-bracketed SELECTION instead (Munro-Paterson style):
  *
  *  pass 1  `approx_percentile` (Spark's built-in KLL-ish digest,
  *          mergeable, partial+final agg) at q±δ gives a VALUE
  *          BRACKET [lo, hi] that must contain the true quantile,
  *          because the digest's rank error 1/accuracy ≪ δ;
  *  pass 2  one partial+final agg computes, per quantile, the exact
  *          count below lo and the exact per-value counts inside
  *          [lo, hi] (the slice is ≤ 2δN rows, and after the groupBy
  *          only its DISTINCT values survive — the cumulative-rank
  *          window runs over that tiny value table, never over rows).
  *
  * The true rank-j elements are read off the cumulative counts and
  * interpolated with exactly `percentile`'s continuous-quantile
  * arithmetic (pos = 1 + q(n-1); v = v1 + frac·(v2-v1)), so the
  * result hash-matches DuckDB's exact `quantile_cont` — an
  * oracle-checkable sketch-powered operator, same design as the
  * Misra-Gries → exact-recount heavy hitters. The same agg tracks the
  * bracket's immediate neighbor values (max below, min above), which
  * cover the one-rank overshoot the digest's rank convention can
  * produce; if a rank is still uncovered (impossible while
  * δ > 1/accuracy — defends against a future knob mistake), the row
  * fails LOUDLY via raise_error rather than dropping. */
object QuantileOps {

  /** Exact global quantiles of `valueCol` (integral type) at `qs`.
    * δ = `margin` must exceed the digest rank error 1/`accuracy`.
    * Returns one row per q: (q, value), ordered by q. */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double], accuracy: Int = 10000,
      margin: Double = 0.005): DataFrame = {
    require(qs.nonEmpty && qs == qs.sorted && qs.distinct == qs,
      s"qs must be sorted distinct (got $qs)")
    require(margin > 1.0 / accuracy,
      s"margin $margin must exceed digest rank error ${1.0 / accuracy}")
    val x = col(valueCol)
    val probes = qs.flatMap(q =>
      Seq(math.max(0.0, q - margin), math.min(1.0, q + margin)))
    // pass 1: row count + bracket digest, one partial+final agg
    val stats = df.agg(
      count(x).as("n"),
      percentile_approx(x, lit(probes.toArray), lit(accuracy))
        .as("bounds"))
    val specs = broadcast(stats.select(col("n"), col("bounds"),
        posexplode(lit(qs.toArray)).as(Seq("qi", "q")))
      .select(col("qi"), col("q"), col("n"),
        element_at(col("bounds"), col("qi") * 2 + 1).as("lo"),
        element_at(col("bounds"), col("qi") * 2 + 2).as("hi")))
    // pass 2: ONE agg (map-side combined) classifies every row as
    // below / in-bracket / above and counts per distinct in-bracket
    // value; min/max per class give the IMMEDIATE NEIGHBOR values of
    // the bracket for free. The neighbors matter because the digest's
    // rank convention (ceil(p·N)-style) can place lo/hi one rank past
    // the interpolation ranks jLo/jHi on small inputs — with
    // margin > 1/accuracy the overshoot is provably at most one rank
    // on either side (|digest rank − target| < margin·N bounds it),
    // so rank n_below (= the max below-bracket value) and rank
    // bracket_end+1 (= the min above-bracket value) are the only two
    // ranks the bracket itself can miss.
    val counted = df.select(x.as("v"))
      .crossJoin(specs)
      .groupBy(col("qi"), col("q"), col("n"),
        when(col("v") < col("lo"), lit(0))
          .when(col("v") <= col("hi"), lit(1))
          .otherwise(lit(2)).as("cls"),
        when(col("v") >= col("lo") && col("v") <= col("hi"), col("v"))
          .as("sv"))
      .agg(count(lit(1)).as("c"),
        min(col("v")).as("minv"), max(col("v")).as("maxv"))
    val nBelow = counted.filter(col("cls") === 0)
      .select(col("qi"), col("c").as("n_below"),
        col("maxv").as("below_max"))
    val above = counted.filter(col("cls") === 2)
      .select(col("qi"), col("minv").as("above_min"))
    val wCum = Window.partitionBy(col("qi")).orderBy(col("sv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the bracket is never empty: the digest returns observed values,
    // so lo itself is an in-bracket data value
    val ranked = counted.filter(col("cls") === 1)
      .join(nBelow, Seq("qi"), "left")
      .withColumn("end_rank",
        coalesce(col("n_below"), lit(0L)) + sum(col("c")).over(wCum))
      .withColumn("start_rank", col("end_rank") - col("c"))
    // continuous-quantile positions: pos = 1 + q(n-1), 1-based
    val pos = lit(1.0) + col("q") * (col("n") - 1)
    val jLo = floor(pos).cast("long")
    val jHi = ceil(pos).cast("long")
    val picked = ranked.groupBy(col("qi"), col("q"), col("n"))
      .agg(
        min(when(jLo > col("start_rank") && jLo <= col("end_rank"),
          col("sv"))).as("v1b"),
        min(when(jHi > col("start_rank") && jHi <= col("end_rank"),
          col("sv"))).as("v2b"),
        max(col("end_rank")).as("br_end"))
      .join(nBelow.select(col("qi"), col("n_below"), col("below_max")),
        Seq("qi"), "left")
      .join(above, Seq("qi"), "left")
      .withColumn("v1", coalesce(col("v1b"),
        when(jLo === coalesce(col("n_below"), lit(0L)),
          col("below_max")),
        when(jLo === col("br_end") + 1, col("above_min"))))
      .withColumn("v2", coalesce(col("v2b"),
        when(jHi === coalesce(col("n_below"), lit(0L)),
          col("below_max")),
        when(jHi === col("br_end") + 1, col("above_min"))))
    picked
      .select(col("q"),
        when(col("v1").isNull || col("v2").isNull,
          raise_error(concat(lit("quantile bracket missed for q="),
            col("q").cast("string"))))
          .otherwise(round(col("v1") +
            (pos - floor(pos)) * (col("v2") - col("v1")), 4))
          .as("value"))
      .orderBy(col("q"))
  }
}
