package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) queries — the preference-query operator
  * class (Börzsönyi, Kossmann & Stocker, ICDE 2001): keep every point
  * no other point dominates. The reference engine has no such
  * operator (it has no joins or windows at all); this is a
  * beyond-reference extension for multi-criteria analytics.
  */
object SkylineOps {

  /** 2-D skyline minimizing `xCol` and MAXIMIZING the long column
    * `yCol` — e.g. cheapest-but-largest. A point survives iff no
    * other point has x ≤ its x AND y ≥ its y with at least one
    * strict; duplicates collapse to one frontier point.
    *
    * Scalable shape (never a global window): same-x groups first
    * collapse to their max y (one aggregate — everything else in the
    * group is dominated by that point), then the survivor test
    * "y strictly above every cheaper point's y" is an EXCLUSIVE
    * running max over the x order, computed two-phase exactly like
    * [[PackOps.withGlobalOffset]]'s prefix sum: range-partition by x,
    * per-partition window for the local exclusive max, ONE bounded
    * (pid, max) row per partition through the driver for the
    * cross-partition carry, broadcast back. The frontier is emitted
    * in one pass; only the aggregated (x, maxy) table ever moves.
    *
    * All comparisons are on raw column values (no float arithmetic is
    * introduced), so the DuckDB oracle replays the definition with a
    * plain window. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = df.groupBy(col(xCol)).agg(max(col(yCol)).as(yCol))
    val w = Window.partitionBy(col("__pid")).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g
      .repartitionByRange(parts, col(xCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lmax", max(col(yCol)).over(w))
      .localCheckpoint(true)
    val totals = local.groupBy(col("__pid"))
      .agg(max(col(yCol)).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = Long.MinValue
    val prefix = totals.map { case (pid, t) =>
      val base = acc; acc = math.max(acc, t); (pid, base)
    }
    val pDf = prefix.toSeq.toDF("__pid", "__pmax")
    local.join(broadcast(pDf), Seq("__pid"))
      .withColumn("__best",
        greatest(coalesce(col("__lmax"), lit(Long.MinValue)),
          col("__pmax")))
      .filter(col(yCol) > col("__best"))
      .drop("__pid", "__lmax", "__pmax", "__best")
  }
}
