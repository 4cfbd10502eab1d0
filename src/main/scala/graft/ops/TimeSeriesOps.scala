package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series preparation operators over the event stream — the
  * resample/align stage a feature pipeline runs before training-data
  * assembly (turn an irregular event stream into a fixed-cadence
  * feature grid; every ML feature store has this op).
  */
object TimeSeriesOps {

  /** Regular-grid RESAMPLE with FORWARD FILL: one row per (key, bucket)
    * on a fixed `stepNs` grid spanning each key's observed range, whose
    * value is the key's most recent observation at or before the
    * bucket's close (the "last known value at sample time" contract —
    * an as-of self-alignment).
    *
    * Distributed discipline: grid markers are GENERATED per key from a
    * per-key min/max aggregate (one small row per key — the grid never
    * materializes driver-side), unioned with the observations, and
    * forward-filled by ONE per-key ordered window pass
    * (`last(ignoreNulls)` over rows to current) — per-key state, no
    * global sort, no self-join; at 1000 executors every key's
    * timeline fills independently. Same-timestamp observations reduce
    * deterministically FIRST (max event_id wins) so the fill can never
    * depend on shuffle order; the marker sorts after a same-instant
    * observation via the (ts, kind) tie-break.
    *
    * `tsCol` is epoch nanos (the events contract). Output: key, bucket
    * index (`bucket` = ts div stepNs), `value` — the filled sample at
    * each bucket close. The first bucket of every key contains its
    * first observation, so no leading-null policy is needed. */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String,
      stepNs: Long = 3600L * 1000 * 1000 * 1000): DataFrame = {
    require(stepNs > 0, s"stepNs must be positive (got $stepNs)")
    val k = col(keyCol)
    // deterministic same-instant reduce: the max-id observation wins
    val obs = events
      .groupBy(k, col(tsCol).as("__ts"))
      .agg(max(struct(col(idCol), col(valCol))).as("__m"))
      .select(k, col("__ts"), col("__m").getField(valCol).as("__v"),
        lit(0).as("__kind"))
    // `div`, never `.divide`: epoch nanos (~1.7e18) exceed double's
    // 2^53 mantissa, so a float division here corrupts bucket edges
    val bucketOf = expr(s"`$tsCol` div ${stepNs}L")
    val bounds = events.groupBy(k).agg(
      min(bucketOf).as("__lo"), max(bucketOf).as("__hi"))
    val markers = bounds
      .select(k, explode(sequence(col("__lo"), col("__hi"))).as("__b"))
      .select(k, ((col("__b") + 1) * lit(stepNs) - 1).as("__ts"),
        lit(null).cast("double").as("__v"), lit(1).as("__kind"))
    val w = Window.partitionBy(k).orderBy(col("__ts"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(markers)
      .withColumn("__fill", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(k, expr(s"__ts div ${stepNs}L").as("bucket"),
        col("__fill").as("value"))
  }
}
