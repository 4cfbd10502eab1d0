package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (at 100 TB a single hot key can stall a stage for hours while 999
  * executors idle).
  *
  * Spark's AQE skew-join handles sort-merge skew automatically; this
  * explicit salting utility covers the cases AQE cannot see (e.g. a
  * skewed key feeding an aggregation-after-join, or disabled AQE) and
  * documents the pattern: the fact side gets a random-ish salt in
  * [0, salts), the dim side is replicated once per salt value, and the
  * join key becomes (key, salt) — splitting each hot key across
  * `salts` reducers. Salt derives from a hash of the whole fact row's
  * unique id (deterministic, no RNG).
  */
object SkewOps {

  /** Equi-join `fact ⋈ dim` on `factKey == dimKey`, salted `salts`
    * ways. Result equals the unsalted inner join, row for row. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFrom: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltFrom), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation: groupBy (key, salt) first — the hot
    * key's rows split across `salts` reducers — then re-aggregate the
    * partials by key. `aggs` supplies BOTH phases for each output
    * column (partial expression, merge expression over the partial's
    * alias). Spark's own partial aggregation already splits map-side;
    * explicit salting additionally splits the REDUCE side, which is
    * what saves a stage whose single hot key exceeds one reducer. */
  def saltedAgg(df: DataFrame, key: String, saltFrom: Column, salts: Int,
      aggs: Seq[(Column, Column)]): DataFrame = {
    val partialCols = aggs.map(_._1)
    val mergeCols = aggs.map(_._2)
    df.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partialCols.head, partialCols.tail: _*)
      .groupBy(col(key))
      .agg(mergeCols.head, mergeCols.tail: _*)
  }
}
