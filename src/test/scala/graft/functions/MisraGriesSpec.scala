package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {

  /** Skewed synthetic stream: key "h<i>" appears ~2^(8-i) times for
    * i in 0..7, plus a long tail of singletons — small k forces the
    * eviction/purge/merge paths that real corpora would. */
  private def skewed = {
    import spark.implicits._
    val rows = (0 until 8).flatMap(i =>
      Seq.fill(1 << (8 - i))(s"h$i")) ++
      (0 until 3000).map(i => s"tail$i")
    // deterministic interleave so heavy keys are spread across the
    // stream (and across the 8 shuffled partitions), not front-loaded
    rows.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % 4096 }
      .map(_._1).toDF("key").repartition(8)
  }

  test("MG guarantee: every key with freq > N/(k+1) is in the sketch") {
    val df = skewed
    val n = df.count()
    val k = 64
    val sketch = df.agg(MisraGries.mgKeys(col("key"), k).as("ks"))
      .selectExpr("explode(ks) as key").collect().map(_.getString(0)).toSet
    assert(sketch.size <= k, s"sketch exceeded k: ${sketch.size}")
    val mustHave = df.groupBy(col("key")).count()
      .filter(col("count") > n / (k + 1).toDouble)
      .collect().map(_.getString(0))
    assert(mustHave.nonEmpty, "test data has no heavy keys — fix the fixture")
    val missing = mustHave.filterNot(sketch)
    assert(missing.isEmpty,
      s"guaranteed heavy keys missing from sketch: ${missing.mkString(",")}")
  }

  test("two-pass heavy hitters == exact GROUP BY + HAVING") {
    val df = skewed
    val k = 64
    val cands = df.agg(MisraGries.mgKeys(col("key"), k).as("ks"))
      .selectExpr("explode(ks) as key")
    val total = df.agg(count(lit(1)).as("total"))
    val twoPass = df.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 100 >= col("total")) // phi = 1% >> 1/(k+1)
      .select(col("key"), col("n"))
      .orderBy(col("n").desc, col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = df.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 100 >= col("total"))
      .select(col("key"), col("n"))
      .orderBy(col("n").desc, col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty)
    assert(twoPass == exact,
      s"two-pass $twoPass != exact $exact")
  }

  test("a deserialized FULL summary still admits new keys (minStored restore)") {
    // regression: fromBytes used to leave the lazy purge floor at
    // Long.MaxValue, so a restored full summary could never purge dead
    // entries or admit a new key — a heavy hitter first appearing
    // after a state-store round-trip was silently lost
    val k = 4
    val buf = new MGBuffer(k)
    // four live keys (margin 1 each after two decrements) — the wire
    // format only carries LIVE entries, so the fixture must end live
    Seq("a", "b", "c", "d").foreach(s => (0 until 3).foreach(_ => buf.add(s)))
    buf.add("x"); buf.add("y") // two misses: base → 2, margin → 1
    val restored = MGBuffer.fromBytes(MGBuffer.toBytes(buf), k)
    assert(restored.counts.size == k, "fixture must restore a full summary")
    (0 until 100).foreach(_ => restored.add("late_hot"))
    val eff = restored.effective.toMap
    assert(eff.contains("late_hot"),
      s"new heavy key not admitted after round-trip: $eff")
    // MG error bound: effective count within N/(k+1) of truth for the
    // post-restore stream (100 adds of late_hot + restored mass)
    assert(eff("late_hot") > 0L && eff("late_hot") <= 100L)
  }

  test("serialize/deserialize round-trips live entries") {
    val agg = MisraGriesKeys(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = new MGBuffer(4)
    Seq("a", "a", "a", "b", "b", "c", "d", "e", "e").foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.effective.toMap == buf.effective.toMap)
  }
}
