package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:00:05")),
      (3L, "A", ts("2024-01-01 10:01:00")),
      (4L, "B", ts("2024-01-01 09:00:00")),
      (5L, "C", ts("2024-01-01 12:00:00"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:59"), 100.0),
      ("A", ts("2024-01-01 10:00:05"), 101.0), // exactly at trade 2 → matches
      ("A", ts("2024-01-01 10:00:30"), 102.0),
      ("B", ts("2024-01-01 10:00:00"), 50.0)   // after trade 4 → no match
    ).toDF("sym", "t", "px")

    val res = JoinOps.asofJoin(trades, quotes, "sym", "sym", "t", "t",
      Seq("px"))
      .select(col("trade_id"), col("asof_px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(res(1L).contains(100.0)) // latest quote <= 10:00:00
    assert(res(2L).contains(101.0)) // tie at same instant matches
    assert(res(3L).contains(102.0))
    assert(res(4L).isEmpty)         // only later quotes exist
    assert(res(5L).isEmpty)         // no quotes for C at all
  }

  test("fuzzy join finds within-distance pairs and only those") {
    val a = Seq((1L, "gadget"), (2L, "widget"), (3L, "sprocket"))
      .toDF("ak", "an")
    val b = Seq((10L, "gadgets"), (11L, "midget"), (12L, "unrelated"))
      .toDF("bk", "bn")
    // blockPrefix=1 so blocking does not mask the distance check here
    val got = JoinOps.fuzzyJoin(a, b, "an", "bn", maxDist = 2,
      blockPrefix = 1)
      .select(col("an"), col("bn"), col("dist"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    // gadget~gadgets: 1 edit; widget~... nothing shares prefix 'w' on
    // the right; sprocket has no within-2 partner
    assert(got == Set(("gadget", "gadgets", 1)))
    // verify the length band prunes before levenshtein: a 9-char
    // unrelated string never pairs with 6-char names at maxDist 2
    val wide = JoinOps.fuzzyJoin(a, b, "an", "bn", maxDist = 5,
      blockPrefix = 1)
      .select(col("an"), col("bn"), col("dist")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(wide.contains(("widget", "midget", 1)) == false,
      "different first letters must stay in different blocks")
  }

  test("topk aggregator equals window top-k on real embeddings") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val win = AnnOps.bruteForceTopK(emb, q, "vec_id", "embedding", 7)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val agg = AnnOps.bruteForceTopKAgg(emb, q, "vec_id", "embedding", 7)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    assert(win.toSeq == agg.toSeq)
  }
}
