package graft

import org.apache.spark.sql.functions._

/** Gates on the scaling probe's DERIVED corpus — the measurement is
  * only meaningful if the scaled tables preserve the base tables'
  * invariants (the probe's exponents feed PLANS.md and the map-shaped
  * gate, so a skewed derivation would silently invalidate them). */
class ScaleProbeSpec extends SparkSpec {

  test("deriveScaled: factor-exact row counts, preserved invariants, " +
      "surviving graph seeds, near-dup-but-segment-novel documents") {
    val factor = 3
    val dir = ScaleProbe.deriveScaled(spark, Sf0001, factor)

    // factor-exact replication for the scaled tables; identity for
    // the copied-through ones
    for (t <- Seq("documents", "events", "embeddings")) {
      val base = Tables.load(spark, Sf0001, t).count()
      val big = Tables.load(spark, dir, t).count()
      assert(big == base * factor, s"$t: $big != $base x $factor")
    }
    for (t <- Seq("region", "nation", "lineitem")) {
      assert(Tables.load(spark, dir, t).count() ==
        Tables.load(spark, Sf0001, t).count(), s"$t must copy through")
    }

    // documents: n_chars == strlen(text) stays exact; ids are the
    // interleaving id*f+copy (bijective: count distinct == count)
    val docs = Tables.load(spark, dir, "documents")
    assert(docs.filter(col("n_chars") =!= length(col("text")))
      .count() == 0, "n_chars invariant broken on derived rows")
    assert(docs.select(col("doc_id")).distinct().count() == docs.count())

    // copies are segment-novel vs their base (the PREPEND shifts the
    // 16-token tiling) but minhash-near-dup: copy 1 of base doc 0
    // shares no 16-token segment string with the base text, yet
    // shares most shingles
    val base0 = Tables.load(spark, Sf0001, "documents")
      .filter(col("doc_id") === 0).select(col("text")).head.getString(0)
    val copy1 = docs.filter(col("doc_id") === 1) // doc 0, copy 1
      .select(col("text")).head.getString(0)
    assert(copy1.endsWith(base0) && copy1 != base0,
      "copy must be the base text with a prepended token")
    def segs(t: String) = t.toLowerCase.split("\\s+").toSeq
      .grouped(16).map(_.mkString(" ")).toSet
    assert(segs(base0).intersect(segs(copy1)).isEmpty,
      "prepend must shift every 16-token segment tile")

    // events: the graph queries' literal seeds (users 0..2) survive
    val users = Tables.events(spark, dir)
      .filter(col("user_id").isin(0L, 1L, 2L)).count()
    assert(users > 0, "seed users 0..2 must exist in the scaled graph")
    // ts arrives in the long-nanos contract Tables.events normalizes
    assert(Tables.events(spark, dir).schema("ts").dataType.typeName
      == "long")

    // embeddings: ids interleave, vectors stay float arrays of the
    // base dimensionality
    val emb = Tables.load(spark, dir, "embeddings")
    val baseDim = Tables.load(spark, Sf0001, "embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    assert(emb.filter(size(col("embedding")) =!= baseDim).count() == 0)
  }
}
