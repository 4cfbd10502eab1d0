package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 gates.
  *
  * Bucket-overflow discipline (VERDICT r8 #1): `bucketPairs` must never
  * drop a bucket silently — the EXACT contract (`setSimPairsExact`)
  * fails loud with `raise_error` when a prefix bucket saturates its
  * `maxBucket` cap, and the LSH family surfaces a dropped-bucket count
  * as an observed metric. At test scale the DuckDB oracle would catch a
  * binding cap; at 100 TB there is no oracle — the engine must defend
  * its own contract.
  */
class Round9Spec extends SparkSpec {

  /** 6 identical docs — every shingle bucket (prefix, band, …) holds
    * all 6 ids, so any cap below 6 is binding. */
  private def hotDocs: DataFrame = {
    import spark.implicits._
    (0L until 6L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
  }

  test("setsim exact FAILS LOUD when a prefix bucket exceeds maxBucket") {
    val ex = intercept[Exception] {
      graft.ops.DedupOps
        .setSimPairsExact(hotDocs, "doc_id", "text", maxBucket = 3)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(ex).mkString(" | ")
    assert(all.contains("exceeded maxBucket=3"),
      s"expected a loud bucket-overflow failure, got: $all")
  }

  test("setsim exact still succeeds when the cap is not binding") {
    // same planted hot corpus, cap above the bucket size: the identical
    // docs are legitimate 1.0-Jaccard pairs and must ALL be reported
    val got = graft.ops.DedupOps
      .setSimPairsExact(hotDocs, "doc_id", "text", maxBucket = 100)
      .collect()
    assert(got.length == 15, s"6 identical docs -> C(6,2)=15 pairs, got ${got.length}")
    assert(got.forall(_.getDouble(2) == 1.0))
  }

  test("LSH family reports dropped-bucket count via observed metric") {
    import spark.implicits._
    // hot corpus PLUS one small legitimate near-dup pair: the surviving
    // bucket keeps the result non-empty, because AQE's empty-relation
    // propagation would otherwise prune the CollectMetrics node out of
    // the final plan (an all-dropped front returns 0 rows — itself the
    // alarm at scale)
    val pairDocs = Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val cand = graft.ops.DedupOps
      .minhashCandidates(hotDocs.union(pairDocs), "doc_id", "text",
        maxBucket = 3)
    val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)),
      s"only the small bucket survives the cap; got $got")
    val dropped = cand.queryExecution.observedMetrics.collect {
      case (name, row)
          if name.startsWith(graft.ops.DedupOps.DroppedBucketMetricPrefix) =>
        row.getLong(0)
    }
    assert(dropped.nonEmpty, "expected a graft_dropped_buckets metric")
    assert(dropped.sum > 0,
      s"the 6-identical-doc band buckets overflowed; tally was ${dropped.sum}")
  }

  // ---- graph-family skew stress (round-9 advice #7) ----------------
  // A hash-derived power-law graph (P(node=k) ~ 1/k² via inverse
  // transform on xxhash64 — fully deterministic, no RNG state): node 1
  // is a hub touching ~half of all draws, the adversarial shape for
  // wedge joins. Gates MEASURE the Suri-Vassilvitskii claims instead
  // of arguing them: oriented out-degree <= sqrt(2m), oriented wedge
  // volume far under the unoriented count, and no single join key
  // carrying an outsized share of the wedge work.
  private def powerLawEdges = {
    val nMax = 2000L
    spark.range(200000)
      .select(
        (lit(nMax) / (pmod(xxhash64(col("id"), lit(1)), lit(nMax)) + 1))
          .cast("long").as("p"),
        (pmod(xxhash64(col("id"), lit(2)), lit(nMax)) + 1)
          .cast("long").as("q"))
      .filter(col("p") =!= col("q"))
      .select(least(col("p"), col("q")).as("u"),
        greatest(col("p"), col("q")).as("v"))
      .distinct()
      .localCheckpoint(true)
  }

  test("triangles under a power-law hub: orientation bound + wedge volume " +
      "+ key-work concentration, all measured") {
    val und = powerLawEdges
    val m = und.count()
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val maxDeg = deg.agg(max(col("d"))).head.getLong(0)
    assert(maxDeg * maxDeg > 2 * m,
      s"fixture must be hub-heavy: max degree $maxDeg vs m=$m")
    // replicate the orientation (lower (degree, id) endpoint first)
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val outDeg = oriented.groupBy(col("a")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val maxOut = outDeg.agg(max(col("d"))).head.getLong(0)
    val bound = math.sqrt(2.0 * m)
    assert(maxOut <= bound + 1,
      s"orientation bound broken: max out-degree $maxOut > sqrt(2m)=$bound")
    // wedge volume: sum d+^2 (what the join actually expands) vs the
    // unoriented sum d^2 a naive wedge join would pay on the hub
    val wedgesOriented = outDeg
      .agg(sum(col("d") * col("d"))).head.getLong(0)
    val wedgesNaive = deg.agg(sum(col("d") * col("d"))).head.getLong(0)
    assert(wedgesOriented * 4 < wedgesNaive,
      s"orientation should collapse hub wedges: $wedgesOriented vs " +
        s"naive $wedgesNaive")
    // KEY-work concentration in the wedge join (the quantity that
    // capsizes a task at scale — task-level bytes are AQE-coalesced
    // into one task at toy sizes and measure nothing): work per join
    // key b is in(b)·out(b); no single key may dominate, because a
    // high-degree node's edges orient INTO it (out small) and a
    // high-out node is low-degree (in small)
    val inDeg = oriented.groupBy(col("b")).agg(count(lit(1)).as("di"))
    val keyWork = outDeg.withColumnRenamed("d", "do_")
      .join(inDeg, col("a") === col("b"), "full_outer")
      .select((coalesce(col("do_"), lit(0L)) *
        coalesce(col("di"), lit(0L))).as("w"))
    val kw = keyWork.agg(sum(col("w")), max(col("w"))).head
    val (workTotal, workMax) = (kw.getLong(0), kw.getLong(1))
    assert(workMax * 10 < workTotal,
      s"one wedge-join key carries $workMax of $workTotal — hub skew " +
        "survived the orientation")
    val nTri = graft.ops.GraphOps.triangles(und, "u", "v").count()
    assert(nTri > 0, "hub graph must contain triangles")
    info(f"m=$m maxDeg=$maxDeg maxOut=$maxOut bound=${bound}%.0f " +
      f"wedges=$wedgesOriented naive=$wedgesNaive triangles=$nTri " +
      f"maxKeyWorkShare=${workMax.toDouble / workTotal}%.3f")
  }

  test("LPA on the power-law hub graph: equals the driver reference, " +
      "hub-bounded per-round join work") {
    val und = powerLawEdges
    val edges = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = graft.ops.GraphOps.labelPropagation(und, "u", "v", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.ops.GraphOps.lpaLocal(edges, iters = 4)
    assert(got == want,
      s"LPA diverged from the reference on ${got.size} nodes")
    // per-round join-key concentration: each round joins labels to the
    // adjacency on the destination node, so a key's work is its degree
    // — the hub must stay a bounded fraction of the total even at
    // maxDeg ~ 2000 (2m rows per round; linear in the key's degree,
    // never quadratic)
    val m = edges.length.toLong
    val maxDeg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size).max.toLong
    assert(maxDeg * 10 < 2 * m,
      s"hub degree $maxDeg dominates the 2m=${2 * m} per-round join rows")
    info(f"nodes=${got.size} m=$m maxDeg=$maxDeg " +
      f"hubRoundShare=${maxDeg.toDouble / (2 * m)}%.4f")
  }

  test("LSH dropped-bucket metric is ZERO on the real corpus (no silent loss)") {
    val docs = Tables.documents(spark, Sf0001)
    val cand = graft.ops.DedupOps
      .minhashCandidates(docs, "doc_id", "text")
    cand.queryExecution.toRdd.count()
    val dropped = cand.queryExecution.observedMetrics.collect {
      case (name, row)
          if name.startsWith(graft.ops.DedupOps.DroppedBucketMetricPrefix) =>
        row.getLong(0)
    }
    assert(dropped.nonEmpty && dropped.sum == 0,
      s"default caps must not bind at test scale: $dropped")
  }
}
