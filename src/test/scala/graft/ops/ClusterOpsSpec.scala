package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusterOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chain graph collapses to one cluster (multi-hop propagation)") {
    // a 10-node path plus a separate 2-node component: min-id must
    // travel 9 hops — only reachable within maxIter via pointer doubling
    val edges = ((1L to 9L).map(i => (i, i + 1)) :+ (20L, 21L))
      .toDF("a", "b")
    val cc = ClusterOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 10L).foreach(i => assert(cc(i) == 1L, s"node $i"))
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("connected components match a union-find oracle on a dense-ish graph") {
    // deterministic pseudo-random graph: 120 nodes, 150 edges via LCG
    var seed = 0x5eedL
    def next(mod: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 16, mod.toLong)
    }
    val edgeList = (1 to 150).map(_ => (next(120), next(120)))
      .filter { case (a, b) => a != b }
    val cc = ClusterOps.connectedComponents(edgeList.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver-side union-find ground truth (test-only)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    members.foreach { case (_, ids) =>
      val expected = ids.min
      ids.foreach(i => assert(cc(i) == expected,
        s"node $i: got ${cc(i)}, want $expected"))
    }
    assert(cc.keySet == parent.keySet)
  }

  test("non-numeric edge ids are rejected up front") {
    val edges = Seq(("x", "y"), ("y", "z")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      ClusterOps.connectedComponents(edges)
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("maxIter exhaustion on a long chain fails loudly") {
    // an 9-hop path cannot converge (and be OBSERVED converged) in one
    // round — silently returning partial labels was the round-3 hazard
    val edges = (1L to 9L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ClusterOps.connectedComponents(edges, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
  }

  test("cluster assignments cover isolated docs and mark keepers") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val edges = Seq((2L, 4L), (4L, 5L)).toDF("a", "b")
    val rows = ClusterOps.clusterAssignments(docs, "doc_id", edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false)))
  }

  private def docs = Seq(
    (0L, (1 to 60).map(i => s"w$i").mkString(" ")),            // base
    (1L, (1 to 57).map(i => s"w$i").mkString(" ") + " x y z"), // near-dup of 0
    (2L, (100 to 160).map(i => s"q$i").mkString(" ")),         // unrelated
    (3L, (1 to 60).map(i => s"w$i").mkString(" ")),            // exact dup of 0
    (5L, (4 to 60).map(i => s"w$i").mkString(" ") + " u v w"), // near-dup of 0/1
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("near-dup clusters are transitive and labeled by the minimum id") {
    val rows = ClusterOps.nearDupClusters(docs, "doc_id", "text",
      threshold = 0.7)
    val byId = rows.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // 0,1,3,5 all near/exact dups of each other (possibly only via 0) —
    // transitive closure must place them in ONE cluster labeled 0
    Seq(0L, 1L, 3L, 5L).foreach(i =>
      assert(byId(i)._1 == 0L, s"doc $i cluster"))
    assert(byId(0L)._2 && !byId(1L)._2 && !byId(3L)._2 && !byId(5L)._2)
    // isolated docs are their own kept singleton
    Seq(2L, 4L).foreach(i => assert(byId(i) == (i, true), s"doc $i"))
  }

  test("every verified pair shares a cluster on real documents (transitivity gate)") {
    val real = graft.Tables.documents(spark, Sf0001)
    val assign = ClusterOps.nearDupClusters(real, "doc_id", "text")
    val pairs = DedupOps.minhashPairs(real, "doc_id", "text")
      .filter(col("jaccard") >= 0.8)
    val lab = assign.select(col("doc_id"), col("cluster_id"))
    val violations = pairs
      .join(lab.select(col("doc_id").as("a"), col("cluster_id").as("ca")),
        Seq("a"))
      .join(lab.select(col("doc_id").as("b"), col("cluster_id").as("cb")),
        Seq("b"))
      .filter(col("ca") =!= col("cb"))
      .count()
    assert(violations == 0L)
    // labels are component minima: no cluster id greater than a member
    assert(assign.filter(col("cluster_id") > col("doc_id")).count() == 0L)
  }

  test("near-dup curation refines exact-text dedup of the gate survivors") {
    // identical texts ALWAYS share a near-dup cluster (Jaccard 1), so
    // the near-dup kept set must refine keep-min-id-per-exact-text.
    // (pipeline_curate's FINGERPRINT dedup is NOT comparable: a shared
    // min rolling hash does not imply Jaccard >= 0.8.)
    val docs = graft.Tables.documents(spark, Sf0001)
    val near = graft.SparkEntry.queries("pipeline_curate_neardup")(
      spark, Sf0001)
    val nearIds = near.select("doc_id").as[Long].collect().toSet
    assert(nearIds.nonEmpty)

    // same quality gate as the pipeline
    val gate = graft.ops.TextOps.quality(docs, col("text"), col("n_chars"))
      .filter(col("quality_score") >= 0.3)
      .select(col("doc_id"), col("text"))
    val gateIds = gate.select("doc_id").as[Long].collect().toSet
    assert(nearIds.subsetOf(gateIds), "kept docs must pass the gate")

    val kept = gate.join(near.select(col("doc_id")), Seq("doc_id"),
      "left_semi")
    // no two kept docs may carry identical text ...
    assert(kept.groupBy(col("text")).count()
      .filter(col("count") > 1).count() == 0L)
    // ... and each kept doc is the min id of its exact-text group
    // among the gate survivors
    val textMin = gate.groupBy(col("text"))
      .agg(min(col("doc_id")).as("min_id"))
    assert(kept.join(textMin, Seq("text"))
      .filter(col("doc_id") =!= col("min_id")).count() == 0L)
  }

  test("pipeline_soft_dedup: reps always kept, members by the exact " +
      "hash rule, sizes consistent, at sf0.001") {
    def knuth(v: Long): Long = {
      val x = ((v % 4294967296L) + 4294967296L) % 4294967296L
      ((x & 65535L) * 2654435761L +
        ((x >> 16) * 2654435761L % 65536L) * 65536L) % 4294967296L
    }
    val rows = graft.SparkEntry
      .queries("pipeline_soft_dedup")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    // size column == observed cluster multiplicity
    val bySize = rows.groupBy(_._2).view.mapValues(_.length.toLong)
    rows.foreach { case (id, cl, size, _) =>
      assert(size == bySize(cl), s"doc $id size $size != ${bySize(cl)}")
    }
    // the keep decision is exactly rep-or-hash-rule
    rows.foreach { case (id, cl, size, kept) =>
      val expect = id == cl ||
        BigInt(knuth(id)) * BigInt(size) < BigInt(4294967296L)
      assert(kept == expect, s"doc $id in cluster $cl (size $size)")
    }
    // singleton clusters are always kept; some non-rep must be dropped
    rows.filter(_._3 == 1L).foreach { case (id, _, _, kept) =>
      assert(kept, s"singleton $id dropped") }
    val nonRepDropped = rows.exists { case (id, cl, _, kept) =>
      id != cl && !kept }
    assert(nonRepDropped, "no near-dup member was thinned — the " +
      "soft-dedup path is unexercised at this sf")
  }
}
