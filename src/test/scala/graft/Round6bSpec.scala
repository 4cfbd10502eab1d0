package graft

import org.apache.spark.sql.functions._

/** Round-6 continuation gates: salted-join plan shape, split
  * fractions, SCD2 interval invariants, and BM25 sanity (exact values
  * for these are oracle-checked; these gates pin the properties the
  * hash compare can't express). */
class Round6bSpec extends SparkSpec {

  test("q_skew_join: dim is NOT broadcast and the salt reaches the join keys") {
    val qe = SparkEntry.queries("q_skew_join")(spark, Sf0001).queryExecution
    qe.toRdd.count()
    val plan = qe.executedPlan.toString
    // the modeled scenario is a non-broadcastable dim: the hint must
    // hold the join in a shuffle strategy, keyed on (key, salt)
    assert(plan.contains("ShuffledHashJoin") ||
      plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("__salt"), s"salt column missing from plan: $plan")
  }

  test("q_skew_join equals the plain unsalted join") {
    val ev = Tables.events(spark, Sf0001)
    val plain = ev
      .withColumn("type_weight", length(col("event_type")).cast("double"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") * col("type_weight"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("weighted_value"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = SparkEntry.queries("q_skew_join")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("q_tvt_split: disjoint, exhaustive, ~80/10/10") {
    val rows = SparkEntry.queries("q_tvt_split")(spark, Sf0001)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val total = rows.map(_._2).sum
    val bydoc = Tables.documents(spark, Sf0001).count()
    assert(total == bydoc, "every document lands in exactly one split")
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val train = bySplit.getOrElse("train", 0L).toDouble / total
    val valF = bySplit.getOrElse("val", 0L).toDouble / total
    val test = bySplit.getOrElse("test", 0L).toDouble / total
    // multiplicative-hash uniformity: generous bounds at 500 docs
    assert(math.abs(train - 0.8) < 0.08, s"train frac $train")
    assert(math.abs(valF - 0.1) < 0.06, s"val frac $valF")
    assert(math.abs(test - 0.1) < 0.06, s"test frac $test")
  }

  test("q_tvt_split assignment is stable under corpus growth") {
    // the split of a doc depends only on its id — recomputing over a
    // half corpus must agree with the full corpus on shared docs
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L),
      lit(4294967296L)), lit(100))
    def splits(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("split", when(bucket < 80, "train")
        .when(bucket < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, Sf0001)
    val full = splits(docs)
    val half = splits(docs.filter(col("doc_id") < 250))
    assert(half.forall { case (id, s) => full(id) == s })
  }

  test("q_scd2: per-customer intervals chain without gaps; one current row") {
    val rows = SparkEntry.queries("q_scd2")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2),
        Option(r.getAs[java.time.LocalDateTime](3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, rs) =>
      val sorted = rs.sortWith((a, b) => a._3.isBefore(b._3))
      // exactly one open (current) interval, and it is the last
      assert(sorted.count(_._4.isEmpty) == 1, s"customer $ck")
      assert(sorted.last._4.isEmpty, s"customer $ck")
      // each interval ends exactly where the next begins
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"gap for customer $ck: $a -> $b")
          // consecutive versions must actually change value
          assert(a._2 != b._2, s"non-change row for customer $ck")
        case _ =>
      }
    }
  }

  test("q_hll_distinct: estimates within 5% of exact; stored-sketch union == direct sketch") {
    val docs = Tables.documents(spark, Sf0001)
    val terms = docs.select(col("source"),
      explode(split(lower(col("text")), " ")).as("term"))

    val rows = SparkEntry.queries("q_hll_distinct")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val exactBySource = terms.groupBy(col("source"))
      .agg(countDistinct(col("term")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, est, _) =>
      val exact = exactBySource(src)
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"$src: est $est vs exact $exact")
    }
    val exactAll = terms.select(col("term")).distinct().count()
    val estAll = rows.head._3
    assert(math.abs(estAll - exactAll).toDouble / exactAll < 0.05,
      s"union estimate $estAll vs exact $exactAll")

    // mergeability: unioning the PERSISTED per-source sketches must
    // equal sketching the whole corpus directly — the property that
    // lets a 100-TB pipeline answer from kilobyte sketch tiles
    val direct = terms
      .agg(hll_sketch_estimate(hll_sketch_agg(col("term"), 12)))
      .head.getLong(0)
    assert(estAll == direct,
      s"stored-sketch union $estAll != direct sketch $direct")
  }

  test("q_weighted_sample matches an independent driver-side A-Res computation") {
    val got = SparkEntry.queries("q_weighted_sample")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val u = (math.floorMod(id * 2654435761L, 4294967296L) + 1) /
          4294967296.0
        val k = BigDecimal(math.pow(u, 1.0 / w))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, k)
      }
      .sortBy { case (id, k) => (-k, id) }
      .take(20).toSeq
    assert(got == want)
    // heavier docs must be overrepresented: mean weight of the sample
    // strictly above the corpus mean (A-Res inclusion ~ weight)
    val byId = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampleMean = got.map(g => byId(g._1)).sum.toDouble / got.size
    val corpusMean = byId.values.sum.toDouble / byId.size
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("text_bm25: only term-matching docs score, and scores are positive") {
    val terms = Set("spark", "join", "window")
    val res = SparkEntry.queries("text_bm25")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(res.nonEmpty && res.forall(_._2 > 0.0))
    val texts = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    res.foreach { case (id, _) =>
      val toks = texts(id).toLowerCase.split(" ").toSet
      assert((toks intersect terms).nonEmpty, s"doc $id matches no term")
    }
    // descending score order with doc_id tiebreak
    val scores = res.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
