package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The trained quality classifier has no SQL oracle (iterative IRLS),
  * so correctness anchors here: the distributed training must equal a
  * plain-Scala reference IRLS over the collected features TO THE LAST
  * BIT (possible because every sufficient statistic is a decimal sum
  * of rounded terms — order-independent), be partitioning-invariant,
  * and actually learn the rule it is trained on. */
class QualityClassifierSpec extends SparkSpec {

  private val N = QualityClassifierOps.NumFeatures

  /** Reference IRLS mirroring the declared arithmetic: per-row terms
    * rounded to 9 decimals, summed as BigDecimal. */
  private def refTrain(rows: Array[(Array[Double], Int)],
      iters: Int): Array[Double] = {
    // mirror Spark exactly: round(col, 9) rounds via BigDecimal and
    // RETURNS A DOUBLE; the decimal cast then re-parses that double's
    // shortest string form — so the reference must round-trip through
    // the double too, or last-bit drift would appear
    def rnd(v: Double): BigDecimal = BigDecimal(
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    var beta = new Array[Double](N)
    for (_ <- 0 until iters) {
      val h = Array.fill(N, N)(BigDecimal(0))
      val g = Array.fill(N)(BigDecimal(0))
      rows.foreach { case (x, y) =>
        val z = (0 until N).map(i => x(i) * beta(i)).sum
        val mu = 1.0 / (1.0 + math.exp(-z))
        val w = mu * (1.0 - mu)
        for (i <- 0 until N; j <- i until N)
          h(i)(j) += rnd(w * x(i) * x(j))
        for (i <- 0 until N) g(i) += rnd((y - mu) * x(i))
      }
      val hm = Array.tabulate(N, N)((i, j) =>
        (if (j >= i) h(i)(j) else h(j)(i)).toDouble)
      for (i <- 0 until N) hm(i)(i) += 1e-6
      val delta = QualityClassifierOps.solve(hm, g.map(_.toDouble))
      beta = beta.zip(delta).map { case (b, d) => b + d }
    }
    beta
  }

  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
  private lazy val feats =
    QualityClassifierOps.featurize(docs, col("text"))

  test("distributed IRLS == reference IRLS to the last bit") {
    val collected = feats.collect().map { r =>
      (Array.tabulate(N)(i => r.getDouble(r.fieldIndex(s"f$i"))),
        r.getInt(r.fieldIndex("label")))
    }
    val ref = refTrain(collected, 8)
    val got = QualityClassifierOps.train(feats)
    assert(got.toSeq == ref.toSeq,
      s"beta mismatch:\n got=${got.mkString(",")}\n ref=${ref.mkString(",")}")
  }

  test("training is partitioning-invariant") {
    val b1 = QualityClassifierOps.train(feats)
    val b2 = QualityClassifierOps.train(feats.repartition(13))
    assert(b1.toSeq == b2.toSeq,
      "decimal-summed IRLS must not depend on partitioning")
  }

  test("the classifier learns the rule it is trained on") {
    val beta = QualityClassifierOps.train(feats)
    val scored = feats
      .withColumn("clf", (QualityClassifierOps.score(beta) >= 0.5)
        .cast("int"))
    val (agree, total, passes) = {
      val r = scored.agg(
        sum(when(col("clf") === col("label"), 1L).otherwise(0L)),
        count(lit(1)),
        sum(col("label").cast("bigint"))).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // both classes must exist or "learning the rule" is vacuous
    assert(passes > 0 && passes < total,
      s"degenerate corpus: $passes/$total rule passes")
    assert(agree.toDouble / total >= 0.85,
      s"classifier agrees on only $agree/$total")
  }
}
