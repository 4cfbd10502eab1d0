package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextOps}

/** Round-6 gates: TPC-H Q15 plan shape, global quantile bucketing
  * equivalence vs the exact ntile, composed-pipeline stage
  * equivalence, and the z-order robustness fixes. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_tpch15 ----------------------------------------------------

  test("q_tpch15: revenue-view shuffle is reused — fact scanned once at runtime") {
    val qe = SparkEntry.queries("q_tpch15")(spark, Sf0001).queryExecution
    qe.toRdd.count() // materialize so AQE finalizes stage reuse
    val plan = qe.executedPlan.toString
    // the max branch must reuse the revenue view's shuffle stage, not
    // rebuild it from a second lineitem scan
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage"), plan)
    // scalar max and the winning row(s) reach supplier as broadcasts
    assert(plan.contains("BroadcastHashJoin"), plan)
    // ship-date quarter bounds reach the lineitem scan
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
  }

  // ---- q_quantile_global --------------------------------------------

  test("q_quantile_global: no window/global-sort; equivalent to exact ntile") {
    val qe = SparkEntry.queries("q_quantile_global")(spark, Sf0001)
      .queryExecution
    // exactQuantiles legitimately windows over the tiny per-quantile
    // bracket-value table PARTITIONED by qi; the scale-killer this gate
    // exists for is a GLOBAL (empty-partition-spec) window — assert
    // none survives anywhere in the plan
    val globalWindows = qe.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"global bucketing must not use a single-partition window: " +
        s"${qe.executedPlan}")

    val approx = SparkEntry.queries("q_quantile_global")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val docs = Tables.documents(spark, Sf0001)
    val n = docs.count()
    // exact global deciles via ntile (the formulation that does NOT
    // scale — used here only as sf0.001 ground truth)
    val exact = docs
      .withColumn("bucket",
        ntile(10).over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("bigint"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // every doc lands in exactly one bucket
    assert(approx.map(_._2).sum == n, approx.mkString(","))
    // bucket ranges are monotone and non-overlapping
    approx.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._1 < hi._1 && lo._4 <= hi._3,
          s"overlapping buckets: $lo vs $hi")
      case _ =>
    }
    // per-bucket counts within tolerance of the exact deciles: the
    // sketch is near-exact at this accuracy, but ties on n_chars are
    // split by ntile and kept together by range bucketing
    approx.foreach { case (b, cnt, _, _) =>
      val ex = exact.getOrElse(b, 0L)
      assert(math.abs(cnt - ex) <= math.max(2L, n / 20),
        s"bucket $b: approx $cnt vs exact $ex")
    }
  }

  // ---- pipeline_full -------------------------------------------------

  test("pipeline_full equals the stage-by-stage recomputation") {
    val got = SparkEntry.queries("pipeline_full")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

    // independent recomposition with DIFFERENT operator choices for
    // the risky stages: dedup via groupBy/min (not window row_number),
    // contamination via RAW shingle strings (not the hash kernel)
    val docs = Tables.documents(spark, Sf0001)
    val evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val gated = TextOps.quality(docs, col("text"), col("n_chars"))
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("pred_lang", TextOps.langId(col("text")))
      .filter(col("quality_score") >= 0.3)
      .filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val keptIds = gated.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = gated.join(keptIds, Seq("doc_id"))
    def shing(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      array_distinct(DedupOps.wordShingles(
        DedupOps.tokens(col("text")), 3)).as("s"))
    val evalGrams = shing(evalSet).select(explode(col("s")).as("g"))
      .distinct()
    val contaminated = shing(deduped)
      .select(col("doc_id"), explode(col("s")).as("g"))
      .join(evalGrams, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val bucket = pmod(pmod(col("doc_id") * lit(2654435761L),
      lit(4294967296L)), lit(10))
    val rate = when(col("source").isin("src0", "src1", "src2", "src3"),
      lit(10)).otherwise(lit(3))
    val sampled = clean.filter(bucket < rate)
      .withColumn("red", TextOps.piiRedact(col("text")))
    val ws = Window.partitionBy(col("pred_lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = sampled
      .select(col("pred_lang"), col("doc_id"),
        TextOps.tokenCount(col("red")).as("n_tokens"))
      .withColumn("shard_id",
        floor((sum(col("n_tokens")).over(ws) - 1) / 4096.0).cast("bigint"))
      .groupBy(col("pred_lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .orderBy(col("pred_lang"), col("shard_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

    assert(got.nonEmpty)
    assert(got == want, s"composed pipeline diverged:\n$got\nvs\n$want")
  }

  test("pipeline_full: text never reaches the post-checkpoint shuffles") {
    // the corpus is materialized once (checkpoint); the stages after it
    // shuffle hashed longs / (lang, id, count) triples — assert no
    // shuffle in the executed plan carries the raw text column
    val qe = SparkEntry.queries("pipeline_full")(spark, Sf0001)
      .queryExecution
    qe.toRdd.count()
    // under AQE the root is an AdaptiveSparkPlanExec and each exchange
    // lives inside a QueryStageExec — a plain collect on the root sees
    // neither, so descend explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def shuffleInputs(p: SparkPlan): Seq[Seq[String]] = p match {
      case a: AdaptiveSparkPlanExec => shuffleInputs(a.executedPlan)
      case q: QueryStageExec => shuffleInputs(q.plan)
      case s: ShuffleExchangeExec =>
        s.child.schema.fieldNames.toSeq +: shuffleInputs(s.child)
      case other => other.children.flatMap(shuffleInputs)
    }
    val shuffles = shuffleInputs(qe.executedPlan)
    assert(shuffles.nonEmpty)
    shuffles.foreach { fields =>
      assert(!fields.contains("text") && !fields.contains("red"),
        s"raw text shuffled: $fields")
    }
  }

  // ---- z-order robustness ---------------------------------------------

  test("zorderWrite survives empty input and all-null cluster columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z6").toString
    val empty = spark.range(0).select(col("id").as("a"), col("id").as("b"))
    ops.StorageOps.zorderWrite(empty, s"$dir/empty", "a", "b", 4)
    assert(spark.read.parquet(s"$dir/empty").count() == 0)

    val nulls = spark.range(10).select(col("id").as("a"),
      lit(null).cast("long").as("b"))
    ops.StorageOps.zorderWrite(nulls, s"$dir/nulls", "a", "b", 4)
    assert(spark.read.parquet(s"$dir/nulls").count() == 10)
  }

  test("zorder_value via SQL implicitly casts int arguments") {
    functions.Registry.registerAll(spark)
    // int literals must be analysis-time cast to long, not crash the
    // interpreted path with a ClassCastException (interleave16(3,7)=31)
    val r = spark.sql(
      "SELECT zorder_value(cast(3 as int), cast(7 as int)) AS z")
      .head.getLong(0)
    assert(r == 31L)
    // non-castable types still fail at analysis time
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT zorder_value(array(1), array(2))").collect()
    }
  }
}
