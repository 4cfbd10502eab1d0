package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Event-ORDER properties for the stateful streaming operators
  * (sessionize / funnelStages / heavyHitterCandidatesExpiring):
  * ScalaCheck-seeded random micro-batch chunkings and within-batch
  * shuffles, each checked against the batch answer.
  *
  * THE DELIVERY CONTRACT these properties pin down (the operators'
  * documented out-of-order guarantee):
  *  - WITHIN a micro-batch, events may arrive in ANY order — every
  *    handler sorts its batch slice by (ts, event_type) before folding
  *    state, so intra-batch disorder is invisible;
  *  - ACROSS micro-batches, per-key delivery is time-ordered up to the
  *    batch boundary: an event must not arrive in a LATER batch than an
  *    already-delivered event of the same key with a strictly larger
  *    timestamp. A cross-batch straggler is the documented
  *    bounded-state horizon caveat (see funnelStages' scaladoc) — the
  *    batch query is the backfill that settles it; a straggler older
  *    than the watermark is dropped by Spark itself before the handler.
  *
  * Under that contract the final streaming answer must EQUAL the batch
  * answer for EVERY ordering — which is exactly what each property
  * asserts over its generated orderings (50 across the three ops). */
class StreamOrderPropertySpec extends SparkSpec {
  import EventStreams.{GroupItemTs, UserEvent}

  private val t0 =
    java.sql.Timestamp.valueOf("2024-06-01 08:00:00").getTime

  private def at(min: Int) = new java.sql.Timestamp(t0 + min * 60000L)

  /** 4 users, multi-session histories, all funnel stages exercised. */
  private lazy val corpus: Seq[UserEvent] = Seq(
    // user 1: two sessions (gap > 30 min), completes the funnel
    UserEvent(1, at(0), "view", 1.0), UserEvent(1, at(5), "click", 2.0),
    UserEvent(1, at(10), "purchase", 3.0),
    UserEvent(1, at(60), "view", 1.0), UserEvent(1, at(62), "view", 0.5),
    // user 2: click precedes the first view; a later click advances
    UserEvent(2, at(1), "click", 1.0), UserEvent(2, at(3), "view", 1.0),
    UserEvent(2, at(4), "click", 1.0), UserEvent(2, at(90), "view", 2.0),
    // user 3: one long session, stops at stage 2
    UserEvent(3, at(2), "view", 1.0), UserEvent(3, at(20), "click", 1.0),
    UserEvent(3, at(40), "click", 4.0),
    // user 4: singleton session, never advances past stage 1
    UserEvent(4, at(7), "view", 9.0))

  /** Contract-respecting random delivery: cut the time-sorted corpus
    * at ScalaCheck-seeded points into consecutive micro-batches, then
    * shuffle arbitrarily WITHIN each batch. */
  private def orderings[A](events: Seq[A], tsOf: A => Long,
      n: Int, seedBase: Long): Seq[Seq[Seq[A]]] = {
    val sorted = events.sortBy(tsOf)
    (0 until n).map { i =>
      val seed = Gen.choose(Long.MinValue, Long.MaxValue)
        .apply(Gen.Parameters.default, Seed(seedBase + i)).get
      val rnd = new scala.util.Random(seed)
      val nChunks = 1 + rnd.nextInt(5)
      val cuts = Seq.fill(nChunks - 1)(rnd.nextInt(sorted.length + 1))
      val bounds = (Seq(0, sorted.length) ++ cuts).distinct.sorted
      bounds.sliding(2).collect {
        case Seq(a, b) if b > a => rnd.shuffle(sorted.slice(a, b))
      }.toSeq
    }
  }

  test("sessionize: every contract-respecting ordering == batch sessions") {
    import spark.implicits._
    val batchRef = EventStreams.sessionizeBatch(
        corpus.toDF("user_id", "ts", "event_type", "value")
          .select(col("user_id"), col("ts"), col("value")),
        gapMs = 30 * 60000L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
      .toSet
    orderings[UserEvent](corpus, _.ts.getTime, n = 20, seedBase = 100L)
      .zipWithIndex.foreach { case (chunks, i) =>
        implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
        val ms = MemoryStream[UserEvent]
        val q = EventStreams.sessionize(spark,
            ms.toDS().withWatermark("ts", "1 minute"),
            gapMs = 30 * 60000L)
          .writeStream.format("memory").queryName(s"sess_prop_$i")
          .outputMode("append").start()
        try {
          chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
          // far-future flush fires every timeout → final sessions emit
          ms.addData(UserEvent(999, at(1000000), "view", 0.0))
          q.processAllAvailable()
          q.processAllAvailable()
          val got = spark.table(s"sess_prop_$i")
            .filter(col("user_id") =!= 999)
            .collect()
            .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
              r.getLong(3), r.getDouble(4)))
            .toSet
          assert(got == batchRef,
            s"ordering $i (${chunks.map(_.size).mkString("+")}) diverged:\n" +
              s"got      $got\nexpected $batchRef")
        } finally q.stop()
      }
  }

  test("funnelStages: every contract-respecting ordering == batch stages") {
    import spark.implicits._
    // batch mode sees each user's full history in one group — the
    // conditional-min cascade equivalence is EventStreamsSpec-gated
    val batchRef = EventStreams.funnelStages(spark, corpus.toDS())
      .collect().map(p => p.user_id -> p.stage).toMap
    orderings[UserEvent](corpus, _.ts.getTime, n = 20, seedBase = 200L)
      .zipWithIndex.foreach { case (chunks, i) =>
        implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
        val ms = MemoryStream[UserEvent]
        val q = EventStreams.funnelStages(spark,
            ms.toDS().withWatermark("ts", "1 minute"))
          .writeStream.format("memory").queryName(s"funnel_prop_$i")
          .outputMode("update").start()
        try {
          chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
          ms.addData(UserEvent(999, at(1000000), "view", 0.0))
          q.processAllAvailable()
          q.processAllAvailable()
          val got = spark.table(s"funnel_prop_$i")
            .filter(col("user_id") =!= 999)
            .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
            .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
          assert(got == batchRef,
            s"ordering $i (${chunks.map(_.size).mkString("+")}) diverged: " +
              s"got $got expected $batchRef")
        } finally q.stop()
      }
  }

  test("expiring heavy hitters: containment holds under every ordering") {
    import spark.implicits._
    // two groups, one decisive heavy item each (> N/(k+1) of its
    // group), plus singleton noise; item timestamps minute-spaced so
    // each group is ONE contiguous active period (idle gaps < idleMs)
    val items: Seq[GroupItemTs] =
      (0 until 10).map(m => GroupItemTs("g1", "hot1", at(m))) ++
        (0 until 6).map(m => GroupItemTs("g1", s"noise$m", at(10 + m))) ++
        (0 until 8).map(m => GroupItemTs("g2", "hot2", at(m))) ++
        (0 until 4).map(m => GroupItemTs("g2", s"rare$m", at(8 + m)))
    orderings[GroupItemTs](items, _.ts.getTime, n = 10, seedBase = 300L)
      .zipWithIndex.foreach { case (chunks, i) =>
        implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
        val ms = MemoryStream[GroupItemTs]
        val q = EventStreams.heavyHitterCandidatesExpiring(spark,
            ms.toDS().withWatermark("ts", "1 minute"), k = 4,
            idleMs = 60 * 60000L)
          .writeStream.format("memory").queryName(s"hh_prop_$i")
          .outputMode("update").start()
        try {
          chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
          // flush far past every deadline → both groups evict and emit
          // their FINAL candidate summaries
          ms.addData(GroupItemTs("flush", "x", at(1000000)))
          q.processAllAvailable()
          q.processAllAvailable()
          val finals = spark.table(s"hh_prop_$i")
            .filter(col("evicted") && col("group") =!= "flush")
            .collect()
            .map(r => r.getString(0) -> r.getSeq[String](1).toSet)
            .toMap
          // the Misra-Gries guarantee, scoped to the active period: a
          // key with freq > N/(k+1) of its group MUST be a candidate,
          // under ANY delivery order
          assert(finals.get("g1").exists(_.contains("hot1")),
            s"ordering $i: hot1 missing from ${finals.get("g1")}")
          assert(finals.get("g2").exists(_.contains("hot2")),
            s"ordering $i: hot2 missing from ${finals.get("g2")}")
        } finally q.stop()
      }
  }
}
