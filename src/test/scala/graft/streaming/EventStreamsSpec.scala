package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class EventStreamsSpec extends SparkSpec {

  lazy val batchEvents =
    EventStreams.canonicalEvents(Tables.events(spark, Sf0001))

  test("streaming windowed stats == batch windowed stats") {
    // stage the canonical events as a parquet dir for the file source
    val dir = Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .parquet(dir)
    val q = EventStreams.windowedStats(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .orderBy(col("window_start"), col("event_type")).collect()
      val batch = EventStreams.windowedStats(batchEvents)
        .orderBy(col("window_start"), col("event_type")).collect()
      assert(streamed.length == batch.length && streamed.nonEmpty)
      streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
    } finally q.stop()
  }

  test("streaming dedup drops replayed events") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    // stage the same events twice — a replayed source
    batchEvents.write.mode("overwrite").parquet(dir)
    batchEvents.write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .parquet(dir)
    val q = EventStreams.dedupStream(stream, "event_id")
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").head.getLong(0)
      assert(n == batchEvents.count(),
        s"expected ${batchEvents.count()} unique events, got $n")
    } finally q.stop()
  }

  test("stateful sessionize matches batch window sessionization") {
    import spark.implicits._
    val typed = batchEvents
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStreams.UserEvent]
    // batch-mode flatMapGroupsWithState sees each user's full history
    val stateful = EventStreams.sessionize(spark, typed, gapMs = 30 * 60 * 1000L)
    val batch = EventStreams.sessionizeBatch(
      batchEvents.select(col("user_id"), col("ts"), col("value")),
      gapMs = 30 * 60 * 1000L)
    // the stateful path emits only CLOSED sessions (the final open
    // session per user stays in state) — so it must be a subset
    val closedCount = stateful.count()
    val batchCount = batch.count()
    val users = batchEvents.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(closedCount == batchCount - users,
      s"closed=$closedCount batch=$batchCount users=$users")
    // spot-check one user's closed sessions agree with the batch result
    val u = batchEvents.select(col("user_id")).head.getLong(0)
    val sb = batch.filter(col("user_id") === u)
      .orderBy(col("session_start"))
      .collect().map(r => (r.getTimestamp(1), r.getLong(3)))
    val ss = stateful.filter(col("user_id") === u)
      .orderBy(col("session_start"))
      .collect().map(s => (s.session_start, s.n_events))
    assert(ss.toSeq == sb.toSeq.dropRight(1))
  }
}
