package graft

/** Sample program through the public API — used to drive the facade
  * end-to-end outside the test harness (`sbt "Test/runMain graft.DemoMain"`).
  */
object DemoMain {
  def main(args: Array[String]): Unit = {
    import graft.api.{GraftContext, exprs => e}
    val ctx = GraftContext.local(4)

    val co = ctx.csv("/root/repo/src/test/resources/employee.csv")
      .filter(e.eq(e.col("state"), e.lit("CO")))
      .project(e.col("id"), e.col("first_name"), e.col("last_name"))
    println("CO rows: " + co.collect().map(_.toSeq.mkString(","))
      .sorted.mkString(" | "))

    val agg = ctx.csv("/root/repo/src/test/resources/employee.csv")
      .aggregate(Seq(e.col("state")),
        Seq(e.max(e.cast(e.col("salary"), "int")).as("max_sal")))
    println("AGG: " + agg.collect().map(_.toSeq.mkString(":"))
      .sorted.mkString(" | "))

    println("PLAN HAS PUSHDOWN: " +
      ctx.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(e.eq(e.col("l_returnflag"), e.lit("R")))
        .project(e.col("l_orderkey"))
        .explainPhysical().contains("PushedFilters: [IsNotNull(l_returnflag)"))

    try { ctx.csv("/tmp/x.csv", hasHeaders = false); println("NOT REJECTED!") }
    catch { case ex: IllegalArgumentException =>
      println("HEADERLESS REJECTED: " + ex.getMessage.take(60)) }

    import graft.streaming.EventStreams
    import org.apache.spark.sql.functions.col
    val ev = EventStreams.canonicalEvents(
      Tables.events(ctx.spark, "/root/testdata/sf0.001"))
    println("SESSIONS(batch): " + EventStreams.sessionizeBatch(
      ev.select(col("user_id"), col("ts"), col("value"))).count())
    import ctx.spark.implicits._
    val typed = ev.select(col("user_id"), col("ts"), col("event_type"),
      col("value")).as[EventStreams.UserEvent]
    println("SESSIONS(stateful closed): " +
      EventStreams.sessionize(ctx.spark, typed).count())
    ctx.spark.stop()
  }
}
