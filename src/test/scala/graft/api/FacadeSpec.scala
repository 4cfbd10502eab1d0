package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.api.{exprs => e}

/** Reference-parity behavior of the facade, mirroring the reference's
  * own test patterns (SURVEY §5): the canonical end-to-end query, the
  * aggregate query, schema semantics, and plan-shape (column pruning)
  * assertions.
  */
class FacadeSpec extends SparkSpec {

  lazy val ctx = new GraftContext(spark)

  // The single integration test of the reference
  // (src/execution/mod.rs:55-85): employees in CO.
  test("canonical query: filter state=CO, project id/first_name/last_name") {
    val result = ctx.csv(resource("employee.csv"))
      .filter(e.eq(e.col("state"), e.lit("CO")))
      .project(e.col("id"), e.col("first_name"), e.col("last_name"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(result.toSeq == Seq(("1", "Bob", "Ben"), ("4", "Mayne", "Vary")))
  }

  // CSV schema inference is header-only → all columns StringType
  // (reference src/datasources/mod.rs:53-70).
  test("csv schema: every column is StringType") {
    val schema = ctx.csv(resource("employee.csv")).schema
    assert(schema.fieldNames.toSeq ==
      Seq("id", "first_name", "last_name", "state", "salary"))
    assert(schema.fields.forall(_.dataType == StringType))
  }

  // Aggregate query shape from the reference's dataframe tests
  // (dataframe/mod.rs:122-151): MIN/MAX/COUNT of salary by state —
  // string min/max are lexicographic, as the reference's accumulator
  // tests prove intended (accumulator/mod.rs:108-116).
  test("aggregate: min/max/count of salary by state (string semantics)") {
    val rows = ctx.csv(resource("employee.csv"))
      .aggregate(
        Seq(e.col("state")),
        Seq(e.min(e.col("salary")).as("min_sal"),
          e.max(e.col("salary")).as("max_sal"),
          e.count(e.col("salary")).as("n")))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("CO", "1000", "4312", 2L),
      ("DF", "7812", "7812", 1L),
      ("TH", "9891", "9891", 1L)))
  }

  // CAST before aggregating (reference src/logical_plan/mod.rs:694-701,
  // fixed per SURVEY §2.6 item 5): MAX(CAST(salary AS int)).
  test("cast: numeric aggregate over string column") {
    val rows = ctx.csv(resource("employee.csv"))
      .aggregate(Seq(), Seq(
        e.max(e.cast(e.col("salary"), IntegerType)).as("max_sal"),
        e.sum(e.cast(e.col("salary"), IntegerType)).as("sum_sal")))
      .collect()
    assert(rows.head.getInt(0) == 9891)
    assert(rows.head.getLong(1) == 1000L + 9891 + 7812 + 4312)
  }

  // Working limit (SURVEY §2.6 item 2).
  test("limit") {
    assert(ctx.csv(resource("test.csv")).limit(3).count() == 3)
  }

  // Null-safe equality is the reference's `=` (datatypes/mod.rs:183).
  test("eqNullSafe: Null == Null is true; eq: Null = Null is null") {
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType)))
    val f = ctx.inMemory(schema, Seq(Row(null, null), Row("x", null),
      Row("x", "x")))
    assert(f.filter(e.eqNullSafe(e.col("a"), e.col("b"))).count() == 2)
    assert(f.filter(e.eq(e.col("a"), e.col("b"))).count() == 1)
  }

  // AND — declared-but-todo!() in the reference (§2.6 item 6).
  test("and: conjunction filter") {
    val n = ctx.csv(resource("employee.csv"))
      .filter(e.and(e.eq(e.col("state"), e.lit("CO")),
        e.eq(e.col("first_name"), e.lit("Bob"))))
      .count()
    assert(n == 1)
  }

  // Column by position (reference #index, logical_plan/mod.rs:353-373).
  test("colAt: positional column reference") {
    val f = ctx.csv(resource("employee.csv"))
    val names = f.project(f.colAt(1)).collect().map(_.getString(0)).sorted
    assert(names.toSeq == Seq("Bob", "John", "Mary", "Mayne"))
  }

  // In-memory source round-trip (reference src/datasources/mod.rs:250-313).
  test("inMemory source") {
    val f = ctx.inMemoryStrings(Seq("k", "v"),
      Seq(Seq("a", "1"), Seq("b", "2")))
    assert(f.count() == 2)
    assert(f.filter(e.eq(e.col("k"), e.lit("a"))).collect()
      .head.getString(1) == "1")
  }

  // The reference's one optimizer rule — projection pushdown into the
  // scan (optimizer/mod.rs:32-99). In Spark terms: the optimized plan's
  // parquet read schema must contain only the referenced columns.
  test("column pruning reaches the scan (projection pushdown)") {
    val f = ctx.parquet(s"$Sf0001/lineitem.parquet")
      .filter(e.eq(e.col("l_returnflag"), e.lit("R")))
      .project(e.col("l_orderkey"))
    val scan = f.df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema"))
    // only the two referenced columns survive into the scan
    assert(scan.contains("l_orderkey") && scan.contains("l_returnflag"))
    assert(!scan.contains("l_extendedprice") && !scan.contains("l_shipdate"))
    // and the filter is pushed to the source
    assert(scan.contains("PushedFilters: [IsNotNull(l_returnflag)"))
  }

  // execute() drains like the reference's iterator path
  // (execution/mod.rs:71-77).
  test("execute returns a row iterator") {
    val it = ctx.execute(ctx.csv(resource("test.csv")))
    assert(it.size == 5)
  }

  // The reference's sink golden, byte for byte
  // (execution/mod.rs:78-84: "1,Bob,Ben\n4,Mayne,Vary\n").
  test("toCsvString matches the reference sink golden") {
    val out = ctx.csv(resource("employee.csv"))
      .filter(e.eq(e.col("state"), e.lit("CO")))
      .project(e.col("id"), e.col("first_name"), e.col("last_name"))
      .sort(e.col("id"))
      .toCsvString()
    assert(out == "1,Bob,Ben\n4,Mayne,Vary\n")
  }

  // JSON-lines source round-trip.
  test("json source reads JSON lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json")
    val f = dir.resolve("data.jsonl")
    java.nio.file.Files.writeString(f,
      """{"k":"a","v":1}
        |{"k":"b","v":2}
        |""".stripMargin)
    val frame = ctx.json(f.toString)
    assert(frame.count() == 2)
    assert(frame.filter(e.eq(e.col("k"), e.lit("b"))).collect()
      .head.getAs[Long]("v") == 2L)
  }

  // Raw text-lines source: one document per line, single value column.
  test("text source reads one row per line") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text")
    java.nio.file.Files.writeString(dir.resolve("docs.txt"),
      "first doc\nsecond doc\nthird doc\n")
    val frame = ctx.text(dir.toString)
    assert(frame.df.columns.toSeq == Seq("value"))
    val lines = frame.collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("first doc", "second doc", "third doc"))
  }

  // Binary-file source: the raw multimodal ingestion path.
  test("binaryFiles source reads payload bytes with glob filtering") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    // real encoded images on disk: the decode composition below runs
    // the actual PPM/BMP codec on what the source read back
    val imgA = graft.ops.ImageCodec.encodePpm(2, 1,
      Array[Byte](1, 2, 3, 4, 5, 6))
    val imgB = graft.ops.ImageCodec.encodeBmp(1, 2,
      Array[Byte](7, 8, 9, 10, 11, 12))
    java.nio.file.Files.write(dir.resolve("a.img"), imgA)
    java.nio.file.Files.write(dir.resolve("b.img"), imgB)
    java.nio.file.Files.writeString(dir.resolve("skip.txt"), "not media")
    val frame = ctx.binaryFiles(dir.toString, glob = "*.img")
    val rows = frame.collect()
      .map(r => (new java.io.File(r.getAs[String]("path")).getName,
        r.getAs[Array[Byte]]("content").toSeq))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(("a.img", imgA.toSeq),
      ("b.img", imgB.toSeq)), rows.toSeq.toString)
    // composes with the multimodal decode path: binary content column
    // through the REAL codec
    val meta = graft.ops.Multimodal.decodeAll(ctx.spark,
      frame.df.select(
        org.apache.spark.sql.functions.xxhash64(e.col("path"))
          .as("doc_id"),
        e.col("content")))
    val byFmt = meta.collect().map(m => m.format -> (m.width, m.height))
      .toMap
    assert(byFmt == Map("ppm" -> (2, 1), "bmp" -> (1, 2)), byFmt.toString)
  }

  // Extension wrappers: rollup/cube/dedup/asof through the frame API.
  test("frame extension wrappers: rollup, cube, dedup, asofJoin") {
    val f = ctx.csv(resource("employee.csv"))
    assert(f.aggregateRollup(Seq(e.col("state")),
      Seq(e.count(e.lit(1)).as("n"))).count() == 4) // 3 states + total
    assert(f.aggregateCube(Seq(e.col("state")),
      Seq(e.count(e.lit(1)).as("n"))).count() == 4)
    assert(f.dedup("state").count() == 3)
    val left = ctx.inMemoryStrings(Seq("k", "t"),
      Seq(Seq("a", "5"), Seq("a", "9")))
      .project(e.col("k"), e.cast(e.col("t"), "int").as("t"))
    val right = ctx.inMemoryStrings(Seq("k", "t", "v"),
      Seq(Seq("a", "4", "x"), Seq("a", "7", "y")))
      .project(e.col("k"), e.cast(e.col("t"), "int").as("t"), e.col("v"))
    val asof = left.asofJoin(right, "k", "k", "t", "t", Seq("v"))
      .sort(e.col("t")).collect().map(_.getString(2))
    assert(asof.toSeq == Seq("x", "y")) // t=5→v@4, t=9→v@7
  }

  // CSV writer round-trip (beyond-reference sink).
  test("writeCsv/readback round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
      .toString + "/out"
    val src = ctx.csv(resource("employee.csv"))
    src.writeCsv(dir)
    assert(ctx.csv(dir).count() == src.count())
  }

  // ORC writer/source round-trip (beyond-reference columnar format).
  test("writeOrc/orc round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc")
      .toString + "/out"
    val src = ctx.parquet(s"$Sf0001/customer.parquet")
    src.writeOrc(dir)
    val back = ctx.orc(dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
  }

  // Observation metrics: computed inside the job, no second pass.
  test("observe surfaces named metrics from the executed job") {
    val f = ctx.parquet(s"$Sf0001/customer.parquet")
      .observe("gate", e.count(e.lit(1)).as("n_rows"))
      .filter(e.col("c_mktsegment") === e.lit("BUILDING"))
    // collect() executes THIS frame's QueryExecution (count() would
    // build and run a separate aggregated plan whose metrics live on
    // that other QueryExecution)
    val filtered = f.collect().length
    val metrics = f.df.queryExecution.observedMetrics
    assert(metrics.contains("gate"))
    // the observation sits BEFORE the filter: full input row count
    assert(metrics("gate").getLong(0) > filtered.toLong)
  }
}
