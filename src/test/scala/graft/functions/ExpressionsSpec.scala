package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpressionsSpec extends SparkSpec {

  test("native cosine matches higher-order-function reference impl") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet").limit(50)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id")).limit(200)
    val diff = pairs.select(
      abs(VectorFunctions.cosineSim(col("va"), col("vb")) -
        VectorFunctions.cosineSimBuiltin(col("va"), col("vb"))).as("d"))
      .agg(max(col("d"))).head.getDouble(0)
    assert(diff < 1e-12, s"native vs builtin cosine diverged by $diff")
  }

  test("cosine of a vector with itself is 1") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet").limit(10)
    val sims = emb.select(
      VectorFunctions.cosineSim(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("minhash signature: deterministic, k lanes, identical for equal input") {
    import spark.implicits._
    val df = Seq("a b c d e", "a b c d e", "v w x y z").toDF("text")
      .select(HashFunctions.minhashSignature(split(col("text"), " "), 16)
        .as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 16)
    assert(sigs(0) == sigs(1), "equal inputs must produce equal signatures")
    assert(sigs(0) != sigs(2), "different inputs should differ")
  }

  test("minhash: similar sets agree on most lanes") {
    import spark.implicits._
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val near = (1 to 98).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val far = (200 to 300).map(i => s"tok$i").mkString(" ")
    val sigs = Seq(base, near, far).toDF("text")
      .select(HashFunctions.minhashSignature(split(col("text"), " "), 64)
        .as("sig")).collect().map(_.getSeq[Long](0))
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count(p => p._1 == p._2)
    assert(agree(sigs(0), sigs(1)) > 40,
      s"near-dup agreement too low: ${agree(sigs(0), sigs(1))}/64")
    assert(agree(sigs(0), sigs(2)) < 10,
      s"unrelated agreement too high: ${agree(sigs(0), sigs(2))}/64")
  }

  test("simhash: near texts have small hamming distance, far texts large") {
    import spark.implicits._
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val near = (1 to 97).map(i => s"tok$i").mkString(" ") + " x y z"
    val far = (200 to 300).map(i => s"w$i").mkString(" ")
    val hs = Seq(base, near, far).toDF("text")
      .select(HashFunctions.simhash64(split(col("text"), " ")).as("h"))
      .collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) <= 12,
      s"near-dup hamming too big: ${ham(hs(0), hs(1))}")
    assert(ham(hs(0), hs(2)) >= 16,
      s"far hamming too small: ${ham(hs(0), hs(2))}")
  }

  test("bounded collect set: sorted distinct values, hard cap") {
    import spark.implicits._
    import graft.functions.BoundedCollectSet.boundedCollectSet
    val df = Seq((1L, 10L), (1L, 5L), (1L, 10L), (2L, 7L))
      .toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(boundedCollectSet(col("v"), 10).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(5L, 10L), "sorted distinct")
    assert(out(2L) == Seq(7L))
    // cap: a group with more distinct values than the limit never
    // exceeds it (the dedup pipelines treat hitting the cap as
    // "degenerate bucket — drop")
    val big = (1 to 100).map(i => (1L, i.toLong)).toDF("g", "v")
    val capped = big.repartition(8).groupBy(col("g"))
      .agg(boundedCollectSet(col("v"), 5).as("vs"))
      .head.getSeq[Long](1)
    assert(capped.length == 5)
  }

  test("rolling hash fingerprint: stable and shift-tolerant") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    val shifted = "PREFIX " + text // shares all 8-grams of the core text
    val hs = Seq(text, text, shifted).toDF("t")
      .select(HashFunctions.rollingHashMin(col("t"), 8).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) == hs(1), "same text must fingerprint identically")
    // the winnowed minimum usually survives a prefix shift (it is a
    // min over a superset of windows) — min can only decrease
    assert(hs(2) <= hs(0))
  }

  test("sketch expressions stay inside one whole-stage-codegen span") {
    // every sketch in one Project over the scan; `*(n)` marks a
    // WholeStageCodegen stage — CodegenFallback exprs would strip it.
    // Generated-code compilation is also exercised (codegen fallback
    // produces identical results, so a compile failure would otherwise
    // hide: interpreted and codegen paths share the SketchKernels
    // methods, and this plan check pins the codegen path as active).
    val docs = graft.Tables.documents(spark, Sf0001)
    val toks = split(lower(col("text")), " ")
    val df = docs.select(
      HashFunctions.minhashSignature(toks, 64, 3).as("mh"),
      HashFunctions.shingleHashes(toks, 3).as("sh"),
      HashFunctions.charNgramHashes(col("text"), 8).as("ng"),
      HashFunctions.simhash64(toks).as("si"),
      HashFunctions.rollingHashMin(col("text"), 8).as("rh"))
    assert(df.queryExecution.toRdd.count() == 500L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project") && l.contains("minhash_signature")),
      s"sketch Project must be codegen'd:\n$plan")
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val df2 = emb.select(
      HashFunctions.hyperplaneBits(col("embedding"), 16).as("hb"))
    assert(df2.queryExecution.toRdd.count() > 0)
    assert(df2.queryExecution.executedPlan.toString.contains("*(1) Project"),
      "hyperplane Project must be codegen'd")
  }

  test("word bigrams: matches HOF reference impl, incl. edge cases") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "one", "a b", "a  b", " lead", "trail ", "a b c")
        .toDF("text"))
    val words = split(col("text"), " ")
    val ref = transform(
      when(size(words) >= 2, sequence(lit(0), size(words) - 2))
        .otherwise(array().cast("array<int>")),
      i => concat_ws(" ",
        element_at(words, i + 1), element_at(words, i + 2)))
    val bad = docs.select(col("text"),
      HashFunctions.wordBigrams(col("text")).as("k"), ref.as("r"))
      .filter(not(col("k") <=> col("r")))
    assert(bad.count() == 0L,
      s"kernel diverged from reference on: ${bad.take(3).mkString("; ")}")
  }

  test("word skipgrams: matches HOF reference impl, stays codegen'd") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("text"))
      .union(Seq("", "one", "a b", "a  b", " lead", "trail ", "a b c",
        "a b c d e").toDF("text"))
    // the round-8 HOF spelling this kernel replaces — kept here as the
    // reference implementation (flatten of per-position 1..2-offset
    // context structs, nulls filtered)
    val ref = expr(
      "flatten(transform(sequence(0, greatest(size(w) - 2, 0)), i -> " +
        "filter(transform(array(1, 2), o -> IF(i + o <= size(w) - 1, " +
        "struct(element_at(w, i + 1) AS center, " +
        "element_at(w, i + o + 1) AS context), null)), " +
        "x -> x IS NOT NULL)))")
    val bad = docs.select(split(col("text"), " ").as("w"), col("text"))
      .select(col("text"),
        HashFunctions.wordSkipgrams(col("text"), 2).as("k"), ref.as("r"))
      .filter(not(col("k") <=> col("r")))
    assert(bad.count() == 0L,
      s"skipgram kernel diverged on: ${bad.take(3).mkString("; ")}")
    // the whole point of the kernel: the pair generator must stay
    // inside a WholeStageCodegen span (the HOF spelling interpreted
    // its lambdas per token)
    val q = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(explode(HashFunctions.wordSkipgrams(lower(col("text")), 2))
        .as("p"))
      .select(col("p.center"), col("p.context"))
    assert(q.queryExecution.toRdd.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1)") && l.contains("word_skipgrams")),
      s"skipgram generate must be codegen'd:\n$plan")
    // general-window gate (the HOF reference above is window-2
    // specific): window=3 vs a driver-side scala reference over the
    // corpus
    val got3 = spark.read.parquet(s"$Sf0001/documents.parquet")
      .orderBy(col("doc_id")).limit(50)
      .select(HashFunctions.wordSkipgrams(col("text"), 3).as("k"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(p => (p.getString(0), p.getString(1))).toList).toList
    val want3 = spark.read.parquet(s"$Sf0001/documents.parquet")
      .orderBy(col("doc_id")).limit(50)
      .select(col("text")).collect().map { r =>
        val w = r.getString(0).split(" ", -1)
        (for {
          i <- w.indices; o <- 1 to 3 if i + o < w.length
        } yield (w(i), w(i + o))).toList
      }.toList
    assert(got3 == want3, "window=3 kernel diverged from the reference")
  }

  test("round-5 expressions are reachable from the SQL path") {
    import spark.implicits._
    Registry.registerAll(spark)
    Seq(("a b c", 3L, 7L)).toDF("text", "x", "y")
      .createOrReplaceTempView("r5_sql_v")
    val r = spark.sql(
      """SELECT word_bigrams(text) AS bg, zorder_value(x, y) AS z,
        |  misra_gries_keys(text, 4) OVER () AS mg,
        |  word_skipgrams(text, 2) AS sg
        |FROM r5_sql_v""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[org.apache.spark.sql.Row](3).map(p =>
      (p.getString(0), p.getString(1))) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    // interleave(3=0b11, 7=0b111): a on odd bits -> 0b1010, b on even
    // bits -> 0b10101; union = 0b11111 = 31
    assert(r.getLong(1) == 31L)
    assert(r.getSeq[String](2) == Seq("a b c"))
  }

  test("portable-family expressions are reachable from the SQL path") {
    import spark.implicits._
    Registry.registerAll(spark)
    Seq(Tuple1("alpha beta gamma delta"))
      .toDF("text").createOrReplaceTempView("r8_sql_v")
    val r = spark.sql(
      """SELECT portable_minhash_signature(split(text, ' '), 16) AS sig,
        |  portable_shingle_hashes(split(text, ' ')) AS sh,
        |  portable_simhash(split(text, ' ')) AS sim
        |FROM r8_sql_v""".stripMargin).head()
    // equality with the column-API spellings (same kernels underneath)
    val c = Seq(Tuple1("alpha beta gamma delta")).toDF("text")
      .select(
        HashFunctions.portableMinhashSignature(
          split(col("text"), " "), 16).as("sig"),
        HashFunctions.portableShingleHashes(split(col("text"), " "))
          .as("sh"),
        HashFunctions.portableSimhash(split(col("text"), " ")).as("sim"))
      .head()
    assert(r.getSeq[Long](0) == c.getSeq[Long](0))
    assert(r.getSeq[Long](1) == c.getSeq[Long](1))
    assert(r.getLong(2) == c.getLong(2))
  }

  test("word bigrams stay inside one whole-stage-codegen span") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val df = docs.select(explode(
      HashFunctions.wordBigrams(col("text"))).as("gram"))
    assert(df.queryExecution.toRdd.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1)") && l.contains("word_bigrams")),
      s"word_bigrams must be codegen'd:\n$plan")
  }
}
