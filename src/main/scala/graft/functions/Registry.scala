package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for graft's native expressions, so the full SQL
  * path (`spark.sql("SELECT cosine_sim(a, b) ...")`) works alongside
  * the Column API. The reference has no SQL surface at all (SURVEY §3:
  * "no SQL path") — with Spark's parser + these registrations, our
  * engine exposes one as a beyond-reference extension.
  */
object Registry {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // weak keys: registration must not pin a stopped session in memory
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register all graft functions on the session (idempotent — a
    * second call on the same session is a no-op, so repeated query
    * construction cannot spam "function replaced a previously
    * registered function" warnings onto stderr, which sbt re-buffers
    * into the bench output tail). */
  def registerAll(spark: SparkSession): Unit = {
    // registration is re-runnable (createOrReplaceTempFunction), so on
    // a race two threads may both register — harmless; what must NOT
    // happen is marking the session done BEFORE the registrations all
    // succeed (a partial failure would latch every later call into a
    // no-op with functions missing), so the put comes LAST
    if (registered.containsKey(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es(0), intArg(es(1), "k"),
        if (es.size > 2) intArg(es(2), "shingleN") else 1), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(es(0), intArg(es(1), "shingleN")), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es(0)), "built-in")
    reg.createOrReplaceTempFunction("char_ngram_hashes",
      es => CharNgramHashes(es(0), intArg(es(1), "n")), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash_min",
      es => RollingHashMin(es(0), intArg(es(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_bits",
      es => HyperplaneBits(es(0), intArg(es(1), "nbits")), "built-in")
    reg.createOrReplaceTempFunction("word_bigrams",
      es => WordBigrams(es(0)), "built-in")
    reg.createOrReplaceTempFunction("word_skipgrams",
      es => WordSkipgrams(es(0),
        if (es.size > 1) intArg(es(1), "window") else 2), "built-in")
    reg.createOrReplaceTempFunction("zorder_value",
      es => ZOrderValue(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("portable_minhash_signature",
      es => PortableMinhashSignature(es(0), intArg(es(1), "k"),
        if (es.size > 2) intArg(es(2), "shingleN") else 3), "built-in")
    reg.createOrReplaceTempFunction("portable_shingle_hashes",
      es => PortableShingleHashes(es(0),
        if (es.size > 1) intArg(es(1), "shingleN") else 3), "built-in")
    reg.createOrReplaceTempFunction("portable_simhash",
      es => PortableSimhash(es(0),
        if (es.size > 1) intArg(es(1), "shingleN") else 3), "built-in")
    reg.createOrReplaceTempFunction("misra_gries_keys",
      es => MisraGriesKeys(es(0), intArg(es(1), "k"))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("count_min_sketch_graft",
      es => CountMinSketchAgg(es(0), intArg(es(1), "depth"),
        intArg(es(2), "width")).toAggregateExpression(), "built-in")
    registered.put(spark, java.lang.Boolean.TRUE)
  }
}
