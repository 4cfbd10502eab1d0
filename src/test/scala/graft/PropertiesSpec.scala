package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over the real testdata (the reference has
  * no property tests — SURVEY §5). Uses scalacheck generators with a
  * fixed seed for reproducible sampling (the scalatest-scalacheck
  * bridge artifact is not available offline, so sampling is manual).
  */
class PropertiesSpec extends SparkSpec {

  lazy val customer = Tables.customer(spark, Sf0001).cache()
  lazy val documents = Tables.documents(spark, Sf0001).cache()

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filter partition law: p + !p == total (no nulls in acctbal)") {
    val total = customer.count()
    samples(Gen.choose(-1000.0, 10000.0), 8).foreach { threshold =>
      val p = customer.filter(col("c_acctbal") > threshold).count()
      val np = customer.filter(!(col("c_acctbal") > threshold)).count()
      assert(p + np == total, s"threshold=$threshold")
    }
  }

  test("filter-project commutes with project-filter") {
    samples(Gen.oneOf("BUILDING", "AUTOMOBILE", "MACHINERY"), 3)
      .distinct.foreach { seg =>
        val a = customer.filter(col("c_mktsegment") === seg)
          .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
        val b = customer.select(col("c_custkey"), col("c_mktsegment"))
          .filter(col("c_mktsegment") === seg)
          .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
        assert(a.toSeq == b.toSeq, s"segment=$seg")
      }
  }

  test("limit bounds: limit(n).count == min(n, total)") {
    val total = customer.count()
    samples(Gen.choose(1, 500), 6).foreach { n =>
      assert(customer.limit(n).count() == math.min(n.toLong, total))
    }
  }

  test("exact dedup is idempotent") {
    val once = documents.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    val twice = once.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    assert(once.count() == twice.count())
  }

  test("union count is additive; distinct-union bounded by nation count") {
    val a = customer.select(col("c_nationkey"))
    val b = Tables.supplier(spark, Sf0001).select(col("s_nationkey"))
    assert(a.union(b).count() == a.count() + b.count())
    assert(a.union(b).distinct().count() <= 25)
  }

  test("property: MG containment guarantee on random skewed streams") {
    import graft.functions.MGBuffer
    val gen = for {
      k <- Gen.choose(4, 32)
      nKeys <- Gen.choose(2, 200)
      n <- Gen.choose(50, 4000)
      // zipf-ish skew exponent: higher -> heavier head
      keys <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(0, math.max(1, nKeys / 10))),
        (2, Gen.choose(0, nKeys - 1))).map(i => s"k$i"))
    } yield (k, keys)
    samples(gen, 24).foreach { case (k, keys) =>
      val buf = new MGBuffer(k)
      keys.foreach(buf.add(_))
      val live = buf.effective.map(_._1).toSet
      assert(live.size <= k, s"k=$k exceeded: ${live.size}")
      val counts = keys.groupBy(identity).map { case (s, xs) => s -> xs.size }
      val bound = keys.size.toDouble / (k + 1)
      val missing = counts.collect {
        case (s, c) if c > bound && !live(s) => s -> c
      }
      assert(missing.isEmpty,
        s"k=$k n=${keys.size} bound=$bound lost: $missing")
      // serialization round-trip preserves the summary exactly
      val back = MGBuffer.fromBytes(MGBuffer.toBytes(buf), k)
      assert(back.effective.toMap == buf.effective.toMap)
    }
  }

  test("property: merge keeps the MG guarantee across random splits") {
    import graft.functions.{MGBuffer, MisraGriesKeys}
    val agg = MisraGriesKeys(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 16)
    val gen = for {
      n <- Gen.choose(100, 3000)
      cut <- Gen.choose(1, n - 1)
      keys <- Gen.listOfN(n, Gen.frequency(
        (7, Gen.choose(0, 5)), (3, Gen.choose(0, 300))).map(i => s"k$i"))
    } yield (keys, cut)
    samples(gen, 16).foreach { case (keys, cut) =>
      val (l, r) = keys.splitAt(cut)
      val b1 = new MGBuffer(16); l.foreach(b1.add(_))
      val b2 = new MGBuffer(16); r.foreach(b2.add(_))
      val merged = agg.merge(b1, b2)
      val live = merged.effective.map(_._1).toSet
      assert(live.size <= 16)
      val counts = keys.groupBy(identity).map { case (s, xs) => s -> xs.size }
      val bound = keys.size.toDouble / 17
      val missing = counts.collect {
        case (s, c) if c > bound && !live(s) => s -> c }
      assert(missing.isEmpty, s"merge lost guaranteed keys: $missing")
    }
  }

  test("property: wordBigrams kernel == split-based reference on random text") {
    import graft.functions.SketchKernels
    import org.apache.spark.unsafe.types.UTF8String
    val gen = Gen.listOfN(12, Gen.frequency(
      (6, Gen.alphaNumStr.map(_.take(5))),
      (2, Gen.const("")),
      (1, Gen.const("päö")), // multi-byte UTF-8
      (1, Gen.const("漢字"))))
      .map(_.mkString(" "))
    samples(gen, 40).foreach { text =>
      val words = text.split(" ", -1)
      val expect =
        if (words.length < 2) Seq.empty
        else words.sliding(2).map(_.mkString(" ")).toSeq
      val got = SketchKernels
        .wordBigrams(UTF8String.fromString(text))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == expect, s"text='$text'")
    }
  }
}
