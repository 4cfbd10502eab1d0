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
}
