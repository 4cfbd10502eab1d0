package graft

import org.apache.spark.sql.functions._

/** Round-7 gates. */
class Round7Spec extends SparkSpec {

  test("knuthHash: ANSI-safe for the full id range, bit-identical to BigInt naive") {
    import spark.implicits._
    // ids straddling the naive-formula overflow point (~3.46e9) and far
    // beyond; includes 2^32 boundary values and a negative id.
    val ids = Seq(0L, 1L, 2L, 17L, 65535L, 65536L, 123456789L,
      3459999999L, 3460000001L, 4294967295L, 4294967296L,
      5000000000L, 1000000000000L, (1L << 62), -7L)
    val got = ids.toDF("id")
      .select(col("id"), SparkEntry.knuthHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val A = BigInt(2654435761L)
    val M = BigInt(1) << 32
    ids.foreach { i =>
      val want = (((BigInt(i) mod M) * A) mod M).toLong
      assert(got(i) == want, s"id=$i got=${got(i)} want=$want")
    }
  }

  test("knuthHashSql mirrors knuthHash exactly (Spark SQL evaluation)") {
    import spark.implicits._
    val ids = Seq(0L, 65535L, 65536L, 3460000001L, 5000000000L)
    val df = ids.toDF("id")
    df.createOrReplaceTempView("khs_ids")
    val viaSql = spark.sql(
      s"SELECT id, ${SparkEntry.knuthHashSql("id")} AS h FROM khs_ids")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = df.select(col("id"), SparkEntry.knuthHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }
}
