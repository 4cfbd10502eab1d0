package graft

import org.apache.spark.sql.functions._

/** Scratch probe for round-9 graph-skew thresholds
  * (`sbt "Test/runMain graft.ProbeR9"`). */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nMax = 2000L
    val und = spark.range(200000)
      .select(
        (lit(nMax) / (pmod(xxhash64(col("id"), lit(1)), lit(nMax)) + 1))
          .cast("long").as("p"),
        (pmod(xxhash64(col("id"), lit(2)), lit(nMax)) + 1)
          .cast("long").as("q"))
      .filter(col("p") =!= col("q"))
      .select(least(col("p"), col("q")).as("u"),
        greatest(col("p"), col("q")).as("v"))
      .distinct().localCheckpoint(true)
    val m = und.count()
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d")).localCheckpoint(true)
    val maxDeg = deg.agg(max(col("d"))).head.getLong(0)
    val oriented = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b")).localCheckpoint(true)
    val outDeg = oriented.groupBy(col("a")).agg(count(lit(1)).as("od"))
    val inDeg = oriented.groupBy(col("b")).agg(count(lit(1)).as("id_"))
    val work = outDeg.join(inDeg, col("a") === col("b"), "full_outer")
      .select(coalesce(col("od"), lit(0L)).as("od"),
        coalesce(col("id_"), lit(0L)).as("id_"))
      .select((col("od") * col("id_")).as("w"), col("od"), col("id_"))
    val tot = work.agg(sum(col("w")), max(col("w")), max(col("od")),
      max(col("id_"))).head
    println(s"m=$m maxDeg=$maxDeg sqrt2m=${math.sqrt(2.0 * m)}")
    println(s"wedgeWork total=${tot.getLong(0)} maxKey=${tot.getLong(1)} " +
      s"maxOut=${tot.getLong(2)} maxIn=${tot.getLong(3)}")
    println(s"maxKeyShare=${tot.getLong(1).toDouble / tot.getLong(0)}")
    spark.stop()
  }
}
