package graft.ops

/** Prints Spark murmur3 hash() of known long-array slices — the
  * ground truth for the DuckDB murmur emulation (dev utility). */
object ProbeR9c {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (Seq(0L), "a"),
      (Seq(1L, 2L), "b"),
      (Seq(Long.MaxValue, Long.MinValue, -1L, 42L), "c"),
      (Seq(1234567890123L, -987654321L, 0L, 7L), "d")
    ).toDF("arr", "tag")
    df.select(col("tag"), hash(col("arr")).as("h")).collect()
      .foreach(r => println(s"[probe] ${r.getString(0)} ${r.getInt(1)}"))
    spark.stop()
  }
}
