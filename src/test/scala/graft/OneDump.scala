package graft
object OneDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.sessionConf).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(args(0))(spark, args(1))
      .coalesce(1).write.mode("overwrite").parquet(args(2))
    spark.stop()
  }
}
