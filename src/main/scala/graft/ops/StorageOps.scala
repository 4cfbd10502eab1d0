package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-side operators: partitioned and bucketed parquet layout.
  *
  * The reference's only sink is stringify-to-CSV
  * (`RecordBatch::to_csv`, reference src/datatypes/mod.rs:308-328);
  * real 100-TB tables live as partitioned/bucketed parquet so that
  *  - partition pruning turns predicates on the partition column into
  *    directory listings instead of data reads (`PartitionFilters` in
  *    the scan node), and
  *  - bucketing on a join/agg key makes downstream joins co-located
  *    (no shuffle on the bucketed key).
  */
object StorageOps {

  /** Write `df` as parquet hive-partitioned by `partitionCol`. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Write `df` as a bucketed+sorted managed table (bucket pruning and
    * shuffle-free joins on `bucketCol` for any reader of the table). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a partitioned dataset with a partition predicate — the
    * plan must show the predicate under PartitionFilters (pruned
    * listing), not as a data filter. */
  def readPartition(spark: SparkSession, path: String,
      partitionCol: String, value: String): DataFrame =
    spark.read.parquet(path).filter(col(partitionCol) === value)
}
