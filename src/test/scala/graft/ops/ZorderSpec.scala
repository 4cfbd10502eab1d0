package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {

  /** Per-file fraction of the global range covered by `c`, averaged
    * over the files of `path` — the quantity parquet min/max skipping
    * keys on: coverage 1.0 means no predicate on `c` can skip the
    * file, coverage ~1/nFiles means near-perfect skipping. */
  private def avgCoverage(path: String, c: String): Double = {
    val all = spark.read.parquet(path)
    val g = all.agg(min(col(c)).cast("double"),
      max(col(c)).cast("double")).head()
    val (gmn, gmx) = (g.getDouble(0), g.getDouble(1))
    val files = all.inputFiles
    val covs = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)).cast("double"),
        max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / (gmx - gmn)
    }
    covs.sum / covs.length
  }

  test("zorderWrite clusters BOTH dimensions; plain sort only one") {
    val events = graft.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("value"), col("event_id"))
    val dir = Files.createTempDirectory("graft-zorder").toString
    val zPath = s"$dir/z"
    val sPath = s"$dir/sorted"
    StorageOps.zorderWrite(events, zPath, "user_id", "value", 16)
    // baseline: single-column range sort, same file count
    events.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.parquet(sPath)

    // identity: clustering must not add/drop/alter rows
    val a = events.orderBy(col("event_id")).collect()
    val b = spark.read.parquet(zPath).orderBy(col("event_id")).collect()
    assert(a.sameElements(b), "z-ordered data differs from input")
    assert(spark.read.parquet(zPath).inputFiles.length == 16)

    val zA = avgCoverage(zPath, "user_id")
    val zB = avgCoverage(zPath, "value")
    val sA = avgCoverage(sPath, "user_id")
    val sB = avgCoverage(sPath, "value")
    // z-order: BOTH dims clustered (~sqrt(1/16) = 0.25 each, gate at
    // 0.6 for sampling slack); plain sort: the other dim is unclustered
    assert(zA < 0.6 && zB < 0.6,
      s"z-order coverage not tight on both dims: user_id=$zA value=$zB")
    assert(sA < 0.3, s"sorted baseline should cluster user_id: $sA")
    // value has a heavy tail (outliers stretch the global range), so
    // the unclustered baseline lands ~0.7 rather than ~1.0 — the gate
    // is that it stays UNclustered while z-order stays tight
    assert(sB > 0.5, s"sorted baseline should NOT cluster value: $sB")
    assert(math.max(zA, zB) < sB,
      "z-order must beat single-sort on the unsorted dimension")
  }
}
