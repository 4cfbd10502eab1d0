package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SketchKernels

/** Hilbert-curve clustering — the kernel's defining properties
  * (bijection + grid adjacency of consecutive distances, exhaustively
  * at small orders) and the layout claim: per-file coverage no worse
  * than z-order on the same data at the same write cost. */
class HilbertSpec extends SparkSpec {

  test("hilbertD is a bijection and consecutive cells are grid-adjacent") {
    for (order <- 2 to 5) {
      val n = 1 << order
      val cells = for (x <- 0 until n; y <- 0 until n)
        yield (SketchKernels.hilbertD(order, x, y), x, y)
      // bijection onto 0 .. n²−1
      assert(cells.map(_._1).sorted == (0L until (n.toLong * n)).toSeq,
        s"order $order not a bijection")
      // the Hilbert hallmark (Morton lacks it): step d → d+1 moves to
      // a 4-neighbor cell, every time
      val byD = cells.sortBy(_._1)
      byD.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"order $order: jump between ($x1,$y1) and ($x2,$y2)")
      }
      // the curve starts at the origin
      assert(SketchKernels.hilbertD(order, 0, 0) == 0L)
    }
  }

  test("morton interleave DOES have quadrant jumps (the contrast)") {
    val n = 8
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield (SketchKernels.interleave16(x, y), x, y)).sortBy(_._1)
    val jumps = byD.sliding(2).count {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0, "morton order unexpectedly adjacency-perfect")
  }

  private def avgCoverage(path: String, c: String): Double = {
    val all = spark.read.parquet(path)
    val g = all.agg(min(col(c)).cast("double"),
      max(col(c)).cast("double")).head()
    val (gmn, gmx) = (g.getDouble(0), g.getDouble(1))
    val covs = all.inputFiles.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)).cast("double"),
        max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / (gmx - gmn)
    }
    covs.sum / covs.length
  }

  test("hilbertWrite: identity, both dims tight, no worse than z-order") {
    val events = graft.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("value"), col("event_id"))
    val dir = Files.createTempDirectory("graft-hilbert").toString
    val hPath = s"$dir/h"
    val zPath = s"$dir/z"
    StorageOps.hilbertWrite(events, hPath, "user_id", "value", 16)
    StorageOps.zorderWrite(events, zPath, "user_id", "value", 16)

    val a = events.orderBy(col("event_id")).collect()
    val b = spark.read.parquet(hPath).orderBy(col("event_id")).collect()
    assert(a.sameElements(b), "hilbert-clustered data differs from input")

    val hA = avgCoverage(hPath, "user_id")
    val hB = avgCoverage(hPath, "value")
    val zA = avgCoverage(zPath, "user_id")
    val zB = avgCoverage(zPath, "value")
    info(f"coverage user_id: hilbert=$hA%.3f zorder=$zA%.3f; " +
      f"value: hilbert=$hB%.3f zorder=$zB%.3f")
    assert(hA < 0.6 && hB < 0.6,
      s"hilbert coverage not tight on both dims: $hA / $hB")
    // the adjacency property can only tighten bounding boxes; allow
    // small per-file sampling slack in the comparison
    assert(hA + hB <= zA + zB + 0.1,
      f"hilbert ($hA%.3f+$hB%.3f) worse than z-order ($zA%.3f+$zB%.3f)")
  }
}
