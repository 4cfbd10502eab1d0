package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.MomentsBuffer

/** PcaOps — distributed fixed-point moments + driver Jacobi + map-side
  * projection. Gates: exact distributed==local moment equality (the
  * integer-sum determinism claim), textbook eigenpairs, orthonormality,
  * the eigen-equation residual on real data, pc-variance == eigenvalue,
  * and bit-exact repartition invariance of the declared query. */
class PcaSpec extends SparkSpec {

  private val D = 64

  private def emb = Tables.embeddings(spark, Sf0001)

  test("moments aggregate == local fixed-point recompute, bit-exact") {
    val (n, sums, prods) = PcaOps.moments(emb, "embedding", D)
    val local = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    assert(n == local.length)
    val wantSums = new Array[Long](D)
    val wantProds = new Array[Long](D * (D + 1) / 2)
    local.foreach { v =>
      val x = v.map(_.toDouble)
      var t = 0
      for (i <- 0 until D) {
        wantSums(i) += math.rint(x(i) * MomentsBuffer.Scale).toLong
        for (j <- i until D) {
          wantProds(t) += math.rint(x(i) * x(j) * MomentsBuffer.Scale).toLong
          t += 1
        }
      }
    }
    assert(sums.map(s => math.rint(s * MomentsBuffer.Scale).toLong)
      .toSeq == wantSums.toSeq)
    // spot-check the symmetrized full matrix against the triangle
    var t = 0
    for (i <- 0 until D; j <- i until D) {
      assert(math.rint(prods(i)(j) * MomentsBuffer.Scale).toLong
        == wantProds(t), s"prods($i)($j)")
      t += 1
    }
  }

  test("moments are partition-invariant (integer sums commute)") {
    val a = PcaOps.moments(emb, "embedding", D)
    val b = PcaOps.moments(emb.repartition(7), "embedding", D)
    assert(a._1 == b._1)
    assert(a._2.toSeq == b._2.toSeq)
    assert(a._3.flatten.toSeq == b._3.flatten.toSeq)
  }

  test("jacobiEig: textbook 2x2 and 3x3 eigenpairs") {
    val (v2, e2) = PcaOps.jacobiEig(Array(
      Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = v2.zipWithIndex.sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-12)
    // eigvec for 3 is (1,1)/sqrt2 up to sign
    val c = pairs(0)._2
    val v = Array(e2(0)(c), e2(1)(c))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12)

    val m3 = Array(
      Array(4.0, 1.0, 0.0),
      Array(1.0, 4.0, 0.0),
      Array(0.0, 0.0, 7.0))
    val (v3, _) = PcaOps.jacobiEig(m3)
    assert(v3.sorted.zip(Array(3.0, 5.0, 7.0))
      .forall { case (g, w) => math.abs(g - w) < 1e-12 })
  }

  test("fit: orthonormal basis, descending eigvals, eigen-equation holds") {
    val model = PcaOps.fit(emb, "embedding", D, k = 8)
    // descending
    assert(model.eigvals.sliding(2).forall(p => p(0) >= p(1) - 1e-15))
    // orthonormal rows
    for (i <- model.basis.indices; j <- i until model.basis.length) {
      val dot = model.basis(i).zip(model.basis(j)).map(p => p._1 * p._2).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"basis($i)·basis($j)=$dot")
    }
    // C v = λ v on the real covariance
    val (n, sums, prods) = PcaOps.moments(emb, "embedding", D)
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(D, D)((i, j) => prods(i)(j) / n - mean(i) * mean(j))
    model.basis.zip(model.eigvals).foreach { case (v, l) =>
      val cv = Array.tabulate(D)(i =>
        (0 until D).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(
        cv.zip(v).map { case (a, b) => (a - l * b) * (a - l * b) }.sum)
      assert(resid < 1e-8, s"||Cv - λv|| = $resid for λ=$l")
    }
    // sign fix: largest-|component| entry is positive
    model.basis.foreach { v =>
      assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
    }
  }

  test("projection variance matches the eigenvalue") {
    val model = PcaOps.fit(emb, "embedding", D, k = 2)
    val pcs = PcaOps.project(emb.select(col("embedding")), "embedding", model)
      .select("pc1", "pc2").collect()
    def popVar(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val v1 = popVar(pcs.map(_.getDouble(0)))
    val v2 = popVar(pcs.map(_.getDouble(1)))
    assert(math.abs(v1 - model.eigvals(0)) < 1e-4,
      s"var(pc1)=$v1 vs λ1=${model.eigvals(0)}")
    assert(math.abs(v2 - model.eigvals(1)) < 1e-4)
    assert(v1 >= v2)
  }

  test("incremental fit: shard-merged moments == whole-corpus fit, bit-exact") {
    val whole = PcaOps.fit(emb, "embedding", D, k = 8)
    val shardA = emb.filter(col("vec_id") % 3 === 0)
    val shardB = emb.filter(col("vec_id") % 3 === 1)
    val shardC = emb.filter(col("vec_id") % 3 === 2)
    val merged = PcaOps.fitFromMoments(
      PcaOps.mergeMomentsBytes(Seq(shardA, shardB, shardC)
        .map(s => PcaOps.momentsBytes(s, "embedding", D))), k = 8)
    assert(merged.n == whole.n)
    assert(merged.mean.toSeq == whole.mean.toSeq)
    assert(merged.eigvals.toSeq == whole.eigvals.toSeq)
    assert(merged.basis.flatten.toSeq == whole.basis.flatten.toSeq)
  }

  test("cached moments artifact: shard-merge through the cache == whole fit") {
    val whole = PcaOps.fit(emb, "embedding", D, k = 8)
    val dirs = (0 until 3).map { m =>
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-pca-shard$m").toString
      emb.filter(col("vec_id") % 3 === m)
        .write.mode("overwrite").parquet(p)
      p
    }
    // frames built ONCE up front: spark.read.parquet runs its own
    // listing/schema jobs at creation time, which must not be billed
    // to the cache-hit job gate below
    val shardDfs = dirs.map(p => p -> spark.read.parquet(p))
    def shardBytes() = shardDfs.map { case (p, df) =>
      PcaOps.cachedMomentsBytes(spark, p, "spec", df, "embedding", D)
    }
    val first = shardBytes()
    // repeat call must serve the stored artifact: byte-identical, and
    // no Spark job runs (the moments aggregate would be one)
    Thread.sleep(300) // let the listener bus drain before the gate
    val sc = spark.sparkContext
    sc.setJobGroup("pca-cache-hit", "artifact read", false)
    val second = shardBytes()
    sc.clearJobGroup()
    Thread.sleep(300)
    assert(first.zip(second).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) })
    assert(sc.statusTracker.getJobIdsForGroup("pca-cache-hit").isEmpty,
      "cache hit must not run any Spark job")
    // the 100-TB flow: merge persisted shard artifacts, fit — and the
    // result is bit-identical to fitting the whole corpus directly
    val merged = PcaOps.fitFromMoments(
      PcaOps.mergeMomentsBytes(second), k = 8)
    assert(merged.n == whole.n)
    assert(merged.mean.toSeq == whole.mean.toSeq)
    assert(merged.eigvals.toSeq == whole.eigvals.toSeq)
    assert(merged.basis.flatten.toSeq == whole.basis.flatten.toSeq)
  }

  test("streaming moments over micro-batches == batch moments, byte-identical") {
    // the streaming-ingest contract: per-micro-batch momentsBytes
    // merged in a foreachBatch sink — integer sums make the merged
    // artifact BYTE-IDENTICAL to one batch aggregate over all rows,
    // however the stream happened to be chunked
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-stream")
    val src = dir.toString
    emb.repartition(4).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(src)
    val shards = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        shards.synchronized {
          shards += PcaOps.momentsBytes(batch, "embedding", D)
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(shards.length > 1, "expected several micro-batches")
    val merged = PcaOps.mergeMomentsBytes(shards.toSeq)
    val whole = PcaOps.momentsBytes(emb, "embedding", D)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("pcaTopK: full shortlist is byte-identical to brute force") {
    val qs = emb.filter(col("vec_id") < 5)
    val full = AnnOps.pcaTopK(emb, qs, "vec_id", "embedding",
      k = 10, pcaDims = 16, shortlist = 499)
      .collect().map(_.toString).sorted
    val brute = AnnOps.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .collect().map(_.toString).sorted
    assert(full.toSeq == brute.toSeq)
  }

  test("pcaTopK recall@10 grows with pcaDims and shortlist (gated)") {
    val qs = emb.filter(col("vec_id") < 5)
    val exact = AnnOps.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(pcaDims: Int, shortlist: Int): Double = {
      val got = AnnOps.pcaTopK(emb, qs, "vec_id", "embedding", 10,
        pcaDims, shortlist)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (got & exact).size / exact.size.toDouble
    }
    // the driver corpus is synthetic-random (near-flat eigenspectrum —
    // the WORST case for PCA truncation; real embeddings decay fast),
    // so the gates sit under the measured 0.74/0.92/0.94 plateau
    val r16s50 = recall(16, 50)
    val r16s100 = recall(16, 100)
    val r32s50 = recall(32, 50)
    info(f"recall@10: (16,50)=$r16s50%.2f (16,100)=$r16s100%.2f " +
      f"(32,50)=$r32s50%.2f")
    assert(r16s100 >= 0.85, f"recall(16,100)=$r16s100%.2f below gate")
    assert(r32s50 >= 0.9, f"recall(32,50)=$r32s50%.2f below gate")
    assert(r16s100 >= r16s50, "recall must not drop as shortlist grows")
    assert(r32s50 >= r16s50, "recall must not drop as pcaDims grows")
  }

  test("declared query is bit-deterministic under repartition") {
    val q = graft.SparkEntry.queries("ann_pca")
    val a = q(spark, Sf0001).collect().map(_.toString)
    val b = PcaOps.pcaProjection(
      Tables.embeddings(spark, Sf0001).repartition(13),
      "vec_id", "embedding", 64, 8).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 500)
  }
}
