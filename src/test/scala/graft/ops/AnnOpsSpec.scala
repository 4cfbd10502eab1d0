package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class AnnOpsSpec extends SparkSpec {

  lazy val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")

  test("brute-force top-k: correct count, ordering, and best neighbor") {
    val res = AnnOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5).collect()
    assert(res.length == 15) // 3 queries × 5 neighbors
    val byQuery = res.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "similarities must be non-increasing in rank")
    }
    // cross-check rank-1 neighbor of query 0 against a manual argmax
    val manual = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q"))))
      .select(col("vec_id"),
        VectorFunctions.cosineSim(col("q"), col("embedding")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).head
    val rank1 = res.filter(r => r.getLong(0) == 0 && r.getLong(1) == 1).head
    assert(rank1.getLong(2) == manual.getLong(0))
  }

  test("lsh top-k is a subset of candidates with valid sims") {
    val res = AnnOps.lshTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getDouble(3) <= 1.0 + 1e-9 && r.getDouble(3) >= -1.0 - 1e-9)
      assert(r.getLong(2) != r.getLong(0), "no self matches")
    }
  }

  test("embedding dup summary: one row per vector") {
    val sum = AnnOps.embeddingDupSummary(emb.limit(100), "vec_id",
      "embedding")
    assert(sum.count() == 100)
  }

  test("ivf: deterministic build, high recall vs brute force") {
    val model = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val model2 = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    assert(model.centroids.map(_.toSeq).toSeq ==
      model2.centroids.map(_.toSeq).toSeq, "ivf build must be deterministic")
    val q = emb.filter(col("vec_id") < 5)
    val brute = AnnOps.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = AnnOps.ivfTopK(emb, q, "vec_id", "embedding", model,
      k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.size == 50, "10 neighbors per query expected")
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf recall too low: $recall")
    // every ivf hit's sim must be <= the brute rank-1 sim for its query
  }

  test("persisted IVF index: partition-pruned probes, same results as in-memory") {
    val model = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf")
      .toString + "/index"
    AnnOps.writeIvfIndex(emb, "vec_id", "embedding", model, path)
    val q = emb.filter(col("vec_id") < 5)
    val fromIndex = AnnOps.ivfTopKFromIndex(spark, path, q,
      "vec_id", "embedding", model, k = 10, nprobe = 3)
    // the scan must prune to the probed cells: partition filter on cid,
    // and fewer partition dirs read than nlist
    val scan = fromIndex.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("cid"), s"cid partition filter missing: $scan")
    val inMemory = AnnOps.ivfTopK(emb, q, "vec_id", "embedding", model,
      k = 10, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val persisted = fromIndex
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == inMemory && inMemory.size == 50)
  }

  /** All FileSourceScanExec nodes, recursing through AQE wrappers. */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(qs.plan)
    case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
      fileScans(r.child)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(fileScans) ++
        other.subqueries.flatMap(fileScans)
  }

  test("incremental append == rebuild at frozen centroids (IVF + IVF-PQ), " +
      "pruning holds, generation-keyed path") {
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val model = AnnOps.buildIvf(base, "vec_id", "embedding", nlist = 8)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-app")
      .toString
    // IVF: write base, append batch at the FROZEN centroids
    val pathA = AnnOps.ivfIndexPath(s"$root/app", model)
    AnnOps.writeIvfIndex(base, "vec_id", "embedding", model, pathA)
    AnnOps.appendIvfIndex(batch, "vec_id", "embedding", model, pathA)
    // rebuild over the union corpus at the SAME centroids
    val pathB = AnnOps.ivfIndexPath(s"$root/full", model)
    AnnOps.writeIvfIndex(emb, "vec_id", "embedding", model, pathB)
    // layout content byte-identical: same (neighbor_id, cid, vec floats)
    def content(p: String) = spark.read.parquet(p)
      .select(col("neighbor_id"), col("cid"), col("vec"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toList))
      .sortBy(t => (t._1, t._2)).toList
    assert(content(pathA) == content(pathB),
      "appended layout must equal a rebuild at the same generation")
    // query equality, full rows including sims
    val q = emb.filter(col("vec_id") < 5)
    def res(p: String) = AnnOps.ivfTopKFromIndex(spark, p, q,
      "vec_id", "embedding", model, k = 10, nprobe = 3)
    assert(res(pathA).collect().map(_.toSeq).toSeq ==
      res(pathB).collect().map(_.toSeq).toSeq)
    // pruning survives the append: probed files a strict minority
    // (single query, 2 of 8 cells — base + appended file per cell)
    val fromIndex = AnnOps.ivfTopKFromIndex(spark, pathA,
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", model,
      k = 10, nprobe = 2)
    fromIndex.collect()
    val filesRead = fileScans(fromIndex.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val totalFiles = walk(new java.io.File(pathA))
    assert(filesRead > 0 && filesRead * 2 < totalFiles,
      s"append broke pruning: read $filesRead of $totalFiles files")
    // the artifact key versions the centroid GENERATION: a different
    // model can never resolve to the same layout path
    val model2 = AnnOps.buildIvf(base, "vec_id", "embedding", nlist = 4)
    assert(AnnOps.ivfIndexPath(s"$root/app", model2) != pathA)
    assert(AnnOps.modelGeneration(model) ==
      AnnOps.modelGeneration(AnnOps.buildIvf(base, "vec_id", "embedding",
        nlist = 8)), "same build must reproduce the same generation")
    // IVF-PQ: same gate with frozen codebooks
    val pq = AnnOps.buildPq(base, "vec_id", "embedding", m = 8, k = 16)
    val pathC = AnnOps.ivfIndexPath(s"$root/pq_app", model)
    AnnOps.writeIvfPqIndex(base, "vec_id", "embedding", model, pq, pathC)
    AnnOps.appendIvfPqIndex(batch, "vec_id", "embedding", model, pq, pathC)
    val pathD = AnnOps.ivfIndexPath(s"$root/pq_full", model)
    AnnOps.writeIvfPqIndex(emb, "vec_id", "embedding", model, pq, pathD)
    def pqRes(p: String) = AnnOps.ivfPqTopKFromIndex(spark, p, emb, q,
      "vec_id", "embedding", model, pq, k = 10, nprobe = 3)
      .collect().map(_.toSeq).toSeq
    assert(pqRes(pathC) == pqRes(pathD),
      "IVF-PQ append-then-query must equal rebuild at frozen models")
  }

  test("index compaction: append x10 -> threshold-triggered compact -> " +
      "probe equality + file-count reduction (IVF + IVF-PQ)") {
    val model = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val pq = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-cmp")
      .toString
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    val q = emb.filter(col("vec_id") < 5)

    // --- IVF: base write + 10 small appends accumulate small files ---
    val path = AnnOps.ivfIndexPath(s"$root/ivf", model)
    AnnOps.writeIvfIndex(emb.filter(pmod(col("vec_id"), lit(12)) > 9),
      "vec_id", "embedding", model, path)
    (0 to 9).foreach { i =>
      AnnOps.appendIvfIndex(emb.filter(pmod(col("vec_id"), lit(12)) === i),
        "vec_id", "embedding", model, path)
    }
    val before = walk(new java.io.File(path))
    val resBefore = AnnOps.ivfTopKFromIndex(spark, path, q,
      "vec_id", "embedding", model, k = 10, nprobe = 3)
      .collect().map(_.toSeq).toSeq
    // steady state below threshold: no rewrite
    assert(!AnnOps.compactIndexIfNeeded(spark, path,
      maxFilesPerCell = 100), "under-threshold layout must not rewrite")
    assert(walk(new java.io.File(path)) == before)
    // over threshold: compacts to ~one file per cell
    assert(AnnOps.compactIndexIfNeeded(spark, path, maxFilesPerCell = 4),
      "11 files per cell must trigger compaction at threshold 4")
    val after = walk(new java.io.File(path))
    assert(after < before / 2,
      s"compaction must collapse small files: $before -> $after")
    val resAfter = AnnOps.ivfTopKFromIndex(spark, path, q,
      "vec_id", "embedding", model, k = 10, nprobe = 3)
      .collect().map(_.toSeq).toSeq
    assert(resAfter == resBefore,
      "probe results must be identical across compaction")
    // compacted layout sits below the threshold again
    assert(!AnnOps.compactIndexIfNeeded(spark, path, maxFilesPerCell = 4))

    // --- IVF-PQ: same flow over the (neighbor_id, codes) layout ---
    val pqPath = AnnOps.ivfIndexPath(s"$root/ivfpq", model)
    AnnOps.writeIvfPqIndex(emb.filter(pmod(col("vec_id"), lit(12)) > 9),
      "vec_id", "embedding", model, pq, pqPath)
    (0 to 9).foreach { i =>
      AnnOps.appendIvfPqIndex(
        emb.filter(pmod(col("vec_id"), lit(12)) === i),
        "vec_id", "embedding", model, pq, pqPath)
    }
    def pqRes() = AnnOps.ivfPqTopKFromIndex(spark, pqPath, emb, q,
      "vec_id", "embedding", model, pq, k = 10, nprobe = 3)
      .collect().map(_.toSeq).toSeq
    val pqBefore = walk(new java.io.File(pqPath))
    val pqResBefore = pqRes()
    assert(AnnOps.compactIndexIfNeeded(spark, pqPath, maxFilesPerCell = 4))
    assert(walk(new java.io.File(pqPath)) < pqBefore / 2)
    assert(pqRes() == pqResBefore,
      "IVF-PQ probe results must be identical across compaction")
  }

  test("scale: 50k-vector IVF index prunes partitions (measured files) " +
      "and PQ trains at k=256") {
    import spark.implicits._
    // deterministic 50k-vector corpus DERIVED from the driver testdata
    // (100 hash-jittered copies per base vector — no synthetic source
    // outside the provided parquet): large enough that nlist=64 cells
    // are all populated and pruning is measurable in file counts
    val big = emb.crossJoin(spark.range(100).toDF("copy"))
      .select((col("vec_id") * 100 + col("copy")).as("vec_id"),
        col("embedding"))
      .select(col("vec_id"), transform(col("embedding"), (x, i) =>
        (x + pmod(xxhash64(col("vec_id"), i), lit(1000)).cast("double")
          / lit(10000.0) - lit(0.05)).cast("float")).as("embedding"))
      .localCheckpoint()
    assert(big.count() == 50000)
    val model = AnnOps.buildIvf(big, "vec_id", "embedding", nlist = 64)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf50k")
      .toString + "/index"
    AnnOps.writeIvfIndex(big, "vec_id", "embedding", model, path)
    val q = big.filter(col("vec_id") < 3)
    val fromIndex = AnnOps.ivfTopKFromIndex(spark, path, q,
      "vec_id", "embedding", model, k = 10, nprobe = 4)
    val persisted = fromIndex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted.size == 30, s"expected 3x10 rows, got ${persisted.size}")
    // MEASURED pruning: the scan's numFiles metric after execution vs
    // the file count of the whole index — the probe set (<= 3 queries
    // x 4 probes = 12 of 64 cells) must read a strict minority
    val scanNodes = fileScans(fromIndex.queryExecution.executedPlan)
    assert(scanNodes.nonEmpty, "no file scan found in the index plan")
    val filesRead = scanNodes.map(_.metrics("numFiles").value).sum
    val totalFiles = {
      val root = new java.io.File(path)
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(root)
    }
    assert(filesRead > 0, "scan metrics not populated")
    assert(filesRead * 3 <= totalFiles,
      s"probed scan read $filesRead of $totalFiles files — not pruned")
    // persisted == in-memory (same equality gate as the 500-vector test)
    val inMemory = AnnOps.ivfTopK(big, q, "vec_id", "embedding", model,
      k = 10, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == inMemory)

    // PQ at production code width: k=256 → one BYTE per code, and the
    // codebooks must actually use the widened range
    val sub = big.filter(pmod(col("vec_id"), lit(5)) === 0).localCheckpoint()
    val pq = AnnOps.buildPq(sub, "vec_id", "embedding", m = 8, k = 256,
      iters = 1)
    assert(pq.codebooks.length == 8 &&
      pq.codebooks.forall(_.length == 256))
    val codes = AnnOps.pqEncode(sub, "vec_id", "embedding", pq)
      .select(explode(col("codes")).as("c")).distinct()
      .collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c <= 255),
      "codes must fit one byte")
    assert(codes.length > 64,
      s"only ${codes.length} distinct codes — k=256 not exercised")
  }

  test("pq: deterministic build, codes in range, high refine-recall") {
    val model = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 64)
    val model2 = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 64)
    assert(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      model2.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "pq build must be deterministic")
    assert(model.dsub == 8 && model.m == 8)

    val codes = AnnOps.pqEncode(emb, "vec_id", "embedding", model)
    assert(codes.count() == emb.count())
    val bad = codes.filter(exists(col("codes"),
      c => c < 0 || c >= 64)).count()
    assert(bad == 0, "every code must index a codeword")

    val q = emb.filter(col("vec_id") < 5)
    val brute = AnnOps.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = AnnOps.pqTopK(emb, q, "vec_id", "embedding", model,
      k = 10, refine = 8)
    val rows = pq.collect()
    assert(rows.length == 50, "10 neighbors per query expected")
    // exact re-rank means sims are true cosines, non-increasing in rank
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    // measured 0.92 at this config (m=8, k=64, refine=8) on the
    // synthetic high-entropy embeddings — a hard PQ case; gate leaves
    // room for run-to-run neutrality only (build is deterministic)
    assert(recall >= 0.8, s"pq refine-recall too low: $recall")
  }

  test("ivf-pq: cell-pruned ADC keeps most of the coarse quantizer's recall") {
    val q = emb.filter(col("vec_id") < 5)
    val brute = AnnOps.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val pq = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 64)
    val got = AnnOps.ivfPqTopK(emb, q, "vec_id", "embedding", ivf, pq,
      k = 10, nprobe = 6, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got.size == 50)
    val recall = (brute intersect got).size.toDouble / brute.size
    // measured 0.78 at this config: the coarse quantizer is the
    // binding constraint on the near-uniform driver data (plain IVF
    // behaves the same — see PLANS.md §recall); PQ + refine loses
    // almost nothing on top of it
    assert(recall >= 0.6, s"ivf-pq recall too low: $recall")
  }

  test("persisted IVF-PQ index: partition-pruned ADC, same results as in-memory") {
    val ivf = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val pq = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 64)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq")
      .toString + "/index"
    AnnOps.writeIvfPqIndex(emb, "vec_id", "embedding", ivf, pq, path)
    // the artifact stores only (neighbor_id, codes) + the cid partition
    // column — never raw vectors
    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted.toSeq == Seq("cid", "codes", "neighbor_id"))
    val q = emb.filter(col("vec_id") < 5)
    val fromIndex = AnnOps.ivfPqTopKFromIndex(spark, path, emb, q,
      "vec_id", "embedding", ivf, pq, k = 10, nprobe = 6, refine = 8)
    val scan = fromIndex.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("cid"), s"cid partition filter missing: $scan")
    val inMemory = AnnOps.ivfPqTopK(emb, q, "vec_id", "embedding", ivf, pq,
      k = 10, nprobe = 6, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val persisted = fromIndex
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == inMemory && inMemory.size == 50)
  }

  test("model cache: round-trip equals the built model; cache hit skips the build") {
    val src = s"$Sf0001/embeddings.parquet"
    val built = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 16)
    val first = AnnOps.cachedPq(spark, src, emb, "vec_id", "embedding",
      m = 8, k = 16)
    val second = AnnOps.cachedPq(spark, src, emb, "vec_id", "embedding",
      m = 8, k = 16)
    // Float.toString round-trips exactly, so all three are identical
    def flat(p: AnnOps.PqModel) = p.codebooks.map(_.map(_.toSeq).toSeq).toSeq
    assert(flat(first) == flat(built) && flat(second) == flat(built))
    assert(first.dsub == built.dsub)

    val ivfBuilt = AnnOps.buildIvf(emb, "vec_id", "embedding", nlist = 8)
    val ivfCached = AnnOps.cachedIvf(spark, src, emb, "vec_id",
      "embedding", nlist = 8)
    assert(ivfCached.centroids.map(_.toSeq).toSeq ==
      ivfBuilt.centroids.map(_.toSeq).toSeq)
    // different build params never collide in the cache
    val other = AnnOps.cachedPq(spark, src, emb, "vec_id", "embedding",
      m = 8, k = 32)
    assert(other.codebooks(0).length == 32)
  }

  test("pq encode is invariant to input partitioning") {
    val model = AnnOps.buildPq(emb, "vec_id", "embedding", m = 8, k = 16)
    def enc(df: org.apache.spark.sql.DataFrame) =
      AnnOps.pqEncode(df, "vec_id", "embedding", model)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(emb) == enc(emb.repartition(7)),
      "codes must not depend on physical partitioning")
  }

  test("hyperplane bits are deterministic across evaluations") {
    val b1 = emb.limit(20).select(col("vec_id"),
      AnnOps.hyperplaneBits(col("embedding"), 16).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = emb.limit(20).select(col("vec_id"),
      AnnOps.hyperplaneBits(col("embedding"), 16).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 == b2)
  }
}
