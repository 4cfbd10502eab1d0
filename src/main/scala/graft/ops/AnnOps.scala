package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions}

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Beyond-reference extension (SURVEY §2.5 — the
  * reference has no vector surface).
  *
  * Two paths:
  *  - brute force: broadcast the query set, fused cosine kernel
  *    ([[graft.functions.CosineSimilarity]]) over every (query, corpus)
  *    pair, per-query top-k. Exact; one pass over the corpus; scales
  *    linearly in corpus size — the right baseline when the query set
  *    is small enough to broadcast.
  *  - LSH-bucketed: deterministic random-hyperplane signs bucket the
  *    corpus; a query only scans buckets matching one of its sign-bit
  *    bands (multi-probe via banding, same pigeonhole trick as
  *    SimHash). Approximate; candidate volume drops by the bucket
  *    selectivity, which is what survives a 100-TB corpus.
  *
  * The per-query top-k shuffles on query id. With a broadcastable query
  * set the partial_topk → final merge is handled by Spark's window +
  * filter over (query partitions); at extreme corpus scale swap the
  * window for a two-phase agg (per-partition top-k then merge) — noted
  * in BENCH notes.
  */
object AnnOps {

  /** Brute-force exact top-k cosine neighbors for each query row.
    * `queries` must be small (it is broadcast). Ties break on
    * neighbor id for full determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosineSim(col("query_vec"),
        col("vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Two-stage retrieval through a PCA coarse space — the classic
    * reduce-then-rerank shape: shortlist per query by cosine in the
    * `pcaDims`-dim principal subspace (mean-centered projections — the
    * top axes carry most of the variance, so the coarse ranking is a
    * cheap high-recall proxy), then re-rank the shortlist with the
    * exact full-dim cosine using [[bruteForceTopK]]'s exact ordering
    * convention (unrounded sim, neighbor_id tiebreak, round-4 output)
    * so a shortlist that contains the true top-k yields byte-identical
    * results.
    *
    * Scale: the coarse candidate stream moves (id, pcaDims floats) —
    * here 4× narrower than the raw vectors — and only shortlist
    * survivors are scored full-dim. At index scale the coarse pass
    * slots behind the IVF front the same way ivfTopK's probes do;
    * `shortlist` ≥ corpus makes the result structurally exact. */
  def pcaTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, pcaDims: Int = 16,
      shortlist: Int = 50, dim: Int = 64): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val model = PcaOps.fit(corpus, vecCol, dim, pcaDims)
    def proj(df: DataFrame, side: String): DataFrame =
      PcaOps.project(df.select(col(idCol), col(vecCol)), vecCol, model)
        .select(col(idCol).as(s"${side}_id"),
          col(vecCol).as(s"${side}_vec"),
          array((1 to pcaDims).map(i => col(s"pc$i")): _*)
            .cast("array<float>").as(s"${side}_pvec"))
    val q = broadcast(proj(queries, "query"))
    val coarse = proj(corpus, "neighbor")
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("coarse_sim",
        VectorFunctions.cosineSim(col("query_pvec"), col("neighbor_pvec")))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse_sim").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    coarse
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= shortlist)
      .withColumn("sim",
        VectorFunctions.cosineSim(col("query_vec"), col("neighbor_vec")))
      .withColumn("rank", row_number().over(wExact).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-k corpus docs whose similarity lies in a BAND
    * [lo, hi) — similar enough to be informative negatives, below the
    * near-duplicate cut (a near-dup used as a negative poisons the
    * contrastive objective; an easy negative teaches nothing). Both
    * the band cut and the ranking use the 4-dp ROUNDED similarity, so
    * the cross-engine result can never hinge on a kernel ulp. Same
    * broadcast-queries shape as [[bruteForceTopK]]; the IVF/LSH
    * candidate fronts compose the same way at index scale. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      lo: Double, hi: Double): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(VectorFunctions.cosineSim(
        col("query_vec"), col("vec")), 4))
      .filter(col("sim") >= lo && col("sim") < hi)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("sim"))
  }

  /** Retrieval-quality evaluation — the metrics harness an embedding
    * pipeline reports before trusting a retriever: per query, top-k
    * neighbors by cosine, relevance = (neighbor label == query label),
    * then recall@k, MRR and NDCG@k per query. Ranking uses the 4-dp
    * ROUNDED similarity ([[hardNegatives]] discipline) and the DCG /
    * IDCG terms are round-12 → decimal-summed, so no metric ever
    * hinges on a kernel ulp or a shuffle-order double sum. IDCG is
    * computed over the SAME top-k rows (ranks 1..min(k, n_rel) — the
    * ideal ranking's term positions), so no per-query sequence
    * generation is needed. `n_rel` counts same-label corpus rows
    * minus the query itself (queries are drawn from the corpus).
    * Scale shape: queries broadcast, label counts broadcast (label
    * domain is O(classes)), one corpus pass, top-k shuffle on
    * query_id. */
  def retrievalEval(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"), col(labelCol).as("query_label")))
    val labelCounts = broadcast(corpus
      .groupBy(col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("lbl_n")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("vec"), col(labelCol).as("n_label"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(VectorFunctions.cosineSim(
        col("query_vec"), col("vec")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val dcgTerm = round(lit(1.0) / log2(col("rank") + 1), 12)
      .cast(org.apache.spark.sql.types.DecimalType(28, 14))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .join(labelCounts, col("query_label") === col("lbl"))
      .withColumn("n_rel", col("lbl_n") - 1)
      .withColumn("rel", (col("n_label") === col("query_label"))
        .cast("long"))
      .groupBy(col("query_id"), col("n_rel"))
      .agg(
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"),
        sum(when(col("rel") === 1, dcgTerm)).as("dcg"),
        sum(when(col("rank") <= least(lit(k.toLong), col("n_rel")),
          dcgTerm)).as("idcg"))
      .select(col("query_id"), col("n_rel"), col("hits"),
        round(when(col("n_rel") > 0,
          col("hits") / least(lit(k.toLong), col("n_rel")))
          .otherwise(0.0), 6).as("recall"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6)
          .as("mrr"),
        // cast BOTH sums to double before dividing: the decimal sums
        // are exact (so the casts are deterministic) and IEEE double
        // division is bit-identical across engines, where decimal
        // division precision/scale rules are engine-specific
        round(coalesce(col("dcg").cast("double") /
          col("idcg").cast("double"), lit(0.0)), 6).as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Brute-force top-k via the typed [[graft.functions.Aggregators.TopK]]
    * aggregator instead of a window: the bounded buffer gives map-side
    * partial top-k, so each partition ships at most k candidates per
    * query to the final merge — the scale path when the candidate
    * stream is too large to shuffle for a window sort. Output is
    * identical to [[bruteForceTopK]] (same oracle). */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"),
        VectorFunctions.cosineSim(col("query_vec"), col("vec")).as("sim"),
        col("neighbor_id"))
      .as[(Long, Double, Long)]
    val topk = new graft.functions.Aggregators.TopK(k)
    scored
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col._2").as("neighbor_id"), round(col("col._1"), 4).as("sim"))
  }

  /** Diversified retrieval: greedy Maximal Marginal Relevance over a
    * bounded shortlist (Carbonell & Goldstein 1998) — the re-rank a
    * RAG/context-building stack applies so the top-k doesn't return k
    * near-copies of the same passage. Stage 1 is [[bruteForceTopK]]'s
    * shape truncated to `shortlist` (ranked on round(sim·10⁴) longs
    * so the shortlist membership is engine-stable); stage 2 collects
    * each query's
    * shortlist (bounded: `shortlist` vectors, KB per group) into the
    * [[graft.functions.Aggregators.MmrSelect]] typed aggregator and
    * runs the greedy λ·sim(q,d) − μ·maxSel sim(d,s) loop in one
    * per-group pass. At index scale stage 1 is whatever ANN front you
    * run (IVF/PQ/LSH); the MMR tail is always shortlist-bounded.
    *
    * The greedy loop runs in INTEGER space end to end: similarities
    * enter as round(sim·10⁴) longs (integer-scale rounding is the
    * one rounding both engines agree on — see
    * [[graft.functions.Aggregators.MmrSelect]]) and the score is the
    * long 7·simq_e4 − 3·m_e4 (unit 10⁻⁵), so selection and ties are
    * exact and the DuckDB oracle replays the loop as a lockstep
    * recursion over the same longs. The emitted mmr_score is
    * score_e5 / 10⁵ — one double division, no rounding. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int = 20,
      lamE1: Long = 7, muE1: Long = 3): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("simq_e4",
        round(VectorFunctions.cosineSim(col("query_vec"), col("vec"))
          * 10000).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("simq_e4").desc, col("neighbor_id"))
    val short = scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("simq_e4"),
        col("vec"))
    mmrTail(short, k, lamE1, muE1)
  }

  /** Shared MMR tail: shortlist rows (query_id, neighbor_id, simq_e4,
    * vec) → greedy selection via the bounded
    * [[graft.functions.Aggregators.MmrSelect]] typed aggregator. */
  private def mmrTail(short: DataFrame, k: Int, lamE1: Long,
      muE1: Long): DataFrame = {
    val spark = short.sparkSession
    import spark.implicits._
    val sel = new graft.functions.Aggregators.MmrSelect(k, lamE1, muE1)
    short.as[(Long, Long, Long, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(sel.toColumn.name("sel"))
      .toDF("query_id", "sel")
      .select(col("query_id"), posexplode(col("sel")))
      .select(col("query_id"),
        (col("pos") + 1).cast("bigint").as("rank"),
        col("col._2").as("neighbor_id"),
        (col("col._1") / lit(100000.0)).as("mmr_score"))
  }

  /** [[mmrTopK]] behind the IVF front — the composition a production
    * retrieval stack runs: candidates come from the query's `nprobe`
    * probed cells (corpus/nlist × nprobe of the data, the index-scale
    * path), the per-query shortlist ranks on the same round(sim·10⁴)
    * longs, and the greedy diversification tail is [[mmrTail]]
    * verbatim. The oracle composes the certified IVF
    * assignment/probe CTEs with the certified MMR lockstep recursion
    * over embedded centroid literals. */
  def ivfMmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: IvfModel, k: Int, nprobe: Int = 3,
      shortlist: Int = 20, lamE1: Long = 7, muE1: Long = 3): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"), nearestCentroid(col(vecCol), model).as("cid"))
    val probes = probeRows(queries, idCol, vecCol, model, nprobe)
    val cand = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("simq_e4",
        round(VectorFunctions.cosineSim(col("query_vec"), col("vec"))
          * 10000).cast("long"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("simq_e4").desc, col("neighbor_id"))
    val short = cand
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("simq_e4"),
        col("vec"))
    mmrTail(short, k, lamE1, muE1)
  }

  /** Scalar-quantized (SQ8) brute-force top-k — the 4×-memory-cut
    * complement of [[pqTopK]]'s 32×: each dimension quantizes
    * independently to one of 256 grid points between the corpus-wide
    * per-dimension min and max, and queries score ASYMMETRICALLY
    * (full-precision query against reconstructed corpus vectors — the
    * standard ADC trade: no query-side quantization error).
    *
    * Determinism discipline: the model is 2·dim exact float32
    * min/max scalars (partition-order invariant by definition, KB on
    * the driver — the PCA/tokenizer "model = task reference"
    * pattern); code assignment is
    * round(((x − mn) · 255) / (mx − mn)) clamped to [0, 255] — each
    * step an IEEE correctly-rounded double op in a fixed order, so
    * DuckDB replays it bit-exactly from the raw table (the oracle
    * RECOMPUTES min/max itself: nothing is embedded) — and the
    * reconstruction mn + (c · (mx − mn)) / 255 rounds to float32, so
    * scoring runs the same codegen'd [[graft.functions
    * .CosineSimilarity]] float kernel as ann_brute. A constant
    * dimension (mx = mn) reconstructs as mn rather than dividing by
    * zero.
    *
    * Scale: at 100 TB the reconstruct-transform is one map-side pass
    * fused into the scan (at rest the corpus stores the int8 codes —
    * 64 B/vector instead of 256 B), the query side broadcasts, and
    * the top-k merge is [[bruteForceTopK]]'s bounded window shape. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int = 64): DataFrame = {
    val mmCols = (0 until dim).flatMap(i => Seq(
      min(element_at(col(vecCol), i + 1)).as(s"mn$i"),
      max(element_at(col(vecCol), i + 1)).as(s"mx$i")))
    val mm = corpus.agg(mmCols.head, mmCols.tail: _*).head()
    // an empty corpus, or a `dim` past the actual vector length
    // (element_at beyond the end is NULL, so min/max are NULL), would
    // otherwise surface as an opaque NPE from the Row access below
    require((0 until 2 * dim).forall(!mm.isNullAt(_)),
      s"sq8TopK: empty corpus or dim=$dim exceeds the stored vector " +
        "length (min/max stats are NULL)")
    val mins = (0 until dim).map(i => mm.getFloat(2 * i).toDouble).toArray
    val maxs = (0 until dim).map(i => mm.getFloat(2 * i + 1).toDouble)
      .toArray
    val mnLit = lit(mins); val mxLit = lit(maxs)
    def reconstruct(v: Column): Column =
      transform(v, (x, i) => {
        val mn = element_at(mnLit, i + 1)
        val mx = element_at(mxLit, i + 1)
        val code = when(mx === mn, lit(0.0)).otherwise(
          least(lit(255.0), greatest(lit(0.0),
            round((x.cast("double") - mn) * lit(255.0) / (mx - mn)))))
        mn + code * (mx - mn) / lit(255.0)
      }).cast("array<float>")
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"),
        reconstruct(col(vecCol)).as("rvec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosineSim(col("query_vec"),
        col("rvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Deterministic random-hyperplane sign bits for a vector — one fused
    * native pass (see [[graft.functions.HyperplaneBits]]). */
  def hyperplaneBits(vec: Column, nbits: Int): Column =
    HashFunctions.hyperplaneBits(vec, nbits)

  /** LSH-bucketed approximate top-k: candidates share at least one
    * `bandBits`-bit band of the `nbits`-bit hyperplane signature with
    * the query. Recall < 1 by construction; candidate volume (and thus
    * cost) is bucket-bounded.
    *
    * Band width is the recall/selectivity dial: P(band match) =
    * p^bandBits with p = 1 - angle/pi, so NARROW bands (4 bits, the
    * default) keep recall usable even when true neighbors are only
    * moderately closer than random pairs (measured recall@10 on the
    * driver data: see RecallGatesSpec / PLANS.md §recall), while WIDE
    * bands (8 bits) buy ~16x more selectivity and are the right setting
    * at 100 TB when the corpus has genuinely-close neighbors
    * (cosine >= 0.8).
    *
    * `probeHamming = 1` turns on MULTI-PROBE: each query band also
    * probes the `bandBits` bucket values at Hamming distance 1 (one
    * sign bit flipped) — a (bandBits+1)x candidate-volume knob that
    * buys recall WITHOUT re-hashing or widening the index, the
    * standard trade (cf. Lv et al., "Multi-probe LSH", VLDB '07).
    * Probing happens on the (broadcast) query side only; the corpus
    * index is untouched, so the knob can be turned per query at an
    * unchanged 100-TB index. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nbits: Int = 32, bandBits: Int = 4,
      probeHamming: Int = 0): DataFrame = {
    require(bandBits >= 1 && bandBits <= 32, "bandBits must be in 1..32")
    require(nbits % bandBits == 0, "nbits must be a multiple of bandBits")
    require(probeHamming >= 0 && probeHamming <= 1,
      "probeHamming must be 0 (exact band) or 1 (flip one bit)")
    val nBands = nbits / bandBits
    val mask = (1L << bandBits) - 1
    def withBands(df: DataFrame, side: String): DataFrame = {
      val renamed = df.select(col(idCol).as(s"${side}_id"),
        col(vecCol).as(s"${side}_vec"))
      val bandVals = (0 until nBands).map(b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask)))
      renamed
        .withColumn("sig", hyperplaneBits(col(s"${side}_vec"), nbits))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          posexplode(array(bandVals: _*)))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_val")
    }
    val qbExact = withBands(queries, "query")
    val qbProbed =
      if (probeHamming == 0) qbExact
      else {
        // the probe set per band: the exact value plus every value one
        // flipped sign bit away (bit positions are static → a plain
        // column array, no expr-parsing)
        val probeVals = array((col("band_val") +: (0 until bandBits).map(
          b => col("band_val").bitwiseXOR(lit(1L << b)))): _*)
        qbExact.select(col("query_id"), col("query_vec"), col("band_id"),
          explode(probeVals).as("band_val"))
      }
    val qb = broadcast(qbProbed)
    val cb = withBands(corpus, "neighbor")
    val candidates = cb.join(qb, Seq("band_id", "band_val"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("neighbor_id"),
        col("neighbor_vec"))
      .distinct()
      .withColumn("sim", VectorFunctions.cosineSim(col("query_vec"),
        col("neighbor_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH banded
    * blocking over the corpus against itself, then exact cosine
    * verification at `threshold`. The embedding-space analogue of
    * [[DedupOps.minhashPairs]]. */
  def embeddingDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nbits: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    require(nbits % 8 == 0, "nbits must be a multiple of 8")
    val banded = bandedBits(corpus, idCol, vecCol, nbits)
    // capped bucket expansion (8-bit band values have only 256 buckets
    // per band — uncapped, candidate volume would be ~N²/256)
    val pairs = DedupOps.bucketPairs(banded,
      Seq(col("band_id"), col("band_val")), idCol, minN = 2, maxN = maxBucket)
    val vecs = corpus.select(col(idCol), col(vecCol))
    pairs
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("vec_a")), Seq("a"))
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("vec_b")), Seq("b"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("vec_a"),
        col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))
  }

  /** IVF (inverted-file) index model: nlist centroid vectors. Built
    * with deterministic seeding (hash-ordered sample) + a few Lloyd
    * iterations, so every build over the same corpus yields the same
    * index — no RNG state anywhere. Centroids are tiny (nlist × d) and
    * live on the driver / in broadcast literals. */
  case class IvfModel(centroids: Array[Array[Float]])

  /** Column: index of the centroid most cosine-similar to `vec`. */
  private def nearestCentroid(vec: Column, model: IvfModel): Column = {
    val sims = array(model.centroids.toIndexedSeq.map(c =>
      VectorFunctions.cosineSim(vec, typedlit(c.toSeq))): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** Build an IVF model: deterministic seeds (lowest hash(id) rows),
    * then `iters` Lloyd steps. Per step: one pass assigning vectors to
    * centroids, one per-dimension mean aggregation; only nlist × d
    * numbers ever reach the driver. */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): IvfModel = {
    val seeds = corpus
      .orderBy(abs(hash(col(idCol))), col(idCol))
      .limit(nlist)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    var model = IvfModel(seeds)
    (0 until iters).foreach { _ =>
      val assigned = corpus.select(
        nearestCentroid(col(vecCol), model).as("cid"), col(vecCol))
      val dims = assigned
        .select(col("cid"), posexplode(col(vecCol)))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("m")))), s => s.getField("m").cast("float")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      model = IvfModel(model.centroids.indices.map(i =>
        dims.getOrElse(i, model.centroids(i))).toArray)
    }
    model
  }

  /** (query_id, query_vec, cid) probe rows: each query's `nprobe` most
    * cosine-similar centroids, via lexicographic sort of (-sim, cid)
    * structs. */
  private def probeRows(queries: DataFrame, idCol: String, vecCol: String,
      model: IvfModel, nprobe: Int): DataFrame = {
    val probeStructs = array(model.centroids.indices.map(i => struct(
      (-VectorFunctions.cosineSim(col("query_vec"), typedlit(
        model.centroids(i).toSeq))).as("negsim"),
      lit(i).as("cid"))): _*)
    queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("probe_cids", transform(
        slice(array_sort(probeStructs), 1, nprobe),
        s => s.getField("cid")))
      .select(col("query_id"), col("query_vec"),
        explode(col("probe_cids")).as("cid"))
  }

  /** Shared probe→score→top-k tail of the IVF paths. */
  private def ivfTail(assigned: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val candidates = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", VectorFunctions.cosineSim(col("query_vec"),
        col("vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** (id, cid) cell assignment under a trained IVF model — the same
    * first-max argmax every probe path uses, exposed for corpus-level
    * cluster operations (balanced sampling, per-domain statistics).
    * Map-side at any scale: the nlist × d centroids ride as literals
    * inside one codegen'd projection, nothing shuffles. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      model: IvfModel): DataFrame =
    corpus.select(col(idCol),
      nearestCentroid(col(vecCol), model).as("cid"))

  /** IVF-probed approximate top-k: each query scans only the vectors
    * assigned to its `nprobe` nearest centroids — candidate volume is
    * corpus/nlist × nprobe on average, which is what survives a 100-TB
    * corpus (see [[writeIvfIndex]] for the persisted layout where the
    * assignment is a partition key). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: IvfModel, k: Int, nprobe: Int = 2): DataFrame = {
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"), nearestCentroid(col(vecCol), model).as("cid"))
    ivfTail(assigned, probeRows(queries, idCol, vecCol, model, nprobe), k)
  }

  /** Persist the IVF index as a CELL-PARTITIONED parquet layout: each
    * vector lives under its centroid's partition directory. A probe
    * then reads nprobe/nlist of the files via partition pruning — the
    * on-disk analogue of the inverted lists, and the layout a 100-TB
    * index actually ships with. */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      model: IvfModel, path: String): Unit =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
      nearestCentroid(col(vecCol), model).as("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Deterministic generation token of an IVF model — a hash of the
    * exact centroid bytes. Persisted index paths embed it (see
    * [[ivfIndexPath]]) so an index whose cells were assigned under
    * centroid generation G can never be probed, appended to, or
    * compared under any other generation: a retrain changes the token
    * and the layout rebuilds instead of silently mixing assignments
    * from two models. */
  def modelGeneration(model: IvfModel): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(4)
    model.centroids.foreach(_.foreach { f =>
      bb.clear(); bb.putFloat(f); md.update(bb.array())
    })
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** The generation-versioned path a persisted IVF/IVF-PQ layout lives
    * under. Callers append batches ONLY through this path, so frozen
    * centroids and stored cells stay consistent by construction. */
  def ivfIndexPath(base: String, model: IvfModel): String =
    s"${base}_${ModelFormatVersion}_g${modelGeneration(model)}"

  /** INCREMENTAL APPEND to a persisted IVF index: assign the new batch
    * to its nearest FROZEN centroids and append the rows under the
    * cell partition directories — no retrain, no rewrite of existing
    * cells, batch-sized I/O. This is the 100-TB freshness path: the
    * index stays a partition-pruned layout (new files land inside the
    * probed-or-not cell dirs), and because [[nearestCentroid]] is a
    * pure function of (vector, centroids), append-then-query equals
    * rebuild-at-the-same-centroids exactly (AnnOpsSpec gate). Callers
    * pass a [[ivfIndexPath]]-derived path so the frozen model and the
    * layout can never diverge. */
  def appendIvfIndex(batch: DataFrame, idCol: String, vecCol: String,
      model: IvfModel, path: String): Unit =
    batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
      nearestCentroid(col(vecCol), model).as("cid"))
      .write.mode("append").partitionBy("cid").parquet(path)

  /** Compact a cell-partitioned index layout ([[writeIvfIndex]] /
    * [[writeIvfPqIndex]] + their appends) IN PLACE: many small
    * per-append files per cell directory degrade every probe (listing
    * + open cost, tiny row groups), so periodically rewrite the
    * layout with each cell's rows coalesced into full-sized files.
    * `repartitionByRange(cid, id)` keeps each output task on a
    * contiguous cell range, so the hive-partitioned rewrite emits
    * one right-sized file per (task, cell) — the per-cell floor for a
    * partitioned layout — while file COUNT is derived from on-disk
    * bytes exactly like [[StorageOps.compact]]. Content is untouched
    * (row-identical rewrite, spec-gated probe equality), and the path
    * — which embeds the model generation via [[ivfIndexPath]] — does
    * not change, so the content-signature discipline of every reader
    * keeps working: a compaction changes the layout's file listing,
    * any signature-keyed derived artifact rebuilds, and the frozen
    * model stays valid because assignments never move. The rewrite
    * lands in a temp dir and swaps in atomically; a crashed compaction
    * leaves the original layout untouched. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val df = spark.read.parquet(path)
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(f))
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nFiles = math.max(1, (totalBytes / targetFileBytes).toInt +
      (if (totalBytes % targetFileBytes > 0) 1 else 0))
    val run = java.util.UUID.randomUUID().toString
    val tmp = s"$path.compact-$run"
    df.repartitionByRange(nFiles, col("cid"), col("neighbor_id"))
      .write.mode("overwrite").partitionBy("cid").parquet(tmp)
    val old = s"$path.old-$run"
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(old),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    try java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      // restore the original layout before propagating
      java.nio.file.Files.move(java.nio.file.Paths.get(old),
        java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))
  }

  /** Threshold-triggered [[compactIndex]] — the hook an append-heavy
    * ingest calls after each [[appendIvfIndex]]/[[appendIvfPqIndex]]:
    * compacts only when some cell directory has accumulated more than
    * `maxFilesPerCell` files (a pure METADATA check — one recursive
    * listing, no data read), so steady-state appends stay append-cost
    * and the rewrite amortizes across batches. Returns whether a
    * compaction ran. */
  def compactIndexIfNeeded(spark: org.apache.spark.sql.SparkSession,
      path: String, maxFilesPerCell: Int = 8,
      targetFileBytes: Long = 128L * 1024 * 1024): Boolean = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return false
    val perCell = scala.collection.mutable.Map.empty[String, Int]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val parent = st.getPath.getParent.getName
      if (parent.startsWith("cid=") &&
          st.getPath.getName.endsWith(".parquet"))
        perCell.updateWith(parent)(n => Some(n.getOrElse(0) + 1))
    }
    val needs = perCell.valuesIterator.exists(_ > maxFilesPerCell)
    if (needs) compactIndex(spark, path, targetFileBytes)
    needs
  }

  /** Top-k over a persisted IVF index: probe cells are resolved first
    * (centroids are driver-side model metadata, probe set is
    * nprobe x |queries| ints), then pushed as a STATIC partition filter
    * — the scan lists only the probed cell directories
    * (`PartitionFilters` in the plan, asserted in AnnOpsSpec), never
    * touching the other inverted lists. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, idCol: String, vecCol: String,
      model: IvfModel, k: Int, nprobe: Int = 2): DataFrame = {
    val probes = probeRows(queries, idCol, vecCol, model, nprobe)
    ivfTail(prunedIndexScan(spark, path, probes), probes, k)
  }

  /** Scan a cell-partitioned index with the probe set resolved to a
    * STATIC partition filter: probe cids are metadata-sized (collected
    * deterministically), so the scan lists only the probed cell
    * directories. Shared by the IVF and IVF-PQ persisted paths. */
  private def prunedIndexScan(spark: org.apache.spark.sql.SparkSession,
      path: String, probes: DataFrame): DataFrame = {
    val probeCids = probes.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).sorted
    spark.read.parquet(path)
      .filter(col("cid").isin(probeCids.toIndexedSeq.map(Integer.valueOf): _*))
  }

  /** (id, vec, band_id, band_val) rows for hyperplane-LSH blocking. */
  private def bandedBits(corpus: DataFrame, idCol: String, vecCol: String,
      nbits: Int): DataFrame = {
    require(nbits % 8 == 0, "nbits must be a multiple of 8")
    val nBands = nbits / 8
    val bandVals = (0 until nBands).map(b =>
      shiftrightunsigned(col("sig"), b * 8).bitwiseAND(lit(0xffL)))
    corpus.select(col(idCol), col(vecCol))
      .withColumn("sig", hyperplaneBits(col(vecCol), nbits))
      .select(col(idCol), posexplode(array(bandVals: _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_val")
  }

  /** Per-vector near-dup summary (stable one-row-per-vector shape even
    * when no pair crosses the threshold): LSH-bucket candidate count and
    * the max verified cosine against any candidate. */
  def embeddingDupSummary(corpus: DataFrame, idCol: String, vecCol: String,
      nbits: Int = 16, maxBucket: Int = 1000): DataFrame = {
    val banded = bandedBits(corpus, idCol, vecCol, nbits)
    val pairs = DedupOps.bucketPairs(banded,
      Seq(col("band_id"), col("band_val")), idCol, minN = 2, maxN = maxBucket)
    val vecs = corpus.select(col(idCol), col(vecCol))
    val scored = pairs
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("vec_a")), Seq("a"))
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("vec_b")), Seq("b"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("vec_a"),
        col("vec_b")))
    // pairs are a<b; explode both directions so each vector sees its
    // candidates
    val sym = scored.select(explode(array(
        struct(col("a").as("id"), col("cosine")),
        struct(col("b").as("id"), col("cosine")))).as("e"))
      .select(col("e.id").as("id"), col("e.cosine").as("cosine"))
    val perVec = sym.groupBy(col("id")).agg(
      count(lit(1)).as("n_candidates"),
      round(max(col("cosine")), 4).as("max_cosine"))
    corpus.select(col(idCol).as("id"))
      .join(perVec, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("max_cosine"), lit(-1.0)).as("max_cosine"))
  }

  /** SemDedup-style semantic dedup (Abbas et al. 2023, arXiv
    * 2303.09540 — public literature; independent implementation):
    * k-means-cluster the embeddings (the [[buildIvf]] deterministic
    * Lloyd model), generate candidate pairs only WITHIN a cluster,
    * verify by exact cosine, and drop every vector that has a verified
    * semantic duplicate with a smaller id (deterministic keep-lowest
    * policy — greedy per pair, documented: a chain a~b, b~c with a!~c
    * drops both b and c). Scale shape: candidate volume is bounded by
    * the per-cluster cap (`maxBucket`, enforced map-side by the
    * bounded collect in bucketPairs), never all-pairs; the cluster
    * model is nlist x d driver-side floats; only (id, cid) ints and
    * verified pairs shuffle. A 100-TB corpus raises nlist so
    * corpus/nlist stays bounded — the knob is the same one the IVF
    * index exposes.
    *
    * Output: one row per vector — (id, cid, n_semantic_dups = verified
    * partners at cosine >= threshold, max_cosine over partners or -1,
    * kept = 0 iff some partner has a smaller id). */
  def semanticDedupSummary(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 8, threshold: Double = 0.95,
      maxBucket: Int = 10000): DataFrame = {
    val model = buildIvf(corpus, idCol, vecCol, nlist)
    val assigned = corpus.select(col(idCol),
      nearestCentroid(col(vecCol), model).as("cid"))
    val pairs = DedupOps.bucketPairs(assigned, Seq(col("cid")), idCol,
      minN = 2, maxN = maxBucket)
    val vecs = corpus.select(col(idCol), col(vecCol))
    val dups = pairs
      .join(vecs.select(col(idCol).as("a"), col(vecCol).as("vec_a")), Seq("a"))
      .join(vecs.select(col(idCol).as("b"), col(vecCol).as("vec_b")), Seq("b"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("vec_a"),
        col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
    // a<b by construction: b sees a smaller-id partner (dropped), a
    // sees a larger-id partner (kept unless it is some other pair's b)
    val sym = dups.select(explode(array(
        struct(col("a").as("id"), col("cosine"), lit(false).as("drop")),
        struct(col("b").as("id"), col("cosine"), lit(true).as("drop"))))
        .as("e"))
      .select(col("e.id").as("id"), col("e.cosine").as("cosine"),
        col("e.drop").as("drop"))
    val perVec = sym.groupBy(col("id")).agg(
      count(lit(1)).as("n_semantic_dups"),
      round(max(col("cosine")), 4).as("max_cosine"),
      max(col("drop")).as("dropped"))
    assigned.select(col(idCol).as("id"), col("cid"))
      .join(perVec, Seq("id"), "left")
      .select(col("id").as(idCol), col("cid").cast("bigint").as("cid"),
        coalesce(col("n_semantic_dups"), lit(0L)).as("n_semantic_dups"),
        coalesce(col("max_cosine"), lit(-1.0)).as("max_cosine"),
        when(coalesce(col("dropped"), lit(false)), lit(0L)).otherwise(lit(1L))
          .as("kept"))
  }

  // ---- product quantization (PQ) -----------------------------------

  /** Product-quantization model: `m` codebooks of `k` codewords, each
    * over a `dsub`-dimensional subvector slice (Jégou et al., TPAMI
    * 2011 — public literature; independent implementation). At scale
    * the index stores only the per-vector code array — with m=8 and
    * k<=256 a 64-float (256-byte) embedding compresses to 8 bytes,
    * and scoring a candidate costs m table lookups instead of a
    * dim-element dot product. */
  case class PqModel(dsub: Int, codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
  }

  // ---- model cache -------------------------------------------------

  /** Persist/load the kilobyte ANN models (IVF centroids, PQ
    * codebooks) keyed by a CONTENT signature of the source parquet
    * plus the build parameters: index construction is offline at
    * scale, so a query run should load the artifact, not re-run
    * Lloyd. Stale-proof exactly like the IVF layout cache
    * ([[StorageOps.contentSignature]]): regenerated source data gets
    * a new signature and a fresh build. Plain-text float lines
    * (Float.toString round-trips exactly), temp-file + atomic rename
    * so concurrent JVMs never read a half-written model.
    *
    * The cache lives under [[StorageOps.scratchPath]]'s per-user 0700
    * root (the root's mode protects every artifact beneath it — one
    * hardening site, not two) so another local user can neither read
    * the models nor pre-plant files this framework would trust; each
    * cache key carries a `_v1` format token so a change to the build
    * algorithm or line format bumps the version and can never
    * deserialize a stale-layout file. */
  private def modelCacheDir = StorageOps.scratchPath("model-cache")

  /** Bump when buildIvf/buildPq or the model line format changes.
    * Persisted index layouts embed it in their paths too, so an
    * algorithm change can never be served a stale on-disk index. */
  private[graft] val ModelFormatVersion = "v1"

  /** Materialize a persisted index layout at `path` exactly once,
    * ATOMICALLY: the layout is written to a scratch sibling and
    * directory-renamed into place, so a crashed writer can never
    * leave a partial artifact that `exists()` would then trust
    * forever, and two concurrent JVMs cannot overwrite-vs-scan race
    * (the rename loser just discards its copy) — the same discipline
    * as the model cache's temp-file + atomic rename. */
  def ensureIndex(path: String)(write: String => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val target = Paths.get(path)
    if (!Files.exists(target)) {
      val tmp = path + ".tmp-" + java.util.UUID.randomUUID().toString
      write(tmp)
      try Files.move(Paths.get(tmp), target,
        StandardCopyOption.ATOMIC_MOVE)
      catch {
        case (_: java.nio.file.FileAlreadyExistsException) |
             (_: java.nio.file.DirectoryNotEmptyException) |
             (_: java.nio.file.AccessDeniedException) =>
          // another JVM won the race; discard our copy
          Files.walk(Paths.get(tmp))
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
      }
    }
  }

  private def modelFile(key: String) =
    java.nio.file.Paths.get(modelCacheDir, s"$key.txt")

  private[ops] def saveRows(key: String, rows: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(modelCacheDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, key, ".tmp")
    java.nio.file.Files.write(tmp,
      rows.mkString("\n").getBytes("UTF-8"))
    try java.nio.file.Files.move(tmp, modelFile(key),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      java.nio.file.Files.deleteIfExists(tmp) // another JVM won the race
    }
  }

  private[ops] def loadRows(key: String): Option[Seq[String]] = {
    val f = modelFile(key)
    if (java.nio.file.Files.exists(f))
      Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        .split("\n").toSeq)
    else None
  }

  /** [[buildIvf]] behind the content-signature cache. */
  def cachedIvf(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): IvfModel = {
    val sig = StorageOps.contentSignature(spark, srcPath)
    val key = s"ivf_${ModelFormatVersion}_${nlist}_${iters}_${java.lang.Long.toHexString(sig)}"
    loadRows(key) match {
      case Some(rows) =>
        IvfModel(rows.map(_.split(",").map(_.toFloat)).toArray)
      case None =>
        val m = buildIvf(corpus, idCol, vecCol, nlist, iters)
        saveRows(key, m.centroids.toSeq.map(_.mkString(",")))
        m
    }
  }

  /** [[buildPq]] behind the content-signature cache. */
  def cachedPq(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 64, iters: Int = 2): PqModel = {
    val sig = StorageOps.contentSignature(spark, srcPath)
    val key = s"pq_${ModelFormatVersion}_${m}_${k}_${iters}_${java.lang.Long.toHexString(sig)}"
    loadRows(key) match {
      case Some(rows) =>
        // line format: "<mi>;f0,f1,..." — mi-major, codeword per line
        val books = rows.map { line =>
          val Array(mi, cw) = line.split(";", 2)
          (mi.toInt, cw.split(",").map(_.toFloat))
        }.groupBy(_._1).toSeq.sortBy(_._1)
          .map(_._2.map(_._2).toArray).toArray
        PqModel(books(0)(0).length, books)
      case None =>
        val model = buildPq(corpus, idCol, vecCol, m, k, iters)
        saveRows(key, model.codebooks.zipWithIndex.toSeq.flatMap {
          case (book, mi) => book.toSeq.map(cw => s"$mi;${cw.mkString(",")}")
        })
        model
    }
  }

  /** (mi, book) rows — one per subspace, each carrying the codebook as
    * array<struct<cw array<float>, nrm double>> with |cw|^2
    * precomputed. The codebook travels as BROADCAST DATA, not as a
    * literal expression tree: m*k codewords inlined as expressions
    * (the naive formulation) blow codegen past the JIT's method
    * limits and force interpreted fallback, and a k=256 production
    * codebook would not compile at all. */
  private def booksDf(corpus: DataFrame, model: PqModel): DataFrame = {
    val sess = corpus.sparkSession
    import sess.implicits._
    model.codebooks.zipWithIndex.toSeq
      .map { case (book, mi) =>
        (mi, book.toSeq.map(cw =>
          (cw.toSeq, cw.map(x => x.toDouble * x.toDouble).sum)))
      }
      .toDF("mi", "raw")
      .select(col("mi"), transform(col("raw"), e =>
        struct(e.getField("_1").as("cw"), e.getField("_2").as("nrm")))
        .as("book"))
  }

  /** (id, mi, sub) rows: each vector split into its m subvector
    * slices. */
  private def subvecs(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): DataFrame =
    corpus.select(col(idCol), posexplode(array((0 until m).map(mi =>
        slice(col(vecCol), mi * dsub + 1, dsub)): _*)))
      .withColumnRenamed("pos", "mi")
      .withColumnRenamed("col", "sub")

  /** 0-based index of the L2-nearest codeword in the `book` column:
    * argmin |v-c|^2 == argmax (2 v.c - |c|^2). One fused-dot-product
    * pass per codeword ([[graft.functions.DotProduct]] inside the
    * lambda); first-minimum tie-break keeps assignment deterministic. */
  private def nearestInBook(sub: Column, book: Column): Column = {
    val scores = transform(book, e =>
      lit(2.0) * VectorFunctions.dot(sub, e.getField("cw")) -
        e.getField("nrm"))
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Build a PQ model: m deterministic L2 k-means runs, all advanced
    * in ONE Spark job per Lloyd iteration — subvector rows join the
    * broadcast codebook table on subspace id, assign, and aggregate
    * per-dimension means; only m*k*dsub floats reach the driver per
    * step. Seeds are the k lowest-hash corpus rows, sliced. */
  def buildPq(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 64, iters: Int = 2): PqModel = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val seeds = corpus
      .orderBy(abs(hash(col(idCol))), col(idCol))
      .limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    var books = Array.tabulate(m)(mi =>
      seeds.map(_.slice(mi * dsub, (mi + 1) * dsub)))
    val sv = subvecs(corpus, idCol, vecCol, m, dsub)
    (0 until iters).foreach { _ =>
      val dims = sv
        .join(broadcast(booksDf(corpus, PqModel(dsub, books))), Seq("mi"))
        .select(col("mi"), nearestInBook(col("sub"), col("book")).as("cid"),
          col("sub"))
        .select(col("mi"), col("cid"), posexplode(col("sub")))
        .groupBy(col("mi"), col("cid"), col("pos"))
        .agg(avg(col("col")).as("v"))
        .groupBy(col("mi"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("v")))), s => s.getField("v").cast("float")).as("cw"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      books = Array.tabulate(m)(mi => books(mi).indices.map(ci =>
        dims.getOrElse((mi, ci), books(mi)(ci))).toArray)
    }
    PqModel(dsub, books)
  }

  /** (id, codes) rows: each vector encoded as its m nearest-codeword
    * indices — the only per-vector state the scale-path index stores.
    * One broadcast join + one shuffle on id. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    subvecs(corpus, idCol, vecCol, model.m, model.dsub)
      .join(broadcast(booksDf(corpus, model)), Seq("mi"))
      .select(col(idCol), col("mi"),
        nearestInBook(col("sub"), col("book")).as("cid"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("mi"),
        col("cid")))), s => s.getField("cid")).as("codes"))

  /** IVF-PQ composition — the shape a production 100-TB ANN index
    * actually ships: the coarse quantizer (IVF cells) bounds WHICH
    * candidates are scanned (nprobe/nlist of the corpus), the PQ
    * codes bound the BYTES per scanned candidate (m small ints, no
    * raw vectors), and the exact re-rank bounds the full-vector reads
    * to O(queries x refine x k) fetched by id. Composes the existing
    * [[buildIvf]] cell assignment with [[pqEncode]]/ADC scoring; with
    * the [[writeIvfIndex]] layout the cell probe becomes partition
    * pruning on disk. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, ivf: IvfModel, pq: PqModel, k: Int,
      nprobe: Int = 2, refine: Int = 4): DataFrame = {
    val cells = corpus.select(col(idCol).as("neighbor_id"),
      nearestCentroid(col(vecCol), ivf).as("cid"))
    val encoded = pqEncode(corpus, idCol, vecCol, pq)
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .join(cells, Seq("neighbor_id"))
    val probes = probeRows(queries, idCol, vecCol, ivf, nprobe)
      .select(col("query_id"), col("cid"))
    adcRerank(encoded, probes, queries, idCol, vecCol, pq, corpus,
      k, refine)
  }

  /** Shared ADC → shortlist → exact-re-rank tail of the IVF-PQ paths:
    * score (cid, codes) candidate rows against each probing query's
    * ADC table, keep the top refine*k per query, fetch true vectors by
    * id for the exact re-rank. */
  private def adcRerank(encoded: DataFrame, probes: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, pq: PqModel,
      corpus: DataFrame, k: Int, refine: Int): DataFrame = {
    val qtabs = pqQueryTables(queries, idCol, vecCol, pq)
    val adc = encoded
      .join(broadcast(probes), Seq("cid"))
      .join(broadcast(qtabs), Seq("query_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("qtab"),
          (c, tab) => element_at(tab, c + 1)),
        lit(0.0), (acc, x) => acc + x))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val shortlist = adc
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(shortlist, corpus, queries, idCol, vecCol, k)
  }

  /** Persist the IVF-PQ index: (neighbor_id, codes) rows partitioned
    * by IVF cell — the production 100-TB artifact in full. Per vector
    * the index stores only the id and m code ints (the 64-float
    * embedding never leaves the corpus), and the cell directory
    * structure makes a probe a partition-pruned scan. */
  def writeIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      ivf: IvfModel, pq: PqModel, path: String): Unit = {
    val cells = corpus.select(col(idCol).as("neighbor_id"),
      nearestCentroid(col(vecCol), ivf).as("cid"))
    pqEncode(corpus, idCol, vecCol, pq)
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .join(cells, Seq("neighbor_id"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
  }

  /** [[appendIvfIndex]] for the IVF-PQ layout: encode the batch with
    * the FROZEN codebooks, assign with the FROZEN centroids, append
    * (neighbor_id, codes) rows under the cell partitions. Both models
    * stay fixed, so the appended layout is bit-identical to a rebuild
    * over the union corpus at the same generation (AnnOpsSpec gate);
    * the path should derive from [[ivfIndexPath]] (the PQ codebooks
    * are keyed by the same source-content signature as the IVF model,
    * so one generation token governs both). */
  def appendIvfPqIndex(batch: DataFrame, idCol: String, vecCol: String,
      ivf: IvfModel, pq: PqModel, path: String): Unit = {
    val cells = batch.select(col(idCol).as("neighbor_id"),
      nearestCentroid(col(vecCol), ivf).as("cid"))
    pqEncode(batch, idCol, vecCol, pq)
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .join(cells, Seq("neighbor_id"))
      .write.mode("append").partitionBy("cid").parquet(path)
  }

  /** Top-k over a persisted IVF-PQ index: probe cells resolve to a
    * STATIC partition filter (the scan lists only the probed cell
    * directories — `PartitionFilters` in the plan, AnnOpsSpec-gated),
    * the ADC scan reads only (neighbor_id, codes), and full vectors
    * are fetched from the CORPUS by id for the refine*k shortlist —
    * the only full-vector reads in the whole search. */
  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, ivf: IvfModel, pq: PqModel, k: Int,
      nprobe: Int = 2, refine: Int = 4): DataFrame = {
    val probes = probeRows(queries, idCol, vecCol, ivf, nprobe)
      .select(col("query_id"), col("cid"))
    adcRerank(prunedIndexScan(spark, path, probes), probes, queries,
      idCol, vecCol, pq, corpus, k, refine)
  }

  /** PQ asymmetric-distance top-k with exact re-ranking.
    *
    * Phase 1 (ADC over codes only): each query builds one m x k
    * inner-product table against the broadcast codebooks, and a
    * candidate's approximate score is m table lookups summed via
    * zip_with/aggregate — the corpus-side scan touches only the code
    * array, never the raw embeddings. Embeddings here are unit-norm,
    * so inner product == cosine and the ADC ranking is principled.
    *
    * Phase 2 (refine): the top refine*k candidates per query join
    * back to the corpus BY ID to fetch their true vectors for an
    * exact cosine re-rank — at 100 TB this is the only stage that
    * reads full vectors, and it reads O(queries x refine x k) of
    * them. Output matches the other ANN paths: (query_id, rank,
    * neighbor_id, sim). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: PqModel, k: Int,
      refine: Int = 4): DataFrame = {
    val encoded = pqEncode(corpus, idCol, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val adc = encoded.crossJoin(broadcast(
        pqQueryTables(queries, idCol, vecCol, model)))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("qtab"),
          (c, tab) => element_at(tab, c + 1)),
        lit(0.0), (acc, x) => acc + x))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val shortlist = adc
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(shortlist, corpus, queries, idCol, vecCol, k)
  }

  /** (query_id, qtab) — each query's m x k ADC inner-product table,
    * assembled from the same broadcast codebook rows the index was
    * built from. */
  private def pqQueryTables(queries: DataFrame, idCol: String,
      vecCol: String, model: PqModel): DataFrame =
    subvecs(queries.select(col(idCol).as("query_id"), col(vecCol)),
        "query_id", vecCol, model.m, model.dsub)
      .join(broadcast(booksDf(queries, model)), Seq("mi"))
      .select(col("query_id"), col("mi"),
        transform(col("book"), e =>
          VectorFunctions.dot(col("sub"), e.getField("cw"))).as("tab"))
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("mi"),
        col("tab")))), s => s.getField("tab")).as("qtab"))

  /** Fetch true vectors for a (query_id, neighbor_id) shortlist BY ID
    * and exact-cosine re-rank to the final top-k — the only stage of
    * the PQ paths that reads full vectors. */
  private def exactRerank(shortlist: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val exact = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("vec")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("query_vec"))), Seq("query_id"))
      .withColumn("sim",
        VectorFunctions.cosineSim(col("query_vec"), col("vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }
}
