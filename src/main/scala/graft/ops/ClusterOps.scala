package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Transitive near-duplicate cluster resolution — the production step
  * after pairwise candidate generation + verification: connected
  * components over the verified-pair graph, then keep-lowest-id per
  * cluster. (The reference has no dedup surface at all; this is a
  * beyond-reference extension for the training-data pipeline.)
  *
  * Scale (100 TB): every round is a constant number of key-shuffles on
  * the edge/label tables, rounds are O(log diameter) thanks to pointer
  * doubling, and NO graph state ever lives on the driver — the driver
  * sees one convergence scalar per round. Lineage is truncated per
  * round with `localCheckpoint` (swap for reliable `checkpoint` on a
  * real cluster where executor loss must be survivable).
  */
object ClusterOps {

  /** Connected components over an undirected edge list (columns `a`,
    * `b`) by alternating min-label propagation with pointer doubling
    * (label(v) ← label(label(v))) — the standard logarithmic-round
    * MapReduce CC scheme (cf. Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC '14). Returns one (id, cluster_id) row
    * per distinct endpoint, where cluster_id is the component's minimum
    * id.
    *
    * Convergence detection without a diff join: labels are pointwise
    * nonincreasing (label(v) <= v is an invariant of both steps), so
    * the exact decimal SUM of labels is strictly decreasing until the
    * fixpoint — one cheap aggregate per round decides termination.
    * At the propagation fixpoint adjacent nodes have equal labels, so
    * labels are constant per component and equal to its minimum id.
    *
    * Cost per round is exactly ONE Spark job: the new label table is
    * localCheckpoint'ed LAZILY and the convergence aggregate is the
    * action that materializes it — the sum rides the same job that
    * truncates lineage (round 2's eager-checkpoint + separate-sum
    * scheme ran 2 jobs/round and ~2x the wall-clock). Propagation is a
    * single message aggregation (edge join + union + min groupBy).
    *
    * Fails LOUDLY instead of silently degrading: non-numeric id
    * columns are rejected up front (a string id would defeat the
    * decimal-sum convergence check and return all-singletons), and
    * maxIter exhaustion before the fixpoint throws IllegalStateException
    * rather than returning unconverged labels. `maxIter` must cover
    * ~log2(component diameter) + 2 rounds — 15 covers any graph whose
    * diameter fits in a long.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 15): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    Seq("a", "b").foreach { c =>
      val dt = edges.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"connectedComponents needs numeric edge ids; column '$c' is " +
          s"$dt — hash non-numeric ids to longs first (xxhash64)")
    }
    // symmetrized edge list, materialized once — every round re-reads
    // it, so it must not drag the upstream candidate pipeline along
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false) // lazy: the first labelSum materializes it

    // exact decimal sum — Long would overflow at 1e10 ids x 1e10 values
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).head()
        .getDecimal(0))

    // no pre-loop baseline job: on a non-empty edge set round 1 ALWAYS
    // decreases the sum (some endpoint adopts a smaller neighbor id),
    // so an initial sum could never detect convergence — round 1's sum
    // becomes the baseline instead, saving one job per call
    var prevSum: Option[java.math.BigDecimal] = None
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // 1-hop min-label propagation as ONE message aggregation:
      // label(v) <- min(label(v), min over neighbors' labels)
      val msgs = sym
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .select(col("dst").as("id"), col("label"))
      val prop = msgs.union(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // pointer doubling: label(v) <- label(label(v)) — labels are
      // always node ids (min over node ids), so the self-join resolves.
      // prop is referenced twice; recomputing its two cheap shuffles
      // over the checkpointed labels/sym beats an extra job per round.
      labels = prop
        .join(prop.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("ll"), col("label")).as("label"))
        .localCheckpoint(false)
      // the ONE action per round: materializes the lazy checkpoint AND
      // decides convergence
      val s = labelSum(labels)
      converged = (s, prevSum) match {
        case (Some(a), Some(b)) => a.compareTo(b) == 0
        case (None, _) => true // empty graph: nothing to label
        case (Some(_), None) => false // round 1 set the baseline
      }
      prevSum = s
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "rounds — labels would be incomplete; raise maxIter " +
          "(~log2(component diameter) + 2 rounds needed)")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Cluster assignment for EVERY row of `docs`: components of `edges`
    * get their component-minimum id; isolated docs are their own
    * singleton cluster. `keep` marks the one row per cluster a dedup
    * pipeline retains (the lowest id). */
  def clusterAssignments(docs: DataFrame, idCol: String,
      edges: DataFrame, maxIter: Int = 15): DataFrame = {
    val cc = connectedComponents(edges, maxIter)
    docs.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col(idCol))
  }

  /** End-to-end near-dup clustering: MinHash-LSH candidates → exact
    * shingle-Jaccard verification at `threshold` → connected components
    * → keep-lowest-id. Exact duplicates always land in one cluster
    * (identical signatures collide in every band; Jaccard = 1). */
  def nearDupClusters(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, maxIter: Int = 15): DataFrame = {
    val edges = DedupOps.minhashPairs(docs, idCol, textCol)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"))
    clusterAssignments(docs, idCol, edges, maxIter)
  }
}
