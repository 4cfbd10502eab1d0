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
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 15): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1 (got $maxIter)")
    // symmetrized edge list, materialized once — every round re-reads
    // it, so it must not drag the upstream candidate pipeline along
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    // exact decimal sum — Long would overflow at 1e10 ids x 1e10 values
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).head()
        .getDecimal(0))

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = prevSum.isEmpty // empty graph: nothing to do
    while (!converged && iter < maxIter) {
      // 1-hop: label(v) <- min(label(v), min over neighbors' labels)
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("dl")),
          Seq("dst"))
        .groupBy(col("src")).agg(min(col("dl")).as("nl"))
      // not checkpointed: the doubling self-join below references prop
      // twice, and recomputing two cheap joins over the checkpointed
      // labels/sym beats paying an extra materialization job per round
      val prop = labels
        .join(nbrMin.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // pointer doubling: label(v) <- label(label(v)) — labels are
      // always node ids (min over node ids), so the self-join resolves
      labels = prop
        .join(prop.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("ll"), col("label")).as("label"))
        .localCheckpoint(true)
      val s = labelSum(labels)
      converged = (s, prevSum) match {
        case (Some(a), Some(b)) => a.compareTo(b) == 0
        case _ => true
      }
      prevSum = s
      iter += 1
    }
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
