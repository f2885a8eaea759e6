package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components — two implementations with the same output
  * contract (id BIGINT, component BIGINT = min vertex id of component):
  *
  *  - [[SummaryAggregations.connectedComponents]]: the reference's
  *    single-pass mergeable union-find (GS/library/ConnectedComponents
  *    .java:~40). One job, no iteration; the merged summary is ≤|V|
  *    entries. Right choice while the vertex set fits in one task's
  *    memory (millions of vertices).
  *
  *  - [[ConnectedComponents.iterative]]: distributed min-label
  *    propagation with pointer jumping. Every step is a pair of
  *    shuffles on vertex id; state never concentrates on one node, so
  *    it survives vertex sets far beyond single-task memory (the
  *    100 TB path). Converges in O(log(diameter)-ish) rounds thanks to
  *    the pointer-jumping step; lineage is truncated per round via
  *    localCheckpoint to keep plans bounded.
  */
object ConnectedComponents {

  /** Single-pass summary aggregation (reference parity). */
  def singlePass(edges: DataFrame): DataFrame =
    SummaryAggregations.connectedComponents(edges)

  /** Scalable iterative CC. `edges`: (src, dst, …). */
  def iterative(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .union(edges.select(col("dst").cast("long"), col("src").cast("long")))
      .distinct()
      .cutLineage()

    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("l", col("id"))
      .cutLineage()

    var converged = false
    var iter = 0
    var prevSum = labels.agg(sum("l")).head().getLong(0)
    while (!converged && iter < maxIter) {
      // min label among neighbors
      val nbrMin = sym.join(labels, sym("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("l")).as("nl"))
      val propagated = labels.join(nbrMin, labels("id") === nbrMin("u"), "left")
        .select(labels("id"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"))
      // pointer jumping: l <- label(l)
      val lhs = propagated.toDF("id", "l")
      val rhs = propagated.toDF("id2", "l2")
      val jumped = lhs.join(rhs, lhs("l") === rhs("id2"), "left")
        .select(col("id"), coalesce(col("l2"), col("l")).as("l"))
        .cutLineage()
      val newSum = jumped.agg(sum("l")).head().getLong(0)
      converged = newSum == prevSum
      prevSum = newSum
      labels = jumped
      iter += 1
    }
    labels.select(col("id"), col("l").as("component"))
  }

  /** INCREMENTAL connected components — the daily-update path at
    * 100 TB: given the PREVIOUS decomposition's labels `(id,
    * component)` and a DELTA of new edges, produce the labels of the
    * grown graph WITHOUT touching the old edge set.
    *
    * Correctness: a component's label edges `(id → component)` form a
    * star that is connectivity-equivalent to the original component
    * (every member reaches the root in one hop), and component roots
    * are themselves member vertices — so CC over (label stars ∪ delta)
    * equals CC over (old edges ∪ delta), with min-label outputs
    * unchanged because the star preserves each component's member set.
    * Cost: ∝ |V| + |delta| instead of |E| + |delta| — on a corpus
    * where edges outnumber vertices 100:1, the daily recompute drops
    * by that factor. Spec-pinned ≡ full recompute; q186 hash-checks it
    * against the full-graph oracle.
    */
  def incremental(labels: DataFrame, delta: DataFrame, maxIter: Int = 50): DataFrame = {
    val stars = labels.select(col("id").cast("long").as("src"),
      col("component").cast("long").as("dst"))
    iterative(stars.unionByName(delta.select(col("src").cast("long"),
      col("dst").cast("long"))), maxIter)
  }
}
