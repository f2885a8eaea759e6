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
}
