package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection via synchronous label propagation (LPA) made
  * deterministic: every round, each vertex adopts the most frequent
  * label among its neighbors, ties broken by the SMALLEST label — a
  * fixed total order, so the round function is a pure function of the
  * previous labeling and any engine replaying it (the q110 oracle
  * unrolls the rounds in SQL) produces identical communities.
  * Asynchronous/randomized LPA — the textbook variant — is
  * order-sensitive by construction and would be rows-only; the
  * synchronous form trades a little convergence speed for a
  * hash-checkable contract.
  *
  * Plan per round: one join of the (symmetrized, checkpointed-once) edge
  * list against the |V|-sized label table, one (vertex, label) count
  * aggregation, one bounded per-vertex top-1 window, one keyed
  * left-join back (isolated vertices keep their label). Labels are
  * checkpointed per round — the BFS lineage discipline. Rounds are a
  * FIXED parameter (part of the semantic contract), not a fixpoint:
  * sync LPA can oscillate 2-cycles, so "run r rounds" is the honest,
  * reproducible spec.
  */
object Communities {

  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    val sym = edges.select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .union(edges.select(col("dst").cast("long"), col("src").cast("long")))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val counts = sym.join(labels.toDF("v", "nl"), Seq("v"))
        .groupBy(col("u"), col("nl")).agg(count(lit(1)).as("c"))
      val top = counts
        .withColumn("rn", row_number().over(
          Window.partitionBy("u").orderBy(col("c").desc, col("nl").asc)))
        .where(col("rn") === 1)
        .select(col("u").as("id"), col("nl").as("new_label"))
      labels = labels.join(top, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Exact-integer community quality table for a (canonical src<dst)
    * edge set and a labeling: per community its vertex count, internal
    * edge count and total (undirected) degree — precisely the integers
    * modularity is made of (Q = Σ_c [in_c/m − (d_c/2m)²]); keeping them
    * unreduced keeps the output engine-exact, the caller divides.
    * One labels broadcast-or-shuffle join per side + three keyed aggs.
    */
  def communityStats(edges: DataFrame, labels: DataFrame): DataFrame = {
    val c = edges.select(col("src").cast("long").as("x"), col("dst").cast("long").as("y"))
    val lab = labels.select(col("id"), col("label")).localCheckpoint(true)
    val internal = c
      .join(lab.toDF("x", "lx"), Seq("x"))
      .join(lab.toDF("y", "ly"), Seq("y"))
      .where(col("lx") === col("ly"))
      .groupBy(col("lx").as("label")).agg(count(lit(1)).as("internal_edges"))
    val deg = c.select(explode(array(col("x"), col("y"))).as("id"))
      .join(lab, Seq("id"))
      .groupBy("label").agg(count(lit(1)).as("total_degree"))
    val nv = lab.groupBy("label").agg(count(lit(1)).as("n_vertices"))
    nv.join(internal, Seq("label"), "left")
      .join(deg, Seq("label"), "left")
      .select(col("label"), col("n_vertices"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        coalesce(col("total_degree"), lit(0L)).as("total_degree"))
  }
}
