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
}
