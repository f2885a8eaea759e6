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

  /** One synchronous greedy modularity-gain pass — the Louvain level-1
    * MOVE step, made deterministic and hash-checkable: every vertex
    * simultaneously evaluates moving to each neighboring community of
    * the CURRENT labeling, using the exact-integer gain
    *
    *   gain·2m² = 2m·(k_i,C − k_i,D∖i) − k_i·(Σtot_C − Σtot_D + k_i)
    *
    * (k_i,C = edges from i into C, Σtot_C = C's degree mass, D = i's
    * community) and adopts the best strictly-positive move, ties broken
    * by the SMALLEST target label. Because simultaneous moves can in
    * principle fight each other, the pass carries Louvain's monotonicity
    * contract explicitly: the refined labeling is kept only if the exact
    * integer modularity ([[integerModularity]]) did not decrease,
    * otherwise the input labeling is returned unchanged — so callers get
    * Q(refine(L)) ≥ Q(L) unconditionally, on any engine, with no
    * floating point anywhere.
    *
    * Plan: the per-round shape of [[labelPropagation]] (|V|-join +
    * bounded top-1 window) plus two |C|-sized aggregates for the gate —
    * nothing touches more than one |E| join per term.
    */
  def modularityRefine(edges: DataFrame, labels: DataFrame): DataFrame = {
    val c = edges.select(col("src").cast("long").as("x"), col("dst").cast("long").as("y"))
      .localCheckpoint(true)
    val m = c.count()
    val sym = c.select(col("x").as("u"), col("y").as("v"))
      .union(c.select(col("y"), col("x")))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    val deg = sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("k"))
    val l0 = labels.select(col("id"), col("label")).localCheckpoint(true)
    val stot = l0.join(deg, Seq("id")).groupBy("label").agg(sum("k").as("stot"))
    val kic = sym.join(l0.toDF("v", "lv"), Seq("v"))
      .groupBy(col("u"), col("lv")).agg(count(lit(1)).as("kc"))
    val cur = l0.select(col("id").as("u"), col("label").as("lu"))
      .join(deg.toDF("u", "k"), Seq("u"))
      .join(stot.toDF("lu", "stotd"), Seq("lu"))
      .join(kic.toDF("u", "lu", "kd"), Seq("u", "lu"), "left")
      .select(col("u"), col("lu"), col("k"), col("stotd"),
        coalesce(col("kd"), lit(0L)).as("kd"))
    val best = cur.join(kic, Seq("u"))
      .where(col("lv") =!= col("lu"))
      .join(stot.toDF("lv", "stotc"), Seq("lv"))
      .select(col("u"), col("lv"),
        (lit(2L * m) * (col("kc") - col("kd"))
          - col("k") * (col("stotc") - col("stotd") + col("k"))).as("gain"))
      .where(col("gain") > 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col("gain").desc, col("lv").asc)))
      .where(col("rn") === 1)
      .select(col("u").as("id"), col("lv").as("new_label"))
    val l1 = l0.join(best, Seq("id"), "left")
      .select(col("id"), coalesce(col("new_label"), col("label")).as("label"))
      .localCheckpoint(true)
    // the monotonicity gate: two exact-integer scalars
    val cd = c.toDF("src", "dst")
    if (integerModularity(cd, l1, m) >= integerModularity(cd, l0, m)) l1 else l0
  }

  /** Exact integer modularity 4m²·Q = 4m·Σ_c in_c − Σ_c d_c² for a
    * canonical (src<dst, distinct) edge set — comparable across
    * labelings of the SAME graph; monotone in Q (4m² > 0), zero float.
    */
  def integerModularity(edges: DataFrame, labels: DataFrame, mOpt: Long = -1L): Long = {
    val c = edges.select(col("src").cast("long").as("x"), col("dst").cast("long").as("y"))
    val m = if (mOpt >= 0) mOpt else c.count()
    val lab = labels.select(col("id"), col("label"))
    val internal = c.join(lab.toDF("x", "lx"), Seq("x"))
      .join(lab.toDF("y", "ly"), Seq("y"))
      .where(col("lx") === col("ly")).count()
    val sumD2 = c.select(explode(array(col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("k"))
      .join(lab, Seq("id"))
      .groupBy("label").agg(sum("k").as("stot"))
      .agg(coalesce(sum(col("stot") * col("stot")), lit(0L)))
      .head().getLong(0)
    4L * m * internal - sumD2
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
