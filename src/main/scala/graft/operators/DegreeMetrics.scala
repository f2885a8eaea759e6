package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-structure metrics over the undirected view of `(src, dst)`
  * edges. Beyond-reference analytics (the reference's degree surface
  * stops at the running degree streams, GS/SimpleEdgeStream.java:~170).
  *
  * Determinism discipline: every aggregate is an exact integer sum
  * (degrees are integers), so the distributed aggregation order cannot
  * perturb the result; the one floating-point division happens once on
  * the final scalars — any engine computing the same formula from the
  * same integer sums produces the identical double.
  */
object DegreeMetrics {

  /** Newman degree assortativity of the undirected graph — the Pearson
    * correlation of endpoint degrees over directed edge occurrences:
    * `r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²)` with j = deg(u),
    * k = deg(v) over the M = 2|E| symmetrized edges (Σj = Σk by
    * symmetry). One row `(m, s_jk, s_j, s_j2, assortativity)` — the
    * integer moments ride along so a verifier can re-derive r.
    *
    * Plan: degree agg (one shuffle) + two joins of the edge list
    * against the degree table (broadcast when it fits) + one global
    * integer agg. Nothing driver-side.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val sym = Traversals.symmetrize(edges).cutLineage()
    val deg = sym.groupBy(col("u").as("id")).agg(count("*").as("d"))
    val moments = sym
      .join(deg.toDF("u", "j"), Seq("u"))
      .join(deg.toDF("v", "k"), Seq("v"))
      .agg(count("*").as("m"),
        sum(col("j") * col("k")).as("s_jk"),
        sum(col("j")).as("s_j"),
        sum(col("j") * col("j")).as("s_j2"))
    moments.select(col("m"), col("s_jk"), col("s_j"), col("s_j2"),
      round((col("m") * col("s_jk") - col("s_j") * col("s_j")).cast("double") /
        (col("m") * col("s_j2") - col("s_j") * col("s_j")).cast("double"), 6)
        .as("assortativity"))
  }

  /** DIRECTED reciprocity — the fraction of arcs whose reverse arc also
    * exists (Garlaschelli & Loffredo 2004's raw r), the first-order
    * "is this network conversational or broadcast" statistic of
    * directed analytics. One row `(n_edges, n_reciprocal,
    * reciprocity_micro)`; exact integers, truncating micro-unit
    * division. Plan: one self-join of the arc table on the reversed
    * key (a single shuffle keyed on (src, dst)) + one global count —
    * each reciprocal arc counts itself once via its own reverse probe.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct().cutLineage()
    val rec = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
    // arc-less input (e.g. loops only): reciprocity is undefined — a
    // NULL ratio row, not an ANSI divide-by-zero
    e.agg(count(lit(1)).as("n_edges")).crossJoin(rec)
      .select(col("n_edges"), col("n_reciprocal"),
        expr("CASE WHEN n_edges = 0 THEN NULL " +
          "ELSE n_reciprocal * 1000000 div n_edges END").as("reciprocity_micro"))
  }
}
