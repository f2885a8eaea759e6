package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting — batch/window re-expression of the reference's
  * incremental exact triangle count (GS/example/ExactTriangleCount
  * .java:~50–200 builds per-vertex neighborhoods and intersects them per
  * edge; GS/example/WindowTriangles.java:~40–150 emits wedges per window
  * and matches closing edges).
  *
  * We use the degree-oriented node-iterator join (the distributed
  * formulation of neighborhood intersection): orient each edge from its
  * lower-(degree, id) endpoint to the higher one, build wedges from each
  * vertex's out-neighbor pairs, and close them against the canonical edge
  * set with a semi join. Orienting by degree bounds every out-degree by
  * O(√m), so the wedge relation is O(m^1.5) worst-case instead of
  * Σ deg² — the difference between "survives hub vertices at 100 TB" and
  * "explodes". All joins are equi-joins on vertex ids (shuffle-partitioned
  * by key; AQE may broadcast the degree side when small).
  */
object Triangles {

  /** Enumerate triangles of a canonical (src < dst) edge set.
    * Returns one row per triangle: (ta, tb, tc) — the degree-ordered
    * corners (center first), NOT id-sorted.
    */
  def enumerate(c: DataFrame): DataFrame = {
    // The edge set feeds the plan tree 7 times (degree agg, orientation,
    // both wedge sides, closing semi join); materialize it once instead
    // of re-running its upstream (e.g. the co-purchase self-join) per use.
    val cc = c.localCheckpoint(true)
    val deg = cc.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count("*").as("d"))

    val withDeg = cc
      .join(deg.toDF("src", "sd"), Seq("src"))
      .join(deg.toDF("dst", "dd"), Seq("dst"))

    // orient from lower (deg, id) to higher; c is canonical so ties on
    // degree fall back to src < dst
    val oriented = withDeg.select(
      when(col("sd") < col("dd") || (col("sd") === col("dd")),
        struct(col("src").as("lo"), col("dst").as("hi")))
        .otherwise(struct(col("dst").as("lo"), col("src").as("hi"))).as("e"))
      .select(col("e.lo").as("ctr"), col("e.hi").as("out"))
      .localCheckpoint(true)

    val wedges = oriented.toDF("ctr", "x")
      .join(oriented.toDF("ctr", "y"), Seq("ctr"))
      .where(col("x") < col("y"))

    // close the wedge with the canonical edge (x, y): x < y already
    wedges.join(cc.toDF("x", "y"), Seq("x", "y"), "left_semi")
      .select(col("ctr").as("ta"), col("x").as("tb"), col("y").as("tc"))
  }

  /** Global triangle count (reference ExactTriangleCount global counter). */
  def globalCount(c: DataFrame): DataFrame =
    enumerate(c).agg(count("*").as("triangles"))

  /** Per-vertex triangle counts, vertices with ≥1 triangle. */
  def perVertexCounts(c: DataFrame): DataFrame =
    enumerate(c)
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("id"))
      .groupBy("id").agg(count("*").as("triangles"))

  /** Triangle count per tumbling window over a windowed canonical edge
    * set (win, src, dst) — the reference's WindowTriangles. Uses the
    * canonical-id orientation (windows are small slices; per-window
    * degree computation would cost an extra shuffle per window set).
    */
  def countPerWindow(cw: DataFrame): DataFrame = {
    val wedges = cw.toDF("win", "a", "b")
      .join(cw.toDF("win", "a", "c"), Seq("win", "a"))
      .where(col("b") < col("c"))
    wedges.join(cw.toDF("win", "b", "c"), Seq("win", "b", "c"), "left_semi")
      .groupBy("win").agg(count("*").as("triangles"))
  }
}
