package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-prediction scores over the undirected view of `(src, dst)`
  * edges: common-neighbor counts and Adamic–Adar, for vertex pairs NOT
  * already connected. Beyond-reference capability (the reference ships
  * no link-prediction library); the plan reuses the wedge-join shape of
  * [[Triangles]] — candidate pairs come from a neighbor self-join per
  * center vertex, never from an all-pairs product.
  *
  * Scale shape: the wedge join is Σ_c deg(c)² rows — the same cost
  * class as triangle counting, and the same mitigation applies (the
  * per-center fan-out is the data's wedge count, an inherent quantity;
  * high-degree centers dominate and AQE skew-splits them). No driver
  * collection anywhere.
  *
  * Determinism: Adamic–Adar sums 1/ln(deg c) over common neighbors — a
  * float sum whose order differs between engines. Each term is rounded
  * to integer micro-units FIRST (the q32/q54 fixed-point pattern), so
  * the per-pair sum is an order-independent integer and hash-matches
  * any engine computing the same formula.
  */
object LinkPrediction {

  /** Pairs `(a < b)` at distance 2 with `cn` ≥ `minCommon` common
    * neighbors and no existing edge, with Adamic–Adar in micro-units:
    * `aa_micro = Σ_c round(1e6 / ln(deg c))`.
    * Output: `(a BIGINT, b BIGINT, cn BIGINT, aa_micro BIGINT)`.
    */
  def adamicAdar(edges: DataFrame, minCommon: Int = 2): DataFrame = {
    val sym = Traversals.symmetrize(edges).cutLineage()
    val deg = sym.groupBy(col("u").as("c")).agg(count("*").as("d"))
    // per-neighbor contribution of each center c, as an exact integer.
    // d >= 2: a degree-1 center can never close a wedge, and ln(1) = 0
    // would make the weight term undefined.
    val weighted = sym.select(col("u").as("c"), col("v").as("n"))
      .join(deg.where(col("d") >= 2), Seq("c"))
      .withColumn("w", round(lit(1000000.0) / log(col("d").cast("double"))).cast("long"))
    val left = weighted.select(col("c"), col("n").as("a"), col("w"))
    val right = weighted.select(col("c"), col("n").as("b"))
    val pairs = left.join(right, Seq("c"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count("*").as("cn"), sum(col("w")).as("aa_micro"))
      .where(col("cn") >= minCommon)
    // distance-2 only: drop pairs already connected
    val existing = sym.where(col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    pairs.join(existing, Seq("a", "b"), "left_anti")
  }

  /** Per-edge EMBEDDEDNESS — the tie-strength structure underneath
    * community detection (Granovetter; Easley–Kleinberg ch. 3): for each
    * canonical edge (u < v), the number of common neighbors `cn`, the
    * neighborhood-union size `un` = |N(u)\{v} ∪ N(v)\{u}|
    * = deg(u)+deg(v)−2−cn, and their ratio as a truncated micro-unit
    * Jaccard (`0` for the isolated-edge un = 0 case). An edge with
    * cn = 0 is a local bridge.
    *
    * Plan shape: the common-neighbor count is the k-truss support join —
    * one wedge join keyed on the shared endpoint then on (v, w), never
    * an all-pairs expansion; degrees broadcast when small. Exact integer
    * arithmetic throughout (Spark `div` ≡ DuckDB `//`).
    * Output: (u, v, cn, un, jaccard_mu).
    */
  def edgeEmbeddedness(edges: DataFrame, scale: Long = 1000000L): DataFrame = {
    val sym = Traversals.symmetrize(edges).cutLineage()
    val e = sym.where(col("u") < col("v"))
    val deg = sym.groupBy(col("u").as("x")).agg(count(lit(1)).as("d"))
    val nbrs = sym.select(col("u").as("x"), col("v").as("w"))
    val common = e
      .join(nbrs.toDF("u", "w"), Seq("u"))
      .join(nbrs.toDF("v", "w"), Seq("v", "w"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
    e.join(common, Seq("u", "v"), "left")
      .join(deg.toDF("u", "du"), Seq("u"))
      .join(deg.toDF("v", "dv"), Seq("v"))
      .select(col("u"), col("v"),
        coalesce(col("cn"), lit(0L)).as("cn"),
        (col("du") + col("dv") - lit(2L) - coalesce(col("cn"), lit(0L))).as("un"))
      .select(col("u"), col("v"), col("cn"), col("un"),
        when(col("un") > 0, expr(s"(cn * $scale) div un"))
          .otherwise(lit(0L)).as("jaccard_mu"))
  }
}
