package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-layout quality analytics — the numbers that decide how a
  * 100 TB edge set is physically partitioned BEFORE any iterative
  * operator runs (public framing: PowerGraph's vertex-cut analysis,
  * Gonzalez et al. OSDI 2012; the 1D vs 2D/grid comparison is the
  * GraphX partitioning-strategy menu).
  *
  * For a partitioner π over edges, a vertex v is REPLICATED across
  * every partition holding one of its edges; the average replication
  * factor is the communication multiplier every per-vertex message pays
  * (degrees, CC labels, PageRank mass all fan out to each replica).
  *   - 1D hash (π = h(src) mod P): out-edges of a vertex co-locate, but
  *     a high-degree DESTINATION is replicated on up to P partitions —
  *     replication grows with skew.
  *   - 2D grid (π = (h(src) mod √P) · √P + h(dst) mod √P): any vertex's
  *     edges touch at most 2√P − 1 partitions REGARDLESS of degree —
  *     the skew-proof bound that makes 2D the default at scale.
  *
  * This operator computes, exactly and engine-portably (the q191
  * multiplicative hash, integer micro-units — the DuckDB oracle replays
  * every number): per strategy, the replication-factor average and max,
  * and the edge-balance ratio max-partition/ideal. Output one row per
  * strategy: (strategy, n_verts, repl_sum, repl_max, repl_avg_micro,
  * max_part_edges, balance_micro).
  *
  * Scale shape: two aggregations per strategy (vertex-keyed distinct
  * partition count; partition-keyed edge count) over a single derived
  * column — no joins, no iteration; this ANALYZES the layout the
  * bucketed/partitioned writers ([[graft.sources.Sources]]) then
  * materialize.
  */
object Partitioning {

  private def h(c: org.apache.spark.sql.Column) =
    pmod(pmod(c, lit(2147483648L)) * lit(2654435761L), lit(2147483648L))

  /** Layout quality for 1D hash vs 2D grid over (src, dst) edges.
    * `parts` must be a perfect square (the grid side is √parts).
    */
  def layoutQuality(edges: DataFrame, parts: Int = 64): DataFrame = {
    val side = math.sqrt(parts.toDouble).toInt
    require(side * side == parts, s"parts=$parts must be a perfect square")
    val e = edges.select(col("src").cast("long").as("u"),
      col("dst").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val strategies = Seq(
      "hash1d" -> (h(col("u")) % parts),
      "grid2d" -> ((h(col("u")) % side) * side + h(col("v")) % side))
    strategies.map { case (name, part) =>
      val ep = e.select(col("u"), col("v"), part.as("p"))
      val repl = ep.select(col("u"), col("p"))
        .union(ep.select(col("v"), col("p")))
        .distinct()
        .groupBy("u").agg(count(lit(1)).as("r"))
        .agg(count(lit(1)).as("n_verts"), sum(col("r")).as("repl_sum"),
          max(col("r")).as("repl_max"))
      val bal = ep.groupBy("p").agg(count(lit(1)).as("pe"))
        .agg(max(col("pe")).as("max_part_edges"),
          sum(col("pe")).as("n_edges"))
      // degenerate (edgeless) input: the global aggs produce one row of
      // n_verts = 0 with NULL sum/max — emit fully-typed zeros instead
      // of NULL metrics that would NPE a getLong reader (ADVICE r10)
      repl.crossJoin(bal).select(
        lit(name).as("strategy"),
        col("n_verts"),
        coalesce(col("repl_sum"), lit(0L)).as("repl_sum"),
        coalesce(col("repl_max"), lit(0L)).as("repl_max"),
        expr("CASE WHEN n_verts = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE repl_sum * 1000000 div n_verts END").as("repl_avg_micro"),
        coalesce(col("max_part_edges"), lit(0L)).as("max_part_edges"),
        expr(s"CASE WHEN coalesce(n_edges, 0) = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE max_part_edges * $parts * 1000000 div n_edges END").as("balance_micro"))
    }.reduce(_ unionByName _)
  }
}
