package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-phase (salted) skew-safe aggregations for power-law graphs.
  *
  * A `groupBy(vertex)` routes every row of a hot key through one
  * reducer; on a Zipf-distributed edge list the head vertex can own a
  * double-digit percent of all rows, so that one reducer becomes the
  * stage. Salting splits each key into `salts` sub-groups (salt = hash
  * of the OTHER endpoint — deterministic, no RNG, reproducible on any
  * engine), aggregates the sub-groups in parallel, then merges the
  * ≤`salts` sub-aggregates per key — bounding any reducer's share of a
  * hub at ~1/salts.
  *
  * When to use which (measured in ScaleSmoke's `salt` mode, SCALE.md):
  *  - count/sum-like aggs: Spark's map-side partial aggregation already
  *    compresses a hub to ≤#partitions partial rows — [[saltedDegrees]]
  *    exists as the parity-checked template (q91 = q03's oracle), not a
  *    speedup at local scale.
  *  - holistic aggs (collect_list/collect_set) whose partials are as
  *    large as their inputs: partial aggregation cannot compress them,
  *    the hub's whole neighbor list lands in one task buffer — THE salted
  *    case, [[saltedAdjacency]].
  */
object Salting {

  private def ends(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("id"), col("dst").cast("long").as("peer"))
      .unionAll(edges.select(col("dst").cast("long"), col("src").cast("long")))

  /** (id, degree) over the undirected view — result identical to
    * `GraphStream.getDegrees`, plan salted two-phase.
    */
  def saltedDegrees(edges: DataFrame, salts: Int = 16): DataFrame =
    ends(edges)
      .groupBy(col("id"), pmod(xxhash64(col("peer")), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("d"))
      .groupBy("id").agg(sum("d").as("degree"))

  /** (id, nbrs) undirected adjacency lists with per-reducer hub share
    * bounded at ~1/salts; `nbrs` is sorted for deterministic output.
    */
  def saltedAdjacency(edges: DataFrame, salts: Int = 16): DataFrame =
    ends(edges)
      .groupBy(col("id"), pmod(xxhash64(col("peer")), lit(salts)).as("salt"))
      .agg(collect_list(col("peer")).as("part"))
      .groupBy("id").agg(array_sort(flatten(collect_list(col("part")))).as("nbrs"))

  /** Plain single-phase adjacency — the baseline the smoke compares
    * against (hub list materializes in one reducer).
    */
  def plainAdjacency(edges: DataFrame): DataFrame =
    ends(edges).groupBy("id").agg(array_sort(collect_list(col("peer"))).as("nbrs"))
}
