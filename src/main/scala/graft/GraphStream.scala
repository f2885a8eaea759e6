package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Direction of the neighborhood a vertex sees, mirroring Gelly's
  * `EdgeDirection` (used by slice — GS/SimpleEdgeStream.java:~430).
  */
sealed trait EdgeDirection
object EdgeDirection {
  case object In  extends EdgeDirection
  case object Out extends EdgeDirection
  case object All extends EdgeDirection
}

/** Spark-native re-expression of the reference's graph-stream API
  * (`GraphStream` / `SimpleEdgeStream`,
  * GS/GraphStream.java:~40 and GS/SimpleEdgeStream.java — see SURVEY §2.1).
  *
  * A graph IS an unbounded stream of edge events (insert-only, vertices
  * derived). We model the stream as a DataFrame with columns
  * `(src BIGINT, dst BIGINT, value DOUBLE, ts TIMESTAMP, …extras)`.
  * Every method here is a pure Catalyst rewrite — no driver-side state,
  * no RDDs — so the SAME code path serves batch DataFrames and Structured
  * Streaming DataFrames (the reference's streaming semantics are recovered
  * by passing a streaming `edges` plus a watermark, see
  * [[graft.streaming.StreamingOps]]).
  *
  * Scale notes: degree/count operators are single-shuffle hash aggregates
  * with map-side partial aggregation (Catalyst does partial+final
  * automatically — the same topology as the reference's per-partition
  * fold + merge in GS/WindowGraphAggregation.java:~45, but without its
  * parallelism-1 merge bottleneck: the final agg is distributed by key).
  */
class GraphStream(val edges: DataFrame) {
  require(Set("src", "dst").subsetOf(edges.columns.toSet),
    s"edge stream needs src/dst columns, got [${edges.columns.mkString(", ")}]")

  /** O1 — raw edge stream (GS/SimpleEdgeStream.java:~90). */
  def getEdges: DataFrame = edges

  /** O2 — continuously-derived distinct endpoint ids
    * (GS/SimpleEdgeStream.java:~100). Vertices are never stored — they are
    * an aggregation over the edge stream.
    */
  def getVertices: DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id")).dropDuplicates("id")

  /** O3 — vertex count (GS/SimpleEdgeStream.java:~130). */
  def numberOfVertices: DataFrame =
    getVertices.agg(count("*").as("n_vertices"))

  /** O4 — edge count (GS/SimpleEdgeStream.java:~150). */
  def numberOfEdges: DataFrame =
    edges.agg(count("*").as("n_edges"))

  /** O5 — degree per vertex, both directions
    * (GS/SimpleEdgeStream.java:~170). One explode + one hash aggregate;
    * partial aggregation keeps the shuffle at |V| not |E|.
    */
  def getDegrees: DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").agg(count("*").as("degree"))

  /** O6 (GS/SimpleEdgeStream.java:~185). */
  def getInDegrees: DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count("*").as("in_degree"))

  /** O7 (GS/SimpleEdgeStream.java:~180). */
  def getOutDegrees: DataFrame =
    edges.groupBy(col("src").as("id")).agg(count("*").as("out_degree"))

  /** O8 — transform the edge value (GS/SimpleEdgeStream.java:~210).
    * Takes a Column expression over the edge row (may reference extra
    * attribute columns), keeping the operator inside whole-stage codegen —
    * no lambda/UDF deopt.
    */
  def mapEdges(value: Column): GraphStream =
    new GraphStream(edges.withColumn("value", value))

  /** O8 lambda form — the reference's arbitrary `MapFunction`
    * (GS/SimpleEdgeStream.java:~210): any Scala over the canonical typed
    * edge. Distributed like any Dataset.map, but it deserializes rows and
    * drops extra attribute columns — prefer the Column form (codegen'd,
    * keeps extras) whenever the transform is expressible.
    */
  def mapEdges(f: graft.model.Edge => graft.model.Edge): GraphStream = {
    val spark = edges.sparkSession
    import spark.implicits._
    new GraphStream(canonical.as[graft.model.Edge].map(f).toDF())
  }

  /** O9 — predicate on edges (GS/SimpleEdgeStream.java:~240). A Catalyst
    * predicate: pushes down to the parquet scan when possible.
    */
  def filterEdges(p: Column): GraphStream =
    new GraphStream(edges.filter(p))

  /** O9 lambda form — arbitrary `FilterFunction`
    * (GS/SimpleEdgeStream.java:~240) over the canonical typed edge. Same
    * trade as the mapEdges lambda form: no predicate pushdown, extras
    * dropped — for predicates Catalyst can't express.
    */
  def filterEdges(f: graft.model.Edge => Boolean): GraphStream = {
    val spark = edges.sparkSession
    import spark.implicits._
    new GraphStream(canonical.as[graft.model.Edge].filter(f).toDF())
  }

  private def canonical: DataFrame =
    edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
      col("value").cast("double").as("value"), col("ts").cast("timestamp").as("ts"))

  /** O10 — keep edges whose BOTH endpoints satisfy a vertex predicate
    * (GS/SimpleEdgeStream.java:~255).
    */
  def filterVertices(p: Column => Column): GraphStream =
    new GraphStream(edges.filter(p(col("src")) && p(col("dst"))))

  /** O11 — dedup edges by (src,dst) (GS/SimpleEdgeStream.java:~280).
    * Streaming: `dropDuplicates` keyed state with watermark TTL.
    */
  def distinct: GraphStream =
    new GraphStream(edges.dropDuplicates("src", "dst"))

  /** O12 — flip edge direction (GS/SimpleEdgeStream.java:~300). */
  def reverse: GraphStream = {
    val others = edges.columns.filter(c => c != "src" && c != "dst").map(col)
    new GraphStream(edges.select(
      (Seq(col("dst").as("src"), col("src").as("dst")) ++ others): _*))
  }

  /** O13 — emit each edge in both directions
    * (GS/SimpleEdgeStream.java:~310).
    */
  def undirected: GraphStream =
    new GraphStream(edges.unionByName(reverse.edges))

  /** O14 — merge two edge streams, bag semantics like the reference
    * (GS/SimpleEdgeStream.java:~330).
    */
  def union(other: GraphStream): GraphStream =
    new GraphStream(edges.unionByName(other.edges))

  /** O15 — continuous global fold over all edges
    * (GS/SimpleEdgeStream.java:~360). Any Spark aggregate expressions,
    * including custom `Aggregator.toColumn`s; Catalyst plans partial
    * per-partition aggregation + a final single-partition merge of tiny
    * partials — exactly the reference's topology, fault-tolerant for free.
    */
  def globalAggregate(agg: Column, more: Column*): DataFrame =
    edges.agg(agg, more: _*)

  /** O16 — run a mergeable graph-summary aggregation (delegates like
    * GS/SimpleEdgeStream.java:~400; see [[graft.operators]] for the
    * summary `Aggregator`s: connected components, bipartiteness, spanner).
    */
  def aggregate(summary: Column): DataFrame =
    edges.agg(summary)

  /** Event-time watermark for streaming inputs; the reference instead
    * assumes ascending timestamps (GS/SimpleEdgeStream.java:~75), i.e.
    * zero lateness — declare `"0 seconds"` for exact parity.
    */
  def withWatermark(delay: String): GraphStream =
    new GraphStream(edges.withWatermark("ts", delay))

  /** O17 — per-vertex neighborhoods inside a tumbling event-time window
    * (GS/SimpleEdgeStream.java:~430). `All` duplicates each edge both ways
    * before keying, like the reference.
    */
  def slice(size: String, direction: EdgeDirection = EdgeDirection.Out): GraphWindowStream =
    new GraphWindowStream(edges, size, direction)

  /** Sliding variant of [[slice]]: windows of `size` every `slide`
    * (epoch-aligned, like the tumbling form). Each edge lands in
    * size/slide neighborhoods — Catalyst's window generator expands it
    * in one pass, no self-join. The reference ships tumbling windows
    * only (SURVEY §1.1); sliding is the natural generalization users of
    * `slice` ask for first.
    */
  def slice(size: String, slide: String, direction: EdgeDirection): GraphWindowStream =
    new GraphWindowStream(edges, size, direction, Some(slide))

  /** Materialize ONE tumbling window of the stream as a batch
    * [[GraphStream]] — the "snapshot" companion to [[slice]]: where
    * slice keeps all windows flowing, snapshot pins the window whose
    * epoch-aligned start contains `atEpochSec` so the full batch
    * operator surface (triangles, CC, spanner, …) can run on it. The
    * time predicate is a pushed-down range filter on `ts` — at scale it
    * prunes partitions/row groups before any operator sees a row.
    */
  def snapshot(size: String, atEpochSec: Long): GraphStream = {
    val secs = GraphStream.windowSizeSeconds(size)
    val start = math.floorDiv(atEpochSec, secs) * secs
    // plain range predicate on the ts column (not on a function of it),
    // so parquet row-group pruning / PushedFilters apply
    new GraphStream(edges.where(
      col("ts") >= timestamp_seconds(lit(start)) &&
        col("ts") < timestamp_seconds(lit(start + secs))))
  }
}

object GraphStream {
  def apply(edges: DataFrame): GraphStream = new GraphStream(edges)

  /** Parse a window-size interval string to whole seconds, rejecting
    * calendar-month and sub-second sizes (neither is epoch-alignable).
    */
  private[graft] def windowSizeSeconds(size: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(size))
    require(iv.months == 0, s"snapshot: calendar-month windows are not epoch-alignable: $size")
    require(iv.microseconds % 1000000L == 0,
      s"snapshot: window size must be a whole number of seconds: $size")
    val secs = iv.days * 86400L + iv.microseconds / 1000000L
    require(secs > 0, s"snapshot: window size must be positive: $size")
    secs
  }
}
