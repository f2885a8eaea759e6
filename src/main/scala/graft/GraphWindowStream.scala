package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** Result of `GraphStream.slice` — per-vertex neighborhoods inside a
  * tumbling event-time window (reference: GS/GraphWindowStream.java:~35,
  * produced by GS/SimpleEdgeStream.java:~430).
  *
  * Built lazily: `keyed` derives (vid, nbr, value, ts) rows per direction;
  * each neighborhood method is then one `groupBy(window(ts), vid)`
  * aggregation. The emitted `win` column is the epoch second of the
  * window start (epoch-aligned tumbling windows), which is deterministic
  * and engine-portable.
  *
  * On a streaming DataFrame the same code runs under a watermark
  * (`GraphStream.withWatermark`) with append-mode emission at watermark
  * advance — the Spark equivalent of the reference's trigger-time window
  * evaluation.
  */
class GraphWindowStream(
    private val edges: DataFrame,
    val size: String,
    val direction: EdgeDirection,
    val slide: Option[String] = None) {

  // tumbling when no slide given; sliding windows assign each edge to
  // size/slide windows (Catalyst expands the window generator — no
  // self-join, one pass)
  private def win(c: Column): Column = slide match {
    case Some(sl) => window(c, size, sl)
    case None     => window(c, size)
  }

  /** Edge rows keyed by the vertex owning the neighborhood.
    * `All` duplicates each edge into both endpoints' neighborhoods, like
    * the reference's pre-keyBy flatMap (GS/SimpleEdgeStream.java:~430).
    */
  def keyed: DataFrame = {
    val others = edges.columns.filterNot(Set("src", "dst")).map(col)
    direction match {
      case EdgeDirection.Out =>
        edges.select((Seq(col("src").as("vid"), col("dst").as("nbr")) ++ others): _*)
      case EdgeDirection.In =>
        edges.select((Seq(col("dst").as("vid"), col("src").as("nbr")) ++ others): _*)
      case EdgeDirection.All =>
        edges
          .withColumn("__pair", explode(array(
            struct(col("src").as("vid"), col("dst").as("nbr")),
            struct(col("dst").as("vid"), col("src").as("nbr")))))
          .select((Seq(col("__pair.vid").as("vid"), col("__pair.nbr").as("nbr")) ++ others): _*)
    }
  }

  private def grouped = keyed.groupBy(win(col("ts")).as("w"), col("vid"))

  private def winStart: Column = unix_timestamp(col("w.start")).as("win")

  /** O18a — fold a vertex's windowed edges into an accumulator
    * (GS/GraphWindowStream.java:~50, iface GS/EdgesFold.java). Algebraic
    * folds are expressed as aggregate Columns (codegen'd, partial-agg'd);
    * arbitrary folds go through [[applyOnNeighbors]].
    */
  def foldNeighbors(agg: Column, more: Column*): DataFrame = {
    val out = grouped.agg(agg, more: _*)
    out.select((Seq(winStart, col("vid")) ++ out.columns.drop(2).map(col)): _*)
  }

  /** O18b — commutative reduce of edge values within a neighborhood
    * (GS/GraphWindowStream.java:~80, iface GS/EdgesReduce.java).
    */
  def reduceOnEdges(reduced: Column): DataFrame =
    foldNeighbors(reduced)

  /** O18c — arbitrary function over a vertex's fully materialized windowed
    * neighbor list (GS/GraphWindowStream.java:~105, iface
    * GS/EdgesApply.java). The neighbor list is materialized per
    * (window, vertex) group; prefer fold/reduce when the function is
    * algebraic — this variant buffers the whole neighborhood.
    */
  def applyOnNeighbors[T: Encoder](fn: (Long, Long, Seq[(Long, Double)]) => IterableOnce[T]): Dataset[T] =
    neighborhoods.flatMap { (r: Row) =>
      val win = r.getLong(0)
      val vid = r.getLong(1)
      val nbrs = r.getSeq[Row](2).map(n => (n.getLong(0), n.getDouble(1)))
      fn(win, vid, nbrs)
    }

  /** Windowed neighbor lists as a DataFrame (win, vid, neighbors). */
  def neighborhoods: DataFrame =
    grouped.agg(collect_list(struct(col("nbr"), col("value"))).as("neighbors"))
      .select(winStart, col("vid"), col("neighbors"))

  /** Materialize ONE window of the stream as a batch [[GraphStream]] —
    * the "snapshot" convenience the reference's slice() users reach for
    * (feed it to the batch operators: triangles, CC, PageRank via
    * [[graft.operators.Snapshots]]). `winStartEpochSec` is the epoch
    * second of the tumbling-window start, as emitted in the `win` column
    * of every windowed result. The window [start, start+size) contains
    * exactly the edges with `ts ∈ [start, start+size)` — tumbling or
    * sliding alike — so the filter is a plain range predicate on `ts`
    * (NOT on a computed window column): it reaches parquet
    * PushedFilters and prunes row groups before any operator sees a
    * row.
    */
  def snapshot(winStartEpochSec: Long): GraphStream = {
    val secs = GraphStream.windowSizeSeconds(size)
    GraphStream(edges.where(
      col("ts") >= timestamp_seconds(lit(winStartEpochSec)) &&
        col("ts") < timestamp_seconds(lit(winStartEpochSec + secs))))
  }

  /** Distinct window starts present in the stream (epoch seconds). */
  def windowStarts: DataFrame =
    edges.select(unix_timestamp(win(col("ts")).getField("start")).as("win"))
      .distinct()
}
