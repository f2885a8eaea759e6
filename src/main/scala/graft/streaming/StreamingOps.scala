package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.GraphStream
import graft.summaries.{DisjointSet, ParityDisjointSet}

/** Structured-Streaming forms of the graph operators.
  *
  * The batch operators in [[graft.GraphStream]] are already pure Catalyst
  * rewrites, so most of them run unchanged on a streaming DataFrame:
  * degrees/counts in update mode, slice()/neighborhood folds in append
  * mode under a watermark (the reference assumes ascending event time —
  * watermark "0 seconds" reproduces that contract,
  * GS/SimpleEdgeStream.java:~75).
  *
  * What needs explicit state is the reference's `transientState=false`
  * mode (GS/GraphAggregation.java:~30: carry the summary across windows
  * forever). That is `flatMapGroupsWithState`: per-trigger partial
  * summaries merge into keyed state — below, the running connected
  * components. Keying by a constant reproduces the reference's
  * parallelism-1 merger (GS/WindowGraphAggregation.java:~45); the
  * per-partition partial fold stays distributed.
  */
object StreamingOps {

  private implicit val dsEnc: Encoder[DisjointSet] = Encoders.javaSerialization[DisjointSet]

  /** Continuously-refined connected components over a (possibly
    * streaming) edge DataFrame. Emits the full (vertex, component)
    * assignment each trigger (update mode downstream).
    */
  def runningConnectedComponents(edges: DataFrame): Dataset[(Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(Long, Long)], state: GroupState[DisjointSet]) =>
          val summary = state.getOption.getOrElse(new DisjointSet)
          it.foreach { case (s, d) => summary.union(s, d) }
          state.update(summary)
          summary.components.iterator
      }
  }

  private implicit val pdsEnc: Encoder[ParityDisjointSet] =
    Encoders.javaSerialization[ParityDisjointSet]

  /** Continuously-refined bipartiteness over a (possibly streaming) edge
    * stream — the reference's BipartitenessCheck with its absorbing
    * not-bipartite state (GS/library/BipartitenessCheck.java:~40).
    * Emits the current verdict each trigger.
    */
  def runningBipartiteness(edges: DataFrame): Dataset[Boolean] = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[(Long, Long)], state: GroupState[ParityDisjointSet]) =>
          val summary = state.getOption.getOrElse(new ParityDisjointSet)
          it.foreach { case (s, d) => summary.addEdge(s, d) }
          state.update(summary)
          Iterator.single(summary.isBipartite)
      }
  }

  /** Running degree table (update mode): identical plan to the batch
    * `getDegrees` — Structured Streaming keeps the per-key counts in the
    * state store and emits changed rows per trigger.
    */
  def runningDegrees(gs: GraphStream): DataFrame = gs.getDegrees

  /** Per-window neighborhood aggregation with watermark-driven append
    * emission; `delay = "0 seconds"` matches the reference's
    * ascending-timestamp assumption.
    */
  def windowedDegrees(gs: GraphStream, size: String, delay: String = "0 seconds"): DataFrame =
    gs.withWatermark(delay)
      .slice(size, graft.EdgeDirection.All)
      .foldNeighbors(count("*").as("degree"))

  /** O20 with `transientState=true` on a stream: an independent
    * connected-components summary per tumbling event-time window,
    * emitted on window close (append mode). The same call works on a
    * batch DataFrame (the watermark is a no-op there).
    * Output: (win, id, component) with `win` = epoch second of window
    * start.
    */
  def windowedConnectedComponents(edges: DataFrame, size: String,
                                  delay: String = "0 seconds"): DataFrame = {
    val ccUdaf = org.apache.spark.sql.functions.udaf(
      new graft.operators.ConnectedComponentsAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    edges.withWatermark("ts", delay)
      .groupBy(window(col("ts"), size).as("w"))
      .agg(ccUdaf(col("src"), col("dst")).as("m"))
      .select(unix_timestamp(col("w.start")).as("win"), explode(col("m")))
      .toDF("win", "id", "component")
  }
}
