package graft

import org.apache.spark.sql.functions._

/** t1 smoke — per-operator unit tests on hand-coded graphs, mirroring the
  * reference's test style (SURVEY §5: TestMapEdges/TestFilterEdges/…).
  */
class GraphStreamSpec extends SparkTestBase {

  // 1→2, 1→3, 2→3, 3→4, 4→1, plus duplicate 1→2
  private lazy val g = GraphStream(edgeDf(Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 2L))))

  test("getVertices returns distinct endpoints") {
    val vs = g.getVertices.collect().map(_.getLong(0)).toSet
    assert(vs == Set(1L, 2L, 3L, 4L))
  }

  test("numberOfVertices / numberOfEdges") {
    assert(g.numberOfVertices.head.getLong(0) == 4L)
    assert(g.numberOfEdges.head.getLong(0) == 6L)
  }

  test("getDegrees counts both directions, bag semantics") {
    val d = g.getDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 2L))
  }

  test("in/out degrees") {
    val outD = g.getOutDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inD = g.getInDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(outD == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(inD == Map(2L -> 2L, 3L -> 2L, 4L -> 1L, 1L -> 1L))
  }

  test("mapEdges rewrites value column") {
    val m = g.mapEdges(col("value") * 10)
    assert(m.edges.agg(sum("value")).head.getDouble(0) == 60.0)
  }

  test("filterEdges / filterVertices") {
    assert(g.filterEdges(col("src") === 1).numberOfEdges.head.getLong(0) == 3L)
    // drop vertex 1: only edges among {2,3,4} survive
    val fv = g.filterVertices(id => id =!= 1)
    assert(collectPairs(fv.edges.select("src", "dst")) == Set((2L, 3L), (3L, 4L)))
  }

  test("lambda mapEdges / filterEdges match the Column forms") {
    import graft.model.Edge
    val mapped = g.mapEdges((e: Edge) => e.copy(value = e.value * 10))
    assert(mapped.edges.agg(sum("value")).head.getDouble(0) == 60.0)
    val filtered = g.filterEdges((e: Edge) => e.src == 1L)
    assert(filtered.numberOfEdges.head.getLong(0) == 3L)
    // arbitrary logic a Column couldn't express stays distributed
    val parity = g.filterEdges((e: Edge) => (e.src + e.dst) % 2 == 1)
    assert(parity.numberOfEdges.head.getLong(0) ==
      g.filterEdges((col("src") + col("dst")) % 2 === 1).numberOfEdges.head.getLong(0))
  }

  test("snapshot materializes one window as a batch GraphStream") {
    // edges at ts = 0,60,...,300s; 2-minute tumbling windows
    val sliced = g.slice("2 minutes", EdgeDirection.Out)
    val wins = sliced.windowStarts.collect().map(_.getLong(0)).toSet
    assert(wins == Set(0L, 120L, 240L))
    // window [0,120s): edges at ts 0s and 60s → (1,2) and (1,3)
    val snap = sliced.snapshot(0L)
    assert(collectPairs(snap.edges.select("src", "dst")) == Set((1L, 2L), (1L, 3L)))
    // a snapshot is a full GraphStream: batch operators run on it
    assert(snap.getDegrees.count() == 3)
  }

  test("windowed snapshot pushes a ts range filter to the parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_pushdown").toString
    (0 until 600).map(i => (i.toLong, i.toLong + 1, 1.0,
        new java.sql.Timestamp(i * 1000L)))
      .toDF("src", "dst", "value", "ts")
      .write.mode("overwrite").parquet(dir)
    val gs = GraphStream(spark.read.parquet(dir))
    val snap = gs.slice("2 minutes", EdgeDirection.Out).snapshot(120L)
    // the filter is a plain ts range (not a computed window column), so
    // it must reach the scan as PushedFilters — row groups prune at scale
    val plan = snap.edges.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"), pushed)
    // and the rows are exactly window [120, 240)
    assert(snap.edges.count() == 120L)
    assert(snap.edges.agg(min("src"), max("src")).as[(Long, Long)].head() == ((120L, 239L)))
  }

  test("distinct dedups (src,dst)") {
    assert(g.distinct.numberOfEdges.head.getLong(0) == 5L)
  }

  test("reverse flips, undirected doubles, reverse∘reverse = id") {
    assert(collectPairs(g.reverse.edges.select("src", "dst")) ==
      Set((2L, 1L), (3L, 1L), (3L, 2L), (4L, 3L), (1L, 4L)))
    assert(g.undirected.numberOfEdges.head.getLong(0) == 12L)
    assert(collectPairs(g.reverse.reverse.edges.select("src", "dst")) ==
      collectPairs(g.edges.select("src", "dst")))
  }

  test("undirected degrees are 2x directed degrees") {
    val d = g.getDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u = g.undirected.getDegrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u == d.map { case (k, v) => k -> v * 2 })
  }

  test("union has bag semantics like the reference") {
    val u = g.union(g)
    assert(u.numberOfEdges.head.getLong(0) == 12L)
    assert(u.numberOfVertices.head.getLong(0) == 4L)
  }

  test("globalAggregate folds over all edges") {
    val r = g.globalAggregate(count("*").as("n"), sum("value").as("s")).head
    assert(r.getLong(0) == 6L && r.getDouble(1) == 6.0)
  }

  test("slice Out: per-vertex per-window reduce") {
    // 60s-spaced edges, 2-minute tumbling windows → edges 0,1 | 2,3 | 4,5
    val r = g.slice("2 minutes", EdgeDirection.Out)
      .foldNeighbors(count("*").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(r((0L, 1L)) == 2L)   // window 0: edges 1→2, 1→3
    assert(r((240L, 4L)) == 1L) // window 2: 4→1
    assert(r((240L, 1L)) == 1L) // window 2: dup 1→2
  }

  test("slice All duplicates edges into both neighborhoods") {
    val r = GraphStream(edgeDf(Seq((1L, 2L))))
      .slice("1 hour", EdgeDirection.All)
      .foldNeighbors(count("*").as("cnt"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L))
  }

  test("applyOnNeighbors (O18c): arbitrary fn over materialized neighbor lists") {
    import spark.implicits._
    // emit (vid, nbr) for the max-valued neighbor per vertex per window
    val out = g.slice("1 hour", EdgeDirection.Out)
      .applyOnNeighbors[(Long, Long, Double)] { (win, vid, nbrs) =>
        val (n, v) = nbrs.maxBy { case (n, v) => (v, n) }
        Iterator((vid, n, v))
      }.collect().map(t => t._1 -> t._2).toMap
    // all edges in one window; per src the max neighbor (value all 1.0 → max nbr id)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
  }

  test("anti join: source vertices (no incoming edges)") {
    // g has cycle 1→2,1→3,2→3,3→4,4→1 — every vertex has an in-edge;
    // drop 4→1 and vertex 1 becomes the only source
    val acyclic = GraphStream(g.edges.where(!(col("src") === 4 && col("dst") === 1)))
    val sources = acyclic.getOutDegrees
      .join(acyclic.getInDegrees, Seq("id"), "left_anti")
    assert(sources.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("set ops: intersect/except on edge sets") {
    val a = edgeDf(Seq((1L, 2L), (2L, 3L), (3L, 4L))).select("src", "dst")
    val b = edgeDf(Seq((2L, 3L), (3L, 4L), (4L, 5L))).select("src", "dst")
    assert(collectPairs(a.intersect(b)) == Set((2L, 3L), (3L, 4L)))
    assert(collectPairs(a.except(b)) == Set((1L, 2L)))
    assert(collectPairs(a.union(b).distinct()) ==
      Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
  }
}
