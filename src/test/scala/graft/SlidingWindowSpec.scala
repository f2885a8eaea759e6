package graft

import org.apache.spark.sql.functions._

/** Sliding-window slice: generator semantics and tumbling equivalence. */
class SlidingWindowSpec extends SparkTestBase {

  test("slide == size reduces to the tumbling result") {
    val e = GraphStream(graft.model.GraphFixtures.edgeStream(spark, sf))
    val tumble = e.slice("30 days", EdgeDirection.Out)
      .foldNeighbors(count("*").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val slide = e.slice("30 days", "30 days", EdgeDirection.Out)
      .foldNeighbors(count("*").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tumble == slide)
  }

  test("size = 2×slide assigns every edge to exactly two windows") {
    val edges = edgeDf(Seq((1L, 2L), (3L, 4L), (5L, 6L)))
    // windows of 120s sliding 60s over ts at 0s, 60s, 120s
    val rows = GraphStream(edges).slice("120 seconds", "60 seconds", EdgeDirection.Out)
      .foldNeighbors(count("*").as("cnt"))
      .collect()
    // 3 edges × 2 windows each, all distinct (vid differs per edge)
    assert(rows.length == 6)
    val perVid = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(perVid == Map(1L -> 2, 3L -> 2, 5L -> 2))
    // window starts are epoch-aligned multiples of the slide covering ts
    val winsForV1 = rows.filter(_.getLong(1) == 1L).map(_.getLong(0)).sorted
    assert(winsForV1.sameElements(Array(-60L, 0L)))
  }
}
