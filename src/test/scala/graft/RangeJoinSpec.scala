package graft

import graft.operators.{DegreeMetrics, RangeJoin}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  test("point-in-interval: boundaries, multi-bin spans, zero-match intervals") {
    import spark.implicits._
    val iv = Seq(
      (1L, 100L, 200L),  // [100,200): 100 in, 199 in, 200 OUT
      (2L, 150L, 450L),  // spans 4 bins of width 100
      (3L, 900L, 950L))  // no points
      .toDF("i_id", "lo", "hi")
    val pts = Seq(
      (10L, 100L), (11L, 199L), (12L, 200L),
      (13L, 449L), (14L, 450L), (15L, 300L))
      .toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(pts, iv, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (2L, 13L), (2L, 15L)),
      s"got $got")
    val cnt = RangeJoin.countPerInterval(pts, iv, 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cnt == Map(1L -> 2L, 2L -> 4L, 3L -> 0L), s"got $cnt")
    // bin width is a performance knob, never a correctness one
    for (bin <- Seq(1L, 7L, 1000L)) {
      val g2 = RangeJoin.pointInInterval(pts, iv, bin, maxBinsPerInterval = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(g2 == got, s"bin=$bin changed the result")
    }
    // fail-loud expansion fence
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, iv, 1L, maxBinsPerInterval = 4)
    }
  }

  test("reciprocity counts mutual arcs once each, drops loops and dups") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L), (1L, 2L))
      .toDF("src", "dst")
    val r = DegreeMetrics.reciprocity(e).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 666666L)),
      s"got $r")
  }
}
