package graft

import graft.operators.Salting

/** Salted two-phase aggregations must be value-identical to their
  * single-phase forms — the salt only re-routes rows, never changes the
  * aggregate (q91 enforces the same for degrees under the driver oracle).
  */
class SaltingSpec extends SparkTestBase {

  test("salted degrees equal single-phase degrees (dup edges included)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L), (1L, 5L), (1L, 2L))
      .toDF("src", "dst")
    val plain = GraphStream(edges).getDegrees.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (salts <- Seq(1, 4, 16)) {
      val salted = Salting.saltedDegrees(edges, salts).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(salted == plain, s"salts=$salts")
    }
  }

  test("salted adjacency equals single-phase adjacency") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L), (1L, 5L), (1L, 2L))
      .toDF("src", "dst")
    val plain = Salting.plainAdjacency(edges).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = Salting.saltedAdjacency(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted == plain)
  }
}
