package graft

import graft.operators.Partitioning

/** Layout-quality checks: exact in-JVM replay of both strategies'
  * metrics, the 2D grid's degree-independent replication bound, and
  * degenerate inputs.
  */
class PartitioningSpec extends SparkTestBase {

  private val T = 2147483648L
  private def hash(v: Long): Long = ((v % T) * 2654435761L) % T

  test("layout metrics equal the in-JVM replay") {
    import spark.implicits._
    val es = (1L to 200L).map(i => (hash(i) % 40, hash(i * 7 + 3) % 40))
      .filter(e => e._1 != e._2).distinct
    val got = Partitioning.layoutQuality(es.toDF("src", "dst"), 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    def metrics(name: String, part: ((Long, Long)) => Long) = {
      val ep = es.map(e => (e, part(e)))
      val repl = ep.flatMap { case ((u, v), p) => Seq((u, p), (v, p)) }
        .distinct.groupBy(_._1).map { case (_, ps) => ps.size.toLong }
      val parts = ep.groupBy(_._2).map { case (_, xs) => xs.size.toLong }
      val (nv, rs, rm) = (repl.size.toLong, repl.sum, repl.max)
      (name, nv, rs, rm, rs * 1000000L / nv, parts.max,
        parts.max * 64L * 1000000L / es.size)
    }
    val expected = Set(
      metrics("hash1d", e => hash(e._1) % 64),
      metrics("grid2d", e => (hash(e._1) % 8) * 8 + hash(e._2) % 8))
    assert(got == expected)
  }

  test("grid2d replication is bounded by 2*side - 1 regardless of degree") {
    import spark.implicits._
    // a star: hub 0 with 300 leaves — the 1D layout replicates the hub
    // on up to P partitions, the grid on at most 2*8-1
    val es = (1L to 300L).map(i => (0L, i))
    val rows = Partitioning.layoutQuality(es.toDF("src", "dst"), 64).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("grid2d") <= 15)
  }

  test("empty input yields two FULLY-TYPED zero rows (no NULL metrics)") {
    import spark.implicits._
    val rows = Partitioning.layoutQuality(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 64).collect()
    assert(rows.length == 2)
    // every metric column must be a readable 0, not NULL — a getLong
    // reader of the degenerate row must not NPE (ADVICE r10)
    rows.foreach { r =>
      (1 to 6).foreach(i => assert(!r.isNullAt(i), s"col $i NULL in $r"))
      (1 to 6).foreach(i => assert(r.getLong(i) == 0L))
    }
  }
}
