package graft

import org.apache.spark.sql.functions._

import graft.operators.{Scc, Triangles}

/** SCC / condensation / directed-triad specs, each cross-checked
  * against a brute-force closure (Floyd–Warshall boolean reachability)
  * computed in plain Scala — the ground truth is the DEFINITION, not a
  * second implementation of the algorithm.
  */
class SccSpec extends SparkTestBase {

  /** Brute-force SCC ids by definition: reach via Floyd–Warshall, then
    * scc(v) = min{u : u ⇝ v ∧ v ⇝ u} ∪ {v}.
    */
  private def bruteScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = vs.zipWithIndex.toMap
    val n = vs.length
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k); j <- 0 until n)
      if (reach(k)(j)) reach(i)(j) = true
    vs.map { v =>
      val i = idx(v)
      val mutual = vs.filter(u => u == v || (reach(i)(idx(u)) && reach(idx(u))(i)))
      v -> mutual.min
    }.toMap
  }

  private def runScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    Scc.stronglyConnectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Deterministic pseudo-random directed graph (no Random: portable
    * arithmetic, same graph every run).
    */
  private def hashGraph(n: Int, m: Int, salt: Int): Seq[(Long, Long)] =
    (0 until m).flatMap { i =>
      val a = math.abs((i * 2654435761L + salt * 40503L) % n)
      val b = math.abs((i * 40503L + salt * 2654435761L + i * i) % n)
      if (a == b) None else Some((a, b))
    }.distinct

  test("scc: canonical shapes (path, cycle, shared-vertex cycles, figure-eight)") {
    // directed path — pure trim territory, every vertex a singleton
    val path = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(runScc(path) == bruteScc(path))
    // one cycle
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(runScc(cycle) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // two cycles sharing vertex 3 merge into one SCC (figure-eight)
    val eight = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L))
    assert(runScc(eight).values.toSet == Set(1L))
    // two cycles linked one-way stay separate SCCs — and force a second
    // peel round when the downstream cycle holds the smaller ids
    val chained = Seq((2L, 3L), (3L, 2L), (10L, 11L), (11L, 10L), (10L, 2L))
    assert(runScc(chained) == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("scc: self-loops and isolated leftovers are singletons") {
    val g = Seq((1L, 1L), (1L, 2L), (2L, 2L), (5L, 1L))
    assert(runScc(g) == Map(1L -> 1L, 2L -> 2L, 5L -> 5L))
  }

  test("scc: deterministic random graphs match the closure brute force") {
    for (salt <- 1 to 4) {
      val g = hashGraph(40, 120, salt)
      assert(runScc(g) == bruteScc(g), s"salt $salt")
    }
    // sparser regime — more DAG structure, exercises trim + multi-peel
    for (salt <- 5 to 7) {
      val g = hashGraph(60, 75, salt)
      assert(runScc(g) == bruteScc(g), s"salt $salt")
    }
  }

  test("condensation levels: sizes and longest-path depths by definition") {
    // chain of three 2-cycles: levels 0, 1, 2; plus a satellite singleton
    val g = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 6L), (6L, 5L),
      (1L, 3L), (3L, 5L), (7L, 5L))
    val lv = Scc.condensationLevels(edges = {
      import spark.implicits._; g.toDF("src", "dst")
    }).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lv == Set((1L, 2L, 0L), (3L, 2L, 1L), (5L, 2L, 2L), (7L, 1L, 0L)))
  }

  test("condensation levels: random graph vs brute-force longest path") {
    val g = hashGraph(30, 45, 9)
    val scc = bruteScc(g)
    val ce = g.map { case (a, b) => (scc(a), scc(b)) }.filter(e => e._1 != e._2).distinct
    // brute longest path by relaxation (DAG, so |C| rounds suffice)
    var level = scc.values.toSeq.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to level.size)
      ce.foreach { case (s, d) =>
        if (level(s) + 1 > level(d)) level = level.updated(d, level(s) + 1)
      }
    val sizes = scc.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val expect = level.map { case (c, l) => (c, sizes(c), l) }.toSet
    val got = Scc.condensationLevels(edges = {
      import spark.implicits._; g.toDF("src", "dst")
    }).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("directed triad census: counts by brute-force triple enumeration") {
    val g = hashGraph(14, 60, 3)
    val es = g.toSet
    val vs = g.flatMap(e => Seq(e._1, e._2)).distinct
    val recip = es.count { case (a, b) => es((b, a)) }
    val cycles = (for {
      a <- vs; b <- vs if es((a, b)) && a < b
      c <- vs if es((b, c)) && es((c, a)) && a < c
    } yield 1).size
    val ffl = (for {
      a <- vs; b <- vs if es((a, b))
      c <- vs if es((b, c)) && es((a, c)) && a != c
    } yield 1).size
    import spark.implicits._
    val row = Triangles.directedTriadCensus(g.toDF("src", "dst")).head()
    assert(row.getLong(0) == es.size.toLong)
    assert(row.getLong(1) == recip.toLong)
    assert(row.getLong(2) == cycles.toLong)
    assert(row.getLong(3) == ffl.toLong)
  }
}
