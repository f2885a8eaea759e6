package graft

import graft.operators.Walks

/** Deterministic-walk checks: the distributed walk must equal a plain
  * in-JVM replay of the hash-argmin rule (which also implies validity:
  * every step moves to an adjacent vertex), and repeated runs are
  * bit-identical.
  */
class WalksSpec extends SparkTestBase {

  private val T = 2147483648L
  private def h(c: Long, t: Long, n: Long): Long =
    ((((c % T * 31 + t) % T) * 31 + n) % T * 2654435761L) % T

  test("deterministic walks equal the in-JVM hash-argmin replay") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (10L, 11L))
    val edges = es.toDF("src", "dst")
    val len = 5
    val got = Walks.deterministicWalks(edges, len).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val adj: Map[Long, Seq[Long]] = (es ++ es.map(e => (e._2, e._1)))
      .filter(e => e._1 != e._2).distinct
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
    val expected = adj.keySet.flatMap { start =>
      var cur = start
      (0 to len).map { t =>
        if (t > 0) cur = adj(cur).minBy(n => (h(cur, t, n), n))
        (start, t.toLong, cur)
      }
    }
    assert(got == expected)
    // walk validity rides the replay, but assert it independently too
    val bySt = got.groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2).map(_._3))
    bySt.foreach { case (_, path) =>
      assert(path.length == len + 1)
      path.sliding(2).foreach { case Seq(a, b) => assert(adj(a).contains(b)) }
    }
    // determinism: a second run is bit-identical
    val again = Walks.deterministicWalks(edges, len).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got)
  }

  test("zero-length walks emit exactly the start vertices") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Walks.deterministicWalks(edges, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 3L)))
  }

  test("biased walks equal the in-JVM second-order replay") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (4L, 5L),
      (5L, 6L), (10L, 11L))
    val edges = es.toDF("src", "dst")
    val len = 6
    val (fR, fN, fF) = (4L, 1L, 2L)
    val got = Walks.biasedWalks(edges, len, fR, fN, fF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sym = (es ++ es.map(e => (e._2, e._1))).filter(e => e._1 != e._2).distinct
    val adj: Map[Long, Seq[Long]] =
      sym.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
    val edgeSet = sym.toSet
    val expected = adj.keySet.flatMap { start =>
      var cur = start
      var prev = start
      (0 to len).map { t =>
        if (t == 1) { prev = start; cur = adj(cur).minBy(n => (h(cur, 1, n), n)) }
        else if (t >= 2) {
          val c0 = cur
          val next = adj(c0).minBy { n =>
            val f = if (n == prev) fR
              else if (edgeSet.contains((prev, n))) fN else fF
            (h(c0, t, n) * f, n)
          }
          prev = c0; cur = next
        }
        (start, t.toLong, cur)
      }
    }
    assert(got == expected)
    // determinism
    val again = Walks.biasedWalks(edges, len, fR, fN, fF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got)
  }

  test("biased walks: a huge return factor forbids immediate backtracks") {
    import spark.implicits._
    // path graph — interior vertices always have a non-return option
    val es = (1L to 9L).map(i => (i, i + 1))
    val edges = es.toDF("src", "dst")
    val walks = Walks.biasedWalks(edges, 6, fReturn = 1000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val deg = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1).map {
      case (u, vs) => u -> vs.map(_._2).distinct.size
    }
    walks.groupBy(_._1).foreach { case (_, rows) =>
      val path = rows.sortBy(_._2).map(_._3).toList
      path.sliding(3).foreach { case List(a, b, c) =>
        if (deg(b) >= 2) assert(c != a,
          s"backtrack $a->$b->$c despite a non-return option at $b")
      case _ => ()
      }
    }
  }
}
