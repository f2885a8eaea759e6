package graft

import graft.operators.HyperBall

/** HyperBall checks: the distributed register rounds must equal a plain
  * in-JVM replay (BFS balls → bucket/rank registers → the exact-integer
  * estimator), estimates are monotone in t, and degenerate inputs hold.
  */
class HyperBallSpec extends SparkTestBase {

  private val T = 2147483648L
  private def hash(v: Long): Long = ((v % T) * 2654435761L) % T
  private def rho(y: Long): Int =
    if (y == 0) 28 else 28 - (64 - java.lang.Long.numberOfLeadingZeros(y))

  private def jvmEst(adj: Map[Long, Set[Long]], k: Int): Set[(Long, Long, Long)] = {
    val verts = adj.keySet
    verts.flatMap { v =>
      var ball = Set(v)
      (1 to k).map { t =>
        ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Set.empty))
        val regs = Array.fill(16)(0)
        ball.foreach { u =>
          val h = hash(u); val b = (h % 16).toInt; val r = rho(h / 16)
          if (r > regs(b)) regs(b) = r
        }
        val denom = regs.map(r => 1L << (28 - r)).sum
        (v, t.toLong, 46246722929L / denom)
      }
    }
  }

  test("ball sizes equal the in-JVM BFS-ball register replay") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 6L),
      (7L, 8L), (20L, 21L), (21L, 22L))
    val edges = es.toDF("src", "dst")
    val got = HyperBall.ballSizes(edges, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sym = (es ++ es.map(e => (e._2, e._1))).filter(e => e._1 != e._2)
    val adj = sym.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    assert(got == jvmEst(adj, 3))
  }

  test("estimates are monotone nondecreasing in t") {
    import spark.implicits._
    val es = (1L to 30L).map(i => (i, i % 30 + 1)) // a 30-cycle
    val got = HyperBall.ballSizes(es.toDF("src", "dst"), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byT = rows.sortBy(_._2).map(_._3).toList
      byT.sliding(2).foreach { case List(a, b) => assert(b >= a) case _ => () }
    }
  }

  test("harmonic centrality equals the in-JVM ball-difference replay") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 6L),
      (7L, 8L))
    val got = HyperBall.harmonicCentrality(es.toDF("src", "dst"), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sym = (es ++ es.map(e => (e._2, e._1))).filter(e => e._1 != e._2)
    val adj = sym.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    def estOf(ball: Set[Long]): Long = {
      val regs = Array.fill(16)(0)
      ball.foreach { u =>
        val h = hash(u); val b = (h % 16).toInt; val r = rho(h / 16)
        if (r > regs(b)) regs(b) = r
      }
      46246722929L / regs.map(r => 1L << (28 - r)).sum
    }
    val expected = adj.keySet.map { v =>
      var ball = Set(v)
      var prev = estOf(ball)
      var hc = 0L
      (1 to 3).foreach { t =>
        ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Set.empty))
        val e = estOf(ball)
        hc += (e - prev) * 1000000L / t
        prev = e
      }
      (v, hc)
    }
    assert(got == expected)
  }

  test("distance distribution equals the in-JVM sum/interpolation replay") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 6L),
      (7L, 8L), (20L, 21L), (21L, 22L))
    val k = 3
    val got = HyperBall.distanceDistribution(es.toDF("src", "dst"), k)
      .collect()
    assert(got.length == 1)
    val r = got.head
    // in-JVM: exact BFS balls → registers → estimator sums → the same
    // integer interpolations
    val sym = (es ++ es.map(e => (e._2, e._1))).filter(e => e._1 != e._2)
    val adj = sym.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    def estOf(ball: Set[Long]): Long = {
      val regs = Array.fill(16)(0)
      ball.foreach { u =>
        val h = hash(u); val b = (h % 16).toInt; val rr = rho(h / 16)
        if (rr > regs(b)) regs(b) = rr
      }
      46246722929L / regs.map(x => 1L << (28 - x)).sum
    }
    val s = Array.fill(k + 1)(0L)
    adj.keySet.foreach { v =>
      var ball = Set(v)
      s(0) += estOf(ball)
      (1 to k).foreach { t =>
        ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Set.empty))
        s(t) += estOf(ball)
      }
    }
    val reach = s(k) - s(0)
    assert(r.getLong(1) == s(0) && r.getLong(2) == s(k) && r.getLong(3) == reach)
    val avg = ((k * s(k) - s.take(k).sum) * 1000000L) / reach
    assert(r.getLong(4) == avg, s"avg: got ${r.getLong(4)} want $avg")
    val med = (1 to k).find(t => (s(t) - s(0)) * 2 >= reach).get
    assert(r.getLong(5) == med)
    val tStar = (1 to k).find(t => (s(t) - s(0)) * 10 >= reach * 9).get
    val eff = (tStar - 1) * 1000000L +
      ((reach * 9 - (s(tStar - 1) - s(0)) * 10) * 1000000L) / ((s(tStar) - s(tStar - 1)) * 10)
    assert(r.getLong(6) == eff, s"eff: got ${r.getLong(6)} want $eff")
    // edgeless input: one fully-typed zero row, no division blowups
    val z = HyperBall.distanceDistribution(
      Seq.empty[(Long, Long)].toDF("src", "dst"), k).collect()
    assert(z.length == 1 && (1 to 6).forall(i => z.head.getLong(i) == 0L))
  }

  test("maintained ball sizes are bit-equal to a cold net-graph run") {
    import spark.implicits._
    // comp A = 1-2-3 path, comp B = 4-5-6 path, comp C = 7-8,
    // comp D = 20-21-22 path (C and D never touched by the delta)
    val base = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L),
      (7L, 8L), (20L, 21L), (21L, 22L))
    // bridge A and B, introduce a NEW vertex 9 into A
    val ins = Seq((3L, 4L), (9L, 1L))
    // strip 6 of its only edge — it must drop out as a cold run drops it
    val del = Seq((5L, 6L))
    val net = (base ++ ins).filterNot(del.contains)
    val trace = scala.collection.mutable.Buffer.empty[Long]
    val got = HyperBall.ballSizesMaintain(
      HyperBall.ballSizes(base.toDF("src", "dst"), 3),
      base.toDF("src", "dst"), ins.toDF("src", "dst"),
      del.toDF("src", "dst"), 3, trace = Some(trace)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = HyperBall.ballSizes(net.toDF("src", "dst"), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the carve confined itself to the merged A∪B∪{9} supergraph
    // component — C and D rode through on the anti-join
    assert(trace == Seq(7L))
    assert(Set(7L, 8L, 20L, 21L, 22L).subsetOf(got.map(_._1)))
    assert(!got.map(_._1).contains(6L))
  }

  test("maintained ball sizes: empty delta is a verbatim pass-through") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val old = HyperBall.ballSizes(base.toDF("src", "dst"), 2)
    val trace = scala.collection.mutable.Buffer.empty[Long]
    val got = HyperBall.ballSizesMaintain(old, base.toDF("src", "dst"),
      empty, empty, 2, trace = Some(trace)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = old.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && trace == Seq(0L))
  }

  test("maintained distance distribution equals the cold net-graph row") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (7L, 8L),
      (20L, 21L), (21L, 22L))
    val ins = Seq((3L, 4L))
    val del = Seq((5L, 6L))
    val net = (base ++ ins).filterNot(del.contains)
    val k = 3
    val got = HyperBall.distanceDistributionFrom(
      HyperBall.ballSizesMaintain(
        HyperBall.ballSizes(base.toDF("src", "dst"), k, includeZero = true),
        base.toDF("src", "dst"), ins.toDF("src", "dst"),
        del.toDF("src", "dst"), k, includeZero = true), k).collect()
    val want = HyperBall.distanceDistribution(net.toDF("src", "dst"), k)
      .collect()
    assert(got.length == 1 && want.length == 1)
    assert((0 to 6).forall(i => got.head.getLong(i) == want.head.getLong(i)))
  }

  test("maintained harmonic centrality equals the cold net-graph run") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (7L, 8L))
    val ins = Seq((3L, 4L))
    val del = Seq((5L, 6L))
    val net = (base ++ ins).filterNot(del.contains)
    val got = HyperBall.harmonicCentralityFrom(
      HyperBall.ballSizesMaintain(
        HyperBall.ballSizes(base.toDF("src", "dst"), 3, includeZero = true),
        base.toDF("src", "dst"), ins.toDF("src", "dst"),
        del.toDF("src", "dst"), 3, includeZero = true)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = HyperBall.harmonicCentrality(net.toDF("src", "dst"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("insert-delta growth is bit-equal to the cold grown-graph run") {
    import spark.implicits._
    // one long path (the wavefront probe) plus a separate pair
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (20L, 21L))
    // a bridge to the pair, a genuinely NEW vertex, and a duplicate
    // insert (present in base — must be a net no-op, reversed to boot)
    val ins = Seq((6L, 20L), (9L, 1L), (3L, 2L))
    val net = base ++ Seq((6L, 20L), (9L, 1L))
    val trace = scala.collection.mutable.Buffer.empty[Long]
    val got = HyperBall.ballSizesGrowFrom(
      HyperBall.registerRounds(base.toDF("src", "dst"), 3),
      base.toDF("src", "dst"), ins.toDF("src", "dst"), 3,
      trace = Some(trace)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = HyperBall.ballSizes(net.toDF("src", "dst"), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the wavefront is confined: at most the delta endpoints' growing
    // neighborhoods ever recompute, never the whole vertex set
    assert(trace.length == 3 && trace.forall(_ < 11), s"wavefront $trace")
  }

  test("insert-delta growth: empty delta reproduces the stored rounds") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val trace = scala.collection.mutable.Buffer.empty[Long]
    val got = HyperBall.ballSizesGrowFrom(
      HyperBall.registerRounds(base.toDF("src", "dst"), 2),
      base.toDF("src", "dst"), empty, 2, includeZero = true,
      trace = Some(trace)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = HyperBall.ballSizes(base.toDF("src", "dst"), 2,
      includeZero = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && trace == Seq(0L, 0L))
  }

  test("degenerate inputs: empty graph and self-loops-only") {
    import spark.implicits._
    assert(HyperBall.ballSizes(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 2).count() == 0)
    assert(HyperBall.ballSizes(
      Seq((5L, 5L)).toDF("src", "dst"), 2).count() == 0)
  }
}
