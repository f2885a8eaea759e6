package graft

import graft.operators.{ConnectedComponents, SpanningForest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum-spanning-forest checks: a handcrafted known MSF, edge-set
  * equality with an in-JVM Kruskal under the identical (w, u, v) total
  * order (this is the MINIMALITY pin — q188/q189's oracles check
  * structure and threshold connectivity, the spec checks optimality),
  * and the single-linkage threshold identity.
  */
class MsfSpec extends SparkTestBase {

  private def wEdgeDf(edges: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("src", "dst", "weight")
  }

  /** Kruskal with union-find under the same lexicographic (w, u, v)
    * order boruvka uses — the unique MSF of the perturbed-total-order
    * weights, so the two edge SETS must be identical.
    */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges
      .map { case (s, d, w) => (math.min(s, d), math.max(s, d), w) }
      .filter { case (u, v, _) => u != v }
      .groupBy { case (u, v, _) => (u, v) }
      .map { case (_, es) => es.minBy(_._3) }
      .toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    canon.sortBy { case (u, v, w) => (w, u, v) }
      .filter { case (u, v, _) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { parent(ru) = rv; true } else false
      }.toSet
  }

  private def collectMsf(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("boruvka: handcrafted graph with a known unique MSF") {
    // two components: a 4-cycle with a chord (drop the heaviest cycle
    // edge) and a triangle (drop its heaviest edge); plus a parallel
    // edge and a self-loop that must be ignored
    val es = Seq(
      (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 1L, 10L), (1L, 3L, 9L),
      (2L, 1L, 5L), // parallel (heavier than 1-2: collapsed away)
      (5L, 5L, 0L), // self-loop: dropped
      (10L, 11L, 7L), (11L, 12L, 8L), (10L, 12L, 6L))
    val msf = collectMsf(SpanningForest.boruvka(wEdgeDf(es)))
    assert(msf == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
      (10L, 12L, 6L), (10L, 11L, 7L)))
  }

  test("boruvka: edge-set equality with in-JVM Kruskal (minimality)") {
    // deterministic pseudo-random multigraph with DUPLICATE weights —
    // exercises the lexicographic tie-break — over 3 disjoint blocks
    val es = for {
      i <- 0L until 300L
      b = i % 3 // block
      u = b * 1000L + (i * 37L) % 50L
      v = b * 1000L + (i * 61L + 13L) % 50L
      w = (i * 2654435761L) % 16L // heavy duplication: 16 weight values
    } yield (u, v, w)
    val msf = collectMsf(SpanningForest.boruvka(wEdgeDf(es)))
    assert(msf == kruskal(es))
    assert(msf.nonEmpty)
  }

  test("singleLinkage: threshold identity against CC of filtered edges") {
    val es = for {
      i <- 0L until 200L
      u = (i * 37L) % 60L
      v = (i * 61L + 13L) % 60L
      w = (i * 2654435761L) % 100L
    } yield (u, v, w)
    val edges = wEdgeDf(es)
    val msf = SpanningForest.boruvka(edges)
    for (tau <- Seq(0L, 30L, 70L, 99L)) {
      val got = SpanningForest.singleLinkage(edges, msf, tau).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val filtered = edges.where(col("weight") <= tau)
        .select(col("src"), col("dst"))
        .where(col("src") =!= col("dst"))
      val cc = ConnectedComponents.iterative(filtered).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val verts = es.flatMap(e => Seq(e._1, e._2)).toSet
      val want = verts.map(v => v -> cc.getOrElse(v, v)).toMap
      assert(got == want, s"tau=$tau")
    }
  }

  test("boruvka: empty and single-edge graphs") {
    assert(SpanningForest.boruvka(wEdgeDf(Seq.empty)).count() == 0)
    assert(collectMsf(SpanningForest.boruvka(wEdgeDf(Seq((7L, 3L, 5L)))))
      == Set((3L, 7L, 5L)))
  }
}
