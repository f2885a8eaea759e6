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

  test("boruvka: tail-collapse A/B — rounds-only ≡ mid-collapse ≡ immediate collapse") {
    // the r12 tail optimization (kruskalForest summary once the
    // inter-component edge set is under tailEdgeBar) must be invisible:
    // bar=0 forces the pure round path, the default bar collapses
    // immediately at spec scale, bar=64 runs real rounds THEN collapses
    // — all three must equal the in-JVM Kruskal edge set
    val es = for {
      i <- 0L until 400L
      b = i % 2
      u = b * 1000L + (i * 37L) % 60L
      v = b * 1000L + (i * 61L + 13L) % 60L
      w = (i * 2654435761L) % 16L
    } yield (u, v, w)
    val expect = kruskal(es)
    assert(collectMsf(SpanningForest.boruvka(wEdgeDf(es), 40, tailEdgeBar = 0L)) == expect)
    assert(collectMsf(SpanningForest.boruvka(wEdgeDf(es), 40, tailEdgeBar = 64L)) == expect)
    assert(collectMsf(SpanningForest.boruvka(wEdgeDf(es))) == expect)
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

  test("boruvkaDelta: composed forest ≡ full-graph forest on a random multigraph") {
    // MSF(G ∪ Δ) = MSF(MSF(G) ∪ Δ) — split the pseudo-random multigraph
    // 90/10 by the same deterministic hash the queries use; the
    // incremental forest must be BIT-EQUAL to the full-graph one
    val es = for {
      i <- 0L until 300L
      b = i % 3
      u = b * 1000L + (i * 37L) % 50L
      v = b * 1000L + (i * 61L + 13L) % 50L
      w = (i * 2654435761L) % 16L
    } yield (u, v, w)
    val (old, delta) = es.partition { case (u, v, _) =>
      ((u * 31 + v) * 2654435761L) % 10L != 7L }
    assert(delta.nonEmpty && old.nonEmpty)
    val oldForest = SpanningForest.boruvka(wEdgeDf(old))
    val composed = collectMsf(SpanningForest.boruvkaDelta(oldForest, wEdgeDf(delta)))
    assert(composed == collectMsf(SpanningForest.boruvka(wEdgeDf(es))))
  }

  test("boruvkaDelta: component merge and weight displacement") {
    // old graph: two components {1,2,3} (path) and {10,11}; the delta
    // (a) MERGES the components via 3–10 and (b) DISPLACES old forest
    // edge 2–3 (w=5) with the lighter cycle-closing 1–3 (w=2)
    val old = Seq((1L, 2L, 1L), (2L, 3L, 5L), (10L, 11L, 4L))
    val oldForest = SpanningForest.boruvka(wEdgeDf(old))
    assert(collectMsf(oldForest) == old.toSet)
    val delta = Seq((3L, 10L, 7L), (1L, 3L, 2L))
    val composed = collectMsf(SpanningForest.boruvkaDelta(oldForest, wEdgeDf(delta)))
    assert(composed == Set((1L, 2L, 1L), (1L, 3L, 2L), (3L, 10L, 7L), (10L, 11L, 4L)))
    assert(composed == kruskal(old ++ delta))
  }

  test("boruvkaDelta: empty delta is the identity") {
    val old = Seq((1L, 2L, 1L), (2L, 3L, 5L), (10L, 11L, 4L))
    val oldForest = SpanningForest.boruvka(wEdgeDf(old))
    assert(collectMsf(SpanningForest.boruvkaDelta(oldForest, wEdgeDf(Seq.empty)))
      == old.toSet)
  }

  test("boruvkaDecremental: forest-edge delete finds the replacement edge") {
    // square 1-2(1), 2-3(2), 3-4(3), 4-1(10): MSF drops the heaviest
    // cycle edge 4-1. Deleting forest edge 2-3 forces the replacement
    // search across the cut {1,2}|{3,4} — the survivor 4-1(10) re-enters
    val old = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 1L, 10L))
    val oldForest = SpanningForest.boruvka(wEdgeDf(old))
    assert(collectMsf(oldForest) == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L)))
    import spark.implicits._
    val got = collectMsf(SpanningForest.boruvkaDecremental(
      oldForest, wEdgeDf(old), Seq((3L, 2L)).toDF("src", "dst")))
    assert(got == Set((1L, 2L, 1L), (3L, 4L, 3L), (1L, 4L, 10L)))
    assert(got == kruskal(old.filterNot(e => (e._1, e._2) == ((2L, 3L)))))
  }

  test("boruvkaDecremental: bridge delete splits with no replacement") {
    // path 1-2-3 plus disjoint 10-11; deleting bridge 2-3 splits its
    // component (no replacement exists) while 10-11 passes through
    val old = Seq((1L, 2L, 1L), (2L, 3L, 5L), (10L, 11L, 4L))
    val oldForest = SpanningForest.boruvka(wEdgeDf(old))
    import spark.implicits._
    val got = collectMsf(SpanningForest.boruvkaDecremental(
      oldForest, wEdgeDf(old), Seq((2L, 3L)).toDF("src", "dst")))
    assert(got == Set((1L, 2L, 1L), (10L, 11L, 4L)))
  }

  test("boruvkaDecremental: non-forest and absent deletes are no-ops") {
    val old = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 1L, 10L),
      (10L, 11L, 4L))
    val oldForest = SpanningForest.boruvka(wEdgeDf(old))
    import spark.implicits._
    // 4-1(10) is outside the forest (red rule: deleting it changes
    // nothing); (100,200) was never an edge; direction-insensitivity
    // exercised by stating 1,4 in reverse
    val got = collectMsf(SpanningForest.boruvkaDecremental(
      oldForest, wEdgeDf(old),
      Seq((1L, 4L), (100L, 200L)).toDF("src", "dst")))
    assert(got == collectMsf(oldForest))
  }

  test("boruvkaDecremental: maintained forest ≡ full Borůvka over E∖D") {
    // pseudo-random multigraph with duplicate weights; delete a
    // hash-selected ~10% slice (forest AND non-forest edges mixed);
    // the maintained forest must be BIT-EQUAL to the full recompute
    val es = for {
      i <- 0L until 300L
      b = i % 3
      u = b * 1000L + (i * 37L) % 50L
      v = b * 1000L + (i * 61L + 13L) % 50L
      w = (i * 2654435761L) % 16L
    } yield (u, v, w)
    val delKeys = es.map { case (s, d, _) => (math.min(s, d), math.max(s, d)) }
      .distinct.filter { case (u, v) => ((u * 31 + v) * 2654435761L) % 10L == 3L }
    assert(delKeys.nonEmpty)
    val surviving = es.filterNot { case (s, d, _) =>
      delKeys.contains((math.min(s, d), math.max(s, d))) }
    val oldForest = SpanningForest.boruvka(wEdgeDf(es))
    import spark.implicits._
    val got = collectMsf(SpanningForest.boruvkaDecremental(
      oldForest, wEdgeDf(es), delKeys.toDF("src", "dst")))
    assert(got == collectMsf(SpanningForest.boruvka(wEdgeDf(surviving))))
    assert(got == kruskal(surviving))
  }

  test("boruvkaDecremental: stored labels give the same forest as derived labels") {
    import spark.implicits._
    val es = for {
      i <- 0L until 200L
      u = (i * 37L) % 40L
      v = (i * 61L + 13L) % 40L
      w = (i * 2654435761L) % 16L
    } yield (u, v, w)
    val oldForest = SpanningForest.boruvka(wEdgeDf(es))
    val deleted = Seq((3L, 24L), (1L, 14L), (0L, 13L)).toDF("src", "dst")
    val derived = collectMsf(SpanningForest.boruvkaDecremental(
      oldForest, wEdgeDf(es), deleted))
    // the deployment path: labels from the nightly CC run — and the
    // contract says ANY consistent labeling works, so shift the ids
    val stored = ConnectedComponents.iterative(
        oldForest.select(col("u").as("src"), col("v").as("dst")))
      .select(col("id"), (col("component") + 1000000L).as("component"))
    val viaStored = collectMsf(SpanningForest.boruvkaDecremental(
      oldForest, wEdgeDf(es), deleted, labels = Some(stored)))
    assert(viaStored == derived)
  }

  test("boruvkaDecrementalPartitioned: identical forest via a partition-pruned carve-out") {
    import spark.implicits._
    // two components: a weighted square-with-chord and a pair; delete
    // forest edge 2-3 (replacement search) and non-forest 4-1 (no-op)
    val es = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 1L, 10L),
      (1L, 3L, 9L), (10L, 11L, 4L))
    val old = wEdgeDf(es)
    val forest = SpanningForest.boruvka(old)
    val labels = ConnectedComponents.iterative(
      forest.select(col("u").as("src"), col("v").as("dst")))
    val deleted = Seq((2L, 3L), (4L, 1L)).toDF("src", "dst")
    // deployment layout: edges tagged with their component, one hive
    // directory per component (the nightly run's natural byproduct)
    val tagged = old.join(labels.toDF("src", "component"), Seq("src"))
    val path = java.nio.file.Files.createTempDirectory("graft-msf-layout").toString
    graft.sources.Sources.writePartitioned(tagged, path, "component",
      orderCols = Seq("src", "dst"))
    val byComp = spark.read.parquet(path)
    val part = collectMsf(SpanningForest.boruvkaDecrementalPartitioned(
      forest, labels, byComp, deleted))
    val plain = collectMsf(SpanningForest.boruvkaDecremental(
      forest, old, deleted))
    assert(part == plain)
    assert(part == kruskal(es.filterNot(e => (e._1, e._2) == ((2L, 3L)))))
    // the carve-out read is DIRECTORY-pruned (static isin on the
    // partition column → PartitionFilters; the pair's dir untouched)
    val affectedIds = deleted.join(labels.toDF("src", "c"), Seq("src"))
      .select("c").distinct().as[Long].collect()
    val pruned = byComp.where(col("component").isin(affectedIds.map(Long.box): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    val leaves = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!leaves.contains("component=10"), leaves.take(300))
    // mass-retraction fence: the broadcast fallback lands the same forest
    val fallback = collectMsf(SpanningForest.boruvkaDecrementalPartitioned(
      forest, labels, byComp, deleted, maxIsinLiterals = 0))
    assert(fallback == plain)
  }

  test("boruvka: empty and single-edge graphs") {
    assert(SpanningForest.boruvka(wEdgeDf(Seq.empty)).count() == 0)
    assert(collectMsf(SpanningForest.boruvka(wEdgeDf(Seq((7L, 3L, 5L)))))
      == Set((3L, 7L, 5L)))
  }
}
