package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r13 scale-adaptive A/B pins: every operator that gained a one-task
  * replay twin this round is run BOTH ways — the default bar (one-task
  * leg) against `oneTaskBar = 0` (the distributed round path) — and the
  * outputs must be bit-equal. The fixtures mix the sf0.001 C10
  * co-purchase graph (multi-component, triangles, odd cycles) with
  * synthetic shapes that exercise the edge semantics (multi-arcs,
  * weights, self-gated passes). Also covers the r12 twins the advice
  * flagged as untested on the round path (SCC, BFS, SSSP, landmarks).
  */
class LocalTwinsSpec extends SparkTestBase {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toVector.sortBy(_.mkString("|"))

  private def pinEqual(local: DataFrame, round: DataFrame, what: String): Unit = {
    assert(local.columns.toSeq == round.columns.toSeq, s"$what: schema")
    assert(rows(local) == rows(round), s"$what: one-task leg != round path")
  }

  private lazy val c10 = graft.model.GraphFixtures.coPurchase10(spark, sf)

  test("labelPropagation: one-task replay == round path") {
    pinEqual(
      Communities.labelPropagation(c10, 3),
      Communities.labelPropagation(c10, 3, oneTaskBar = 0L),
      "labelPropagation")
  }

  test("modularityRefine: one-task replay == round path") {
    val lpa = Communities.labelPropagation(c10, 3)
    pinEqual(
      Communities.modularityRefine(c10, lpa),
      Communities.modularityRefine(c10, lpa, oneTaskBar = 0L),
      "modularityRefine")
  }

  test("louvain / louvainLeiden: one-task replay == round path") {
    pinEqual(
      Communities.louvain(c10, 2, 2),
      Communities.louvain(c10, 2, 2, oneTaskBar = 0L),
      "louvain")
    pinEqual(
      Communities.louvainLeiden(c10, 2, 2),
      Communities.louvainLeiden(c10, 2, 2, oneTaskBar = 0L),
      "louvainLeiden")
  }

  test("louvainWeighted: one-task replay == round path (incl. parallel-edge weights)") {
    import spark.implicits._
    val weighted = Seq((1L, 2L, 5L), (2L, 3L, 1L), (3L, 1L, 2L), (3L, 4L, 7L),
      (4L, 5L, 7L), (5L, 3L, 7L), (6L, 7L, 1L), (1L, 2L, 3L))
      .toDF("src", "dst", "weight")
    pinEqual(
      Communities.louvainWeighted(weighted, 2, 2),
      Communities.louvainWeighted(weighted, 2, 2, oneTaskBar = 0L),
      "louvainWeighted")
  }

  test("louvainByComponent + louvainMaintain: one-task replay == round path") {
    pinEqual(
      Communities.louvainByComponent(c10, 2, 2),
      Communities.louvainByComponent(c10, 2, 2, oneTaskBar = 0L),
      "louvainByComponent")
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L), (20L, 21L)).toDF("src", "dst")
    val inserts = Seq((3L, 4L), (4L, 1L)).toDF("src", "dst")
    val deletes = Seq((20L, 21L)).toDF("src", "dst")
    val oldLabels = Communities.louvainByComponent(base, 2, 2)
      .toDF("id", "community")
    pinEqual(
      Communities.louvainMaintain(oldLabels, base, inserts, deletes),
      Communities.louvainMaintain(oldLabels, base, inserts, deletes,
        oneTaskBar = 0L),
      "louvainMaintain")
  }

  test("pagerank family: one-task replay == round path") {
    val sym = c10.unionByName(c10.select(col("dst").as("src"), col("src").as("dst")))
    pinEqual(
      PageRank.fixedPoint(sym, 10),
      PageRank.fixedPoint(sym, 10, oneTaskBar = 0L),
      "pagerank.fixedPoint")
    val prev = PageRank.fixedPoint(sym, 3)
    pinEqual(
      PageRank.fixedPointFrom(c10, prev, 4),
      PageRank.fixedPointFrom(c10, prev, 4, oneTaskBar = 0L),
      "pagerank.fixedPointFrom")
    val src = c10.agg(min(col("src"))).head().getLong(0)
    pinEqual(
      PageRank.personalized(sym, Seq(src), 10),
      PageRank.personalized(sym, Seq(src), 10, oneTaskBar = 0L),
      "pagerank.personalized")
    import spark.implicits._
    // multi-arc + zero-weight group: totw=0 vertices drop from the
    // propagation but stay in the vertex table
    val weighted = Seq((1L, 2L, 3L), (1L, 2L, 2L), (2L, 3L, 1L),
      (3L, 1L, 4L), (4L, 5L, 0L)).map { case (s, d, w) => (s, d, w.toDouble) }
      .toDF("src", "dst", "value")
    pinEqual(
      PageRank.weightedFixedPoint(weighted, 10),
      PageRank.weightedFixedPoint(weighted, 10, oneTaskBar = 0L),
      "pagerank.weighted")
  }

  test("hits family: one-task replay == round path") {
    pinEqual(
      Hits.fixedPoint(c10, 5),
      Hits.fixedPoint(c10, 5, oneTaskBar = 0L),
      "hits.fixedPoint")
    val prev = Hits.fixedPoint(c10, 2)
    pinEqual(
      Hits.fixedPointFrom(c10, prev, 3),
      Hits.fixedPointFrom(c10, prev, 3, oneTaskBar = 0L),
      "hits.fixedPointFrom")
  }

  test("centrality family: one-task replay == round path") {
    val srcs = c10.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().orderBy("id").limit(3).collect().map(_.getLong(0)).toSeq
    pinEqual(
      Centrality.stressCentrality(c10, srcs, 10),
      Centrality.stressCentrality(c10, srcs, 10, oneTaskBar = 0L),
      "stressCentrality")
    pinEqual(
      Centrality.betweennessCentrality(c10, srcs, 10),
      Centrality.betweennessCentrality(c10, srcs, 10, oneTaskBar = 0L),
      "betweennessCentrality")
    pinEqual(
      Centrality.harmonicCloseness(c10, srcs, 10),
      Centrality.harmonicCloseness(c10, srcs, 10, oneTaskBar = 0L),
      "harmonicCloseness")
  }

  test("centrality: one-task leg mirrors the maxDepth fail-loud budget") {
    import spark.implicits._
    // path 1-2-3-4-5 from source 1: the deepest vertex (5) sits at
    // depth 4. The round path errors when the layer AT depth ==
    // maxDepth is non-empty, so budget 4 fails (layer 4 = {5}) and
    // budget 5 passes — both legs must agree on both.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val ex1 = intercept[Exception](
      Centrality.stressCentrality(path, Seq(1L), 4).collect())
    val ex2 = intercept[Exception](
      Centrality.stressCentrality(path, Seq(1L), 4, oneTaskBar = 0L).collect())
    assert(ex1.getMessage.contains("raise maxDepth"))
    assert(ex2.getMessage.contains("raise maxDepth"))
    // both legs succeed and agree once the budget clears
    pinEqual(
      Centrality.stressCentrality(path, Seq(1L), 5),
      Centrality.stressCentrality(path, Seq(1L), 5, oneTaskBar = 0L),
      "stress path budget-clear")
  }

  test("densest peels: one-task replay == round path") {
    pinEqual(
      Traversals.densestSubgraph(c10),
      Traversals.densestSubgraph(c10, oneTaskBar = 0L),
      "densestSubgraph")
    pinEqual(
      Traversals.densestByComponent(c10),
      Traversals.densestByComponent(c10, oneTaskBar = 0L),
      "densestByComponent")
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L), (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val inserts = Seq((3L, 4L), (4L, 1L)).toDF("src", "dst")
    val deletes = Seq((20L, 21L)).toDF("src", "dst")
    val oldStats = Traversals.densestByComponent(base)
    pinEqual(
      Traversals.densestMaintain(oldStats, base, inserts, deletes),
      Traversals.densestMaintain(oldStats, base, inserts, deletes,
        oneTaskBar = 0L),
      "densestMaintain")
  }

  test("bipartiteness: one-task replay == round path (odd cycles, per component, groups)") {
    import spark.implicits._
    // mixed shapes: odd cycle (non-bipartite), even cycle, isolated
    // edge, self-loop (odd by definition)
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 13L), (13L, 10L), (20L, 21L), (30L, 30L)).toDF("src", "dst")
    pinEqual(
      Bipartiteness.bipartitenessByComponent(mixed),
      Bipartiteness.bipartitenessByComponent(mixed, oneTaskBar = 0L),
      "bipartitenessByComponent")
    val inserts = Seq((21L, 22L), (22L, 20L)).toDF("src", "dst")
    val deletes = Seq((3L, 1L)).toDF("src", "dst")
    val oldV = Bipartiteness.bipartitenessByComponent(mixed)
    pinEqual(
      Bipartiteness.bipartitenessMaintain(oldV, mixed, inserts, deletes),
      Bipartiteness.bipartitenessMaintain(oldV, mixed, inserts, deletes,
        oneTaskBar = 0L),
      "bipartitenessMaintain")
    val tagged = mixed.where(col("src") < 20)
      .select(lit("A").as("g"), col("src"), col("dst"))
      .unionByName(mixed.where(col("src") >= 20)
        .select(lit("B").as("g"), col("src"), col("dst")))
    pinEqual(
      Bipartiteness.iterativeByGroup(tagged),
      Bipartiteness.iterativeByGroup(tagged, oneTaskBar = 0L),
      "iterativeByGroup")
  }

  test("kcore: one-task replay == round path (incl. maxIter truncation)") {
    for (k <- Seq(2, 4, 6)) {
      pinEqual(
        Traversals.kcore(c10, k),
        Traversals.kcore(c10, k, oneTaskBar = 0L),
        s"kcore k=$k")
    }
    // truncation semantics: a 1-round budget leaves the partial peel —
    // both legs must leave the SAME partial state
    pinEqual(
      Traversals.kcore(c10, 4, maxIter = 1),
      Traversals.kcore(c10, 4, maxIter = 1, oneTaskBar = 0L),
      "kcore truncated")
  }

  test("hyperball ballSizes: one-task replay == round path") {
    pinEqual(
      HyperBall.ballSizes(c10, 3),
      HyperBall.ballSizes(c10, 3, oneTaskBar = 0L),
      "hyperball.ballSizes")
    pinEqual(
      HyperBall.ballSizes(c10, 2, includeZero = true),
      HyperBall.ballSizes(c10, 2, includeZero = true, oneTaskBar = 0L),
      "hyperball.ballSizes includeZero")
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (20L, 21L)).toDF("src", "dst")
    val inserts = Seq((3L, 4L), (12L, 10L)).toDF("src", "dst")
    val deletes = Seq((20L, 21L)).toDF("src", "dst")
    val oldBalls = HyperBall.ballSizes(base, 3)
    pinEqual(
      HyperBall.ballSizesMaintain(oldBalls, base, inserts, deletes, 3),
      HyperBall.ballSizesMaintain(oldBalls, base, inserts, deletes, 3,
        oneTaskBar = 0L),
      "hyperball.ballSizesMaintain")
  }

  test("hyperball registerRounds + growFrom: one-task legs == round paths") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L))
      .toDF("src", "dst")
    val localRounds = HyperBall.registerRounds(base, 3)
    val roundRounds = HyperBall.registerRounds(base, 3, oneTaskBar = 0L)
    localRounds.zip(roundRounds).zipWithIndex.foreach { case ((l, r), t) =>
      pinEqual(l, r, s"registerRounds t=$t")
    }
    // growFrom: the one-task leg rides the operator's own
    // maintained ≡ cold contract; both legs must produce identical rows
    val ins = Seq((3L, 4L), (9L, 1L)).toDF("src", "dst")
    pinEqual(
      HyperBall.ballSizesGrowFrom(localRounds, base, ins, 3),
      HyperBall.ballSizesGrowFrom(roundRounds, base, ins, 3, oneTaskBar = 0L),
      "ballSizesGrowFrom")
    // and c10-scale: grow the base by a deterministic insert slice
    val srcs = c10.where(col("src") % 97 === 0)
    pinEqual(
      HyperBall.ballSizesGrowFrom(HyperBall.registerRounds(c10, 2), c10,
        srcs, 2),
      HyperBall.ballSizesGrowFrom(
        HyperBall.registerRounds(c10, 2, oneTaskBar = 0L), c10,
        srcs, 2, oneTaskBar = 0L),
      "ballSizesGrowFrom c10")
  }

  test("walks: one-task replay == round path (uniform and node2vec-biased)") {
    pinEqual(
      Walks.deterministicWalks(c10, 5),
      Walks.deterministicWalks(c10, 5, oneTaskBar = 0L),
      "deterministicWalks")
    pinEqual(
      Walks.biasedWalks(c10, 6),
      Walks.biasedWalks(c10, 6, oneTaskBar = 0L),
      "biasedWalks")
  }

  test("sparsifiedEstimateGate: fused one-pass counts == two-pass kept-subgraph shape") {
    import spark.implicits._
    // a kept triangle is a full-graph triangle with three hash-kept
    // edges, counted once under either orientation — value-pin the
    // fused counts against the old shape's explicit kept subgraph
    for ((g, name) <- Seq(
        (c10, "c10"),
        (Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
          (1L, 4L), (2L, 4L)).toDF("src", "dst"), "synthetic"))) {
      val counts = Triangles.sparsifiedCounts(g, 0.5, 42L).head()
      val exact = Triangles.globalCount(g).head().getLong(0)
      val kept = g.where(
        pmod(xxhash64(col("src"), col("dst"), lit(42L)), lit(1000000L)) <
          lit(500000L))
      val keptCount = Triangles.globalCount(kept).head().getLong(0)
      assert(counts.getLong(0) == exact, s"$name n_exact")
      assert(counts.getLong(1) == keptCount, s"$name kept_triangles")
    }
  }

  test("r12 twins gain round-path A/Bs: scc, bfs, sssp, landmarks (advice)") {
    pinEqual(
      Scc.stronglyConnectedComponents(c10),
      Scc.stronglyConnectedComponents(c10, oneTaskBar = 0L),
      "scc")
    val src = c10.agg(min(col("src"))).head().getLong(0)
    pinEqual(
      Traversals.bfsDepths(c10, src),
      Traversals.bfsDepths(c10, src, oneTaskBar = 0L),
      "bfsDepths")
    pinEqual(
      Traversals.doubleSweepDiameter(c10, src),
      Traversals.doubleSweepDiameter(c10, src, oneTaskBar = 0L),
      "doubleSweepDiameter")
    // sssp weights ride the `value` column — use the weighted edge
    // fixture (c10 carries no value)
    val weighted = edgeDf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (4L, 5L), (2L, 5L), (6L, 7L)))
    pinEqual(
      Traversals.sssp(weighted, 1L),
      Traversals.sssp(weighted, 1L, oneTaskBar = 0L),
      "sssp")
    pinEqual(
      Traversals.landmarkDistances(c10, 4),
      Traversals.landmarkDistances(c10, 4, oneTaskBar = 0L),
      "landmarkDistances")
  }
}
