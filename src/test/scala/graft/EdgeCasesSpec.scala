package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bipartiteness, ConnectedComponents, SummaryAggregations, Triangles}

/** Degenerate inputs: empty edge sets, self-contained single edges,
  * self-loop-free invariants — operators must return empty/identity
  * results, not throw.
  */
class EdgeCasesSpec extends SparkTestBase {

  private lazy val empty = edgeDf(Seq.empty)

  test("empty edge stream: counts, degrees, vertices") {
    val gs = GraphStream(empty)
    assert(gs.numberOfEdges.head.getLong(0) == 0L)
    assert(gs.numberOfVertices.head.getLong(0) == 0L)
    assert(gs.getDegrees.count() == 0L)
    assert(gs.getVertices.count() == 0L)
    assert(gs.distinct.numberOfEdges.head.getLong(0) == 0L)
  }

  test("empty edge stream: triangles and summaries") {
    assert(Triangles.globalCount(empty.select("src", "dst")).head.getLong(0) == 0L)
    assert(Triangles.perVertexCounts(empty.select("src", "dst")).count() == 0L)
    assert(SummaryAggregations.connectedComponents(empty).count() == 0L)
    // empty graph is vacuously bipartite
    assert(SummaryAggregations.bipartiteness(empty).head.getBoolean(0))
    assert(Bipartiteness.iterative(empty).head.getBoolean(0))
  }

  test("single edge graph") {
    val one = edgeDf(Seq((5L, 9L)))
    assert(GraphStream(one).getDegrees.count() == 2L)
    assert(Triangles.globalCount(one.select("src", "dst")).head.getLong(0) == 0L)
    val cc = SummaryAggregations.connectedComponents(one)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(5L -> 5L, 9L -> 5L))
    val it = ConnectedComponents.iterative(one)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(it == cc)
  }

  test("missing src/dst columns is rejected with a clear message") {
    import spark.implicits._
    val bad = Seq((1L, 2L)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException](GraphStream(bad))
    assert(ex.getMessage.contains("src/dst"))
  }

  test("traversals on degenerate graphs: empty/isolated inputs") {
    import graft.operators.{LinkPrediction, Traversals}
    // BFS on an empty edge set: just the source at distance 0
    val bfs = Traversals.bfsDepths(empty, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bfs == Map(1L -> 0L))
    // k-core and link prediction on empty inputs: empty, no throw
    assert(Traversals.kcore(empty, 2).isEmpty)
    assert(LinkPrediction.adamicAdar(empty, 1).isEmpty)
    // SSSP from a vertex absent from a non-empty graph: source only
    val one = edgeDf(Seq((5L, 9L)))
    val d = Traversals.sssp(one, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L))
    // self-loops are ignored by the undirected view
    val loop = edgeDf(Seq((7L, 7L), (7L, 8L)))
    assert(Traversals.kcore(loop, 1).count() == 2L)
    assert(Traversals.bfsDepths(loop, 7L).count() == 2L)
  }

  test("r3 operators on degenerate inputs: empty, no throw") {
    import spark.implicits._
    // salted aggregations
    assert(graft.operators.Salting.saltedDegrees(empty).isEmpty)
    assert(graft.operators.Salting.saltedAdjacency(empty).isEmpty)
    // incremental k-truss: triangle-free graph peels everything round 1
    assert(Triangles.ktruss(edgeDf(Seq((1L, 2L), (2L, 3L))).select("src", "dst"), 3).isEmpty)
    assert(Triangles.ktruss(empty.select("src", "dst"), 3).isEmpty)
    // composite-key ingest of an empty relation: empty graph + empty dict
    val e = Seq.empty[(Long, Int, Long, Long)].toDF("o", "ln", "p", "s")
    val (enc, dict) = graft.sources.Sources.dictionaryEncodeComposite(
      e, Seq("o", "ln"), Seq("p", "s"))
    assert(enc.isEmpty && dict.isEmpty)
    // image stats over undecodable payloads: dropped rows, not errors
    val junk = Seq((1L, "image", "nope".getBytes, Map.empty[String, String]))
      .toDF("id", "kind", "content", "meta")
    assert(graft.operators.Multimodal.imageStats(junk).isEmpty)
    // cleaning stats on empty docs relation
    assert(graft.functions.TextStats.cleaningStats(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).isEmpty)
    // temperature mix on an empty corpus: empty result, not an NPE
    assert(graft.functions.Corpus.temperatureMix(
      Seq.empty[(Long, String, String, String)]
        .toDF("doc_id", "text", "lang", "source")).isEmpty)
    // hash walks / ego sizes with empty graphs or starts
    assert(graft.operators.Traversals.hashWalks(
      empty, Seq.empty[Long].toDF("id"), 3).isEmpty)
    assert(graft.operators.Traversals.egoSizes(empty, Seq(1L).toDF("id"), 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L))
  }

  test("r6 operators on degenerate inputs: empty, no throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val noDocs = Seq.empty[Long].toDF("doc_id")
    // Leiden on an empty graph: empty mapping, no div-by-zero in the gate
    assert(graft.operators.Communities.louvainLeiden(empty).isEmpty)
    // connectivity refinement with an empty labeling is the empty labeling
    val g0 = empty.select(col("src").as("u"), col("dst").as("v"), lit(1L).as("w"))
    assert(graft.operators.Communities.connectivityRefine(
      g0, Seq.empty[(Long, Long)].toDF("id", "label")).isEmpty)
    // video/audio synth + decode over zero documents: empty, no throw
    assert(graft.operators.Multimodal.keyframeStats(
      graft.operators.Multimodal.sampleKeyframes(
        graft.operators.Multimodal.syntheticVideos(noDocs).toDF(), 2)).isEmpty)
    assert(graft.operators.Multimodal.audioStats(
      graft.operators.Multimodal.syntheticAudio(noDocs).toDF()).isEmpty)
    // video twins over undecodable junk "videos": no frames → no pairs
    val junkVid = Seq((1L, "video", "not a container".getBytes, Map.empty[String, String]),
        (2L, "video", "also junk".getBytes, Map.empty[String, String]))
      .toDF("id", "kind", "content", "meta")
    assert(graft.operators.Multimodal.videoTwins(
      graft.operators.Multimodal.keyframeHashes(
        graft.operators.Multimodal.sampleKeyframes(junkVid, 2))).isEmpty)
    // TTL'd streaming CC replay over an empty edge table: empty result
    val noEdges = Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("src", "dst", "ts")
    assert(graft.streaming.StreamingOps
      .replayConnectedComponentsTtl(noEdges, "1 hour", 2).isEmpty)
  }

  test("r7 operators on degenerate inputs: empty, no throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // substring dedup: no docs → no spans; short docs (< k tokens) and
    // unique docs pass through verbatim with zero repeated tokens
    assert(graft.functions.Dedup.repeatedSpans(noDocs, 5).isEmpty)
    assert(graft.functions.Dedup.stripRepeatedSpans(noDocs, 5).isEmpty)
    val shorts = Seq((1L, "too short"), (2L, "also tiny")).toDF("doc_id", "text")
    assert(graft.functions.Dedup.repeatedSpans(shorts, 5).isEmpty)
    val passthrough = graft.functions.Dedup.stripRepeatedSpans(shorts, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(passthrough == Map(1L -> ((0L, "too short")), 2L -> ((0L, "also tiny"))))
    // coloring: empty graph → empty coloring, no fail-loud trip;
    // self-loops are dropped by canonicalization (a self-loop can never
    // be properly colored — the operator excludes it like every other
    // graph op here)
    assert(graft.operators.Communities.greedyColoring(empty).isEmpty)
    val loopy = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val lc = graft.operators.Communities.greedyColoring(loopy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lc.keySet == Set(1L, 2L) && lc(1L) != lc(2L))
    // 4-cliques: empty / triangle-free graphs → empty
    assert(graft.operators.Triangles.fourCliqueCounts(empty).isEmpty)
    assert(graft.operators.Triangles.fourCliqueCounts(
      Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")).isEmpty)
    // PII redaction over zero docs → empty; empty text row is identity
    assert(graft.functions.Corpus.piiRedact(noDocs).isEmpty)
    val emptyText = graft.functions.Corpus.piiRedact(
      Seq((9L, "")).toDF("doc_id", "text")).collect().head
    assert(emptyText.getString(4) == "" && emptyText.getLong(1) == 0L)
    // domain ops: unparseable URLs group under '' and survive the cap
    val oneBad = Seq((1L, "no scheme here")).toDF("doc_id", "url")
    assert(graft.functions.Corpus.domainCap(oneBad, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == Set(("", 1L)))
    // incremental BPE over an empty word table: no merges, no throw
    val noWf = Seq.empty[(String, Long)].toDF("word", "cnt")
    assert(graft.functions.Bpe.learnMergesFrom(noWf, 3).isEmpty)
  }

  test("r9 second-session operators on degenerate inputs") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // densest subgraph of an edgeless graph: empty stats, no crash
    assert(graft.operators.Traversals.densestSubgraph(noEdges).count() == 0L)
    // temporal BFS from an isolated source: just the source at startT
    val noTe = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "t")
    val tb = graft.operators.Traversals.temporalBfs(noTe, 5L).collect()
    assert(tb.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, -1L)))
    // range join with no intervals / no points: empty, zero counts
    val noIv = Seq.empty[(Long, Long, Long)].toDF("i_id", "lo", "hi")
    val somePts = Seq((1L, 10L)).toDF("p_id", "p")
    assert(graft.operators.RangeJoin.countPerInterval(somePts, noIv, 10L).count() == 0L)
    val someIv = Seq((1L, 0L, 10L)).toDF("i_id", "lo", "hi")
    val noPts = Seq.empty[(Long, Long)].toDF("p_id", "p")
    assert(graft.operators.RangeJoin.countPerInterval(noPts, someIv, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0L)))
    // bm25 / bloom / sketch replays over a token-less corpus: empty
    // results, vacuous parity, no NPE
    val blank = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(graft.functions.Bm25.topK(blank).count() == 0L)
    assert(graft.functions.Corpus.bloomDecontaminate(blank, blank.limit(0))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(graft.streaming.StreamingOps.replayCmsHeavyHitters(blank).count() == 0L)
    // reciprocity needs >= 1 arc by contract; loops-only input divides
    // by zero nowhere because the loop row is dropped BEFORE the count
    val loops = Seq((1L, 1L)).toDF("src", "dst")
    val rr = graft.operators.DegreeMetrics.reciprocity(loops).collect()
    assert(rr.length == 1 && rr(0).isNullAt(2), s"${rr.toSeq}")
  }

  test("r12 operators on degenerate inputs: empty, no throw") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // component-local Louvain on an edgeless graph: empty mapping
    assert(graft.operators.Communities.louvainByComponent(noEdges).isEmpty)
    // a single edge: one two-vertex community (the move pass merges)
    val one = graft.operators.Communities
      .louvainByComponent(Seq((1L, 2L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one.keySet == Set(1L, 2L) && one.values.toSet.size == 1)
    // self-loops-only input: no community rows (canonicalization drops
    // loops, leaving an edgeless graph)
    assert(graft.operators.Communities.louvainByComponent(
      Seq((3L, 3L)).toDF("src", "dst")).isEmpty)
    // maintenance with empty EVERYTHING: empty output, no crash
    assert(graft.operators.Communities.louvainMaintain(
      Seq.empty[(Long, Long)].toDF("id", "community"),
      noEdges, noEdges, noEdges).isEmpty)
    // warm-start PageRank from an empty prev over an empty graph
    assert(graft.operators.PageRank.fixedPointFrom(
      noEdges, Seq.empty[(Long, Long)].toDF("id", "rank"), 3).isEmpty)
  }
}
