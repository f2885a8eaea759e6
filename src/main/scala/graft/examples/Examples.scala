package graft.examples

import org.apache.spark.sql.functions._

import graft.{EdgeDirection, GraphStream, GraftSession}
import graft.model.GraphFixtures
import graft.operators.{SummaryAggregations, Triangles}
import graft.sources.Sources
import graft.streaming.StreamingOps

/** Runnable example mains mirroring the reference's example programs
  * (ConnectedComponentsExample, WindowTrianglesExample, degree examples —
  * the GS example package). Each reads the driver test data (or a
  * user-provided edge file) and prints a result sample.
  *
  * Run: `sbt "runMain graft.examples.ConnectedComponentsExample [sfDir]"`
  */
object ConnectedComponentsExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val cc = SummaryAggregations.connectedComponents(
      GraphFixtures.coPurchase10(spark, dir))
    println(s"components: ${cc.select("component").distinct().count()}")
    cc.orderBy("id").show(10, truncate = false)
    spark.stop()
  }
}

object WindowTrianglesExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    Triangles.countPerWindow(
      GraphFixtures.coPurchaseWindowed(spark, dir, sizeSec = 5184000L))
      .orderBy("win").show(20, truncate = false)
    spark.stop()
  }
}

object DegreesExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val gs = GraphStream(GraphFixtures.edgeStream(spark, dir))
    gs.getDegrees.orderBy(desc("degree")).show(10)
    gs.slice("30 days", EdgeDirection.Out)
      .foldNeighbors(count("*").as("cnt"), max("value").as("max_value"))
      .orderBy(desc("cnt")).show(10)
    spark.stop()
  }
}

/** Streaming: running degree table over a synthetic rate-source edge
  * stream, printed to the console for a few trigger cycles.
  */
object StreamingDegreesExample {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val edges = Sources.rateEdgeStream(spark, rowsPerSecond = 500, nVertices = 100)
    val q = StreamingOps.runningDegrees(GraphStream(edges))
      .writeStream.outputMode("complete")
      .format("console").option("numRows", 10)
      .start()
    q.awaitTermination(15000)
    q.stop()
    spark.stop()
  }
}

/** End-to-end training-data curation pass over the documents table:
  * near-dup clustering → per-cluster survivor → repetition + quality
  * gates → deterministic mixture sampling → sequence packing. Prints
  * the funnel counts at each stage — the shape of a real corpus build,
  * on the same operators the driver queries gate individually.
  */
object TrainingDataPipelineExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val docs = graft.model.Tables.documents(spark, dir)
    val n0 = docs.count()

    // 1. near-dup clusters (MinHash candidates, exact verify, CC labels);
    //    keep each cluster's min doc_id
    val clustered = graft.functions.Dedup.nearDupClusters(docs, 2, 0.5)
    val survivors = docs.join(
      clustered.where(col("doc_id") === col("cluster")).select("doc_id"), "doc_id")
    val n1 = survivors.count()

    // 2. repetition + quality gates: drop boilerplate-heavy docs AND
    //    docs failing the length/diversity bounds
    val rep = graft.functions.Corpus.repetitionStats(survivors)
      .where(col("dup_bigram_frac") < 0.9 &&
        col("n_tokens") >= 10 &&
        col("n_distinct").cast("double") / col("n_tokens") >= 0.2)
      .select("doc_id")
    val gated = survivors.join(rep, "doc_id")
    val n2 = gated.count()

    // 3. deterministic mixture sampling (keep 80% of every source)
    val sampled = gated.where(pmod(col("doc_id"), lit(10)) < 8)
    val n3 = sampled.count()

    // 4. pack into 256-token bins per source shard
    val packed = graft.functions.Corpus.packSequences(sampled, 256)
    val nBins = packed.count()

    println(s"docs: $n0 -> dedup: $n1 -> quality: $n2 -> sampled: $n3 -> bins: $nBins")
    packed.orderBy("source", "bin").show(10, truncate = false)
    spark.stop()
  }
}

/** The REAL image path end-to-end (r3): deterministic PNGs decoded via
  * `javax.imageio`, nearest-neighbor resized, stats re-extracted from the
  * re-encoded payloads — the decode→transform→re-encode loop a multimodal
  * curation job runs, verifiable because the pixels follow a formula.
  *
  * Run: `sbt "runMain graft.examples.ImagePipelineExample [sfDir]"`
  */
object ImagePipelineExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val docs = graft.model.Tables.documents(spark, dir)
    val media = graft.operators.Multimodal.syntheticImages(docs).toDF()
    val before = graft.operators.Multimodal.imageStats(media)
    val resized = graft.operators.Multimodal.resizeDecoded(media, 8, 8).toDF()
    val after = graft.operators.Multimodal.imageStats(resized)
    println("decoded 16x16 stats:")
    before.orderBy("id").show(5, truncate = false)
    println("after real 8x8 nearest-neighbor resize + PNG re-encode:")
    after.orderBy("id").show(5, truncate = false)
    spark.stop()
  }
}

/** The end-to-end TRAINING-DATA CURATION pipeline a user of the
  * extended engine runs (each stage is an oracle-checked operator —
  * this main just chains them the way a production job would):
  *
  *  1. exact dedup (128-bit content keys)
  *  2. near-dup clustering (MinHash banding → exact-Jaccard verify →
  *     CC), keeping each cluster's canonical survivor
  *  3. substring-level dedup: strip cross-document repeated ≥5-token
  *     spans from the survivors (the boilerplate class doc-level
  *     near-dup can't see)
  *  4. PII redaction (emails / IPv4 / phones → typed sentinels)
  *  5. quality gating (C4/Gopher-style per-language bounds)
  *  6. domain caps + temperature-rebalanced source mixing
  *  7. token-budgeted admission (the training run's actual unit)
  *
  * Run: `sbt "runMain graft.examples.CurateCorpusExample [sfDir]"`
  */
object CurateCorpusExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    import graft.functions.{Corpus, Dedup}
    val docs = graft.model.Tables.documents(spark, dir)
    println(s"[curate] input docs: ${docs.count()}")

    // 1-2: exact + near-dup survivors (cluster-canonical doc ids)
    val survivors = Dedup.nearDupSurvivors(docs, n = 2, threshold = 0.5)
    val kept = docs.join(survivors, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    println(s"[curate] after exact+near dedup: ${kept.count()}")

    // 3: strip cross-document repeated spans, keep the rebuilt text
    val stripped = Dedup.stripRepeatedSpans(kept, k = 5)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(kept.select("doc_id", "lang", "source"), Seq("doc_id"))
    val spanStats = Dedup.repeatedSpans(kept, k = 5)
      .agg(count(lit(1)), sum("span_tokens")).collect()(0)
    println(s"[curate] repeated spans stripped: ${spanStats.get(0)} spans / " +
      s"${spanStats.get(1)} tokens")

    // 4: PII redaction on the stripped text
    val redacted = Corpus.piiRedact(stripped)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(stripped.select("doc_id", "lang", "source"), Seq("doc_id"))
      .localCheckpoint(true)

    // 5: quality gate (per-language bounds)
    val quality = Corpus.qualityGate(redacted)
    println("[curate] quality pass rates per lang:")
    quality.show(10, truncate = false)

    // 6-7: temperature mixing quotas, then token-budgeted admission
    Corpus.temperatureMix(redacted, maxKeep = 0.8).show(5, truncate = false)
    val admitted = Corpus.tokenBudgetSample(redacted, budgetTokens = 20000L)
    println(s"[curate] token-budget admitted: ${admitted.count()} docs, " +
      s"budget 20000 tokens/source")
    spark.stop()
  }
}
