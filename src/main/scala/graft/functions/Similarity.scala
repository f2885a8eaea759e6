package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions

/** Similarity search over an embedding column (`array<float>`).
  *
  * All kernels are built from the native [[graft.expressions.DotProduct]]
  * Catalyst expression — no Scala UDFs, no intermediate arrays, the whole
  * pipeline stays inside WholeStageCodegen. Arrays are cast to double
  * before any arithmetic so results are engine-portable bit-for-bit at
  * 6-decimal rounding.
  *
  *  - [[bruteForceTopK]]: exact top-k; the query side is broadcast, the
  *    corpus streams through — one pass over the corpus per batch of
  *    queries, no shuffle of the corpus itself (the scale baseline).
  *  - [[lshTopK]]: random-hyperplane LSH — hash corpus and queries to
  *    signature buckets (deterministic, seeded), then brute-force only
  *    within matching buckets. Trades recall for a corpus-partitioned
  *    candidate join; the 100 TB path where the corpus no longer fits a
  *    single scan per query batch.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays — a native
    * codegen'd Catalyst expression (see [[graft.expressions.DotProduct]]);
    * same element-order summation as the HOF formulation, ~10x faster.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, sim) with sim rounded to 6dp
    * and ties broken by lower neighbor id (deterministic).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms are precomputed once per vector, not once per pair
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", norm(col("qe")))
    val e = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("ne"))
      .withColumn("nn", norm(col("ne")))
    val sims = e.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qe"), col("ne")) / (col("qn") * col("nn")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** All corpus pairs (a < b) with cosine ≥ threshold (embedding
    * near-duplicate detection). Exact — and deliberately quadratic: this
    * is the AUDIT baseline the approximate paths are verified against
    * ([[lshTopK]] buckets, [[Dedup.minhashPairs]] bands), not a shipped
    * scale path. The fence below refuses corpora where n²/2 pair rows
    * would no longer be a deliberate choice; raise `maxRows` explicitly
    * to audit a bigger sample, or use the bucketed operators for the
    * full corpus.
    */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  maxRows: Long = 100000L): DataFrame = {
    val n = corpus.count() // parquet sources answer from footer metadata
    require(n <= maxRows,
      s"cosinePairs is an exact all-pairs audit over ${n} rows (~${n * n / 2} pairs); " +
        s"cap is $maxRows. Use Similarity.lshTopK / Dedup.minhashPairs for the full " +
        "corpus, or pass maxRows explicitly to audit a sample this big.")
    val a = corpus.select(col("vec_id").as("vec_a"), asDouble(col("embedding")).as("ea"))
      .withColumn("na", norm(col("ea")))
    val b = corpus.select(col("vec_id").as("vec_b"), asDouble(col("embedding")).as("eb"))
      .withColumn("nb", norm(col("eb")))
    a.crossJoin(b)
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Bucketed embedding near-duplicate pairs — the 100 TB form of
    * [[cosinePairs]]: random-hyperplane LSH candidates (a pair is a
    * candidate iff it shares a full signature in ≥1 of `nTables`
    * tables) verified with exact cosine at the same 6-dp rounding.
    * Found pairs are therefore always a SUBSET of the exact audit
    * (precision 1 by construction — the verify step applies the
    * identical formula); recall is 1-(1-p^nPlanes)^nTables for a pair
    * whose collision probability per plane is p = 1-θ/π. The defaults
    * target the ~0.3-cosine near-dup cut (p ≈ 0.6 → recall ≈ 0.69);
    * raise nPlanes toward log2(corpus/bucket_target) for ≥0.9 near-dup
    * corpora, where p ≈ 0.86 keeps recall high with far smaller
    * buckets.
    *
    * Plan shape: signatures are one narrow projection per table over a
    * checkpointed (id, vec, norm) table; candidates come from a
    * self-equi-join on (table, signature) — work tracks bucket
    * co-occupancy, never |corpus|²; the verify join fetches the two
    * embeddings for candidate ids only.
    */
  def cosinePairsBucketed(corpus: DataFrame, threshold: Double,
                          nPlanes: Int = 4, nTables: Int = 8,
                          dim: Int = -1): DataFrame = {
    val vecs = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .localCheckpoint(true) // nTables signature branches + 2 verify sides
    val d = if (dim > 0) dim else vecs.select(size(col("e"))).head().getInt(0)
    val sigs = (0 until nTables).map { t =>
      vecs.select(col("vec_id"), lit(t).as("tbl"),
        signature(col("e"), nPlanes, d, seed = 42L + t).as("sig"))
    }.reduce(_ unionByName _)
    val cands = sigs.toDF("vec_a", "tbl", "sig")
      .join(sigs.toDF("vec_b", "tbl", "sig"), Seq("tbl", "sig"))
      .where(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    cands
      .join(vecs.toDF("vec_a", "ea", "na"), Seq("vec_a"))
      .join(vecs.toDF("vec_b", "eb", "nb"), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Semantic near-dup clusters: connected components over a verified
    * cosine-pair graph, min-vec_id labels (so `vec_id == cluster` marks
    * the canonical survivor — [[Dedup.nearDupClusters]]'s contract on
    * the embedding side). The pair source is pluggable: any frame with
    * (vec_a, vec_b) columns whose pairs passed exact-cosine verification
    * works, and the downstream CC is identical — at 100 TB feed it
    * [[cosinePairsBucketed]] (recall-gated by q122); for the
    * oracle-replicable audit use [[cosinePairs]] via [[semanticClusters]].
    */
  def clustersFromPairs(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = graft.operators.SummaryAggregations.connectedComponents(
        pairs.select(col("vec_a").as("src"), col("vec_b").as("dst")))
      .toDF("vec_id", "cluster")
    corpus.select("vec_id").join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"))
      .withColumn("is_canonical", col("vec_id") === col("cluster"))
  }

  /** [[clustersFromPairs]] over the exact [[cosinePairs]] audit —
    * inherits its 100k-row fence; swap the pair source for
    * [[cosinePairsBucketed]] past that.
    */
  def semanticClusters(corpus: DataFrame, threshold: Double): DataFrame =
    clustersFromPairs(corpus, cosinePairs(corpus, threshold))

  /** Deterministic random hyperplanes: seeded at plan build time (no
    * runtime randomness), shipped as a broadcast literal.
    */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane signature (one bit per plane) as a LongType. */
  def signature(vec: Column, nPlanes: Int, dim: Int, seed: Long): Column = {
    val ps = planes(nPlanes, dim, seed)
    ps.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      val planeCol = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(p.map(lit)): _*)
      acc + when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
  }

  /** Approximate top-k: candidates share an LSH bucket with the query
    * (multi-probe over `nTables` independent signatures), then exact
    * cosine within candidates. Recall measured against
    * [[bruteForceTopK]] in tests.
    *
    * Tuning: recall for a neighbor at angle θ is
    * 1 - (1 - (1-θ/π)^nPlanes)^nTables; more planes → smaller buckets →
    * fewer candidates but lower recall. The defaults favor recall on
    * weakly-clustered corpora (top-neighbor cosine ~0.3–0.5); raise
    * nPlanes toward log2(corpus/bucket_target) when near-duplicates
    * (cosine ≥0.9) are the target — their collision probability stays
    * high even with 16+ planes.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 4, nTables: Int = 8, dim: Int = -1): DataFrame = {
    // plane dimension comes from the data (dim <= 0, the default) — a
    // hard-coded mismatch would truncate dots silently before DotProduct
    // grew its strict length check; now it would throw mid-query instead
    val d = if (dim > 0) dim else corpus.select(size(col("embedding"))).head().getInt(0)
    def signed(df: DataFrame, idCol: String): DataFrame = {
      val vecs = df.select(col("vec_id").as(idCol), asDouble(col("embedding")).as(s"e_$idCol"))
      val tables = (0 until nTables).map { t =>
        vecs.select(col(idCol), col(s"e_$idCol"),
          lit(t).as("tbl"), signature(col(s"e_$idCol"), nPlanes, d, seed = 42L + t).as("sig"))
      }
      tables.reduce(_ unionByName _)
    }
    val c = signed(corpus, "neighbor_id")
    val q = signed(queries, "query_id")
    val cands = c.join(broadcast(q), Seq("tbl", "sig"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("e_query_id"), col("e_neighbor_id")), 6).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
