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

  /** Adaptive LSH sizing — ONE calculus shared by [[cosinePairsBucketed]],
    * [[lshTopK]] and [[graft.functions.Corpus.embeddingContamination]].
    * Returns (planes, tables) for a corpus of `rows` vectors and a target
    * cosine `threshold`:
    *
    *  - Occupancy rule: planes = log2(rows) (floor 4) puts expected bucket
    *    occupancy near one row per table, so random-pair candidate volume
    *    (rows²/2^planes per table) stays ∝ tables × rows — linear.
    *  - Recall rule: per-table collision for a pair AT the threshold is
    *    p1 = (1-θ/π)^planes; to miss such a pair with probability ≤
    *    `recallMiss` using at most `maxTables` tables, p1 must stay ≥
    *    1 - recallMiss^(1/maxTables). Planes beyond ln(p1min)/ln(1-θ/π)
    *    CANNOT reach the recall target — at wide angles (low thresholds)
    *    this cap binds below log2(rows) and candidate volume is
    *    fundamentally ∝ rows²/2^planesCap per table: hyperplane LSH
    *    cannot be simultaneously high-recall and sub-quadratic there.
    *    That floor is a property of the hash family, not of this sizing
    *    (the 1M-doc tier-2 smoke measures both regimes, SCALE.md).
    *
    * Given the chosen planes, tables = ln(recallMiss)/ln(1-p1), capped at
    * `maxTables` — the cap trades recall below the target for bounded
    * work when even planes=1 is too selective (threshold ≤ ~0.1); the
    * q33/q36/q122 in-query gate rows are the check when that matters.
    */
  private[graft] def lshSizing(rows: Long, threshold: Double,
                               recallMiss: Double = 1e-3,
                               maxTables: Int = 64): (Int, Int) = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    // 62-bit ceiling: signatures pack one bit per plane into a Long
    val occupancy = math.min(62, math.max(4,
      (math.log(math.max(2L, rows).toDouble) / math.log(2)).ceil.toInt))
    val planesCap =
      if (p >= 1.0) Int.MaxValue
      else {
        val p1min = 1.0 - math.pow(recallMiss, 1.0 / maxTables)
        math.max(1, (math.log(p1min) / math.log(p)).floor.toInt)
      }
    val planes = math.min(occupancy, planesCap)
    val p1 = math.pow(p, planes)
    val tables =
      if (p1 >= 1.0) 2
      else math.min(maxTables,
        math.max(2, (math.log(recallMiss) / math.log1p(-p1)).ceil.toInt))
    (planes, tables)
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
    // NOTE: this count EXECUTES the corpus plan — real work for a
    // filtered/derived frame (only a bare parquet scan answers from
    // footer metadata). Acceptable here because the fence must see the
    // true row count before agreeing to an O(n²) audit.
    val n = corpus.count()
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
    * whose collision probability per plane is p = 1-θ/π.
    *
    * `nPlanes`/`nTables` default to 0 = SIZE ADAPTIVELY via
    * [[lshSizing]] — planes from the bucket-occupancy rule (log2(rows)),
    * capped by the recall rule so pairs AT the threshold are still found
    * with probability ≥ 99.9%, tables solved from the collision
    * calculus. A fixed plane count is a scale trap (4 planes = 16
    * buckets/table ⇒ candidates → |corpus|²/16 — the degenerate shape
    * the 1M×2M contamination tier-2 smoke measured, SCALE.md); the
    * adaptive default keeps candidates ∝ tables × |corpus| whenever the
    * threshold's recall cap permits.
    *
    * Plan shape: signatures are one narrow projection per table over a
    * checkpointed (id, vec, norm) table; candidates come from a
    * self-equi-join on (table, signature) — work tracks bucket
    * co-occupancy, never |corpus|²; the verify join fetches the two
    * embeddings for candidate ids only. When `dim`, `nPlanes` and
    * `nTables` are all pinned by the caller, composing the plan runs NO
    * Spark job (the checkpoint is lazy); otherwise one combined
    * count+dim aggregate materializes the checkpoint and feeds the
    * sizing — the corpus plan still executes exactly once.
    */
  def cosinePairsBucketed(corpus: DataFrame, threshold: Double,
                          nPlanes: Int = 0, nTables: Int = 0,
                          dim: Int = -1): DataFrame = {
    val pinned = dim > 0 && nPlanes > 0 && nTables > 0
    val vecs = corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .localCheckpoint(!pinned) // nTables signature branches + 2 verify sides
    val (d, planes, tables) =
      if (pinned) (dim, nPlanes, nTables)
      else {
        val stats = vecs.agg(count(lit(1)), max(size(col("e")))).head()
        val rows = stats.getLong(0)
        val dd = if (dim > 0) dim
          else if (stats.isNullAt(1)) 1 // empty corpus: any plane dim works
          else stats.getInt(1)
        val (ap, at) = lshSizing(rows, threshold)
        (dd, if (nPlanes > 0) nPlanes else ap, if (nTables > 0) nTables else at)
      }
    // ALL tables' signatures in one codegen'd expression + posexplode —
    // one scan of the checkpoint and one fused loop per row, where a
    // per-table union (or per-plane literal columns) re-plans nTables
    // branches and blows codegen at adaptive table counts
    val sigs = vecs.select(col("vec_id"),
        posexplode(signatures(col("e"), tables, planes, d)))
      .toDF("vec_id", "tbl", "sig")
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

  /** ALL `nTables` signatures at once (`array<long>`, element t = the
    * seed-42+t table's signature) — one fused codegen'd loop with the
    * plane tensor as a single plan constant; bit-identical to calling
    * [[signature]] per table (spec-checked), but O(tables) smaller
    * generated code. This is the form every bucketed kernel uses.
    */
  def signatures(vec: Column, nTables: Int, nPlanes: Int, dim: Int,
                 seedBase: Long = 42L): Column =
    VectorExpressions.hyperplaneSignatures(vec,
      Array.tabulate(nTables)(t => planes(nPlanes, dim, seedBase + t)))

  /** Approximate top-k: candidates share an LSH bucket with the query
    * (multi-probe over `nTables` independent signatures), then exact
    * cosine within candidates. Recall measured against
    * [[bruteForceTopK]] in tests.
    *
    * Tuning: recall for a neighbor at angle θ is
    * 1 - (1 - (1-θ/π)^nPlanes)^nTables; more planes → smaller buckets →
    * fewer candidates but lower recall. `nPlanes`/`nTables` default to
    * 0 = SIZE ADAPTIVELY via [[lshSizing]] at `targetCosine` — the
    * cosine at which 99.9% recall is guaranteed (neighbors ABOVE it
    * collide strictly more often; neighbors below it degrade smoothly).
    * The 0.5 default matches weakly-clustered corpora where the true
    * top neighbor sits at cosine ~0.3–0.6; raise it toward 0.9 for
    * near-duplicate-heavy corpora — the recall cap then permits
    * log2(rows) planes and candidates stay ∝ tables × |corpus|.
    *
    * When `dim`, `nPlanes` and `nTables` are all pinned, composing the
    * plan runs NO Spark job (lazy checkpoint); otherwise one combined
    * count+dim aggregate on the corpus materializes its checkpoint and
    * feeds the sizing — the corpus plan executes once either way (the
    * checkpoint serves all nTables signature branches).
    *
    * `probeHamming1` turns on MULTI-PROBE (Lv et al. 2007, public): each
    * query probes its exact bucket PLUS every Hamming-1 neighbor bucket
    * (one signature bit flipped) in every table. A neighbor separated
    * from the query by exactly one disagreeing plane is then found with
    * certainty in that table, which is where [[lshSizing]]'s
    * fundamental wide-angle recall cap binds — more recall WITHOUT more
    * tables or any extra corpus-side work: only the (broadcast-tiny)
    * query side fans out ×(planes+1), so candidate volume stays ∝
    * tables × corpus-bucket occupancy along the probed keys (q33's gate
    * row checks the recall side in-query).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 0, nTables: Int = 0, dim: Int = -1,
              targetCosine: Double = 0.5,
              probeHamming1: Boolean = false): DataFrame = {
    val pinned = dim > 0 && nPlanes > 0 && nTables > 0
    val cVecs = corpus
      .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("e_neighbor_id"))
      .localCheckpoint(!pinned)
    // plane dimension comes from the data unless pinned — a hard-coded
    // mismatch would throw mid-query in DotProduct's strict length check
    val (d, planes, tablesN) =
      if (pinned) (dim, nPlanes, nTables)
      else {
        val stats = cVecs.agg(count(lit(1)), max(size(col("e_neighbor_id")))).head()
        val dd = if (dim > 0) dim
          else if (stats.isNullAt(1)) 1
          else stats.getInt(1)
        val (ap, at) = lshSizing(stats.getLong(0), targetCosine)
        (dd, if (nPlanes > 0) nPlanes else ap, if (nTables > 0) nTables else at)
      }
    def signed(vecs: DataFrame, idCol: String): DataFrame =
      vecs.select(col(idCol), col(s"e_$idCol"),
          posexplode(signatures(col(s"e_$idCol"), tablesN, planes, d)))
        .toDF(idCol, s"e_$idCol", "tbl", "sig")
    val c = signed(cVecs, "neighbor_id")
    val q0 = signed(queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("e_query_id")), "query_id")
    // multi-probe: fan the QUERY side out to its Hamming-1 bucket keys —
    // the corpus side and its bucketing are untouched. The signature is
    // a 64-bit long, so a pinned nPlanes past 64 would silently wrap
    // shiftleft and probe duplicate/wrong buckets — fail loud instead
    // (planes is also interpolated into the probe SQL below).
    require(planes >= 1 && planes <= 64,
      s"lshTopK: nPlanes must be in [1, 64] (signature is a 64-bit long), got $planes")
    val q = if (!probeHamming1) q0
      else q0.select(col("query_id"), col("e_query_id"), col("tbl"),
        explode(concat(array(col("sig")),
          expr(s"transform(sequence(0, ${planes - 1}), " +
            "j -> sig ^ shiftleft(CAST(1 AS BIGINT), j))"))).as("sig"))
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
