package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations with exact-verify gates.
  *
  * Sketches are the natural citizens of the reference's summary-
  * aggregation model (GS/GraphAggregation.java:~30 — bounded mergeable
  * state folded per partition, merged across): a count-min sketch or an
  * HLL register bank IS such a summary, with element-wise-add /
  * register-max as the merge. Both sketches here are order-independent
  * (counter adds and register maxes commute), so results are
  * deterministic for a fixed seed regardless of partitioning — which is
  * what lets the gate rows hash-match a DuckDB oracle.
  *
  * The gate pattern (same as the ANN recall gates): run the sketch AND
  * the exact computation in one plan, emit per-group rows asserting the
  * sketch's guarantee against the exact value. The oracle recomputes the
  * exact side and expects the guarantee to hold.
  */
object Sketches {

  /** Count-min-sketch heavy hitters over whitespace tokens, verified
    * against exact counts. Output: (token, exact_cnt, within_bound) for
    * the exact top-`k` tokens (ties → lexicographic, same contract as
    * the q21 token query). `within_bound` asserts the classic CMS
    * guarantee: exact ≤ estimate ≤ exact + ⌈eps·N⌉ (N = total token
    * occurrences) — over-estimation only, bounded by eps·N.
    *
    * Scale shape: the sketch is one `count_min_sketch` aggregation
    * (map-side partial sketches, element-wise-add merge — a few KB per
    * partial regardless of input size); the exact side is the same
    * one-shuffle token count the top-k query already does. The driver
    * touches only the final ~KB sketch and k tokens (model state, like
    * IVF centroids).
    */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 10, eps: Double = 0.001): DataFrame =
    cmsGateWithSketch(docs, k, eps)._1

  /** The gate rows TOGETHER WITH the serialized sketch they were
    * checked against — so callers needing both (the streaming-parity
    * replay) pay for one tokenize + one sketch aggregation, not two.
    */
  private[graft] def cmsGateWithSketch(docs: DataFrame, k: Int = 10,
                                       eps: Double = 0.001): (DataFrame, Array[Byte]) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val tokens = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
      .cutLineage()

    // exact counts + deterministic top-k (ties → lexicographic)
    val exact = tokens.groupBy("token").agg(count("*").as("exact_cnt"))
    val topK = exact.orderBy(col("exact_cnt").desc, col("token").asc).limit(k)
      .collect().map(r => r.getString(0) -> r.getLong(1))

    val n = tokens.count()
    val bound = math.ceil(eps * n).toLong

    // one global CMS; partials merge by counter addition (order-free)
    val sketchBytes = tokens
      .agg(expr(s"count_min_sketch(token, cast($eps as double), cast(0.99 as double), 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))

    val gate = topK.toSeq.map { case (tok, cnt) =>
      // the SQL agg hashes the UTF-8 bytes of each string, so probe with
      // the same representation
      val est = cms.estimateCount(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (tok, cnt, est >= cnt && est <= cnt + bound)
    }.toDF("token", "exact_cnt", "within_bound")
    (gate, sketchBytes)
  }

  /** HLL++ distinct-token count per language next to the exact count,
    * with a relative-error gate. Output: (lang, n_exact, within_tol).
    * `rsd` is the sketch's target relative standard deviation; the gate
    * allows 5× that — comfortably above observed error for a fixed hash
    * family, so the row is deterministic for a given corpus.
    *
    * Scale shape: both sides are one aggregation; the HLL side carries a
    * fixed-size register bank per partial (register-wise max merge) and
    * the exact side shuffles one row per distinct (lang, token).
    */
  def hllDistinctGate(docs: DataFrame, rsd: Double = 0.01): DataFrame = {
    val tokens = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .where(col("token") =!= "")
    tokens.groupBy("lang")
      .agg(countDistinct(col("token")).as("n_exact"),
        approx_count_distinct(col("token"), rsd).as("n_approx"))
      .select(col("lang"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact") * lit(5 * rsd)).as("within_tol"))
  }

  /** Corpus OVERLAP estimation by HLL register algebra — sizing the
    * train∩bench token overlap per language WITHOUT the join/anti-join
    * a full decontamination pays: |A∩B| ≈ est(A) + est(B) − est(A∪B)
    * (inclusion–exclusion; the union sketch is the element-wise max of
    * the two register banks — the mergeability that makes the whole
    * estimate one aggregation over one pass of each corpus). The
    * standard pre-flight before committing to an exact decontamination
    * run at 100 TB: if the overlap estimate is ~0, skip the join.
    *
    * Engine-portable and exact-integer end to end: token → 31-bit
    * integer via the md5-hex prefix (the q192 bucket trick both engines
    * compute identically) → the q220 register discipline
    * (multiplicative hash, 16 bucket/rank INT registers, floor-division
    * estimator). ONE aggregation computes all three register banks —
    * per-side banks via conditional max, the union bank via plain max —
    * so each corpus is scanned once. The overlap estimate can be
    * slightly negative at tiny cardinalities (estimator noise);
    * emitted as-is, deterministically.
    *
    * Output: (lang, est_a, est_b, est_union, overlap_est) for every
    * lang present in either side.
    */
  def tokenOverlap(a: DataFrame, b: DataFrame): DataFrame = {
    def tokens(df: DataFrame, side: Int) = df
      .select(col("lang"), lit(side).as("s"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .where(col("token") =!= "")
    val both = tokens(a, 0).unionByName(tokens(b, 1))
      // md5-hex prefix → 31-bit integer, then the q220 register columns
      .withColumn("x",
        expr("conv(substring(md5(token), 1, 8), 16, 10)").cast("long")
          % lit(2147483648L))
    val withRegs = both.select(
      col("lang") +: col("s") +:
        graft.operators.HyperBall.regColsOf(col("x")): _*)
    val names = (0 until 16).map(j => s"r$j")
    val aggs =
      names.map(c => max(when(col("s") === 0, col(c)).otherwise(0)).as(s"a_$c")) ++
        names.map(c => max(when(col("s") === 1, col(c)).otherwise(0)).as(s"b_$c")) ++
        names.map(c => max(col(c)).as(s"u_$c")) ++
        Seq(sum(when(col("s") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_b"))
    val banks = withRegs.groupBy("lang").agg(aggs.head, aggs.tail: _*)
    // a side with zero tokens for the lang reports 0, not the empty
    // sketch's estimator floor (~10)
    def est(prefix: String, guard: String) = {
      val denom = names.map(c =>
        s"shiftleft(CAST(1 AS BIGINT), 28 - ${prefix}_$c)").mkString(" + ")
      expr(s"CASE WHEN $guard = 0 THEN CAST(0 AS BIGINT) " +
        s"ELSE CAST(46246722929 AS BIGINT) div ($denom) END")
    }
    banks.select(col("lang"),
      est("a", "n_a").as("est_a"), est("b", "n_b").as("est_b"),
      est("u", "n_a + n_b").as("est_union"))
      .withColumn("overlap_est",
        col("est_a") + col("est_b") - col("est_union"))
  }
}
