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
}
