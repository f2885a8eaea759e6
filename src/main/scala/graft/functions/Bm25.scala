package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-integer BM25 ranked retrieval over the `documents` table — the
  * relevance-scoring primitive of retrieval-augmented curation (pick
  * the best training documents for a topic) expressed engine-portably.
  *
  * Okapi BM25 with k1 = 1.2, b = 0.75. The only floating-point step is
  * the per-term idf fixing — idf_micro = round(10⁶·ln(1 + (N−df+0.5)/
  * (df+0.5))), the q77 tf-idf discipline (one ROUND over a multi-ulp-
  * separated value, then integers everywhere) — after which the
  * tf/length normalization is EXACT integer arithmetic: with k1 = 6/5
  * and b = 3/4, multiplying numerator and denominator by 10·T (T =
  * total corpus tokens) gives
  *
  *   score_micro(d,t) = idf_micro(t) · 22·tf·T div (10·T·tf + 3·T + 9·dl·N)
  *
  * computed in DECIMAL(38,0)/HUGEINT — T reaches ~10¹³ at the 100 TB
  * corpus and idf·tf·T products overflow 64-bit long before that — with
  * a single truncating division back to BIGINT micro-units both engines
  * share.
  *
  * Plan shape at scale: the fixed query-term table is broadcast into
  * the exploded token scan (a semi-join that prunes the corpus to
  * matching postings BEFORE any shuffle); corpus stats (N, T) are one
  * scalar aggregate; per-(query, doc) summation and the top-k window
  * shuffle only the pruned postings. Nothing is ever all-terms × docs.
  */
object Bm25 {

  /** The fixed benchmark queries (id, terms). Terms come from the
    * corpus's closed vocabulary so every query has matches.
    */
  val Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "join", "window"),
    2L -> Seq("fast", "merge"),
    3L -> Seq("customer", "table", "scan"))

  /** The retrieval INDEX: the compact (doc_id, token, tf) table — the
    * artifact every downstream branch (df, dl, corpus stats, postings)
    * reads instead of re-tokenizing the corpus. Materialized eagerly:
    * without the checkpoint the optimizer pushes per-branch term
    * filters below the aggregate and the text column (the dominant
    * 100 TB cost) is scanned three times. dl = Σ_token tf, so no
    * second tokenize pass exists at all. This is also the MAINTAINED
    * artifact — see [[maintain]].
    */
  def index(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .cutLineage()

  /** INDEX MAINTENANCE — the daily-refresh path for the retrieval
    * index (the q210 story applied to postings): per-doc tf rows are
    * independent, so the maintained index is exactly
    * `tf ∖ removed ∪ index(added)` — one anti-join on the COMPACT
    * table plus a tokenize of the ADDED docs only; the old corpus text
    * is never re-scanned. Everything derived (dl, N, T, df, idf) is
    * recomputed from the maintained compact table, so the scores are
    * bit-equal to a full rebuild of the final corpus — which is what
    * the q218 oracle hash-checks. Contract: `added` doc_ids must not
    * collide with surviving ids (an in-place UPDATE = list the id in
    * `removed` AND ship the new text in `added`).
    */
  def maintain(tf: DataFrame, added: DataFrame,
               removed: DataFrame): DataFrame =
    // materialized like index(): topKFrom's branches (dl scalar, df,
    // postings tf+dl legs) would otherwise re-execute the anti-join
    // plan once each
    tf.join(removed.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(index(added))
      .cutLineage()

  /** Top-`k` documents per benchmark query by summed BM25 over its
    * terms; ties broken by doc_id ascending. Output:
    * `(query_id, rnk, doc_id, score_micro)`.
    */
  def topK(docs: DataFrame, k: Int = 10,
           queries: Seq[(Long, Seq[String])] = Queries): DataFrame =
    topKFrom(index(docs), k, queries)

  /** [[topK]] over an already-built (doc_id, token, tf) index — the
    * entry the maintained path serves from.
    */
  def topKFrom(tf: DataFrame, k: Int = 10,
               queries: Seq[(Long, Seq[String])] = Queries): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    // corpus scalars: docs with ≥1 token (tokenizable corpus) and Σ dl;
    // a token-less corpus has a NULL sum — coalesce to the empty result
    // via totTok = 0 (no postings exist either) rather than an NPE
    val Seq(nDocs, totTok) = {
      val r = dl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()(0)
      Seq(r.getLong(0), r.getLong(1))
    }
    val qterms = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "token")
    val df = tf.join(broadcast(qterms.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("df"))
    val idf = df.select(col("token"),
      round(lit(1e6) * log(lit(1.0) +
        (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .cast("long").as("idf_micro"))
    val postings = tf
      .join(broadcast(qterms), Seq("token"))
      .join(broadcast(idf), Seq("token"))
      .join(dl, Seq("doc_id"))
    val contrib = postings
      .withColumn("num",
        col("idf_micro").cast("decimal(38,0)") * lit(22L) * col("tf") * lit(totTok))
      .withColumn("den",
        col("tf").cast("decimal(38,0)") * lit(10L * totTok)
          + lit(3L * totTok) + col("dl").cast("decimal(38,0)") * lit(9L * nDocs))
      .select(col("query_id"), col("doc_id"),
        expr("CAST(num div den AS BIGINT)").as("s"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("s")).as("score_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score_micro"))
  }
}
