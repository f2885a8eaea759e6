package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: tokenization, frequency,
  * quality scoring, document fingerprinting, language ID. Everything is
  * codegen'd Catalyst expressions over the `documents` table schema
  * (doc_id, text, lang, source, n_chars) — no UDFs, no collect.
  */
object TextStats {

  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation — the usual pre-tokenizer regex.
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Global token frequency table, deterministically ordered. */
  def topTokens(docs: DataFrame, k: Int): DataFrame =
    Spread(docs).select(explode(tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count("*").as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** Per-document stats: token count, distinct tokens, average token
    * length (exact integer arithmetic: text is single-space separated),
    * type-token ratio.
    */
  def qualityStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    Spread(docs).select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      round((length(col("text")) - size(t) + 1).cast("double") / size(t), 6).as("avg_token_len"),
      round(size(array_distinct(t)).cast("double") / size(t), 6).as("type_token_ratio"))
  }

  /** C4-style text normalization: digit runs masked to `#`, whitespace
    * runs collapsed to one space, edges trimmed — the standard cheap
    * cleaning pass before tokenization/dedup. Pure codegen'd
    * `regexp_replace` chain. The whitespace class is spelled explicitly
    * ([ \t\n\r\f]) rather than `\s`: Java's \s includes \x0B where RE2's
    * does not, and an explicit class keeps both engines (and q96's
    * oracle) bit-identical while still collapsing real multi-line text.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "[0-9]+", "#"), "[ \\t\\n\\r\\f]+", " "))

  /** Per-document cleaning audit: raw vs cleaned length and cleaned
    * token count — the before/after a curation pipeline reports.
    */
  def cleaningStats(docs: DataFrame): DataFrame = {
    val ct = cleanText(col("text"))
    Spread(docs).select(col("doc_id"),
      length(col("text")).cast("long").as("raw_len"),
      length(ct).cast("long").as("clean_len"),
      size(split(ct, " ")).cast("long").as("n_tokens"))
  }

  /** Heuristic quality score in [0,1]: balanced token length + lexical
    * diversity + reasonable document length. Deterministic, spec-tested.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    qualityStats(docs).select(
      col("doc_id"),
      round(
        least(col("n_tokens"), lit(100)).cast("double") / 100 * 0.4 +
          col("type_token_ratio") * 0.4 +
          when(col("avg_token_len").between(3, 10), 0.2).otherwise(0.0), 6)
        .as("quality"))

  /** Deterministic document fingerprint: polynomial rolling hash over the
    * character stream, mod p — engine-portable (plain integer arithmetic
    * over code points, no engine-specific hash family), so DuckDB can
    * replay it bit-for-bit as `list_reduce` over `string_split(text, '')`
    * and the driver hash-checks q29. Sequential in character order via
    * the `aggregate` higher-order function.
    */
  def fingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31L + ascii(c)) % p)
  }

  def fingerprints(docs: DataFrame): DataFrame =
    Spread(docs).select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Winnowing (Schleimer–Wilkerson–Aiken, the MOSS fingerprint
    * standard): hash every character k-gram with the engine-portable
    * polynomial hash, slide a w-hash window, keep each window's minimum.
    * Guarantee: any shared substring of length ≥ w+k−1 between two
    * documents shares at least one selected fingerprint; expected
    * density 2/(w+1) of the k-gram stream. Documents shorter than k
    * select nothing; with fewer than w k-grams the global minimum is
    * selected (every non-trivial doc gets ≥1 fingerprint).
    *
    * Returns (doc_id, selected ARRAY<BIGINT>) — distinct selected
    * hashes. Shuffle-free map stage; the O(n·k) hashing is the cost
    * (k is small; a two-pass rolling form trades it for O(n) at the
    * price of a modular inverse — not worth it below k≈20).
    */
  def winnowSelected(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    Spread(docs).select(col("doc_id"),
      greatest(length(col("text")) - (k - 1), lit(0)).cast("long").as("n_kgrams"),
      graft.expressions.WinnowSelect(col("text"), k, w).as("selected"))

  /** The declarative HOF formulation of [[winnowSelected]]'s selection —
    * kept as the executable SPEC the native expression is property-
    * checked against (and the shape the DuckDB oracle mirrors). Two
    * hard-won plan notes if you ever resurrect it for production:
    * `codes`/`kg` must be materialized as COLUMNS in separate
    * projections (a HOF lambda re-evaluates any inlined subtree once PER
    * ELEMENT — the per-position slice becomes an O(n²) re-split of the
    * text; measured minutes instead of seconds on 500 docs), and any
    * downstream explode needs a checkpoint barrier (see
    * [[winnowJaccardPairs]]).
    */
  private[graft] def winnowSelectedHof(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val p = lit(1000000007L)
    Spread(docs)
      .select(col("doc_id"),
        transform(split(col("text"), ""), c => ascii(c).cast("long")).as("codes"))
      .select(col("doc_id"),
        when(size(col("codes")) >= k,
          transform(sequence(lit(0), size(col("codes")) - k), i =>
            aggregate(slice(col("codes"), i + 1, lit(k)), lit(0L),
              (acc, x) => (acc * 31L + x) % p)))
          .otherwise(array().cast("array<bigint>")).as("kg"))
      .select(col("doc_id"), size(col("kg")).cast("long").as("n_kgrams"),
        when(size(col("kg")) === 0, array().cast("array<bigint>"))
          .when(size(col("kg")) < w, array(array_min(col("kg"))))
          .otherwise(array_distinct(
            transform(sequence(lit(0), size(col("kg")) - w), j =>
              array_min(slice(col("kg"), j + 1, lit(w))))))
          .as("selected"))
  }

  /** Hash-checkable winnowing digest: (doc_id, n_kgrams, n_selected,
    * fp_sum) with fp_sum the exact integer sum of the selected set —
    * order-independent, so the oracle replays it with list arithmetic.
    */
  def winnowStats(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    winnowSelected(docs, k, w).select(col("doc_id"), col("n_kgrams"),
      size(col("selected")).cast("long").as("n_selected"),
      coalesce(aggregate(col("selected"), lit(0L), (a, x) => a + x), lit(0L)).as("fp_sum"))

  /** Winnow-set similarity pairs: Jaccard over the documents' selected
    * fingerprint sets, computed AFTER dropping "stop fingerprints" whose
    * document frequency exceeds `dfCap` — exactly the IR stopword-removal
    * move: a fingerprint shared by many docs carries no pair evidence
    * AND would cost df² join rows (measured: the uncapped self-join on a
    * 5k-doc shared-vocabulary corpus is 678M rows; capped at 10 it is
    * ~1e3). Output `(a, b, n_shared, jaccard)` for pairs at or above
    * `threshold`, a < b.
    *
    * Semantics note: this detects overlap in RARE fingerprints. On a
    * corpus with genuine near-duplicates the winnowing guarantee makes
    * twins share their (rare) cross-boundary fingerprints — the planted-
    * overlap spec demonstrates it; the synthetic bench corpus contains
    * no true near-dups, so its output is the (deterministic,
    * hash-checked) rare-overlap background.
    */
  def winnowJaccardPairs(docs: DataFrame, threshold: Double = 0.5,
                         dfCap: Int = 10, k: Int = 5, w: Int = 4): DataFrame = {
    // checkpoint BEFORE the explode: InferFiltersFromGenerate synthesizes
    // a `size(selected) > 0` predicate from the explode, and pushdown
    // substitutes the whole alias chain into it — without the barrier the
    // filter re-evaluates the full winnowing expression tree (with the
    // codes projection INLINED, i.e. the O(n²) shape) once more per row.
    // Measured: minutes vs seconds on 500 docs. The barrier makes the
    // inferred filter a cheap size() probe on materialized arrays.
    val sel = winnowSelected(docs, k, w).select("doc_id", "selected")
      .cutLineage()
    val e0 = sel.select(col("doc_id"), explode(col("selected")).as("h"))
    val keep = e0.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap).select("h")
    val e = e0.join(keep, "h").cutLineage()
    val ns = e.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = e.toDF("h", "a").join(e.toDF("h2", "b"),
        col("h") === col("h2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
    pairs
      .join(ns.toDF("a", "na"), Seq("a"))
      .join(ns.toDF("b", "nb"), Seq("b"))
      .select(col("a"), col("b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Top-`k` TF-IDF terms per document — the classic retrieval /
    * keyword-extraction scoring, engine-deterministic by the fixed-point
    * rule: `score_micro = tf · round(1e6 · ln(N / df))` (tf and df are
    * exact integers, the idf factor is rounded to micro-units BEFORE the
    * multiply, ties break lexicographically). N = documents with at
    * least one token, derived from the checkpointed tf table so the
    * corpus is scanned exactly once.
    *
    * Plan shape: one shuffle for per-(doc, token) tf, one for df; the
    * df table is vocabulary-sized and broadcast when it fits (AQE).
    * Top-k per doc is a bounded window sort per document.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count("*").as("tf"))
      .cutLineage()
    val n = tf.select(countDistinct("doc_id")).head().getLong(0)
    val df = tf.groupBy("token").agg(count("*").as("df"))
      .withColumn("idf_micro",
        round(lit(1e6) * log(lit(n.toDouble) / col("df"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("token").asc)
    tf.join(df, "token")
      .withColumn("score_micro", col("tf") * col("idf_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("doc_id", "rnk", "token", "score_micro")
  }

  /** Per-doc bigram language-model score in integer micro-units — the
    * CCNet-style "how typical is this document of the corpus" quality
    * signal, made hash-exact. The corpus's own bigram statistics are the
    * model (self-trained, like [[LangId]]):
    *
    *   p_mu(w1 w2)  = (count(w1 w2) · SCALE) div count(w1 ·)
    *   lm_mu(doc)   = (Σ over the doc's bigram OCCURRENCES p_mu) div n_bigrams
    *
    * — the mean conditional probability of each next token. (The usual
    * perplexity takes logs; the mean-probability form keeps every step
    * in truncating non-negative integer arithmetic so Spark `div` and
    * DuckDB `//` replay it bit-for-bit. Ranking direction is the same:
    * repetitive/templated docs score high, unusual token sequences low.)
    *
    * Plan shape at 100 TB: one explode + groupBy for corpus bigram
    * counts (vocabulary²-bounded, in practice Zipf-small), a map-side
    * prefix rollup for the conditioning counts, then one join of the
    * exploded doc bigrams against the probability table — dimension-like
    * and broadcast when it fits (AQE); bucket both sides by bigram hash
    * past that. Docs with fewer than 2 tokens have no bigrams and are
    * excluded (n_bigrams ≥ 1 on every output row).
    */
  def bigramLmScore(docs: DataFrame, scale: Long = 1000000L): DataFrame = {
    val bg = Spread(docs)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("t")) - 2),
          i => concat(col("t")(i), lit(" "), col("t")(i + 1)))).as("bg"))
      .cutLineage()
    val cb = bg.groupBy("bg").agg(count(lit(1)).as("c"))
    val cu = cb.groupBy(split(col("bg"), " ")(0).as("w1")).agg(sum("c").as("cu"))
    val p = cb.withColumn("w1", split(col("bg"), " ")(0))
      .join(cu, "w1")
      .select(col("bg"), expr(s"(c * $scale) div cu").as("pmu"))
    bg.join(p, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("pmu").as("psum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("psum div n_bigrams").as("lm_mu"))
  }

  /** Vocabulary coverage: build the top-`k` token vocabulary (count
    * desc, token asc — fully deterministic) and report each document's
    * out-of-vocabulary rate in micro-units:
    *
    *   oov_mu = (n_oov · SCALE) div n_tokens
    *
    * counting token OCCURRENCES (with multiplicity) on both sides — the
    * coverage check run before committing to a tokenizer vocab. The
    * vocab is token-count-table-sized (≪ corpus) and broadcast into an
    * anti-membership flag; per-doc stats are one explode + keyed agg.
    */
  def oovStats(docs: DataFrame, k: Int = 16, scale: Long = 1000000L): DataFrame = {
    val tok = Spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .cutLineage()
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .select(col("token"), lit(true).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr(s"(n_oov * $scale) div n_tokens").as("oov_mu"))
  }

  /** N-gram/token language-ID: self-trained token log-odds profiles.
    * `fit` learns per-language token frequencies from labeled docs (one
    * aggregation, result broadcast by Catalyst via the join); `predict`
    * scores each doc by Σ log P(token|lang) with add-one smoothing and
    * picks the argmax. A heuristic — accuracy depends on the corpus
    * carrying real per-language signal.
    */
  object LangId {
    /** (lang, token, logp) profile table. Log-odds are fixed-point
      * micro-units (`floor(ln(...) * 1e6)` as BIGINT): per-doc scores
      * become exact integer sums, so the argmax is independent of
      * float-summation order and an SQL oracle replays it bit-for-bit
      * (double sums are order-sensitive; integer sums aren't).
      */
    def fit(docs: DataFrame): DataFrame = {
      val tok = Spread(docs).select(col("lang"), explode(tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      val counts = tok.groupBy("lang", "token").agg(count("*").as("c"))
      val totals = tok.groupBy("lang").agg(count("*").as("tot"))
      counts.join(totals, Seq("lang"))
        .select(col("lang"), col("token"),
          floor(log((col("c") + 1).cast("double") / (col("tot") + 1000)) * 1e6)
            .cast("long").as("logp"))
    }

    /** (doc_id, predicted lang). Ties broken by lang name. */
    def predict(docs: DataFrame, profile: DataFrame): DataFrame = {
      val tok = Spread(docs).select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      val scored = tok.join(broadcast(profile), Seq("token"))
        .groupBy(col("doc_id"), col("lang")).agg(sum(col("logp")).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang").asc)
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("lang").as("predicted"))
    }
  }
}
