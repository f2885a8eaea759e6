package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.BpeEncode

/** Deterministic byte-pair-encoding tokenizer over the `documents`
  * table — the real-tokenizer upgrade of the whitespace/regex token
  * operators (a training-data pipeline budgets, packs and deduplicates
  * in SUBWORD tokens, not whitespace words).
  *
  * Design for 100 TB: the only corpus-sized work is ONE word-frequency
  * aggregation (a single shuffle on `word`); merge learning then runs
  * on the distinct-word table (bounded by vocabulary, ~Heaps-law
  * sublinear in corpus size), with one loop-control scalar read per
  * merge round (the q124/q132 iterative pattern). Application is a
  * BROADCAST dictionary join (distinct word → token count): each
  * distinct word is encoded once, never per occurrence.
  *
  * Determinism contract (cross-engine, hash-checkable):
  *  - words: split on single spaces, empties dropped, `|` stripped
  *    (the delimiter of the oracle's string encoding);
  *  - pair counts: ALL adjacent symbol positions, weighted by word
  *    frequency (overlapping repeats count every position);
  *  - merge choice per round: count DESC, then (left, right) ASC —
  *    binary string order in both engines (ASCII corpus);
  *  - merge application: [[graft.expressions.BpeEncode]]'s
  *    portable-replace pass, bit-compatible with an unrolled DuckDB
  *    `replace` chain.
  */
object Bpe {

  private def words(docs: DataFrame): Column =
    split(translate(col("text"), "|", ""), " ")

  /** Distinct words with corpus frequencies — the one corpus-sized
    * shuffle in the whole tokenizer.
    */
  def wordFrequencies(docs: DataFrame): DataFrame =
    docs.select(explode(words(docs)).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `k` merges. Per round: encode every distinct word with the
    * rules so far (from scratch — k is small, the word table is
    * vocabulary-sized), count adjacent symbol pairs, take the
    * deterministic argmax. The `.head()` per round is loop control (a
    * one-row scalar), not a data path.
    */
  def learnMerges(docs: DataFrame, k: Int): Array[(String, String, Long)] =
    learnMergesFrom(wordFrequencies(docs).cutLineage(), k)

  /** [[learnMerges]] over an ALREADY-AGGREGATED (word, cnt) frame — the
    * entry the composite operators use so the one corpus-sized shuffle
    * truly runs once per pipeline, not once per stage. Stops EARLY
    * (returning fewer than `k` merges) when no adjacent symbol pair
    * remains — every word fully merged — which is itself deterministic:
    * any engine replaying the selection on an exhausted pair space
    * selects nothing, so the learned vocabulary still matches.
    */
  def learnMergesFrom(wf: DataFrame, k: Int): Array[(String, String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val rules = out.map(m => Array(m._1, m._2)).toArray
      val syms = BpeEncode.column(col("word"), rules)
      val best = wf.select(syms.as("s"), col("cnt"))
        .where(size(col("s")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i + 1] AS b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else out += ((best(0).getString(0), best(0).getString(1), best(0).getLong(2)))
    }
    out.toArray
  }

  /** The learned vocabulary as a one-partition frame:
    * (merge_rank, left_sym, right_sym, pair_count).
    */
  def learnedVocab(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    learnMerges(docs, k).zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }.toSeq
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Broadcastable dictionary: distinct word → BPE token count under
    * the `k` learned merges. The word-frequency aggregation is built
    * ONCE and shared between merge learning and the dictionary
    * projection — the design note's one corpus-sized shuffle.
    */
  def tokenDict(docs: DataFrame, k: Int): DataFrame = {
    val wf = wordFrequencies(docs).cutLineage()
    val rules = learnMergesFrom(wf, k).map(m => Array(m._1, m._2))
    wf.select(col("word"),
      size(BpeEncode.column(col("word"), rules)).cast("long").as("word_tokens"))
  }

  /** Per-document token counts: (doc_id, n_words, n_bpe_tokens). The
    * corpus streams once against the broadcast dictionary.
    */
  def docTokenCounts(docs: DataFrame, k: Int): DataFrame = {
    val dict = tokenDict(docs, k)
    docs.select(col("doc_id"), explode(words(docs)).as("word"))
      .where(col("word") =!= "")
      .join(broadcast(dict), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("word_tokens")).as("n_bpe_tokens"))
  }

  /** [[Corpus.tokenBudgetSample]] re-based on BPE tokens: per-source
    * priority-ordered cumulative admission, but the running sum counts
    * SUBWORD tokens — what a training run actually consumes. Output:
    * (doc_id, source, n_tokens, cum_tokens) for admitted docs.
    */
  def tokenBudgetSampleBpe(docs: DataFrame, k: Int, budgetTokens: Long): DataFrame = {
    val dict = tokenDict(docs, k)
    val perDoc = docs.select(col("doc_id"), col("source"), explode(words(docs)).as("word"))
      .where(col("word") =!= "")
      .join(broadcast(dict), Seq("word"))
      .groupBy("doc_id", "source")
      .agg(sum(col("word_tokens")).as("n_tokens"))
    val pri = graft.Portable.prio31(col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(pri.asc, col("doc_id").asc)
    perDoc.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }
}
