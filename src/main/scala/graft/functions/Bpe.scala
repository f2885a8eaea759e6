package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{BpeEncode, BpeMergeOnce}

/** Deterministic byte-pair-encoding tokenizer over the `documents`
  * table — the real-tokenizer upgrade of the whitespace/regex token
  * operators (a training-data pipeline budgets, packs and deduplicates
  * in SUBWORD tokens, not whitespace words).
  *
  * Design for 100 TB: the only corpus-sized work is ONE word-frequency
  * aggregation (a single shuffle on `word`); merge learning then runs
  * on the distinct-word table (bounded by vocabulary, ~Heaps-law
  * sublinear in corpus size) with INCREMENTALLY-MAINTAINED pair counts
  * — per round, only the words containing the won pair are touched and
  * only their pair-count deltas move, so a 32k–50k-merge production
  * vocabulary costs k bounded-size rounds, not k vocabulary re-encodes
  * (the one loop-control scalar read per round is the q124/q132
  * iterative pattern). Application is a BROADCAST dictionary join
  * (distinct word → token count): each distinct word is encoded once,
  * never per occurrence.
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

  /** Learn `k` merges — incremental pair-count maintenance plus BATCHED
    * selection (see [[learnMergesFrom]]): each round applies a provably
    * order-equivalent batch of merges, so learning a production-sized
    * vocabulary (k in the tens of thousands) costs k/batch-width
    * bounded-size rounds, never a corpus or vocabulary re-encode and
    * never k sequential driver-paced jobs.
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
    *
    * INCREMENTAL (the production-k path): pair counts are maintained
    * across rounds instead of re-derived by re-encoding the whole
    * vocabulary. The loop keeps two checkpointed working tables —
    * `enc` (each multi-symbol word's CURRENT symbol array + corpus
    * count) and `pc` (the adjacent-pair count table) — and per round:
    * select a BATCH of merges from `pc` (a bounded collect on a
    * vocabulary-bounded table — loop control, not a data path), apply
    * them in rank order to the AFFECTED words only (chained
    * [[graft.expressions.BpeMergeOnce]] passes over words containing
    * any batch adjacency — identical by construction to re-encoding
    * under all rules so far, since [[graft.expressions.BpeEncode]]
    * applies rules as the same one-pass units in the same order), and
    * adjust `pc` by the affected words' old-pairs −, new-pairs +
    * delta. Per-round work is O(vocab filter + affected words + |pc|)
    * for a whole batch of merges, so a 32k-vocabulary learn is
    * k/batch-width driver-paced rounds, not k (measured: SCALE.md
    * tier2bpe). Equality with [[learnMergesRescan]] is spec-checked
    * merge-for-merge.
    *
    * BATCH VALIDITY — why batching provably cannot reorder the merge
    * sequence. Let the pair table rank by (count DESC, (a,b) ASC). A
    * round admits the longest CONTIGUOUS rank-prefix m1..mN (width
    * capped at `maxBatch`, no skipping) such that
    *
    *  1. members are pairwise symbol-disjoint INCLUDING concats:
    *     {aj,bj} ∩ {ai, bi, ai+bi} = ∅ for every i < j — so applying
    *     earlier batch members cannot change a later member's count
    *     (no destroyed occurrence touches its symbols, and every
    *     created adjacency involves the new symbol ai+bi);
    *  2. cj > ⌊c1/2⌋ for j ≥ 2 — a merged pair's LEFTOVER occurrences
    *     (surviving (ai,bi) adjacencies from odd chains like "ababab",
    *     which the portable-replace pass leaves behind and sequential
    *     selection may re-pick later) number at most ⌊ci/2⌋ ≤ ⌊c1/2⌋
    *     (each leftover consumes two old occurrences), so they lose
    *     strictly to every batch member;
    *  3. the tail is shrunk until c_N is STRICTLY greater than the
    *     first non-admitted entry's count — every pair CREATED by a
    *     batch member (x, ai+bi)/(ai+bi, y) has count ≤ the old count
    *     of an adjacent pair (x,ai)/(bi,y), all of which rank past the
    *     boundary (they share a symbol, so they were never admitted),
    *     hence < c_N; strictness also removes the lex-tie hazard of a
    *     created pair tying a batch member's count.
    *
    * Under 1–3 the sequential argmax at step j is exactly mj: batch
    * members j..N keep their counts (1), every non-member old pair is
    * ≤ the boundary count < cj (prefix contiguity + 3), every created
    * pair is < c_N ≤ cj (3), every leftover is ≤ ⌊c1/2⌋ < cj (2), and
    * ties inside the batch follow rank order by construction. A round
    * degenerating to width 1 IS the sequential argmax. The recorded
    * counts match sequential's for the same reason (unchanged at
    * selection time).
    *
    * Working-table hygiene: each round's checkpoints are materialized
    * EAGERLY before the previous round's are unpersisted, and only
    * RDD ids this loop created are ever touched.
    *
    * `batchTrace`, when supplied, records each round's admitted batch
    * width (spec/diagnostics hook, the greedyColoring trace pattern).
    */
  def learnMergesFrom(wf: DataFrame, k: Int, maxBatch: Int = 64,
                      batchTrace: Option[scala.collection.mutable.Buffer[Int]] = None,
                      byteLevel: Boolean = false)
      : Array[(String, String, Long)] = {
    val spark = wf.sparkSession
    val sc = spark.sparkContext
    def pairsOf(df: DataFrame): DataFrame =
      df.where(size(col("s")) >= 2) // sequence(0, -1) DESCENDS — guard 1-symbol rows
        .select(explode(expr(
          "transform(sequence(0, size(s) - 2), i -> struct(s[i] AS a, s[i + 1] AS b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pc"))
    val before0 = sc.getPersistentRDDs.keySet
    // right-size the working tables: the vocabulary is tiny relative to
    // the corpus (Heaps' law), and each of the k rounds runs a handful
    // of jobs over these tables — 32 near-empty partitions per job is
    // pure task-scheduling overhead × k. ~250k words per partition,
    // capped at the session's parallelism.
    val vocabRows = wf.count()
    val parts = math.max(1, math.min(sc.defaultParallelism,
      (vocabRows / 250000L).toInt))
    val sym0 =
      if (byteLevel) byteSyms(col("word"))
      else BpeEncode.column(col("word"), Array.empty)
    var enc = wf.select(sym0.as("s"), col("cnt"))
      .where(size(col("s")) >= 2)
      .coalesce(parts)
      .cutLineage()
    var pc = pairsOf(enc).coalesce(parts).cutLineage()
    var ownedIds: Seq[Int] = (sc.getPersistentRDDs.keySet -- before0).toSeq
    require(maxBatch >= 1, s"learnMergesFrom: maxBatch must be >= 1, got $maxBatch")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    try {
      while (out.length < k && !exhausted) {
        val cap = math.min(maxBatch, k - out.length)
        val top = pc.orderBy(col("pc").desc, col("a").asc, col("b").asc)
          .limit(cap + 1).collect()
        if (top.isEmpty) exhausted = true
        else {
          // admit the valid rank-prefix (scaladoc conditions 1–3)
          val admitted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          val symbols = scala.collection.mutable.HashSet.empty[String]
          val c1 = top(0).getLong(2)
          var idx = 0
          var blocked = false
          while (!blocked && idx < top.length && admitted.length < cap) {
            val (a, b, c) = (top(idx).getString(0), top(idx).getString(1), top(idx).getLong(2))
            val ok = admitted.isEmpty ||
              (!symbols(a) && !symbols(b) && c > c1 / 2)
            if (ok) {
              admitted += ((a, b, c))
              symbols += a; symbols += b; symbols += (a + b)
              idx += 1
            } else blocked = true
          }
          // strict boundary drop (condition 3): pop trailing members
          // tying the first non-admitted count — width 1 is always valid
          // (it IS the sequential argmax, lex tie-break included)
          val boundary = if (idx < top.length) Some(top(idx).getLong(2)) else None
          while (admitted.length > 1 && boundary.contains(admitted.last._3))
            admitted.remove(admitted.length - 1)
          out ++= admitted
          batchTrace.foreach(_ += admitted.length)
          val rules = admitted.toArray
          // ONE array pass deciding "contains any batch adjacency" —
          // width disjuncts inside a single exists lambda
          val hasPair = exists(
            sequence(lit(0), size(col("s")) - 2),
            i => rules.map { case (a, b, _) =>
              element_at(col("s"), i + 1) === lit(a) &&
                element_at(col("s"), i + 2) === lit(b)
            }.reduce(_ || _))
          val before = sc.getPersistentRDDs.keySet
          // aff/merged are cheap filter+map branches over the CHECKPOINTED
          // enc — re-deriving them in two plans costs less than two more
          // eager checkpoint jobs per round (round latency is the budget)
          val aff = enc.where(hasPair)
          // rank-order chained passes ≡ sequential application of each
          // rule as its own pass (the BpeEncode one-pass unit)
          val merged = aff.select(rules.foldLeft(col("s")) {
            case (s, (a, b, _)) => BpeMergeOnce.column(s, a, b)
          }.as("s"), col("cnt"))
          // pc := pc − pairs(affected, old) + pairs(affected, merged),
          // dropped at zero (a vanished pair must not win a later round)
          val newPc = pc
            .unionByName(pairsOf(aff).select(col("a"), col("b"), (-col("pc")).as("pc")))
            .unionByName(pairsOf(merged))
            .groupBy("a", "b").agg(sum(col("pc")).as("pc"))
            .where(col("pc") > 0)
          val newEnc = enc.where(!hasPair)
            .unionByName(merged.where(size(col("s")) >= 2))
          // ONE eager checkpoint for both working tables (tagged union):
          // the loop is driver-latency-bound, so a fused materialization
          // beats two checkpoint jobs per round; the per-kind reads are
          // narrow filters over the cached blocks (vocab-bounded — the
          // double-scan costs microseconds, the saved job costs ~100 ms)
          val combined = newEnc
            .select(lit(0).as("kind"), col("s"), col("cnt"),
              lit(null).cast("string").as("a"), lit(null).cast("string").as("b"),
              lit(null).cast("long").as("pc"))
            .unionByName(newPc.select(lit(1).as("kind"),
              lit(null).cast("array<string>").as("s"), lit(null).cast("long").as("cnt"),
              col("a"), col("b"), col("pc")))
            .coalesce(parts)
            .cutLineage()
          val fresh = (sc.getPersistentRDDs.keySet -- before).toSeq
          // the new round's tables are materialized (eager checkpoints);
          // drop ONLY the blocks this loop created in earlier rounds
          ownedIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
          ownedIds = fresh
          enc = combined.where(col("kind") === 0).select("s", "cnt")
          pc = combined.where(col("kind") === 1).select("a", "b", "pc")
        }
      }
    } finally {
      ownedIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    }
    out.toArray
  }

  /** The r6 rescan learner, kept as the AUDIT definition the oracle SQL
    * mirrors (re-encode every distinct word under all rules so far,
    * re-count all pairs, take the argmax): O(k² · vocab · word length)
    * total work and the reason k was capped at demo sizes. The
    * incremental [[learnMergesFrom]] is spec-checked equal to this
    * merge-for-merge; keep rescan for cross-checks, never for scale.
    */
  private[graft] def learnMergesRescan(wf: DataFrame, k: Int): Array[(String, String, Long)] = {
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

  // -----------------------------------------------------------------
  // BYTE-LEVEL BPE (the GPT-2/LLaMA-class tokenizer shape): base
  // vocabulary = the 256 UTF-8 byte values, rendered as 2-hex-digit
  // symbols — portable to any engine as hex(encode(word)) — with byte
  // FALLBACK by construction (every string of every script decomposes
  // into base symbols; OOV is impossible), plus SPECIAL-TOKEN FENCING:
  // text splits on the special literal BEFORE word segmentation, so a
  // merge can never cross a special-token boundary even when the
  // special is glued to surrounding text without whitespace.
  // Whitespace still separates words WITHIN a segment, but a no-space
  // script (CJK) arrives as one long word whose subwords the merges
  // build from bytes — exactly the case the char-level whitespace
  // pretokenizer (q138) cannot segment at all. Learning, batching and
  // application reuse [[learnMergesFrom]]/[[graft.expressions
  // .BpeMergeOnce]] unchanged (both are symbol-agnostic); only the
  // INITIAL symbolization differs.
  // -----------------------------------------------------------------

  /** 2-hex-digit byte symbols of a word (uppercase — Spark
    * hex(encode(w,'UTF-8')) ≡ DuckDB hex(encode(w)) bit-for-bit).
    * Words are non-empty by contract (an empty input would make the
    * sequence bound 0 and DESCEND — the pairsOf guard's rule).
    */
  private[functions] def byteSyms(word: Column): Column = {
    val h = hex(encode(word, "UTF-8"))
    transform(sequence(lit(1), floor(length(h) / 2).cast("int")),
      i => h.substr(i * 2 - 1, lit(2)))
  }

  /** Distinct words with frequencies under byte-level segmentation:
    * strip the `|` delimiter, split on the special token (the fence),
    * then on single spaces — one corpus-sized shuffle, as
    * [[wordFrequencies]].
    */
  def byteWordFrequencies(docs: DataFrame, special: String): DataFrame =
    docs.select(explode(split(
        translate(coalesce(col("text"), lit("")), "|", ""),
        java.util.regex.Pattern.quote(special))).as("seg"))
      .select(explode(split(col("seg"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Byte-level learned vocabulary: (merge_rank, left_sym, right_sym,
    * pair_count) over byte symbols — [[learnedVocab]]'s sibling with
    * byte initial symbols (q213; oracle = the unrolled hex-replace
    * chain).
    */
  def learnedVocabBytes(spark: SparkSession, docs: DataFrame, k: Int,
                        special: String): DataFrame = {
    import spark.implicits._
    learnMergesFrom(byteWordFrequencies(docs, special).cutLineage(), k,
        byteLevel = true)
      .zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }.toSeq
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** Per-document byte-level token counts: [[docTokenCounts]]'s
    * broadcast-dictionary discipline under byte merges (q214). The
    * rank-ordered [[graft.expressions.BpeMergeOnce]] fold over the
    * byte symbols is BY CONSTRUCTION identical to re-encoding under
    * all rules (the one-pass-unit argument in [[learnMergesFrom]]).
    */
  def docTokenCountsBytes(docs: DataFrame, k: Int, special: String): DataFrame = {
    val wf = byteWordFrequencies(docs, special).cutLineage()
    val rules = learnMergesFrom(wf, k, byteLevel = true)
    val dict = wf.select(col("word"),
      size(rules.foldLeft(byteSyms(col("word"))) {
        case (s, (a, b, _)) => BpeMergeOnce.column(s, a, b)
      }).cast("long").as("word_tokens"))
    docs.select(col("doc_id"), explode(split(
        translate(coalesce(col("text"), lit("")), "|", ""),
        java.util.regex.Pattern.quote(special))).as("seg"))
      .select(col("doc_id"), explode(split(col("seg"), " ")).as("word"))
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
