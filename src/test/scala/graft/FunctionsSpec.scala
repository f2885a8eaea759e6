package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextStats}
import graft.model.Tables

/** Dedup / similarity / text-stat operators: determinism, recall against
  * exact baselines, and sanity on the sf0.001 tables.
  */
class FunctionsSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("cleanText masks digit runs, collapses whitespace, trims") {
    import spark.implicits._
    import graft.functions.TextStats
    val out = Seq((1L, "  a1b 22  c  "), (2L, "no digits"), (3L, ""),
        (4L, "a\n\nb\tc\r\n d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.cleanText(col("text")).as("ct"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a#b # c", 2L -> "no digits", 3L -> "",
      4L -> "a b c d"))
  }

  test("native WinnowSelect matches the HOF winnowing spec exactly") {
    import spark.implicits._
    import graft.functions.TextStats
    val rnd = new scala.util.Random(31)
    // small alphabet forces duplicate k-grams and window ties — the
    // hard cases for selection parity; lengths straddle k and w edges
    val rows = (1L to 60L).map { i =>
      (i, (0 until rnd.nextInt(120)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }
    // non-BMP coverage: supplementary-plane chars must hash as CODE
    // POINTS on both paths (ascii()/split("") are code-point-aware;
    // the native loop decodes via codePoints() — ADVICE r3)
    val emoji = rows ++ Seq(
      (101L, "ab😀cd😀ef😁gh"),
      (102L, "😀😁😂😃😄😅😀😁"))
    val d = emoji.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(run(TextStats.winnowSelected(d)) == run(TextStats.winnowSelectedHof(d)))
    assert(run(TextStats.winnowSelected(docs)) == run(TextStats.winnowSelectedHof(docs)))
  }

  test("winnowing guarantee: shared substrings of length >= w+k-1 share a fingerprint") {
    import spark.implicits._
    import graft.functions.TextStats
    val common = "thequickbrownfoxjumps" // 21 chars >= w+k-1 = 8
    val d = Seq(
      (1L, "aaaa" + common + "zzzz"),
      (2L, "bbbbbbb" + common + "qq"),
      (3L, "совершенно другой текст")).toDF("doc_id", "text")
    val sel = TextStats.winnowSelected(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    assert((sel(1L) & sel(2L)).nonEmpty, "winnowing guarantee violated")
    assert((sel(1L) & sel(3L)).isEmpty)
    // fewer than w k-grams: exactly the global minimum is selected
    val s9 = TextStats.winnowSelected(Seq((9L, "abcdef")).toDF("doc_id", "text"))
      .collect().head.getSeq[Long](2)
    assert(s9.size == 1)
    // shorter than k: nothing selected
    val s8 = TextStats.winnowSelected(Seq((8L, "abc")).toDF("doc_id", "text"))
      .collect().head.getSeq[Long](2)
    assert(s8.isEmpty)
    // density: expected ~2/(w+1) of the k-gram stream, generously bounded
    val stats = TextStats.winnowStats(docs).collect()
    stats.filter(_.getLong(1) >= 20).foreach { r =>
      val frac = r.getLong(2).toDouble / r.getLong(1)
      assert(frac > 0.05 && frac < 0.95, s"doc ${r.getLong(0)} density $frac")
    }
    // pair detection: near-dup twins (long shared body, short unique
    // edges) reach jaccard >= 0.5; the unrelated doc pairs with nobody
    val body = "thequickbrownfoxjumpsoverthelazydog" * 6
    val twins = Seq(
      (1L, "aaaa" + body + "zz"),
      (2L, "bbbbbbb" + body),
      (3L, "a completely different document about graphs and sparks")
    ).toDF("doc_id", "text")
    val pairs = TextStats.winnowJaccardPairs(twins, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("exact dedup keeps one survivor per normalized text") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello World", "en"), (2L, "  hello world  ", "en"),
      (3L, "HELLO WORLD", "en"), (4L, "other", "en"))
      .toDF("doc_id", "text", "lang")
    assert(Dedup.exactSurvivors(d).collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    val counts = Dedup.exactCountsByLang(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 2L))
  }

  test("prefix-filtered and bitset jaccard equal the inverted-index join") {
    for (t <- Seq(0.2, 0.5)) {
      val base = Dedup.ngramJaccardPairs(docs, 2, t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val filtered = Dedup.ngramJaccardPairsPrefix(docs, 2, t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val bitset = Dedup.ngramJaccardPairsBitset(docs, 2, t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(filtered == base, s"prefix, threshold $t")
      assert(bitset == base, s"bitset, threshold $t")
    }
  }

  test("sparse corpus: prefix filter prunes most candidates; all variants agree") {
    import spark.implicits._
    // sparse regime for the prefix filter: shingles collide occasionally
    // (so there IS a candidate set to prune) but df stays low relative to
    // doc count — vocab 40 over 24-token docs gives ~13k co-occurring
    // pairs of 45k possible. Deterministic LCG: identical on every run.
    var state = 12345L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.abs(state >>> 33) % bound).toInt
    }
    val vocabSize = 40
    val base = (1 to 300).map { id =>
      (id.toLong, (1 to 24).map(_ => s"w${nextInt(vocabSize)}").mkString(" "))
    }
    // a handful of true near-dups: copy a doc and perturb one token
    val dups = (1 to 10).map { i =>
      val (srcId, text) = base(i * 7)
      val toks = text.split(" "); toks(0) = "perturbed"
      (1000L + srcId, toks.mkString(" "))
    }
    val corpus = (base ++ dups).toDF("doc_id", "text")
    val sh = Dedup.shingles(corpus, 2).localCheckpoint(true)
    val counts = sh.groupBy(col("doc_id")).agg(count("*").as("n_sh"))
    val cooc = sh.toDF("doc_a", "shingle")
      .join(sh.toDF("doc_b", "shingle"), Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count()
    val pref = Dedup.prefixCandidates(sh, counts, 0.8).count()
    // the win regime is structural, not a timing accident: the prefix
    // filter must eliminate the vast majority of co-occurrence candidates
    info(s"prefix kept $pref of $cooc co-occurrence candidates")
    assert(pref * 10 <= cooc, s"prefix kept $pref of $cooc candidates — not a sparse regime?")
    val exact = Dedup.ngramJaccardPairs(corpus, 2, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val prefixed = Dedup.ngramJaccardPairsPrefix(corpus, 2, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty && prefixed == exact)
    // every planted near-dup must surface
    assert((1 to 10).forall { i => exact.keys.exists(_._2 == 1000L + base(i * 7)._1.toInt) })
  }

  test("minhash LSH finds all high-jaccard pairs found exactly (recall=1 at 0.5)") {
    val exact = collectPairs(Dedup.ngramJaccardPairs(docs, 2, 0.5).select("doc_a", "doc_b"))
    val mh = collectPairs(Dedup.minhashPairs(docs, 2, 0.5).select("doc_a", "doc_b"))
    // minhash verifies candidates with exact jaccard ⇒ subset; banding with
    // 8x4 at j≥0.5 has >99% hit prob per pair — require full recall here
    assert(mh == exact, s"missed=${exact -- mh} extra=${mh -- exact}")
  }

  test("simhash: identical docs are distance 0; unrelated docs don't pair") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("brute-force topK is deterministic and self-consistent") {
    val r1 = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") <= 4), 3).collect()
    val r2 = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") <= 4), 3).collect()
    assert(r1.toSeq == r2.toSeq)
    assert(r1.length == 15) // 5 queries × 3
    // per-query ranks are 1..3 with non-increasing sim
    r1.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.map(_.getDouble(3)).toSeq.reverse.sorted.reverse == sorted.map(_.getDouble(3)).toSeq)
    }
  }

  test("LSH topK recall vs brute force ≥ 0.5 on sf0.001 queries") {
    val queries = emb.where(col("vec_id") <= 9)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"recall=$recall")
    // multi-probe (Hamming-1 query fanout): candidates are a SUPERSET
    // of the exact-bucket candidates, so recall can only improve — and
    // at sf0.001's wide-angle neighbors it must beat the single-probe
    // run (q33 raises its gate on the strength of this)
    val mp = Similarity.lshTopK(emb, queries, 5, probeHamming1 = true).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val mpRecall = (brute & mp).size.toDouble / brute.size
    assert(mpRecall >= recall, s"multi-probe $mpRecall < single-probe $recall")
    assert(mpRecall >= 0.6, s"multi-probe recall=$mpRecall")
    println(s"[spec] lshTopK recall single-probe=$recall multi-probe=$mpRecall")
  }

  test("cosinePairs matches a hand-computed example") {
    import spark.implicits._
    val vs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(1f, 1f, 0f)), (2L, Array(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(vs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set((0L, 1L)))
    assert(math.abs(pairs((0L, 1L)) - 0.707107) < 1e-6)
  }

  test("bucketed cosine pairs ⊆ exact audit with recall ≥ 0.4 (q122 gate)") {
    val exact = Similarity.cosinePairs(emb, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = Similarity.cosinePairsBucketed(emb, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1 by construction: every bucketed pair is in the exact
    // set with the identical 6-dp similarity
    bucketed.foreach { case (k, sim) =>
      assert(exact.get(k).contains(sim), s"false positive or sim drift at $k")
    }
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall (${bucketed.size}/${exact.size})")
  }

  test("BpeEncode: merges apply left-to-right with the portable-replace shield") {
    import spark.implicits._
    import graft.expressions.BpeEncode
    def enc(w: String, rules: (String, String)*): Seq[String] =
      Seq(Tuple1(w)).toDF("word")
        .select(BpeEncode.column(col("word"), rules.map(r => Array(r._1, r._2)).toArray))
        .head.getSeq[String](0)
    assert(enc("lower", ("e", "r")) == Seq("l", "o", "w", "er"))
    assert(enc("lower", ("l", "o"), ("lo", "w")) == Seq("low", "e", "r"))
    // shield: equivalently replace('|a|a|a|a|', '|a|a|', '|aa|') — the
    // trailing delimiter of a match is consumed, so the next symbol
    // cannot START a match of the same pass
    assert(enc("aaaa", ("a", "a")) == Seq("aa", "a", "a"))
    assert(enc("aaaaa", ("a", "a")) == Seq("aa", "a", "aa"))
    // a rule whose right side is a PREFIX of the actual symbol must not
    // fire ("rx" != "r") — the trailing-delimiter check in string form
    assert(enc("erx", ("r", "x"), ("e", "r")) == Seq("e", "rx"))
    // empty rule set: plain characters
    assert(enc("cat") == Seq("c", "a", "t"))
  }

  test("BPE learning is deterministic and counts overlapping pairs; dict matches encode") {
    import spark.implicits._
    import graft.functions.Bpe
    // 'ab' occurs 5x adjacent (3 in "ababab": pairs (a,b)x3, (b,a)x2; 2 in "abab")
    val docs = Seq((1L, "ababab abab", "s"), (2L, "aaa abab", "s"))
      .toDF("doc_id", "text", "source")
    val merges = Bpe.learnMerges(docs, 2)
    // counts: (a,b): 3·1+2·2=7  (b,a): 2·1+1·2=4  (a,a): 2 (overlaps in aaa)
    assert(merges(0) == ("a", "b", 7L))
    // after merge 1 WITH the shield: "ababab"->[ab,a,b,ab] (the a after
    // a merge can't start a match), "abab"->[ab,a,b], "aaa" unchanged.
    // round-2 pairs: (ab,a)=1+2=3, (a,b)=1+2=3, (a,a)=2, (b,ab)=1 —
    // tie at 3 broken by pair asc: ("a","b") < ("ab","a"), so the SAME
    // rule is learned again (the shield left unmerged occurrences)
    assert(merges(1) == ("a", "b", 3L))
    val counts = Bpe.docTokenCounts(docs, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // two (a,b) passes: "ababab"->[ab,a,b,ab]->[ab,ab,ab] (3);
    // "abab"->[ab,a,b]->[ab,ab] (2); "aaa"->[a,a,a] (3)
    assert(counts == Map(1L -> (2L, 5L), 2L -> (2L, 5L)))
  }

  test("incremental BPE learning ≡ the rescan learner, merge for merge") {
    import spark.implicits._
    import graft.functions.Bpe
    // overlap-heavy corpus: repeats, shields, words that fully merge
    // and leave the working table, and a tie broken by pair order
    val docs = Seq(
      (1L, "ababab abab aaa", "s"), (2L, "banana bandana ban", "s"),
      (3L, "xy xy xyxy zz", "s"), (4L, "q", "s")).toDF("doc_id", "text", "source")
    val wf = Bpe.wordFrequencies(docs).cache()
    val k = 12
    val inc = Bpe.learnMergesFrom(wf, k).toSeq
    val rescan = Bpe.learnMergesRescan(wf, k).toSeq
    assert(inc == rescan, s"incremental=$inc rescan=$rescan")
    // single-symbol corpus exhausts immediately on both paths
    val singles = Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source")
    assert(Bpe.learnMergesFrom(Bpe.wordFrequencies(singles), 3).isEmpty)
    // BpeMergeOnce on an encoded array ≡ BpeEncode with the rule appended
    import graft.expressions.{BpeEncode, BpeMergeOnce}
    val w = Seq(Tuple1("aaaa")).toDF("word")
    val viaOnce = w.select(BpeMergeOnce.column(
        BpeEncode.column(col("word"), Array(Array("a", "a"))), "aa", "a"))
      .head.getSeq[String](0)
    val viaFull = w.select(BpeEncode.column(col("word"),
        Array(Array("a", "a"), Array("aa", "a"))))
      .head.getSeq[String](0)
    assert(viaOnce == viaFull && viaOnce == Seq("aaa", "a"))
    wf.unpersist()
  }

  test("batched BPE merge selection ≡ sequential, with real batching observed") {
    import spark.implicits._
    import graft.functions.Bpe
    // distinct-alphabet word families give symbol-disjoint top pairs
    // with a strict count ladder (batchable); plus overlap chains whose
    // LEFTOVER occurrences sequential may re-select later, a
    // lex-ordered count tie, and shield shapes
    val docs = Seq(
      (1L, "xxxxxxxx xxxxxxxx yyyyyy yyyyyy zzzz", "s"),
      (2L, "ababababab cdcdcdcd efefef gh gh gh", "s"),
      (3L, "mn mn mn mn op op op qr qr st", "s"),
      (4L, "banana bandana kayak", "s")).toDF("doc_id", "text", "source")
    val wf = Bpe.wordFrequencies(docs).cache()
    val k = 25
    val widths = scala.collection.mutable.ArrayBuffer.empty[Int]
    val batched = Bpe.learnMergesFrom(wf, k, maxBatch = 8,
      batchTrace = Some(widths)).toSeq
    val sequential = Bpe.learnMergesFrom(wf, k, maxBatch = 1).toSeq
    val rescan = Bpe.learnMergesRescan(wf, k).toSeq
    assert(batched == rescan, s"batched=$batched rescan=$rescan")
    assert(sequential == rescan, s"sequential=$sequential rescan=$rescan")
    // the fixture must actually exercise batching, not degenerate to 1s
    assert(widths.exists(_ > 1), s"no round batched: widths=$widths")
    assert(widths.sum == batched.length)
    // count ties straddling a would-be batch boundary force width 1 on
    // the tied ranks (the strict-drop rule) and stay order-correct
    val tied = Seq(
      (1L, "aa aa aa bb bb bb cc cc cc", "s")).toDF("doc_id", "text", "source")
    val twf = Bpe.wordFrequencies(tied).cache()
    assert(Bpe.learnMergesFrom(twf, 6, maxBatch = 8).toSeq ==
      Bpe.learnMergesRescan(twf, 6).toSeq)
    wf.unpersist(); twf.unpersist()
  }

  test("fused HyperplaneSignatures ≡ per-table signature columns, bit for bit") {
    import spark.implicits._
    val vecs = emb.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val planes = 7; val tables = 5; val dim = 64
    val fused = vecs.select(col("vec_id"),
        posexplode(Similarity.signatures(col("e"), tables, planes, dim)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val perTable = (0 until tables).flatMap { t =>
      vecs.select(col("vec_id"),
          Similarity.signature(col("e"), planes, dim, seed = 42L + t).as("sig"))
        .collect().map(r => (r.getLong(0), t) -> r.getLong(1))
    }.toMap
    assert(fused == perTable)
  }

  test("all-pairs fences refuse past their caps and point at the scale path") {
    // cosinePairs: corpus bigger than maxRows refuses before any join
    val eCos = intercept[IllegalArgumentException] {
      Similarity.cosinePairs(emb, 0.3, maxRows = 10L)
    }
    assert(eCos.getMessage.contains("lshTopK"))
    // ngramJaccardPairs: dense corpus exceeding the df² mass cap refuses
    val eJac = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, 2, 0.5, maxCooccurrence = 100L)
    }
    assert(eJac.getMessage.contains("minhashPairs"))
    // within the caps both still run (defaults cover the test scale)
    assert(Similarity.cosinePairs(emb, 0.9).count() >= 0)
  }

  test("fingerprints are stable and distinct texts get distinct prints") {
    val fp1 = TextStats.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fp2 = TextStats.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp1 == fp2)
    assert(fp1.values.toSet.size > 490) // 500 distinct texts, few collisions tolerated
  }

  test("regexTokens segments letter runs, digit runs and punctuation") {
    import spark.implicits._
    val r = Seq((1L, "abc12 de-f 3")).toDF("doc_id", "text")
      .select(TextStats.regexTokens(col("text")).as("t"))
      .head.getSeq[String](0)
    assert(r == Seq("abc", "12", "de", "-", "f", "3"))
  }

  test("qualityStats / qualityScore sane ranges") {
    val qs = TextStats.qualityScore(docs).collect().map(_.getDouble(1))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    val st = TextStats.qualityStats(docs).collect()
    st.foreach { r =>
      assert(r.getLong(1) > 0)               // n_tokens
      assert(r.getLong(2) <= r.getLong(1))   // n_distinct ≤ n_tokens
      assert(r.getDouble(3) > 0)             // avg_token_len
    }
  }

  test("langid predicts a label for every doc from the known set") {
    val profile = TextStats.LangId.fit(docs)
    val pred = TextStats.LangId.predict(docs, profile)
    assert(pred.count() == docs.count())
    val langs = pred.select("predicted").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "fr", "es", "zh", "de")))
  }

  test("tfidf: rare terms outrank common ones; scores match the fixed-point formula") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "common" appears in all 4 docs (idf=ln(1)=0), "rare" in one
    val docs = Seq(
      (1L, "common rare rare"), (2L, "common mid"),
      (3L, "common mid"), (4L, "common")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopK(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    val rareScore = 2L * math.round(1e6 * math.log(4.0 / 1))
    val midScore = 1L * math.round(1e6 * math.log(4.0 / 2))
    assert(out((1L, 1L)) == ("rare", rareScore))
    assert(out((1L, 2L)) == ("common", 0L))
    assert(out((2L, 1L)) == ("mid", midScore))
    // doc 4 has only the zero-idf token; it still ranks (score 0)
    assert(out((4L, 1L)) == ("common", 0L))
  }

  test("semantic clusters: CC over cosine pairs, min-id canonical, pluggable pair source") {
    import spark.implicits._
    import graft.functions.Similarity
    // two tight groups on orthogonal axes + one singleton off both
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.95f, 0.05f, 0.0f)),
      (10L, Seq(0.0f, 1.0f, 0.0f)), (11L, Seq(0.0f, 0.9f, 0.1f)),
      (20L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticClusters(emb, 0.9).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(
      1L -> (1L, true), 2L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false),
      20L -> (20L, true)))
    // pair-source pluggability: the bucketed generator feeds the same CC
    val viaBucketed = Similarity.clustersFromPairs(emb,
      Similarity.cosinePairsBucketed(emb, 0.9)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bucketed pairs ⊆ exact ⇒ clusters refine the exact ones: every
    // bucketed label maps inside one exact cluster
    assert(viaBucketed.keySet == out.keySet)
    viaBucketed.groupBy(_._2).values.foreach { grp =>
      assert(grp.keys.map(v => out(v)._1).toSet.size == 1)
    }
  }

  test("bigram LM score: mean conditional probability in micro-units, hand-checked") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z")).toDF("doc_id", "text")
    val out = TextStats.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // corpus bigrams: "a b"×2, "b a"×1, "a c"×1; prefix a·=3, b·=1
    // p("a b")=2e6 div 3=666666, p("b a")=1e6, p("a c")=1e6 div 3=333333
    // doc1: (666666+1000000+666666) div 3 = 777777; doc2: 333333
    assert(out == Map(1L -> (3L, 777777L), 2L -> (1L, 333333L)))
    // single-token doc 3 has no bigrams and no row — by contract
    assert(!out.contains(3L))
  }

  test("oov rate: deterministic top-k vocab, occurrence-counted misses") {
    import spark.implicits._
    val docs = Seq((1L, "a a b c"), (2L, "b b a d")).toDF("doc_id", "text")
    val out = TextStats.oovStats(docs, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // counts a:3 b:3 c:1 d:1 → vocab {a, b} (count desc, token asc);
    // each doc misses one occurrence of 4 → 250000 µ
    assert(out == Map(1L -> (4L, 1L, 250000L), 2L -> (4L, 1L, 250000L)))
    // tie-break determinism at the vocab boundary: k=3 admits "c" (not
    // "d") because ties break token-ascending
    val out3 = TextStats.oovStats(docs, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out3 == Map(1L -> 0L, 2L -> 1L))
  }

  test("byte-level BPE: byte symbols, special-token fence, CJK subwords, token counts") {
    import spark.implicits._
    import graft.functions.Bpe
    // héllo = 68 C3 A9 6C 6C 6F (6 bytes); 端到端 = E7 AB AF E5 88 B0
    // E7 AB AF (9 bytes, NO whitespace anywhere — the char-level
    // whitespace pretokenizer would treat it as one opaque word with
    // no subword structure); the special glues to text with no spaces
    val docs = Seq(
      (1L, "héllo héllo<EOD>端到端", "s"),
      (2L, "héllo<EOD>端到端", "s")).toDF("doc_id", "text", "source")
    // fencing: the unspaced "héllo<EOD>端到端" splits into héllo + 端到端
    val wf = Bpe.byteWordFrequencies(docs, "<EOD>")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("héllo" -> 3L, "端到端" -> 2L))
    // hand-derived merge sequence: (AB,AF,4) beats (E7,AB,4) on lex
    // tie-break; merge 2 = the chained (E7,ABAF,4); merge 3 falls to
    // the héllo pairs at count 3, lex-min (68,C3)
    val vocab = Bpe.learnedVocabBytes(spark, docs, 3, "<EOD>")
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(vocab.toSeq == Seq(("AB", "AF", 4L), ("E7", "ABAF", 4L), ("68", "C3", 3L)))
    // token counts under those merges: héllo → [68C3 A9 6C 6C 6F] = 5,
    // 端到端 → [E7ABAF E5 88 B0 E7ABAF] = 5
    val counts = Bpe.docTokenCountsBytes(docs, 3, "<EOD>")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts == Map(1L -> ((3L, 15L)), 2L -> ((2L, 10L))))
  }

  test("BPE learning stops gracefully when the pair space exhausts before k merges") {
    import spark.implicits._
    import graft.functions.Bpe
    // one two-symbol word: merge 1 fuses it into a single symbol, so
    // merges 2..5 have no adjacent pair anywhere — must return 1 merge,
    // not throw on the empty argmax
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 5)
    assert(merges.length == 1 && merges(0)._1 == "a" && merges(0)._2 == "b")
    // single-character words: zero possible merges from the start
    val singles = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(singles, 3).isEmpty)
    // and the composed operators survive the exhausted regime
    assert(Bpe.docTokenCounts(docs, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 1L, 1L)))
  }
}
