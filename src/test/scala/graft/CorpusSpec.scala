package graft

import org.apache.spark.sql.functions._
import graft.functions.Corpus

/** Known-value checks for the corpus-curation operators. */
class CorpusSpec extends SparkTestBase {

  private def docs(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  test("repeatedSpans: planted cross-document boilerplate found as maximal spans, merged when overlapping") {
    import graft.functions.Dedup
    // k=3; a 5-token boilerplate "the quick brown fox jumps" planted in
    // docs 1 and 2 at different offsets; doc 3 shares nothing 3-token
    // long with anyone; doc 4 repeats a WITHIN-doc phrase only (must
    // not trigger: the contract is cross-document)
    val d = docs(
      (1L, "alpha the quick brown fox jumps omega", "en", "s0"),
      (2L, "the quick brown fox jumps beta gamma delta", "en", "s0"),
      (3L, "unrelated words entirely here now", "en", "s0"),
      (4L, "p q r s p q r s", "en", "s0"))
    val spans = Dedup.repeatedSpans(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 1: boilerplate at tokens 1..5 -> starts 1,2,3 merge to [1,5];
    // doc 2: at tokens 0..4 -> starts 0,1,2 merge to [0,4]
    assert(spans == Set((1L, 1L, 5L, 5L), (2L, 0L, 4L, 5L)))
    // strip: covered tokens removed, text rebuilt in position order
    val clean = Dedup.stripRepeatedSpans(d, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(clean(1L) == ((7L, 5L, "alpha omega")))
    assert(clean(2L) == ((8L, 5L, "beta gamma delta")))
    assert(clean(3L) == ((5L, 0L, "unrelated words entirely here now")))
    assert(clean(4L) == ((8L, 0L, "p q r s p q r s")))
    // two documents sharing DISJOINT repeats with a third produce
    // separate spans, not one merged one (gap 4 > k leaves token 3
    // uncovered)
    val d2 = docs(
      (10L, "a b c GAP x y z", "en", "s0"),
      (11L, "a b c other stuff here", "en", "s0"),
      (12L, "more filler x y z", "en", "s0"))
    val spans2 = Dedup.repeatedSpans(d2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans2 == Set((10L, 0L, 2L), (10L, 4L, 6L), (11L, 0L, 2L), (12L, 2L, 4L)))
    // OVERLAPPING windows through an unrepeated middle shingle: doc 20's
    // starts {0, 2} (gap 2 ≤ k) — "p q r" shared with 21, "r s t" with
    // 22, "q r s" unique — must fold into ONE maximal interval [0,4],
    // never two overlapping rows double-counting token 2
    val d3 = docs(
      (20L, "p q r s t", "en", "s0"),
      (21L, "x x p q r", "en", "s0"),
      (22L, "r s t y y", "en", "s0"))
    val s20 = Dedup.repeatedSpans(d3, 3).collect()
      .filter(_.getLong(0) == 20L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(s20 == Set((0L, 4L, 5L)), s"got $s20")
    // TOUCHING coverage (gap exactly k): starts {0, 3} cover [0,2] and
    // [3,5] with no uncovered token between — one interval [0,5]
    val d4 = docs(
      (30L, "a b c d e f", "en", "s0"),
      (31L, "a b c zz zz", "en", "s0"),
      (32L, "zz d e f zz", "en", "s0"))
    val s30 = Dedup.repeatedSpans(d4, 3).collect()
      .filter(_.getLong(0) == 30L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(s30 == Set((0L, 5L, 6L)), s"got $s30")
    // span_tokens over a document now sums to EXACTLY its covered
    // token count (rows are disjoint) — cross-check vs the strip
    val stripped3 = Dedup.stripRepeatedSpans(d3, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val spanSum3 = Dedup.repeatedSpans(d3, 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(stripped3.filter(_._2 > 0) == spanSum3, s"$stripped3 vs $spanSum3")
  }

  test("repeatedSpans minOccurs: within-document self-repeats caught, cross-doc criterion unchanged") {
    import graft.functions.Dedup
    // doc 4 repeats its own 4-token phrase twice (nd = 1 — invisible to
    // minDocs); docs 1/2 share cross-document boilerplate as before;
    // doc 5 repeats a phrase exactly once short of the threshold
    val d = docs(
      (1L, "alpha the quick brown fox jumps omega", "en", "s0"),
      (2L, "the quick brown fox jumps beta gamma delta", "en", "s0"),
      (4L, "p q r s p q r s", "en", "s0"),
      (5L, "u v w x filler filler2 u v w x filler3 filler4 morefiller", "en", "s0"))
    // occurrence criterion at 2: doc 4's "p q r"/"q r s" shingles occur
    // twice (starts 0,4 and 1,5) → starts {0,1,4,5} gap ≤ 3 merge to
    // [0, 5+2] = the whole 8-token text; doc 5's "u v w"/"v w x" also
    // occur twice → starts {0,1,6,7} merge (gap 5 > k=3 BREAKS between
    // 1 and 6) to [0,3] and [6,9]
    val spans = Dedup.repeatedSpans(d, 3, minDocs = 2, minOccurs = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans == Set(
      (1L, 1L, 5L, 5L), (2L, 0L, 4L, 5L),
      (4L, 0L, 7L, 8L),
      (5L, 0L, 3L, 4L), (5L, 6L, 9L, 4L)), s"got $spans")
    // threshold 3: doc 4's phrase occurs only twice — nothing flagged
    val strict = Dedup.repeatedSpans(d, 3, minDocs = 2, minOccurs = 3).collect()
      .map(_.getLong(0)).toSet
    assert(strict == Set(1L, 2L), s"got $strict")
    // minOccurs = 0 (default) ≡ the unchanged cross-document contract
    val legacy = Dedup.repeatedSpans(d, 3).collect().map(_.getLong(0)).toSet
    assert(legacy == Set(1L, 2L))
    // the strip action honors the combined criterion
    val clean = Dedup.stripRepeatedSpans(d, 3, minDocs = 2, minOccurs = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(clean(4L) == ((8L, "")), s"got ${clean(4L)}")
    assert(clean(5L) == ((8L, "filler filler2 filler3 filler4 morefiller")),
      s"got ${clean(5L)}")
  }

  test("piiRedactWide: Luhn separates real cards from 16-digit noise; SSN shape redacted") {
    import graft.functions.Corpus
    val d = docs(
      // valid card, space separators (4111… is the public Luhn-valid test number)
      (1L, "pay 4111 1111 1111 1111 today", "en", "s"),
      // valid card, dash separators; plus an SSN
      (2L, "card 4111-1111-1111-1111 ssn 123-45-6789 end", "en", "s"),
      // card-SHAPED but Luhn-invalid: counted 0, still redacted
      (3L, "ref 1234 5678 9012 3456 thanks", "en", "s"),
      // unseparated 16 valid digits (4012888888881881 is Luhn-valid)
      (4L, "id 4012888888881881 ok", "en", "s"),
      (5L, "no pii here at all", "en", "s"))
    val r = Corpus.piiRedactWide(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(4), x.getLong(5), x.getString(6)))).toMap
    assert(r(1L) == ((1L, 0L, "pay <CARD> today")), s"got ${r(1L)}")
    assert(r(2L) == ((1L, 1L, "card <CARD> ssn <SSN> end")), s"got ${r(2L)}")
    assert(r(3L) == ((0L, 0L, "ref <CARD> thanks")), s"got ${r(3L)}")
    assert(r(4L) == ((1L, 0L, "id <CARD> ok")), s"got ${r(4L)}")
    assert(r(5L) == ((0L, 0L, "no pii here at all")), s"got ${r(5L)}")
    // the three original classes keep their q157 semantics
    val legacyCols = Corpus.piiRedactWide(docs(
      (9L, "mail a@b.co ip 1.2.3.4 tel +12-3456-789", "en", "s"))).head()
    assert((legacyCols.getLong(1), legacyCols.getLong(2), legacyCols.getLong(3)) == ((1L, 1L, 1L)))
    assert(legacyCols.getString(6) == "mail <EMAIL> ip <IP> tel <PHONE>")
  }

  test("repetitionStats: exact duplication fractions") {
    val d = docs(
      (1L, "a b a b", "en", "s0"),      // 4 tokens, 2 distinct; bigrams: a b, b a, a b -> 2 distinct of 3
      (2L, "x y z", "en", "s0"),        // no repetition
      (3L, "w w w w", "en", "s0"))      // total repetition
    val r = Corpus.repetitionStats(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 4 && r(1L).getLong(2) == 2)
    assert(r(1L).getDouble(3) == 0.5)
    assert(math.abs(r(1L).getDouble(4) - (1.0 - 2.0 / 3)) < 1e-6)
    assert(r(2L).getDouble(3) == 0.0 && r(2L).getDouble(4) == 0.0)
    // 3 bigrams "w w", 1 distinct => 1 - 1/3
    assert(r(3L).getDouble(3) == 0.75)
    assert(math.abs(r(3L).getDouble(4) - (1.0 - 1.0 / 3)) < 1e-6)
  }

  test("qualityGate: each filter dimension rejects independently") {
    val ok = (1 to 20).map(i => f"tok$i%02d").mkString(" ")  // 20 distinct 5-char tokens
    val short = "one two three"                              // < 10 tokens
    val repeat = ("rep " * 20).trim                          // distinct frac 1/20 < 0.2
    val longTok = (1 to 12).map(i => "x" * 28 + f"$i%02d").mkString(" ") // distinct, mean len 30 > 12
    val d = docs(
      (1L, ok, "en", "s"), (2L, short, "en", "s"),
      (3L, repeat, "en", "s"), (4L, longTok, "en", "s"),
      (5L, ok, "de", "s"))
    val r = Corpus.qualityGate(d).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("en") == (4L, 1L))   // only doc 1 passes
    assert(r("de") == (1L, 1L))
  }

  test("sampleBySource: id-mod selection matches the quota exactly") {
    val d = docs((0 until 100).map(i =>
      (i.toLong, "t o k e n s", "en", if (i % 2 == 0) "sA" else "sB")): _*)
    // mod 10: sA keeps ids with id%10 < 4 (ids are even: 0,2 -> 2 of every 10)
    val r = Corpus.sampleBySource(d, Map("sA" -> 4, "sB" -> 0), mod = 10)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("sA") == (50L, 20L))  // ids 0,2 mod 10 in each decade of evens
    assert(r("sB") == (50L, 0L))
  }

  test("stratifiedSample: exact k per source, deterministic, priority-ordered") {
    val d = docs((0 until 100).map(i =>
      (i.toLong, "x", "en", if (i % 2 == 0) "sA" else "sB")): _*)
    val r1 = Corpus.stratifiedSample(d, 3).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    val r2 = Corpus.stratifiedSample(d, 3).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(r1 == r2 && r1.count(_._1 == "sA") == 3 && r1.count(_._1 == "sB") == 3)
    // matches the sequential definition of the portable priority
    def pri(id: Long) = ((id % 2147483648L) * 2654435761L) % 2147483648L
    val expectA = (0 until 100 by 2).map(_.toLong).sortBy(id => (pri(id), id)).take(3).toSet
    assert(r1.filter(_._1 == "sA").map(_._2) == expectA)
  }

  test("tokenBudgetSample: admits in priority order, first overflow excluded") {
    def prio(id: Long) = ((id % 2147483648L) * 2654435761L) % 2147483648L
    // source s0: three 3-token docs; budget 7 admits the first two in
    // priority order and excludes the third (3+3+3 > 7)
    val d = docs(
      (1L, "a b c", "en", "s0"), (2L, "d e f", "en", "s0"),
      (3L, "g h i", "en", "s0"), (10L, "x y", "en", "s1"))
    val out = Corpus.tokenBudgetSample(d, 7L).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val s0Order = Seq(1L, 2L, 3L).sortBy(id => (prio(id), id))
    assert(out.keySet == Set(s0Order(0), s0Order(1), 10L))
    assert(out(s0Order(0))._3 == 3L && out(s0Order(1))._3 == 6L)
    assert(out(10L) == ("s1", 2L, 2L))
    // budget below the smallest doc admits nothing
    assert(Corpus.tokenBudgetSample(d, 1L).count() == 0L)
  }

  test("leakageSafeSplit: near-dup clusters land atomically, formula-exact") {
    def prio(id: Long) = ((id % 2147483648L) * 2654435761L) % 2147483648L
    // docs 1 and 2 are identical → one cluster; 3 is distinct
    val d = docs(
      (1L, "the quick brown fox jumps over dogs", "en", "s0"),
      (2L, "the quick brown fox jumps over dogs", "en", "s0"),
      (3L, "completely different text goes here now", "en", "s0"))
    val out = graft.functions.Dedup.leakageSafeSplit(d, 2, 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // cluster-atomic: the near-dup pair shares cluster AND split
    assert(out(1L)._1 == out(2L)._1 && out(1L)._2 == out(2L)._2)
    // the assignment is the documented formula of the cluster label
    out.values.foreach { case (cluster, split) =>
      val expected = if (prio(cluster) % 1000L < 100L) "val" else "train"
      assert(split == expected)
    }
  }

  test("urlHost grammar + domainCap keeps the cap lowest-priority docs per host") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://a.example.org/x"),
      (2L, "HTTPS://A.EXAMPLE.ORG:8443/y"),          // scheme/host case, port
      (3L, "ftp://user:pw@a.example.org/z"),          // scheme variety, userinfo
      (4L, "https://b.example.org/p?q=1#frag"),
      (5L, "not a url at all"),                       // unparseable -> ''
      (6L, "https://b.example.org"),                  // bare host, no path
      (7L, "https://a.example.org/deep/er/path"))
      .toDF("doc_id", "url")
    val hosts = urls.select(col("doc_id"), Corpus.urlHost(col("url")).as("host"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hosts == Map(1L -> "a.example.org", 2L -> "a.example.org",
      3L -> "a.example.org", 4L -> "b.example.org", 5L -> "",
      6L -> "b.example.org", 7L -> "a.example.org"))
    // cap 2: host a keeps the 2 lowest by prio31 (doc_id ties), b keeps
    // both, '' keeps its single doc — verified against the replayed hash
    val kept = Corpus.domainCap(urls, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def prio(id: Long) = ((id % 2147483648L) * 2654435761L) % 2147483648L
    val expA = Seq(1L, 2L, 3L, 7L).sortBy(id => (prio(id), id)).take(2).toSet
    assert(kept.filter(_._1 == "a.example.org").map(_._2) == expA)
    assert(kept.filter(_._1 == "b.example.org").map(_._2) == Set(4L, 6L))
    assert(kept.filter(_._1 == "").map(_._2) == Set(5L))
  }

  test("piiRedact: per-class counts on raw text, ordered sentinel replacement") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail me at jo.doe+x@sub.example.com or jo@ex.org thanks"),
      (2L, "server 192.168.001.5 and 10.0.0.7 up"),
      (3L, "call +1-555-0142 or +44-20-7946-0958 now"),
      (4L, "mixed a@b.co then 8.8.8.8 then +7-495-123-4567 end"),
      (5L, "nothing sensitive here 3.14 is pi and 1.2.3 is a version"))
      .toDF("doc_id", "text")
    val r = Corpus.piiRedact(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4))).toMap
    assert(r(1L) == ((2L, 0L, 0L, "mail me at <EMAIL> or <EMAIL> thanks")))
    assert(r(2L) == ((0L, 2L, 0L, "server <IP> and <IP> up")))
    assert(r(3L) == ((0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(r(4L) == ((1L, 1L, 1L, "mixed <EMAIL> then <IP> then <PHONE> end")))
    // 1.2.3 is NOT an ipv4 (three octets); 3.14 is not; short numbers
    // without +country stay — conservative precision by design
    assert(r(5L) == ((0L, 0L, 0L, "nothing sensitive here 3.14 is pi and 1.2.3 is a version")))
  }

  test("temperatureMix: sqrt quotas upsample small sources, cap at keep-all") {
    val d = docs(((0 until 160).map(i => (i.toLong, "x", "en", "big")) ++
      (160 until 170).map(i => (i.toLong, "x", "en", "small"))): _*)
    val r = Corpus.temperatureMix(d, maxKeep = 0.5).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("big") == ((160L, 500000L))) // largest source keeps maxKeep
    // sqrt(160/10)*0.5 = 2.0 -> capped at keep-all
    assert(r("small") == ((10L, 1000000L)))
  }

  test("embeddingContamination: planted near-dup vector is flagged") {
    import spark.implicits._
    val bench = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Array(0.99f, 0.1f, 0.0f)),   // near-dup of bench 1
      (11L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (12L, Array(-1.0f, 0.0f, 0.0f)))   // opposite
      .toDF("vec_id", "embedding")
    val hits = Corpus.embeddingContamination(train, bench, 0.9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(10L -> 1L))
  }

  test("embeddingContamination: bucketed scale path equals the brute path on planted near-dups") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, concat}
    // embeddings fixture + planted near-identical twins of 3 benchmark
    // vectors: the contamination regime (cosine >= 0.9), where the seeded
    // multi-table LSH finds every pair deterministically
    val emb = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val bench = emb.where(col("vec_id") < 3)
    val jiggle = org.apache.spark.sql.functions.transform(
      col("embedding"), x => x * lit(1.0f) + lit(0.001f))
    val train = emb.where(col("vec_id") >= 3)
      .unionByName(bench.select((col("vec_id") + 1000).as("vec_id"),
        jiggle.as("embedding")))
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val brute = got(Corpus.embeddingContaminationBrute(train, bench, 0.9, excludeSameId = false))
    val bucketed = got(Corpus.embeddingContaminationBucketed(train, bench, 0.9, excludeSameId = false))
    assert(brute.keySet.exists(_ >= 1000L), "fixture must plant near-dups")
    assert(bucketed == brute)
    // dispatch: a tiny benchmark takes the exact broadcast path; shrink
    // the budget and the same call routes through the buckets
    assert(got(Corpus.embeddingContamination(train, bench, 0.9)) == brute)
    assert(got(Corpus.embeddingContamination(train, bench, 0.9,
      maxBroadcastRows = 1)) == brute)
  }

  test("contaminationHits: planted leak is flagged with exact shingle counts") {
    // doc 1 copies benchmark doc 100's opening 6 tokens => two shared
    // 5-grams; doc 2 shares nothing; benchmark docs are never flagged
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta other words", "en", "s"))
    val train = docs(
      (1L, "alpha beta gamma delta epsilon zeta different tail", "en", "s"),
      (2L, "totally unrelated content with many plain tokens", "en", "s"))
    val hits = graft.functions.Corpus.contaminationHits(train, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 2L))
  }

  test("degenerate docs: empty and single-token texts don't break the metrics") {
    // ANSI-mode regression guard: slice/element access on 0/1-token
    // arrays must not throw, fractions must not be NULL/NaN
    val d = docs((1L, "", "en", "s"), (2L, "solo", "en", "s"), (3L, "a b", "en", "s"))
    val rep = Corpus.repetitionStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rep(1L).getDouble(4) == 0.0 && rep(2L).getDouble(4) == 0.0)
    assert(rep(3L).getLong(1) == 2)
    assert(!rep.values.exists(r => r.isNullAt(3) || r.isNullAt(4) ||
      r.getDouble(3).isNaN || r.getDouble(4).isNaN))
    val gate = Corpus.qualityGate(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gate("en") == (3L, 0L)) // all too short; none pass, none crash
    assert(Corpus.packSequences(d, 16).agg(sum("n_docs")).head().getLong(0) == 3L)
  }

  test("packing invariants on the sf corpus: totals preserved, bins near capacity") {
    import spark.implicits._
    val d = graft.model.Tables.documents(spark, sf)
    val packed = Corpus.packSequences(d, 256)
    // conservation: every doc and every token lands in exactly one bin
    val Seq(nd, nt) = packed.agg(sum("n_docs"), sum("n_tokens")).head()
      .toSeq.map(_.asInstanceOf[Long])
    assert(nd == d.count())
    val totalTokens = d.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(nt == totalTokens)
    // every non-final bin of a shard holds < capacity + max single doc
    val maxDoc = d.select(max(size(split(col("text"), " ")))).head().getInt(0)
    val over = packed.where(col("n_tokens") >= 256 + maxDoc).count()
    assert(over == 0, s"a bin exceeded capacity+maxdoc ($over bins)")
  }

  test("packSequences: running-sum bins respect capacity and shard isolation") {
    // 5-token docs, capacity 12: bins of 2 docs (10 before-tokens < 12,
    // 3rd doc starts at 10 div 12 = 0... before=10 -> bin 0; before=15 -> bin 1)
    val d = docs((1 to 6).map(i =>
      (i.toLong, "a b c d e", "en", if (i <= 3) "sA" else "sB")): _*)
    val r = Corpus.packSequences(d, capacity = 12).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    // per shard: doc1 before=0 bin0, doc2 before=5 bin0, doc3 before=10 bin0
    // (10 div 12 = 0), so one bin of 3 docs / 15 tokens per shard
    assert(r == Map(("sA", 0L) -> (3L, 15L), ("sB", 0L) -> (3L, 15L)))
    val r2 = Corpus.packSequences(d, capacity = 6).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    // capacity 6: before=0 bin0, before=5 bin0, before=10 bin1
    assert(r2 == Map(("sA", 0L) -> 2L, ("sA", 1L) -> 1L,
      ("sB", 0L) -> 2L, ("sB", 1L) -> 1L))
  }

  test("qualityModelScores: exact integer linear score over hashed uni+bigrams") {
    import spark.implicits._
    // reference weight calc mirroring the distributed formula
    def weight(feat: String, buckets: Int = 4096): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(feat.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val b = java.lang.Long.parseLong(hex, 16) % buckets
      ((b * 2654435761L) % 2147483648L) % 1001L - 500L
    }
    val docs = Seq(
      (1L, "alpha beta gamma"),       // 3 uni + 2 bi = 5 feats
      (2L, "solo"),                   // 1 uni, no bigrams
      (3L, ""),                       // no features at all
      (4L, "  spaced   out  "))       // empty split tokens filtered
      .toDF("doc_id", "text")
    val got = Corpus.qualityModelScores(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val s1 = Seq("alpha", "beta", "gamma", "alpha beta", "beta gamma").map(weight(_)).sum
    val s2 = weight("solo")
    val s4 = Seq("spaced", "out", "spaced out").map(weight(_)).sum
    assert(got(1L) === ((5L, s1, if (s1 >= 0) 1L else 0L)))
    assert(got(2L) === ((1L, s2, if (s2 >= 0) 1L else 0L)))
    assert(got(3L) === ((0L, 0L, 1L))) // featureless doc scores 0, kept
    assert(got(4L) === ((3L, s4, if (s4 >= 0) 1L else 0L)))
    // the plan is a pure projection: no exchange anywhere
    val plan = Corpus.qualityModelScores(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "quality scoring must not shuffle")
  }

  test("perceptron: separable fixture converges, partition-invariant, degenerate input") {
    import spark.implicits._
    // disjoint vocabularies: 'en' docs speak vocab A, 'fr' docs vocab B
    // — linearly separable in the bucket space, so the batch perceptron
    // must classify every doc correctly after its 4 epochs
    val docs = Seq(
      (1L, "en", "alpha beta gamma alpha"),
      (2L, "en", "beta gamma delta"),
      (3L, "en", "alpha delta delta gamma"),
      (4L, "fr", "uno dos tres"),
      (5L, "fr", "dos tres quattro uno"),
      (6L, "fr", "uno quattro quattro"),
      (7L, "fr", ""), // featureless: score 0, pred +1 BY the >= 0 rule
      (8L, "en", null.asInstanceOf[String])) // null text ≡ empty
      .toDF("doc_id", "lang", "text")
    val out = Corpus.perceptronQualityScores(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 8)
    for (id <- Seq(1L, 2L, 3L)) {
      val (y, score, pred) = out(id)
      assert(y === 1L && score > 0 && pred === 1L, s"doc $id: ${out(id)}")
    }
    for (id <- Seq(4L, 5L, 6L)) {
      val (y, score, pred) = out(id)
      assert(y === -1L && score < 0 && pred === -1L, s"doc $id: ${out(id)}")
    }
    // featureless docs score exactly 0 in both engines' contract
    assert(out(7L) === ((-1L, 0L, 1L)) && out(8L) === ((1L, 0L, 1L)))
    // batch (not sequential) updates: the result is partitioning- and
    // order-independent
    val repart = Corpus.perceptronQualityScores(
      docs.repartition(7).sortWithinPartitions("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(repart === out)
    // AVERAGED variant: same separable fixture stays fully correct, and
    // on a separable run where later epochs stop updating, the summed-
    // snapshot score is larger in magnitude but identical in sign
    val avg = Corpus.perceptronQualityScores(docs, averaged = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (id <- 1L to 6L) {
      val (_, s0, p0) = out(id)
      val (_, sa, pa) = avg(id)
      assert(pa === p0 && math.abs(sa) >= math.abs(s0), s"doc $id: $sa vs $s0")
    }
    assert(avg(7L) === ((-1L, 0L, 1L)) && avg(8L) === ((1L, 0L, 1L)))
  }

  test("bloom decontamination equals the exact anti-join exactly") {
    import spark.implicits._
    // doc 1 shares a full 5-gram with the benchmark (dirty); doc 2 is
    // clean; doc 3 is too short to shingle (survives trivially);
    // doc 4 shares only 4 consecutive tokens (clean at n=5)
    val train = Seq(
      (1L, "a b c d e f g"),
      (2L, "p q r s t u v"),
      (3L, "a b c"),
      (4L, "z b c d e x y"))
      .toDF("doc_id", "text")
    val bench = Seq((7L, "a b c d e zz ww")).toDF("doc_id", "text")
    val got = Corpus.bloomDecontaminate(train, bench)
      .collect().map(_.getLong(0)).toSet
    // independent exact anti-join
    def sh(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Dedup.shingles(df, 5)
    val dirty = sh(train).join(sh(bench).select("shingle"), Seq("shingle"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val expect = Set(1L, 2L, 3L, 4L) -- dirty
    assert(got == expect && got == Set(2L, 3L, 4L), s"got $got dirty $dirty")
    // the filter-size fence fails loud
    intercept[IllegalArgumentException] {
      Corpus.bloomDecontaminate(train, bench, maxBits = 32L)
    }
  }

  test("ppsSample: exact k draws, PPS weighting, bucketed = global cumsum") {
    import spark.implicits._
    val T = 2147483648L
    def hash(v: Long): Long = ((v % T) * 2654435761L) % T
    // 60 docs with varied token masses, incl. one whale heavier than
    // the sampling step (must be drawn multiple times)
    val docs = (1L to 60L).map { i =>
      val n = if (i == 17L) 500 else (hash(i) % 9 + 1).toInt
      (i, Seq.fill(n)("tok").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val k = 20
    val got = Corpus.ppsSample(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sum == k, s"sum of draws must be exactly $k")
    // in-JVM replay with ONE global cumsum — the bucketed two-level
    // prefix sum must land on the identical axis
    val ws = docs.map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
    val total = ws.map(_._2).sum
    val step = total / k
    var cum = 0L
    val expected = ws.sortBy { case (id, _) => (hash(id), id) }.flatMap {
      case (id, w) =>
        val lo = cum; cum += w
        val hits = math.min(cum / step, k.toLong) - math.min(lo / step, k.toLong)
        if (hits >= 1) Some((id, w, hits)) else None
    }
    assert(got.toSet == expected.toSet)
    // the whale outweighs the step → multiple draws
    assert(got.find(_._1 == 17L).exists(_._3 >= 2))
    // degenerate: fewer tokens than draws fails loud
    intercept[IllegalArgumentException] {
      Corpus.ppsSample(Seq((1L, "a b")).toDF("doc_id", "text"), 5)
    }
  }
}
