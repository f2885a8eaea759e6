package graft

import graft.functions.Bm25

class Bm25Spec extends SparkTestBase {

  test("bm25 topK matches an independent BigInt replay and ranks deterministically") {
    import spark.implicits._
    // d4 empty and d5 null must not count toward N (no tokens); query 3
    // ('customer table scan') matches nothing → zero rows for it
    val docs = Seq(
      (1L, "spark join window spark"),
      (2L, "spark the the the"),
      (3L, "fast merge merge"),
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Bm25.topK(docs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    // independent replay of the exact-integer formula
    val corpus = Map(1L -> "spark join window spark".split(" ").toSeq,
      2L -> "spark the the the".split(" ").toSeq,
      3L -> "fast merge merge".split(" ").toSeq)
    val n = corpus.size.toLong
    val tt = corpus.values.map(_.size.toLong).sum
    def df(t: String) = corpus.values.count(_.contains(t)).toLong
    def idf(t: String) =
      math.round(1e6 * math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5)))
    def score(d: Long, terms: Seq[String]): Long = terms.map { t =>
      val tf = corpus(d).count(_ == t).toLong
      if (tf == 0) BigInt(0)
      else {
        val dl = corpus(d).size.toLong
        BigInt(idf(t)) * 22 * tf * tt /
          (BigInt(tf) * 10 * tt + BigInt(3) * tt + BigInt(dl) * 9 * n)
      }
    }.sum.toLong
    val expected = Seq(
      (1L, 1L, 1L, score(1L, Seq("spark", "join", "window"))),
      (1L, 2L, 2L, score(2L, Seq("spark", "join", "window"))),
      (2L, 1L, 3L, score(3L, Seq("fast", "merge"))))
    assert(got.toSeq == expected, s"got ${got.toSeq} expected $expected")
    // the multi-term doc must outrank the single-term doc
    assert(expected(0)._4 > expected(1)._4)
  }

  test("maintained index serves scores bit-equal to a full rebuild (remove/add/update)") {
    import spark.implicits._
    val old = Seq(
      (1L, "spark join window spark"),
      (2L, "spark the the the"),
      (3L, "fast merge merge"),
      (4L, "customer table scan"))
      .toDF("doc_id", "text")
    // remove 3; UPDATE 2 (remove + re-add with new text); add fresh 10
    val removed = Seq(3L, 2L).toDF("doc_id")
    val added = Seq(
      (2L, "spark join fast"),
      (10L, "merge merge window"))
      .toDF("doc_id", "text")
    val finalCorpus = Seq(
      (1L, "spark join window spark"),
      (2L, "spark join fast"),
      (4L, "customer table scan"),
      (10L, "merge merge window"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val maintained = rows(Bm25.topKFrom(
      Bm25.maintain(Bm25.index(old), added, removed)))
    assert(maintained == rows(Bm25.topK(finalCorpus)))
    // empty delta is the identity
    val idle = rows(Bm25.topKFrom(Bm25.maintain(Bm25.index(old),
      added.limit(0), removed.limit(0))))
    assert(idle == rows(Bm25.topK(old)))
  }
}
