package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.model.Tables
import graft.operators.Triangles

/** Sketch gates and the triangles∘degrees composition. */
class SketchesSpec extends SparkTestBase {

  test("CMS heavy hitters: top-k exact counts with the bound holding (sf0.001)") {
    val docs = Tables.documents(spark, sf)
    val rows = Sketches.cmsHeavyHitters(docs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 10)
    assert(rows.forall(_._3), "CMS estimate outside [exact, exact + eps*N]")
    // exact side really is exact: recompute the top token's count directly
    val (topTok, topCnt, _) = rows.maxBy(_._2)
    val direct = docs.select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") === topTok).count()
    assert(topCnt == direct)
  }

  test("HLL distinct gate holds for every language (sf0.001)") {
    val rows = Sketches.hllDistinctGate(Tables.documents(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "HLL estimate off by more than 5×rsd")
  }

  test("clustering coefficients on a hand graph") {
    // triangle 1-2-3 plus pendant edge 3-4
    val c = edgeDf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val rows = Triangles.clusteringCoefficients(c)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!rows.contains(4L)) // degree 1 → undefined, excluded
    assert(rows(1L) == ((2L, 1L, 1.0)))
    assert(rows(2L) == ((2L, 1L, 1.0)))
    assert(rows(3L) == ((3L, 1L, 0.333333)))
  }

  test("tokenOverlap: identical corpora share everything, disjoint share ~0") {
    import spark.implicits._
    def corpus(prefix: String, n: Int) = (1 to 50).map(i =>
      (i.toLong, "en", (0 until n).map(j => s"$prefix${(i * 7 + j) % 300}").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val a = corpus("w", 20)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // identical: union registers == each side's → overlap == est
    val same = rows(graft.functions.Sketches.tokenOverlap(a, a))("en")
    assert(same._1 == same._2 && same._3 == same._1 && same._4 == same._1)
    // disjoint vocabularies: union ≈ sum → overlap ≈ 0 (estimator
    // noise bounded: m=16 ⇒ |overlap| well under half of either side)
    val disj = rows(graft.functions.Sketches.tokenOverlap(a, corpus("z", 20)))("en")
    assert(math.abs(disj._4) < disj._1 / 2,
      s"disjoint corpora overlap estimate too large: $disj")
    // a lang absent from one side reports est 0 there, not the empty
    // sketch's estimator floor
    val b2 = Seq((1L, "fr", "bonjour le monde")).toDF("doc_id", "lang", "text")
    val only = rows(graft.functions.Sketches.tokenOverlap(a, b2))
    assert(only("fr")._1 == 0L && only("fr")._2 > 0L)
    assert(only("en")._2 == 0L && only("en")._1 > 0L)
  }
}
