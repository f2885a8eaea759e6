package graft

import org.apache.spark.sql.functions._

import graft.functions.{IVF, Similarity}
import graft.model.Tables

class IVFSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("IVF training is deterministic and centroids are unit vectors") {
    val m1 = IVF.fit(emb, k = 8, iters = 3)
    val m2 = IVF.fit(emb, k = 8, iters = 3)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    m1.centroids.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("IVF index partitions the whole corpus into k cells") {
    val model = IVF.fit(emb, k = 8, iters = 3)
    val indexed = IVF.index(emb, model)
    assert(indexed.count() == emb.count())
    val cells = indexed.select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet) && cells.size > 1)
  }

  test("IVF topK recall vs brute force improves with nprobe") {
    val queries = emb.where(col("vec_id") <= 9)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val model = IVF.fit(emb, k = 8, iters = 3)
    val indexed = IVF.index(emb, model).cache()
    def recall(nprobe: Int): Double = {
      val got = IVF.topK(indexed, queries, model, 5, nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val r2 = recall(2)
    val r8 = recall(8) // probing all cells = exact
    assert(r8 == 1.0, s"full probe must be exact, got $r8")
    assert(r2 >= 0.3, s"nprobe=2 recall too low: $r2")
    assert(r8 >= r2)
  }

  test("sampled training (maxTrainVectors < corpus) still yields a usable index") {
    val n = emb.count()
    val cap = (n / 4).toInt.max(8)
    assert(cap < n) // the sample branch actually engages
    val model = IVF.fit(emb, k = 8, iters = 3, maxTrainVectors = cap)
    // deterministic: the hash-threshold sample is fixed, so re-fitting agrees
    val model2 = IVF.fit(emb, k = 8, iters = 3, maxTrainVectors = cap)
    assert(model.centroids.map(_.toSeq).toSeq == model2.centroids.map(_.toSeq).toSeq)
    // the FULL corpus is still indexed, and full-probe search stays exact
    val indexed = IVF.index(emb, model)
    assert(indexed.count() == n)
    val queries = emb.where(col("vec_id") <= 9)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = IVF.topK(indexed, queries, model, 5, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == brute, "full probe over a sample-trained index must remain exact")
  }
}
