package graft

import org.apache.spark.sql.functions._

import graft.functions.KMeans

class KMeansSpec extends SparkTestBase {

  test("clusterExact separates planted clusters and is partitioning-invariant") {
    import spark.implicits._
    // two tight planted blobs in 2-D: ids 0-4 near (0.1, 0.1), ids 5-9
    // near (0.9, 0.9); k=2 must split them exactly after one iteration
    val vecs = (0L to 9L).map { id =>
      val base = if (id < 5) 0.1f else 0.9f
      (id, Array(base + id.toFloat / 1000f, base - id.toFloat / 1000f))
    }.toDF("vec_id", "embedding")
    val out = KMeans.clusterExact(vecs, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.values.map(_._1).toSeq.sorted === Seq(5L, 5L), s"sizes: $out")
    // the two centroid sums sit near the two blob centers (micro-units):
    // one ≈ 0.2e6 total, the other ≈ 1.8e6
    val sums = out.values.map(_._2).toSeq.sorted
    assert(sums.head > 150000L && sums.head < 250000L, s"low blob: $sums")
    assert(sums.last > 1750000L && sums.last < 1850000L, s"high blob: $sums")
    // partitioning must not change a single output value (integer Σ)
    for (parts <- Seq(1, 7)) {
      val again = KMeans.clusterExact(vecs.repartition(parts), k = 2, iters = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(again === out, s"parts=$parts")
    }
  }

  test("clusterExact: empty clusters keep their centroid; iters=0 assigns to init") {
    import spark.implicits._
    // 3 identical vectors, k=2: init picks two (identical) centroids,
    // all vectors tie at dist 0 -> all go to cid with the smaller id,
    // the other cluster is EMPTY and must not appear in the output
    val vecs = Seq((1L, Array(0.5f, 0.5f)), (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = KMeans.clusterExact(vecs, k = 2, iters = 2).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 3L) // all members in one cluster
    assert(out.head.getLong(3) === 0L) // inertia 0: identical vectors
    // iters=0: pure assignment to the deterministic init
    val zero = KMeans.clusterExact(vecs, k = 2, iters = 0).collect()
    assert(zero.map(_.getLong(1)).sum === 3L)
  }
}
