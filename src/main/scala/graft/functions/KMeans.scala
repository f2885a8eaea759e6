package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT-integer Lloyd's k-means over an embedding column — the
  * deterministic, engine-replayable sibling of [[IVF]]'s float
  * spherical k-means (whose quality is recall-GATED, not value-checked).
  *
  * Everything is exact: vectors quantize once to integer micro-units
  * (round(x·10⁶), the fixed-point discipline of q54/q127), distances
  * are integer squared-L2, argmin ties break by smaller centroid id,
  * and centroid updates are truncating integer means — so ANY engine
  * replaying the same iteration count reproduces the clustering
  * bit-for-bit regardless of partitioning or summation order
  * (integer Σ is associative/commutative; no float drift).
  *
  * Distributed shape: centroids are k·D longs — they live in the PLAN
  * as literals (broadcast by construction); assignment is a pure
  * codegen'd projection (zip_with + aggregate per centroid, array_min
  * of (dist, cid) structs); the only shuffle per iteration is the
  * (cid, dim) partial-aggregated centroid-sum — O(k·D) rows out of the
  * map side. The per-iteration driver collect is k·D longs (loop
  * control, the audited class — same as [[IVF.fit]]). Init picks the k
  * vectors with the smallest [[graft.Portable.prio31]] priority (id
  * ties) — deterministic on any engine, no RNG.
  *
  * Overflow: |micro| ≤ ~10⁹ per coordinate ⇒ diff² ≤ 4·10¹⁸ / D… for
  * unit-norm-ish embeddings (|x| ≤ 1 ⇒ |micro| ≤ 10⁶) dist ≤ 4·10¹²·D —
  * Long-safe through D ~ 10⁵. Inputs far outside [-10³, 10³] should
  * scale down first (documented caveat, spec-probed).
  */
object KMeans {

  private def sqDist(e: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(e, typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** (vec_id, e, cid, dist) under the given centroids. */
  private def assign(vecs: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col("e"), c).as("dist"), lit(i.toLong).as("cid"))
    }
    vecs.withColumn("best", array_min(array(scored.toIndexedSeq: _*)))
      .select(col("vec_id"), col("e"),
        col("best.cid").as("cid"), col("best.dist").as("dist"))
  }

  /** Cluster and summarize: one row per NON-EMPTY final cluster —
    * `(cid, n_members, centroid_sum = Σ dims of the final centroid,
    * inertia = Σ member distances)`, all exact integers.
    */
  def clusterExact(embeddings: DataFrame, k: Int = 4, iters: Int = 3): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got $k, $iters")
    val vecs = embeddings.select(col("vec_id").cast("long"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000d).cast("long")).as("e"))
      .cutLineage()
    var cents: Array[Array[Long]] = vecs
      .withColumn("p", graft.Portable.prio31(col("vec_id")))
      .orderBy(col("p"), col("vec_id")).limit(k)
      .select("e").collect().map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"corpus has fewer than $k vectors")
    for (_ <- 1 to iters) {
      val sums = assign(vecs, cents)
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      cents = cents.indices.map { c =>
        if (!sums.contains((c.toLong, 0))) cents(c) // empty cluster keeps its centroid
        else cents(c).indices.map { d =>
          val (s, n) = sums((c.toLong, d))
          s / n // Long division truncates toward zero — matches SQL //
        }.toArray
      }.toArray
    }
    val centSums = vecs.sparkSession.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i.toLong, c.sum) }.toIndexedSeq)
      .toDF("cid", "centroid_sum")
    assign(vecs, cents)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"), sum("dist").as("inertia"))
      .join(broadcast(centSums), Seq("cid"))
      .select("cid", "n_members", "centroid_sum", "inertia")
  }
}
