package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join.
  *
  * Spark plans a bare `p >= lo AND p < hi` theta-join as
  * BroadcastNestedLoopJoin — O(|P|·|I|) work and a broadcast of a whole
  * side, both catastrophic at 100 TB. The standard fix (the technique
  * behind dedicated range-join support in several engines) is BIN
  * EXPANSION: pick a bin width, map each point to its bin, expand each
  * interval to the (few) bins it covers, equi-join on the bin key —
  * a plain shuffled hash/sort-merge join — and post-filter exactly.
  * Work becomes O(|P| + Σ_i bins(i) + matches): linear in the data plus
  * the true result, provided bin width is of the order of the interval
  * span.
  *
  * Correctness does not depend on the bin width (the post-filter is
  * exact); only performance does. The expansion is fenced: an interval
  * covering more than `maxBinsPerInterval` bins fails loudly instead of
  * silently exploding rows — at that point the caller picked a bin
  * width orders of magnitude below the span and should rebin.
  *
  * Reference scope note: the reference engine has no relational join
  * operators at all (SURVEY §2.2); this is part of the beyond-reference
  * relational surface (as-of join q51, interval stream-stream join q84).
  */
object RangeJoin {

  /** All (interval, point) matches with `lo <= p < hi` (half-open).
    * `points`: (p_id, p); `intervals`: (i_id, lo, hi). Output:
    * (i_id, p_id, p), one row per containment.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, binSize: Long,
                      maxBinsPerInterval: Int = 64): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    // integer `div` (exact at any magnitude — double floor loses ulps
    // past 2^53); values are epochs/offsets, non-negative by contract.
    // iv is checkpointed: the spanBins fence below is an ACTION over
    // it, and without the cut the join side would re-run the whole
    // interval scan (the embeddingContamination discipline)
    val iv = intervals.select(col("i_id"), col("lo").cast("long"), col("hi").cast("long"))
      .where(col("hi") > col("lo"))
      .cutLineage()
    // empty/degenerate interval sets: max() is NULL — no expansion to
    // fence, the join below is correctly empty
    val spanBins = Option(iv
        .agg(max(expr(s"(hi - 1) div $binSize - lo div $binSize + 1")))
        .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    require(spanBins <= maxBinsPerInterval,
      s"range join: an interval covers $spanBins bins of width $binSize " +
        s"(cap $maxBinsPerInterval) — rebin with a width near the typical span")
    val binnedIv = iv.select(col("i_id"), col("lo"), col("hi"),
        explode(sequence(expr(s"lo div $binSize"),
          expr(s"(hi - 1) div $binSize"))).as("bin"))
    val binnedP = points.select(col("p_id"), col("p").cast("long"))
      .withColumn("bin", expr(s"p div $binSize"))
    binnedIv.join(binnedP, Seq("bin"))
      .where(col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("i_id"), col("p_id"), col("p"))
  }

  /** Per-interval containment counts, intervals with zero matches kept
    * (count 0) — the aggregate form pipelines (curation-window stats,
    * promo attribution) actually consume. Output: (i_id, n_points).
    */
  def countPerInterval(points: DataFrame, intervals: DataFrame, binSize: Long,
                       maxBinsPerInterval: Int = 64): DataFrame = {
    val matches = pointInInterval(points, intervals, binSize, maxBinsPerInterval)
      .groupBy("i_id").agg(count(lit(1)).as("n_points"))
    intervals.select("i_id").distinct()
      .join(matches, Seq("i_id"), "left")
      .select(col("i_id"), coalesce(col("n_points"), lit(0L)).as("n_points"))
  }
}
