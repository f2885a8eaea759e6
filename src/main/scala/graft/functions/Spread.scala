package graft.functions

import org.apache.spark.sql.DataFrame

/** Guard against under-partitioned inputs ahead of compute-heavy per-row
  * stages (shingling, signatures, fingerprints): a small parquet file is
  * one row group = ONE scan task, so everything before the first shuffle
  * runs on one core no matter how many the session has.
  *
  * The gate only fires when the scan has fewer partitions than the
  * session's parallelism — on real multi-file/multi-row-group data (the
  * 100 TB case) it is a no-op, so no gratuitous full-corpus shuffle is
  * ever added at scale.
  *
  * ONLY wrap scan-stage inputs (a table loader plus per-row projections /
  * filters). The partition probe goes through `df.rdd`, and under AQE
  * that pre-executes any shuffle stages in the plan to learn the final
  * partitioning — wrapping a plan that already contains a join or
  * aggregation runs that work twice (measured 2× on the summary-agg
  * queries, whose sequential union-find fold was never the bottleneck
  * anyway: O(α) per edge beats any per-row encode cost that parallelism
  * would amortize).
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
