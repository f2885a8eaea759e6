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
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
