package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The partition-confined anti-join rewrite shared by the persisted
  * indexes' DELETE maintenance ([[DedupIndex.delete]],
  * [[PhashIndex.delete]] — the IVF.delete shape): survivors of the
  * affected partitions are checkpointed, fully-emptied partitions
  * DDL-dropped FIRST (the overwrite writes no rows into them, and
  * dropping first closes the crash window where tombstoned rows kept
  * being served), then dynamic partition overwrite lands the
  * survivors. Unaffected partitions are never read or written.
  */
private[functions] object TableRewrite {

  /** Anti-join `table` against `tombIds` on `idCol`, confined to the
    * `pcol` partitions in `affected` (None = all).
    */
  def rewritePartitioned(spark: SparkSession, table: String,
                         pcol: String, idCol: String, tombIds: DataFrame,
                         affected: Option[Array[Number]]): Unit = {
    val full = spark.table(table)
    val scoped = affected match {
      case Some(vals) if vals.isEmpty => return
      case Some(vals) => full.where(col(pcol).isin(vals.toIndexedSeq: _*))
      case None => full
    }
    val before = scoped.select(col(pcol)).distinct().collect()
      .map(_.getLong(0)).toSet
    if (before.isEmpty) return
    val kept = scoped.join(tombIds, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val emptied = before --
      kept.select(col(pcol)).distinct().collect().map(_.getLong(0)).toSet
    emptied.foreach(v => spark.sql(
      s"ALTER TABLE $table DROP IF EXISTS PARTITION ($pcol = $v)"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try kept.select(full.columns.map(col): _*)
      .repartition(col(pcol))
      .write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
