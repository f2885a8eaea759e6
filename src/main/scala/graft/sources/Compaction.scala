package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crash-safe COMPACTION of an exactly-once streaming-ingest side
  * table into its hive-partitioned base table — the fold that closes
  * the LSM lifecycle the persisted indexes run (build → persist →
  * stream-ingest → COMPACT → delete). Before the fold, serving pays
  * the LSM read shape: the partition-pruned base scan PLUS a whole
  * scan of the (small, recent) ingest delta on every probe; the fold
  * moves each ingest row into the base partition it belongs to, so
  * serving is a purely pruned scan again and the per-trigger ingest
  * files stop accumulating (the small-file debt a week of triggers
  * builds up at 100 TB).
  *
  * Shared by the partitioned index families —
  * [[graft.functions.IVF.compact]] (cells keyed by `cid`) and
  * [[graft.functions.DedupIndex.compact]] (buckets keyed by `kp`);
  * the vec_id-BUCKETED PQ codes table compacts through its own
  * swap-rename discipline instead ([[graft.functions.PQ.compact]]) —
  * a bucketed layout has no partition directories to fold into, so
  * its unit of atomicity is the whole-table rename, not the
  * partition overwrite.
  *
  * The fold is PARTITION-PRUNED on both sides: ingest rows already
  * carry their base partition value (they were encoded through the
  * frozen model / hash family at ingest time), so the affected base
  * partitions are exactly the distinct partition values in the folded
  * batches — a bounded driver list (≤ k cells / ≤ KP buckets, the
  * IVF nprobe discipline). Unaffected base partitions are never read
  * or written (spec asserts files + mtimes).
  *
  * CRASH SAFETY — the marker-scoped replay discipline: a tiny
  * `<base>_folding` marker table recording the ingest batches being
  * folded is written BEFORE the base overwrite and dropped only after
  * the folded ingest partitions are. Every crash window in between
  * leaves the marker on disk, and [[healFold]] — invoked by the next
  * fold AND by every index load — replays the fold, which is
  * IDEMPOTENT because survivors are derived from the CURRENT state
  * with ingest-wins precedence: base rows of the affected partitions
  * are anti-joined against the folded batches' ids before the union,
  * so re-folding rows the crashed overwrite already landed changes
  * nothing. A reader that heals first therefore never serves a
  * duplicate, whatever instant the previous writer died at.
  *
  * CONCURRENCY: the fold is scoped to the batch list captured in the
  * marker — a streaming trigger that appends a NEW batch after the
  * capture is untouched by this fold (and folded by the next one).
  * Single compactor at a time, the usual table-maintenance contract.
  *
  * ID-collision contract: an ingested id that already exists in the
  * base REPLACES the base rows within the affected partitions
  * (ingest-wins — what replay-idempotence requires anyway). An update
  * that moves an id's rows ACROSS partitions (re-encoded text landing
  * in different kp buckets) must go through delete → ingest; the fold
  * only sees the partitions the new rows live in.
  */
object Compaction {

  private def marker(baseTable: String) = s"${baseTable}_folding"

  /** Fold every current ingest batch of `ingestTable` into
    * `baseTable`'s `partCol` partitions (ingest-wins on `idCol`),
    * then drop the folded ingest partitions. No ingest table or no
    * batches → no-op. Heals any interrupted previous fold first.
    */
  def foldIngest(spark: SparkSession, baseTable: String,
                 ingestTable: String, partCol: String,
                 idCol: String): Unit = {
    healFold(spark, baseTable, ingestTable, partCol, idCol)
    if (!spark.catalog.tableExists(ingestTable)) return
    val batches = spark.table(ingestTable)
      .select(col("ingest_batch")).distinct().collect().map(_.getLong(0))
    if (batches.isEmpty) return
    // the marker write is the commit point: from here every crash
    // window replays through healFold; batches appended after this
    // capture belong to the next fold
    import spark.implicits._
    Sources.dropManagedTable(spark, marker(baseTable))
    spark.createDataset(batches.toIndexedSeq).toDF("ingest_batch")
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(marker(baseTable))
    doFold(spark, baseTable, ingestTable, partCol, idCol, batches)
  }

  /** Complete a fold interrupted after its marker landed: replay the
    * (idempotent) fold for the marker's batch list. Invoked by every
    * load so no reader ever serves the duplicate window.
    */
  def healFold(spark: SparkSession, baseTable: String,
               ingestTable: String, partCol: String,
               idCol: String): Unit =
    if (spark.catalog.tableExists(marker(baseTable))) {
      val batches = spark.table(marker(baseTable))
        .collect().map(_.getLong(0))
      if (batches.nonEmpty && spark.catalog.tableExists(ingestTable))
        doFold(spark, baseTable, ingestTable, partCol, idCol, batches)
      else Sources.dropManagedTable(spark, marker(baseTable))
    }

  private def doFold(spark: SparkSession, baseTable: String,
                     ingestTable: String, partCol: String, idCol: String,
                     batches: Array[Long]): Unit = {
    val base = spark.table(baseTable)
    val ing = spark.table(ingestTable)
      .where(col("ingest_batch")
        .isin(batches.map(java.lang.Long.valueOf): _*))
      .drop("ingest_batch")
    // the bounded driver list of affected base partitions (a healed
    // replay whose ingest partitions are already dropped sees none —
    // the overwrite already landed; fall through to the cleanup)
    val affParts = ing.select(col(partCol)).distinct().collect().map(_.get(0))
    if (affParts.nonEmpty) {
      // ingest-wins within the affected partitions; checkpoint breaks
      // the read-overwrite cycle on the base scan; the partCol
      // repartition keeps the one-file-per-directory write discipline
      // (without it every union branch's tasks fan a file into every
      // directory they touch — the small-file storm the bulk writers
      // already route around)
      val kept = base.where(col(partCol).isin(affParts.toIndexedSeq: _*))
        .join(ing.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        .unionByName(ing.select(base.columns.map(col): _*))
        .localCheckpoint(true)
        .repartition(col(partCol))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try kept.select(base.columns.map(col): _*)
        .write.mode("overwrite").insertInto(baseTable)
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    batches.foreach(b => spark.sql(
      s"ALTER TABLE $ingestTable DROP IF EXISTS PARTITION (ingest_batch = $b)"))
    Sources.dropManagedTable(spark, marker(baseTable))
  }
}
