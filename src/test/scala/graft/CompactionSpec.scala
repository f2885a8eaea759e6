package graft

import org.apache.spark.sql.functions._

import graft.functions.{DedupIndex, IVF, PQ}
import graft.model.Tables

/** The compaction fold that closes the persisted-index LSM lifecycle
  * (build → persist → stream-ingest → COMPACT → delete): correctness
  * of the fold, the partition-pruned write confinement, replay
  * idempotence (ingest-wins), and the crash-heal paths for both the
  * marker-scoped partition fold (IVF / dedup) and the swap-rename
  * bucketed fold (PQ).
  */
class CompactionSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  private def cellSet(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid"))).toSet

  private def wh = new java.io.File(
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))

  private def partState(table: String, part: String): Set[(String, Long)] = {
    val d = new java.io.File(wh, s"$table/$part")
    if (!d.isDirectory) Set.empty
    else d.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
  }

  test("IVF compact: partition-pruned fold, emptied ingest, untouched cells, replay no-op") {
    // the delta is confined to ONE cell (a mod-10 slice spreads over
    // every cell at this SF and would leave nothing unaffected): all
    // of the min cid's vectors ingest, the rest are the base
    val model = IVF.fit(emb, k = 8, iters = 3)
    val indexedAll = IVF.index(emb, model).cache()
    val deltaCid = indexedAll.agg(min(col("cid"))).head.getInt(0)
    val base = indexedAll.where(col("cid") =!= deltaCid)
    IVF.save(model, base, "graft_ivf_cpt_spec")
    graft.streaming.StreamingOps.replayIvfIngest(
      emb.join(indexedAll.where(col("cid") === deltaCid).select("vec_id"),
        Seq("vec_id"), "left_semi"),
      model, "graft_ivf_cpt_spec", nBatches = 2)
    // cells no ingest row lands in must not be rewritten by the fold
    val ingCids = spark.table("graft_ivf_cpt_spec_cells_ingest")
      .select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(ingCids == Set(deltaCid))
    val baseCids = spark.table("graft_ivf_cpt_spec_cells")
      .select("cid").distinct().collect().map(_.getInt(0)).toSet
    val untouched = (baseCids -- ingCids).toSeq
    assert(untouched.nonEmpty, "fixture must leave some cells unaffected")
    val statesBefore = untouched
      .map(c => c -> partState("graft_ivf_cpt_spec_cells", s"cid=$c")).toMap
    IVF.compact(spark, "graft_ivf_cpt_spec")
    // folded: a fresh session serves the whole corpus from the base
    // table alone; the ingest partitions and the marker are gone
    val fresh = spark.newSession()
    val (m2, cells) = IVF.load(fresh, "graft_ivf_cpt_spec")
    assert(m2.centroids.map(_.toSeq).toSeq == model.centroids.map(_.toSeq).toSeq)
    assert(cellSet(cells) == cellSet(IVF.index(emb, model)))
    assert(spark.table("graft_ivf_cpt_spec_cells_ingest").count() == 0)
    assert(!spark.catalog.tableExists("graft_ivf_cpt_spec_cells_folding"))
    // the fold never read or wrote the unaffected partitions
    untouched.foreach(c => assert(
      partState("graft_ivf_cpt_spec_cells", s"cid=$c") == statesBefore(c),
      s"cid=$c was rewritten by the fold"))
    // compacting an already-compacted index is a no-op
    val allStates = baseCids.toSeq
      .map(c => c -> partState("graft_ivf_cpt_spec_cells", s"cid=$c")).toMap
    IVF.compact(spark, "graft_ivf_cpt_spec")
    baseCids.foreach(c => assert(
      partState("graft_ivf_cpt_spec_cells", s"cid=$c") == allStates(c)))
  }

  test("IVF compact crash-heal: marker replay is ingest-wins idempotent, load heals") {
    val base = emb.where(col("vec_id") % 10 =!= 7)
    val delta = emb.where(col("vec_id") % 10 === 7)
    val model = IVF.fit(base, k = 8, iters = 3)
    IVF.save(model, IVF.index(base, model), "graft_ivf_heal_spec")
    // crash window A — marker landed, nothing else did: a reader's
    // load must complete the fold before serving
    IVF.ensureIngestTable(spark, "graft_ivf_heal_spec")
    IVF.ingestBatch(IVF.index(delta, model), "graft_ivf_heal_spec", 0L)
    import spark.implicits._
    Seq(0L).toDF("ingest_batch").coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ivf_heal_spec_cells_folding")
    val (_, healed) = IVF.load(spark.newSession(), "graft_ivf_heal_spec")
    assert(cellSet(healed) == cellSet(IVF.index(emb, model)))
    assert(spark.table("graft_ivf_heal_spec_cells_ingest").count() == 0)
    assert(!spark.catalog.tableExists("graft_ivf_heal_spec_cells_folding"))
    // crash window B — the overwrite landed but the ingest partitions
    // did not drop (the duplicate window): re-ingest rows the base now
    // already contains and heal; ingest-wins must fold without doubling
    IVF.ingestBatch(IVF.index(delta, model), "graft_ivf_heal_spec", 1L)
    Seq(1L).toDF("ingest_batch").coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ivf_heal_spec_cells_folding")
    val (_, healed2) = IVF.load(spark.newSession(), "graft_ivf_heal_spec")
    assert(healed2.count() == emb.count(), "fold doubled re-folded rows")
    assert(cellSet(healed2) == cellSet(IVF.index(emb, model)))
  }

  test("dedup compact: probe parity with the LSM shape, emptied ingest, untouched kps") {
    val docs = Tables.documents(spark, sf).cache()
    val baseDocs = docs.where(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 5)
    DedupIndex.save(baseDocs, "graft_dedup_cpt_spec")
    graft.streaming.StreamingOps.replayDedupIngest(
      docs.where(col("doc_id") % 10 === 5), "graft_dedup_cpt_spec")
    def pairs(s: org.apache.spark.sql.SparkSession) = {
      val d = Tables.documents(s, sf)
      DedupIndex.probe(s, "graft_dedup_cpt_spec",
        d.where(col("doc_id") % 10 === 7),
        d.where(col("doc_id") % 10 =!= 7), 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val lsmPairs = pairs(spark.newSession())
    assert(lsmPairs.nonEmpty, "fixture yields no near-dup pairs")
    val ingKps = spark.table("graft_dedup_cpt_spec_buckets_ingest")
      .select("kp").distinct().collect().map(_.getLong(0)).toSet
    val baseKps = spark.table("graft_dedup_cpt_spec_buckets")
      .select("kp").distinct().collect().map(_.getLong(0)).toSet
    val untouched = (baseKps -- ingKps).toSeq
    val statesBefore = untouched
      .map(k => k -> partState("graft_dedup_cpt_spec_buckets", s"kp=$k")).toMap
    DedupIndex.compact(spark, "graft_dedup_cpt_spec")
    assert(pairs(spark.newSession()) == lsmPairs)
    assert(spark.table("graft_dedup_cpt_spec_buckets_ingest").count() == 0)
    assert(!spark.catalog.tableExists("graft_dedup_cpt_spec_buckets_folding"))
    untouched.foreach(k => assert(
      partState("graft_dedup_cpt_spec_buckets", s"kp=$k") == statesBefore(k),
      s"kp=$k was rewritten by the fold"))
  }

  test("PQ compact: swap fold preserves bucket spec, drops ingest, heals a crashed swap") {
    def codeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Int]]("codes"))).toSet
    val base = emb.where(col("vec_id") % 10 =!= 7)
    val delta = emb.where(col("vec_id") % 10 === 7)
    val model = PQ.fit(base, m = 8, ks = 16, iters = 3)
    // non-default bucket count: the fold must preserve the table's OWN
    // spec, not this call's default
    PQ.save(model, PQ.index(base, model), "graft_pq_cpt_spec", nBuckets = 4)
    graft.streaming.StreamingOps.replayPqIngest(delta, model,
      "graft_pq_cpt_spec", nBatches = 2)
    PQ.compact(spark, "graft_pq_cpt_spec")
    assert(!spark.catalog.tableExists("graft_pq_cpt_spec_codes_ingest"))
    assert(codeSet(PQ.load(spark.newSession(), "graft_pq_cpt_spec")._2) ==
      codeSet(PQ.index(emb, model)))
    val spec = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser
        .parseTableIdentifier("graft_pq_cpt_spec_codes")).bucketSpec
    assert(spec.map(_.numBuckets).contains(4), s"bucket spec degraded: $spec")
    // compacting with no ingest table is a no-op
    PQ.compact(spark, "graft_pq_cpt_spec")
    assert(codeSet(spark.table("graft_pq_cpt_spec_codes")) ==
      codeSet(PQ.index(emb, model)))
    // crash window — a finished swap beside the live tables (died
    // between the swap write and the drops): load completes the
    // rename, drops the stale ingest, and serves the swap's fold
    val folded = PQ.index(emb, model)
    graft.sources.Sources.writeBucketed(folded, "graft_pq_cpt_spec_codes_swap",
      "vec_id", 4, sortCols = Seq("vec_id"))
    PQ.ensureIngestTable(spark, "graft_pq_cpt_spec")
    PQ.ingestBatch(PQ.index(delta, model), "graft_pq_cpt_spec", 9L)
    val (_, healed) = PQ.load(spark.newSession(), "graft_pq_cpt_spec")
    assert(codeSet(healed) == codeSet(folded))
    assert(!spark.catalog.tableExists("graft_pq_cpt_spec_codes_swap"))
    assert(!spark.catalog.tableExists("graft_pq_cpt_spec_codes_ingest"))
  }
}
