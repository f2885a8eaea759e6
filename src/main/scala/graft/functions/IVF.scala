package graft.functions

import graft.Lineage.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions
import graft.functions.Similarity.{dot, norm}

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.lshTopK]]: partition the corpus into
  * Voronoi cells of k spherical-k-means centroids; a query probes only
  * its `nprobe` closest cells and brute-forces within them. The corpus
  * is scanned once at index time and shuffled once by cell id; per-query
  * work drops from O(N) to O(N·nprobe/k).
  *
  * Training is Lloyd's iterations expressed as DataFrame jobs; only the
  * k×dim centroid matrix (a few KB) ever reaches the driver — that is
  * model state, not data. Initialization is deterministic (vectors with
  * the k smallest xxhash64(vec_id) values), so the whole index is
  * reproducible run to run.
  */
object IVF {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Normalized embedding column (unit L2) — spherical k-means space.
    * One fused codegen pass: norm computed once per vector (not per
    * element), zero vectors pass through rather than becoming NaNs.
    */
  private def unit(c: Column): Column = VectorExpressions.unitVector(c)

  /** Column of cosine scores against each centroid: array<struct<s,i>>.
    * The centroid matrix binds as ONE array-of-arrays literal — k×dim
    * scalar literals (16×64 = 1,024 nested expressions) blow the
    * generated method past Janino limits and silently drop the stage to
    * interpreted eval. Used only on the query side (rows = #queries);
    * the corpus-side hot path is the codegen'd [[NearestCentroid]].
    */
  private def scores(vec: Column, cents: Array[Array[Double]]): Column = {
    val m = typedlit(cents.map(_.toSeq).toSeq)
    transform(m, (ct, i) => struct(dot(vec, ct).as("s"), i.cast("int").as("i")))
  }

  /** Nearest-centroid id (centroids are unit vectors; vec need not be):
    * fused argmax-dot loop over a constant matrix, fully codegen'd.
    */
  private def nearest(vec: Column, cents: Array[Array[Double]]): Column =
    VectorExpressions.nearestCentroid(vec, cents)

  /** Train spherical k-means with deterministic init.
    *
    * Lloyd's runs on a deterministic xxhash64-thresholded sample of at
    * most ~`maxTrainVectors` vectors (the full corpus trains only when it
    * is already that small): centroid quality needs a representative
    * sample, not every row, and at 100 TB nobody Lloyd-iterates the whole
    * corpus — the full data is scanned exactly once afterwards, by
    * [[index]]. The sample is hash-selected (no sort, no sampleBy RNG —
    * same rows on any engine/partitioning) and cached once, so each of
    * the `iters` iterations scans |sample|, not |corpus|, rows.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int = 5,
          maxTrainVectors: Int = 65536): Model = {
    val all = corpus.select(col("vec_id"), unit(asDouble(col("embedding"))).as("e"))
    val n = all.count() // loop-control scalar
    val vecs = (if (n <= maxTrainVectors) all
      else {
        // hash-threshold keep-fraction; expected sample size ≈ maxTrainVectors
        val keepPpm = math.max(1L, (maxTrainVectors.toDouble / n * 1e6).toLong)
        all.where(pmod(xxhash64(col("vec_id"), lit(7)), lit(1000000L)) < lit(keepPpm))
      }).cutLineage()
    var cents: Array[Array[Double]] = vecs
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(k)
      .select("e").collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = vecs.withColumn("cid", nearest(col("e"), cents))
      val means = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("mv"))
        .select(col("cid"), transform(col("mv"), s => s.getField("m")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      cents = cents.indices.map { i =>
        means.get(i).map { m =>
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n == 0) cents(i) else m.map(_ / n)
        }.getOrElse(cents(i)) // empty cell keeps its centroid
      }.toArray
    }
    Model(cents)
  }

  /** Index the corpus: one shuffle-free projection adding the cell id. */
  def index(corpus: DataFrame, model: Model): DataFrame =
    corpus.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("cid", nearest(col("e"), model.centroids))
      .withColumn("nn", norm(col("e")))

  /** Approximate top-k: probe the `nprobe` best cells per query, exact
    * cosine within them. Output matches [[Similarity.bruteForceTopK]].
    */
  def topK(indexed: DataFrame, queries: DataFrame, model: Model,
           k: Int, nprobe: Int = 2): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qe"))
      .withColumn("qn", norm(col("qe")))
      .withColumn("probe",
        slice(reverse(array_sort(scores(col("qe"), model.centroids))), 1, nprobe))
      .select(col("query_id"), col("qe"), col("qn"),
        explode(col("probe").getField("i")).as("cid"))
    val cands = indexed.join(broadcast(q), Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qe"), col("e")) / (col("qn") * col("nn")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Convenience end-to-end search. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val model = fit(corpus, nCells)
    topK(index(corpus, model), queries, model, k, nprobe)
  }

  /** Persist the index for the build-once / query-many lifecycle
    * ([[graft.functions.PQ.save]]'s sibling for the cell-probing
    * family): the indexed corpus as a catalog table PARTITIONED BY
    * CELL — one hive directory per cell, the layout under which a
    * probe of nprobe cells is a partition-pruned read of nprobe/k of
    * the corpus, never a full scan — and the centroids (model state,
    * k×dim doubles) as a tiny table (cid, pos, mu). Overwrite
    * semantics, idempotent across JVMs.
    */
  def save(model: Model, indexed: DataFrame, name: String): Unit = {
    val spark = indexed.sparkSession
    import spark.implicits._
    // a fresh save also clears any prior ingest state — stale streamed
    // partitions must never survive into a rebuilt index (the PQ.save
    // contract)
    Seq(s"${name}_cells", s"${name}_centroids", s"${name}_cells_ingest")
      .foreach(graft.sources.Sources.dropManagedTable(spark, _))
    indexed.write.mode("overwrite").format("parquet")
      .partitionBy("cid").saveAsTable(s"${name}_cells")
    val rows = for {
      (cent, cid) <- model.centroids.zipWithIndex.toIndexedSeq
      (mu, pos) <- cent.zipWithIndex.toIndexedSeq
    } yield (cid, pos, mu)
    spark.createDataset(rows).toDF("cid", "pos", "mu")
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${name}_centroids")
  }

  /** DELETE maintenance for a [[save]]d index — the IVF leg of the
    * takedown half ([[graft.functions.PQ.delete]] is the PQ leg, which
    * rewrites the whole bucketed table): the cid-PARTITIONED cells
    * layout makes deletion genuinely partition-pruned, the 100 TB
    * shape — (1) one broadcast semi-join finds the cids the tombstones
    * live in (a tiny driver list, ≤ k), (2) ONLY those hive partitions
    * are read (PartitionFilters — spec-asserted) and rewritten through
    * dynamic partition overwrite, after (3) any partition whose every
    * vector is tombstoned is dropped by DDL UP FRONT (dynamic
    * overwrite cannot touch a partition it writes no rows into, and
    * dropping first means no crash point leaves a fully-tombstoned
    * cell still being served). Centroids untouched, no re-assignment,
    * idempotent for absent/replayed deletes.
    */
  def delete(spark: org.apache.spark.sql.SparkSession, name: String,
             tombstones: DataFrame): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val cells = spark.table(s"${name}_cells")
    val tomb = broadcast(tombstones.select(col("vec_id")).distinct())
    val affCids = cells.join(tomb, Seq("vec_id"), "left_semi")
      .select(col("cid")).distinct().collect().map(_.getInt(0))
    if (affCids.nonEmpty) {
      val kept = cells.where(col("cid").isin(affCids.map(Integer.valueOf): _*))
        .join(tomb, Seq("vec_id"), "left_anti")
        .localCheckpoint(true)
      val emptied = affCids.toSet --
        kept.select(col("cid")).distinct().collect().map(_.getInt(0)).toSet
      // drop fully-emptied cells FIRST (review finding r11): the dynamic
      // overwrite writes no rows into them, so ordering the DDL ahead of
      // it closes the crash window where tombstoned vectors kept being
      // served from a stale partition with nothing recording the delete —
      // a failure after these drops but before the overwrite leaves the
      // emptied cells already gone and the partially-tombstoned cells
      // intact, and a replayed delete heals the rest
      emptied.foreach(c => spark.sql(
        s"ALTER TABLE ${name}_cells DROP IF EXISTS PARTITION (cid = $c)"))
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        // insertInto resolves columns BY POSITION against the table
        // schema (partition column last in the on-disk layout)
        kept.select(cells.columns.map(col): _*)
          .write.mode("overwrite").insertInto(s"${name}_cells")
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    // the exactly-once ingest side table is pruned by ITS partition key
    // (the batches the tombstones actually landed in — bounded by the
    // trigger count between compactions), same rewrite discipline
    if (spark.catalog.tableExists(s"${name}_cells_ingest")) {
      val ing = spark.table(s"${name}_cells_ingest")
      val affBatches = ing.join(tomb, Seq("vec_id"), "left_semi")
        .select(col("ingest_batch")).distinct().collect().map(_.getLong(0))
      if (affBatches.nonEmpty) {
        val keptI = ing.where(col("ingest_batch")
            .isin(affBatches.map(java.lang.Long.valueOf): _*))
          .join(tomb, Seq("vec_id"), "left_anti")
          .localCheckpoint(true)
        val emptiedB = affBatches.toSet --
          keptI.select(col("ingest_batch")).distinct().collect()
            .map(_.getLong(0)).toSet
        emptiedB.foreach(b => spark.sql(
          s"ALTER TABLE ${name}_cells_ingest DROP IF EXISTS PARTITION (ingest_batch = $b)"))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try keptI.select(ing.columns.map(col): _*)
          .write.mode("overwrite").insertInto(s"${name}_cells_ingest")
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
    }
  }

  /** Create the EXACTLY-ONCE streaming-append side table for a [[save]]d
    * index if absent: `<name>_cells_ingest`, the cells schema plus an
    * `ingest_batch` hive partition column — the
    * [[graft.functions.PQ.ensureIngestTable]] discipline for the
    * cell-probing family. Serving unions it through [[load]]; the base
    * stays cid-partition-pruned while the (small, recent) ingest delta
    * is scanned whole — the standard LSM read shape; a periodic rebuild
    * ([[save]] over the unioned corpus) is the compaction.
    */
  def ensureIngestTable(spark: org.apache.spark.sql.SparkSession,
                        name: String): Unit =
    if (!spark.catalog.tableExists(s"${name}_cells_ingest")) {
      import org.apache.spark.sql.types._
      graft.sources.Sources.dropManagedTable(spark, s"${name}_cells_ingest")
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("e", ArrayType(DoubleType)),
        StructField("nn", DoubleType),
        StructField("cid", IntegerType),
        StructField("ingest_batch", LongType)))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
        .write.mode("overwrite").format("parquet")
        .partitionBy("ingest_batch")
        .saveAsTable(s"${name}_cells_ingest")
    }

  /** Idempotent per-trigger append: write `indexed` ([[index]]ed rows
    * through the FROZEN centroids) into the `ingest_batch = batchId`
    * partition through dynamic partition overwrite — re-delivery
    * rewrites the same partition with the same rows (exactly-once
    * stored state, the [[graft.functions.PQ.ingestBatch]] contract).
    */
  def ingestBatch(indexed: DataFrame, name: String, batchId: Long): Unit = {
    val spark = indexed.sparkSession
    val t = s"${name}_cells_ingest"
    val cols = spark.table(t).columns
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try indexed.withColumn("ingest_batch", lit(batchId))
      .select(cols.map(col): _*)
      .repartition(1)
      .write.mode("overwrite").insertInto(t)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** COMPACTION — fold the streamed ingest delta into the
    * cid-partitioned cells table ([[graft.sources.Compaction]]'s
    * marker-scoped, crash-safe, partition-pruned fold): serving goes
    * back to a purely cid-pruned scan (no whole-delta side read on
    * every probe) and the per-trigger small files stop accumulating.
    * Affected cells are exactly the distinct cids of the folded
    * batches (ingest rows were encoded through the frozen centroids,
    * so they already carry their home cell); unaffected cells' files
    * are untouched. Centroids never change — compaction is a storage
    * fold, not a refit.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
              name: String): Unit =
    graft.sources.Compaction.foldIngest(spark, s"${name}_cells",
      s"${name}_cells_ingest", "cid", "vec_id")

  /** Reload a [[save]]d index: (model, cells). The cells DataFrame IS
    * the partitioned table scan — unioned with the exactly-once ingest
    * table's partitions when one exists — and serving re-assigns
    * nothing; a fresh session sees the tables through the shared
    * catalog. Heals any interrupted [[compact]] first, so no reader
    * ever serves the fold's duplicate window.
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           name: String): (Model, DataFrame) = {
    graft.sources.Compaction.healFold(spark, s"${name}_cells",
      s"${name}_cells_ingest", "cid", "vec_id")
    val rows = spark.table(s"${name}_centroids").collect()
    require(rows.nonEmpty, s"no centroids found in table ${name}_centroids")
    val k = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val cents = Array.fill(k, dim)(0.0)
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val base = spark.table(s"${name}_cells")
    val cells =
      if (spark.catalog.tableExists(s"${name}_cells_ingest"))
        base.unionByName(
          spark.table(s"${name}_cells_ingest").drop("ingest_batch"))
      else base
    (Model(cents), cells)
  }
}
