package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Edge-stream sources and sinks (reference: text-file edge lists,
  * socket streams and collections in the GS example mains, each at
  * `:~30`; print and CSV sinks — SURVEY O27/O28). Our equivalents are the standard
  * Spark connectors, emitting the canonical edge schema
  * `(src BIGINT, dst BIGINT, value DOUBLE, ts TIMESTAMP)`.
  */
object Sources {

  val edgeSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  /** Parquet edge source — vectorized scan, pushdown-capable. */
  def parquetEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV/TSV edge lists, the reference's `readTextFile` + split shape:
    * `src<sep>dst[<sep>value[<sep>epochSeconds]]`.
    */
  def csvEdges(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read
      .option("sep", sep)
      .schema(StructType(Seq(
        StructField("src", LongType), StructField("dst", LongType),
        StructField("value", DoubleType), StructField("epoch", LongType))))
      .csv(path)
      .withColumn("value", coalesce(col("value"), lit(1.0)))
      .withColumn("ts", timestamp_seconds(coalesce(col("epoch"), lit(0L))))
      .drop("epoch")

  /** Streaming file source over a directory of edge CSVs (append-only
    * directory = unbounded edge stream).
    */
  def csvEdgeStream(spark: SparkSession, dir: String, sep: String = ","): DataFrame =
    spark.readStream
      .option("sep", sep)
      .schema(StructType(Seq(
        StructField("src", LongType), StructField("dst", LongType),
        StructField("value", DoubleType), StructField("epoch", LongType))))
      .csv(dir)
      .withColumn("value", coalesce(col("value"), lit(1.0)))
      .withColumn("ts", timestamp_seconds(coalesce(col("epoch"), lit(0L))))
      .drop("epoch")

  /** Synthetic unbounded edge stream from the rate source (examples /
    * load tests): deterministic edge per tick over `nVertices`.
    */
  def rateEdgeStream(spark: SparkSession, rowsPerSecond: Int, nVertices: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        pmod(xxhash64(col("value")), lit(nVertices)).cast("long").as("src"),
        pmod(xxhash64(col("value") + 1), lit(nVertices)).cast("long").as("dst"),
        lit(1.0).as("value"),
        col("timestamp").as("ts"))

  /** Log-bus (Kafka-shaped) ingest — deployment note. This container is
    * offline (no kafka-clients jar, no broker), so the connector cannot
    * be exercised here; the mapping is one reader swap because every
    * operator consumes the canonical edge schema, not the source:
    *
    * {{{
    * spark.readStream.format("kafka")
    *   .option("kafka.bootstrap.servers", brokers)
    *   .option("subscribe", topic)
    *   .option("startingOffsets", "earliest")
    *   .load()                                  // key, value, timestamp…
    *   .select(from_csv(col("value").cast("string"),
    *       Sources.edgeSchema.toDDL, Map.empty[String, String]).as("e"),
    *     col("timestamp"))
    *   .select(col("e.src"), col("e.dst"),
    *     coalesce(col("e.value"), lit(1.0)).as("value"),
    *     coalesce(col("e.ts"), col("timestamp")).as("ts"))
    * }}}
    *
    * Partitioning: one Spark input partition per topic partition;
    * watermark on `ts` exactly as with the file/socket sources. Nothing
    * downstream changes — [[csvEdgeStream]] is the offline stand-in with
    * identical semantics (append-only unbounded source).
    */

  /** Socket text source (`host:port`, lines `src,dst[,value]`) — the
    * reference's socket example.
    */
  def socketEdgeStream(spark: SparkSession, host: String, port: Int): DataFrame = {
    val raw = spark.readStream.format("socket")
      .option("host", host).option("port", port).load()
    val parts = split(col("value"), ",")
    raw.select(
      parts.getItem(0).cast("long").as("src"),
      parts.getItem(1).cast("long").as("dst"),
      coalesce(parts.getItem(2).cast("double"), lit(1.0)).as("value"),
      current_timestamp().as("ts"))
  }

  /** String-keyed edge ingest — the reference's generic vertex key `K`
    * (GS/SimpleEdgeStream.java:~60) for the common case a real user hits
    * first: ids that aren't integers. Dictionary-encodes every distinct
    * endpoint key to a unique Long (so all Long-keyed operators run
    * unchanged) and returns the dictionary to decode results back.
    *
    * Ids come from `monotonically_increasing_id` over the DISTINCT key
    * set: unique by construction, assigned partition-locally (no global
    * row_number sort funneling the dictionary through one task). The
    * dictionary is eagerly materialized so ids are frozen — on a real
    * cluster swap `localCheckpoint` for `checkpoint` (same one-line note
    * as the iterative operators). Ids are NOT stable across sessions;
    * results are decoded back to keys, which are.
    */
  def dictionaryEncode(edges: DataFrame): (DataFrame, DataFrame) = {
    val dict = edges.select(col("src").cast("string").as("key"))
      .unionByName(edges.select(col("dst").cast("string").as("key")))
      .distinct()
      .withColumn("id", monotonically_increasing_id())
      .localCheckpoint(true)
    val others = edges.columns.filterNot(Set("src", "dst")).map(col)
    val enc = edges
      .join(dict.select(col("key").as("__sk"), col("id").as("__sid")),
        col("src").cast("string") === col("__sk"))
      .join(dict.select(col("key").as("__dk"), col("id").as("__did")),
        col("dst").cast("string") === col("__dk"))
      .select((Seq(col("__sid").as("src"), col("__did").as("dst")) ++ others): _*)
    (enc, dict)
  }

  /** Composite-keyed edge ingest — the reference's generic vertex key
    * `K` (GS/SimpleEdgeStream.java:~60) for multi-column keys: an
    * endpoint identified by SEVERAL columns (e.g. (orderkey, linenumber)
    * line ids vs (partkey, suppkey) part-supplier pairs). Each
    * endpoint's columns are normalized positionally to a
    * `struct<k0 string, k1 string, …>` key, the distinct key set is
    * dictionary-encoded to dense Longs exactly like [[dictionaryEncode]]
    * (partition-local id assignment — no global sort), and every
    * Long-keyed operator runs unchanged. Decode with [[decodeKeys]]
    * (the returned dictionary's `key` column is the struct).
    *
    * `srcCols`/`dstCols` must have equal arity — with the default
    * `domains = None` both endpoints share ONE key space, as the
    * reference's single `K` requires: (orderkey=1, linenumber=1) and
    * (partkey=1, suppkey=1) would merge into one vertex. When the two
    * endpoint sets are DIFFERENT entity spaces, pass distinct domain
    * tags — the tag becomes a leading `dom` field of the key struct, so
    * identically-stringified tuples from the two spaces can never
    * collide (ADVICE r3).
    */
  def dictionaryEncodeComposite(edges: DataFrame, srcCols: Seq[String],
                                dstCols: Seq[String],
                                domains: Option[(String, String)] = None): (DataFrame, DataFrame) = {
    require(srcCols.nonEmpty && srcCols.length == dstCols.length,
      s"composite key arity mismatch: $srcCols vs $dstCols")
    def key(cols: Seq[String], dom: String) = {
      val parts = cols.zipWithIndex.map { case (c, i) => col(c).cast("string").as(s"k$i") }
      struct((if (domains.isDefined) Seq(lit(dom).as("dom")) else Nil) ++ parts: _*)
    }
    val (sDom, dDom) = domains.getOrElse(("", ""))
    val dict = edges.select(key(srcCols, sDom).as("key"))
      .unionByName(edges.select(key(dstCols, dDom).as("key")))
      .distinct()
      .withColumn("id", monotonically_increasing_id())
      .localCheckpoint(true)
    val others = edges.columns.filterNot((srcCols ++ dstCols).toSet).map(col)
    val enc = edges
      .join(dict.select(col("key").as("__sk"), col("id").as("__sid")),
        key(srcCols, sDom) === col("__sk"))
      .join(dict.select(col("key").as("__dk"), col("id").as("__did")),
        key(dstCols, dDom) === col("__dk"))
      .select((Seq(col("__sid").as("src"), col("__did").as("dst")) ++ others): _*)
    (enc, dict)
  }

  /** Decode an encoded id column back to its original string key (joined
    * against the dictionary from [[dictionaryEncode]]; AQE broadcasts the
    * dictionary when it fits). The id column is replaced by `keyCol`.
    */
  def decodeKeys(df: DataFrame, dict: DataFrame,
                 idCol: String, keyCol: String = "key"): DataFrame =
    df.join(dict.select(col("id").as(idCol), col("key").as(keyCol)), Seq(idCol))
      .drop(idCol)

  /** Batch sinks. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Hive-style partitioned layout + in-file ordering — the 100 TB
    * data-layout tool: an equality filter on a partition column prunes
    * whole directories before any IO (PartitionFilters in the scan),
    * and sorting within partitions by `orderCols` tightens parquet
    * min/max row-group stats so range filters skip pages too.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       orderCols: Seq[String] = Nil): Unit = {
    // range-partition on (partition, order) keys: rows of one hive
    // partition cluster together for tight per-file min/max stats, but a
    // LARGE partition value still splits across many tasks — hashing on
    // the partition column alone would funnel e.g. all of lang=en
    // through one task at corpus scale
    val laid = df.repartitionByRange((partitionCol +: orderCols).map(col): _*)
      .sortWithinPartitions((partitionCol +: orderCols).map(col): _*)
    laid.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
  }
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Bucketed catalog table — the co-located-join layout for the 100 TB
    * regime: two facts bucketed (and optionally sorted) on their join
    * key with the SAME bucket count join with NO Exchange on either side
    * — the shuffle happened once at write time and is amortized over
    * every subsequent join/aggregation on that key (the classic
    * fact-to-fact pattern: lineitem⋈orders on orderkey, events sessions
    * by user, edges by src). `sortBy` additionally pre-sorts each bucket
    * file so the sort-merge join's per-task Sort disappears too.
    * Bucketing requires the session catalog (`saveAsTable`) — plain
    * `.parquet(path)` writes lose the bucket metadata. The no-Exchange
    * contract is spec-certified (SourcesSpec).
    */
  /** Drop a managed table AND any stale warehouse directory a previous
    * JVM left behind (its in-memory catalog died with it, but the
    * location survives and makes saveAsTable throw
    * LOCATION_ALREADY_EXISTS even in overwrite mode). Idempotent.
    */
  def dropManagedTable(spark: org.apache.spark.sql.SparkSession,
                       table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive; got $nBuckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** Z-order (Morton-curve) layout writer — multi-dimensional file
    * skipping for the 100 TB regime. [[writePartitioned]]'s range layout
    * clusters ONE sort prefix: a filter on the second column alone
    * touches every file. Z-ordering interleaves the bits of each
    * column's bucket index, so files cover hypercubes of the value
    * space and parquet min/max row-group stats prune on ANY filtered
    * subset of the z-columns (the layout Delta/Iceberg OPTIMIZE ZORDER
    * applies; effectiveness per dimension degrades ~geometrically with
    * the number of z-columns — 2–4 is the useful range).
    *
    * Buckets are UNIFORM over each column's (min, max) — one tiny
    * driver agg, no global sort, fully shuffle-parallel
    * (`repartitionByRange` on the z-value + in-partition sort). Skewed
    * columns get skewed buckets; pre-transform (log, rank) upstream if
    * that matters. Numeric columns only.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 8, nFiles: Int = 32): Unit = {
    require(zCols.size >= 2, s"z-ordering needs >= 2 columns, got $zCols")
    require(zCols.size * bits <= 62, s"${zCols.size} cols x $bits bits exceeds a Long")
    // enforce the numeric-only precondition up front — a string column
    // would otherwise surface as a confusing cast error mid-write
    zCols.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"z-column '$c' not in schema ${df.schema.fieldNames.mkString("[", ", ", "]")}"))
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-column '$c' must be numeric, got ${f.dataType.simpleString}")
    }
    val mmExprs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(mmExprs.head, mmExprs.tail: _*).head()
    // empty input or an all-null z-column yields null min/max — fail
    // loud rather than NPE inside getDouble
    zCols.zipWithIndex.foreach { case (c, ci) =>
      require(!stats.isNullAt(2 * ci) && !stats.isNullAt(2 * ci + 1),
        s"writeZOrdered: min/max of z-column '$c' is null " +
          "(empty input or all-null column) — nothing to layout")
    }
    val nBuckets = 1 << bits
    val z = zCols.zipWithIndex.map { case (c, ci) =>
      val lo = stats.getDouble(2 * ci)
      val hi = stats.getDouble(2 * ci + 1)
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      val bucket = least(greatest(
        floor((col(c).cast("double") - lit(lo)) / lit(span) * nBuckets).cast("long"),
        lit(0L)), lit((nBuckets - 1).toLong))
      // spread bucket's bits to positions ci, ci + nCols, ci + 2*nCols…
      (0 until bits).map { b =>
        shiftleft(shiftright(bucket, b).bitwiseAND(lit(1L)), b * zCols.size + ci)
      }.reduce(_ + _)
    }.reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Streaming sink through foreachBatch — each micro-batch lands as a
    * batch DataFrame for arbitrary handling (upserts, multi-sink fanout).
    */
  def foreachBatchSink(df: DataFrame)(handler: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch(handler)

  /** EXACTLY-ONCE path sink for foreachBatch: each micro-batch
    * OVERWRITES its own `batch=<id>` directory instead of appending to
    * a shared one — a retried batch (Structured Streaming re-delivers
    * the same batchId after failure, the at-least-once caveat
    * documented on the PQ stream-ingest path) replaces its previous
    * partial/complete write rather than duplicating it, so the read
    * view `spark.read.parquet(dir)` is idempotent under any retry
    * pattern. This is the standard transactional-sink recipe when the
    * store is a filesystem path (a table with MERGE keys is the other
    * one); the batchId IS the transaction id, courtesy of the
    * checkpoint's offset log.
    */
  def idempotentBatchWriter(dir: String): (DataFrame, Long) => Unit =
    (df: DataFrame, batchId: Long) =>
      df.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
}
