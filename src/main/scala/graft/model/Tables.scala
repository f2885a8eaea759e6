package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical typed edge — the reference's `Edge<K, EV>` plus event
  * time (GS/Edge.java, GS/SimpleEdgeStream.java:~60) at the v0 key/value
  * types (K=Long, EV=Double). Used by the lambda forms of
  * mapEdges/filterEdges; the Column forms operate on the full row and
  * keep extra attribute columns.
  */
case class Edge(src: Long, dst: Long, value: Double, ts: java.sql.Timestamp)

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md). All reads are plain vectorized parquet scans — column
  * pruning and predicate pushdown happen in callers via Catalyst.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark only reads
    * as LongType under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * our sessions). We keep the raw nanos as `ts_ns` (exact) and expose a
    * proper TimestampType `ts` truncated to micros via integer division —
    * no double round-trip, so no precision loss.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events")
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
