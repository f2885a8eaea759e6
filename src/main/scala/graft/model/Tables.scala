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

  /** `events.ts` has shipped as two different physical types across
    * driver testdata generations: INT64 TIMESTAMP(NANOS) (readable only
    * as LongType under `spark.sql.legacy.parquet.nanosAsLong=true`, set
    * in our sessions) and TIMESTAMP(MICROS) with isAdjustedToUTC=false
    * (read as TIMESTAMP_NTZ). Normalize both to the same surface: a
    * session-zone-free TimestampType `ts` (sessions pin UTC) plus the
    * exact integer nanos as `ts_ns` — integer arithmetic only, no double
    * round-trip, so no precision loss either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long generation
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // TIMESTAMP(_NTZ) micros generation
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
}
