package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived graph fixtures over the test tables (SURVEY §2.9 / FIXTURES.md).
  *
  * The edge-stream data model follows the reference's
  * `Edge<K, EV>` = (source, target, value) plus event time
  * (GS/SimpleEdgeStream.java:~60 — the event-time ctor assigns ascending
  * timestamps). We represent an edge stream as a DataFrame with columns
  * `(src BIGINT, dst BIGINT, value DOUBLE, ts TIMESTAMP, …extras)`;
  * extra columns ride along unharmed through the graph operators, which
  * lets `mapEdges` compute new edge values from auxiliary attributes.
  */
object GraphFixtures {

  /** Part keys and supplier keys overlap (FIXTURES.md: every supplier id
    * also occurs as a part id), so supplier vertex ids are offset into a
    * disjoint range. This also makes E bipartite by construction.
    */
  val SupplierOffset = 1000000000L

  /** E — bipartite part→supplier edge stream from lineitem. */
  def edgeStream(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_partkey").as("src"),
      (col("l_suppkey") + SupplierOffset).as("dst"),
      col("l_quantity").as("value"),
      col("l_shipdate").as("ts"),
      col("l_discount").as("discount"))

  /** C — co-purchase graph: distinct canonical pairs (a<b) of parts that
    * appear in the same order. ≤13 parts/order bounds the per-order clique
    * expansion (FIXTURES.md), so the self-join is ~|orders|·avg_pairs.
    * The self-join key is l_orderkey: at scale this is a shuffle on the
    * order key (both sides identically partitioned — one shuffle each, a
    * co-partitioned sort-merge join; AQE handles skew).
    */
  def coPurchase(spark: SparkSession, dir: String): DataFrame =
    coPurchaseFrom(Tables.lineitem(spark, dir))

  /** C10 — C restricted to orders with o_orderkey % 10 == 0 (l_orderkey ==
    * o_orderkey, so the filter needs no join and is pushed to the scan).
    */
  def coPurchase10(spark: SparkSession, dir: String): DataFrame =
    coPurchaseFrom(Tables.lineitem(spark, dir).where(col("l_orderkey") % 10 === 0))

  private def coPurchaseFrom(li: DataFrame): DataFrame = {
    val pairs = li.select(col("l_orderkey").as("ok"), col("l_partkey"))
    val a = pairs.toDF("ok", "src")
    val b = pairs.toDF("ok", "dst")
    a.join(b, Seq("ok"))
      .where(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** CT — temporal co-purchase edge EVENTS: distinct (src<dst part
    * pair, t = epoch of the order's o_orderdate) for orders with
    * o_orderkey % orderMod == 0. The same pair purchased under several
    * orders yields several events — the temporal-motif operators count
    * edge events, not static edges.
    */
  def coPurchaseTemporal(spark: SparkSession, dir: String,
                         orderMod: Long = 2L): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % orderMod === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey").as("ok"),
      unix_timestamp(col("o_orderdate")).as("t"))
    li.toDF("ok", "src").join(li.toDF("ok", "dst"), Seq("ok"))
      .where(col("src") < col("dst"))
      .join(ord, Seq("ok"))
      .select("src", "dst", "t")
      .distinct()
  }

  /** CW — co-purchase edges tagged with the tumbling event-time window
    * (epoch-aligned, `sizeSec` seconds) of their order's o_orderdate.
    * Distinct per (win, src, dst): an edge exists in a window iff some
    * order in that window contains both parts.
    */
  def coPurchaseWindowed(spark: SparkSession, dir: String, sizeSec: Long,
                         orderMod: Long = 1L): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % orderMod === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val ord = Tables.orders(spark, dir).select(
      col("o_orderkey").as("ok"),
      (unix_timestamp(col("o_orderdate")).divide(sizeSec)).cast("long"))
      .toDF("ok", "win")
    val a = li.toDF("ok", "src")
    val b = li.toDF("ok", "dst")
    a.join(b, Seq("ok"))
      .where(col("src") < col("dst"))
      .join(ord, Seq("ok"))
      .select(col("win").multiply(sizeSec).cast("long").as("win"), col("src"), col("dst"))
      .distinct()
  }
}
