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

  /** D — DIRECTED part graph (the directed-analytics fixture: SCC,
    * condensation, directed motifs). Two edge families:
    *
    *  1. Per-order cycles: each order's lineitems (sorted by
    *     l_linenumber, part id as tiebreak) form a directed cycle over
    *     their parts — line i's part → line i+1's part, last → first.
    *     Orders that share a part merge their cycles into one strongly
    *     connected component.
    *  2. Customer chains: each customer's filtered orders (by
    *     o_orderdate then o_orderkey) chain head-to-head — the first
    *     part of one order → the first part of the customer's next
    *     order. These are the inter-SCC DAG edges (they only form new
    *     cycles when chains collide on shared parts).
    *
    * Orders are filtered to o_orderkey % orderMod == 0 (pushed to the
    * scan); self-edges dropped, distinct pairs. At scale both families
    * are one window over the order key / customer key — a single
    * shuffle each, no self-join.
    */
  def directedParts(spark: SparkSession, dir: String,
                    orderMod: Long = 20L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % orderMod === 0)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_partkey").as("p"))
    val w = Window.partitionBy("ok").orderBy("ln", "p")
    val cyc = li.select(col("p").as("src"),
      coalesce(lead("p", 1).over(w), first("p").over(w)).as("dst"))
    val firsts = li.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).select(col("ok"), col("p").as("fp"))
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderkey") % orderMod === 0)
      .select(col("o_orderkey").as("ok"), col("o_custkey"), col("o_orderdate"))
    val wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "ok")
    val chain = firsts.join(ord, Seq("ok"))
      .select(col("fp").as("src"), lead("fp", 1).over(wc).as("dst"))
      .where(col("dst").isNotNull)
    cyc.unionByName(chain)
      .where(col("src") =!= col("dst"))
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
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
