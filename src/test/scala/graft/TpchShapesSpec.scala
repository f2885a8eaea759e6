package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the reduced-schema TPC-H shapes q166–q170
  * (the oracle hash is the ground truth; these pin the SHAPE so a later
  * refactor can't silently weaken the interesting part of each plan).
  */
class TpchShapesSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q166: every surviving offer carries its part's minimum cost") {
    val rows = q("q166_tpch_q2")
      .groupBy("partkey")
      .agg(countDistinct("cost_cents").as("n"))
      .where(col("n") =!= 1)
    assert(rows.isEmpty, "a part surfaced offers above its min cost")
  }

  test("q166: plan broadcasts the dims (no shuffle join on part/supplier/nation)") {
    val plan = q("q166_tpch_q2").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q167: distribution accounts for every customer, including zero-order ones") {
    val dist = q("q167_tpch_q13")
    val total = dist.agg(sum("custdist")).head().getLong(0)
    val nCust = model.Tables.customer(spark, sf).count()
    assert(total === nCust)
  }

  test("q168: a flagged supplier is the ONLY returner on each counted order") {
    import spark.implicits._
    // replay the definition row-by-row on the small SF and compare counts
    val li = model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
    val byOrder = li.groupBy(_.getLong(0))
    val expected = byOrder.valuesIterator.flatMap { rows =>
      val supps = rows.map(_.getLong(1)).toSet
      val returners = rows.filter(_.getString(2) == "R").map(_.getLong(1)).toSet
      if (supps.size > 1 && returners.size == 1) returners.headOption else None
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q168_tpch_q21")
      .join(model.Tables.supplier(spark, sf), Seq("s_name"))
      .select("s_suppkey", "numwait").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("q169: the threshold is exact at the cent boundary") {
    import spark.implicits._
    // planted fixture: positive balances avg exactly 100.00 — a customer
    // AT the average must be excluded (strict >), one cent above included
    val cust = Seq(
      (1L, 0L, 100.00), (2L, 0L, 100.00), (3L, 0L, 100.01),
      (4L, 0L, 99.99), (5L, 1L, -3.50)
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("long"))
    val thr = cust.where(col("c_acctbal") > 0)
      .agg(sum("bal_cents").as("s_pos"), count("*").as("n_pos"))
    val kept = cust.crossJoin(broadcast(thr))
      .where(col("bal_cents") * col("n_pos") > col("s_pos"))
      .select("c_custkey").as[Long].collect().toSet
    assert(kept === Set(3L), s"expected only the one-cent-above customer, got $kept")
  }

  test("q171: only the two pair directions appear, inside the ship window") {
    import spark.implicits._
    val pairs = q("q171_tpch_q7")
      .select("supp_nation", "cust_nation").distinct()
      .as[(String, String)].collect().toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_8"), ("NATION_8", "NATION_3"))))
    assert(pairs.nonEmpty, "pair filter returned nothing — pick nations with suppliers")
    val years = q("q171_tpch_q7").select("l_year").distinct()
      .as[Long].collect().toSet
    assert(years.subsetOf(Set(1996L, 1997L)))
  }

  test("q172: the ppm share is the exact integer quotient of the cent sums") {
    import spark.implicits._
    val rows = q("q172_tpch_q8")
      .select("nation_cents", "total_cents", "share_ppm")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, t, ppm) =>
      assert(n <= t && ppm === n * 1000000L / t)
    }
  }

  test("q173: group profits sum to the independently-computed total") {
    val total = q("q173_tpch_q9").agg(sum("sum_profit_cents")).head().getLong(0)
    val p = model.Tables.part(spark, sf)
      .where(col("p_name").contains("widget"))
      .withColumn("cost_cents", round(col("p_retailprice") * 100).cast("long"))
      .select("p_partkey", "cost_cents")
    val expected = model.Tables.lineitem(spark, sf)
      .join(p, col("l_partkey") === col("p_partkey"))
      .agg(sum(
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") -
          col("cost_cents") * col("l_quantity").cast("long")).as("t"))
      .head().getLong(0)
    assert(total === expected)
  }

  test("q174: kept set is exactly the above-average parts") {
    import spark.implicits._
    val regSupp = model.Tables.supplier(spark, sf)
      .join(model.Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(model.Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "AFRICA").select("s_suppkey")
    val value = model.Tables.lineitem(spark, sf)
      .join(regSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
      .as[(Long, Long)].collect()
    val total = value.map(_._2).sum
    val n = value.length.toLong
    val expected = value.filter { case (_, v) => v * n > total }.map(_._1).toSet
    val got = q("q174_tpch_q11").select("partkey").as[Long].collect().toSet
    assert(got === expected && got.nonEmpty)
  }

  test("q175: high + low counts account for every joined lineitem") {
    val dist = q("q175_tpch_q12")
      .agg(sum(col("high_line_count") + col("low_line_count"))).head().getLong(0)
    val expected = model.Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(model.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(dist === expected)
  }

  test("q176: every reported supplier carries the one global max revenue") {
    import spark.implicits._
    val revs = q("q176_tpch_q15").select("total_revenue_cents").as[Long].collect()
    assert(revs.nonEmpty && revs.toSet.size === 1)
  }

  test("q177: matches a row-by-row replay of the 0.2·avg rule") {
    val p = model.Tables.part(spark, sf)
      .where(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select("p_partkey")
    val li = model.Tables.lineitem(spark, sf)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect()
    val byPart = li.groupBy(_.getLong(0))
    val expected = byPart.valuesIterator.flatMap { rows =>
      val sumQty = rows.map(_.getLong(1)).sum
      val cnt = rows.length.toLong
      rows.filter(r => r.getLong(1) * 5 * cnt < sumQty).map(_.getLong(2))
    }.sum
    val got = q("q177_tpch_q17").head()
    assert(got.getLong(got.fieldIndex("total_cents")) === expected)
    assert(got.getDouble(got.fieldIndex("avg_yearly")) === expected / 700.0)
  }

  test("q178: each reported supplier is the unique top shipper of some part") {
    import spark.implicits._
    val li = model.Tables.lineitem(spark, sf)
      .join(model.Tables.part(spark, sf).where(col("p_name").startsWith("large"))
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
    val perSupp = li.groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.map(_.getDouble(2).toLong).sum).toMap
    val expected = perSupp.groupBy(_._1._1).valuesIterator.flatMap { m =>
      val mx = m.values.max
      val top = m.collect { case ((_, sk), q) if q == mx => sk }
      if (top.size == 1) top.headOption else None
    }.toSet
    val got = q("q178_tpch_q20").select("suppkey").as[Long].collect().toSet
    assert(got === expected && got.nonEmpty)
  }

  test("q170: negative-acctbal suppliers never reach a supplier_cnt") {
    // re-run the query with the exclusion REMOVED and check counts only
    // ever grow — the anti join can't add suppliers
    val withEx = q("q170_tpch_q16").withColumnRenamed("supplier_cnt", "c_ex")
    val without = model.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(model.Tables.part(spark, sf)
          .where(col("p_brand") =!= "Brand#15" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("c_all"))
    val badJoin = withEx.join(without, Seq("p_brand", "p_type", "p_size"))
      .where(col("c_ex") > col("c_all"))
    assert(badJoin.isEmpty)
  }
}
