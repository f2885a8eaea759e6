package graft

import org.apache.spark.sql.functions._

import graft.functions.TopK

class TopKSpec extends SparkTestBase {

  test("TopKAgg: insert/merge keep (key desc, id asc) order with a hard k bound") {
    val agg = new TopK.TopKAgg(3)
    val buf = Seq((5L, 10L), (7L, 2L), (5L, 3L), (9L, 9L), (7L, 1L))
      .foldLeft(agg.zero)(agg.reduce)
    // top-3 of {(9,9),(7,1),(7,2),(5,3),(5,10)}
    assert(buf.keys.toSeq === Seq(9L, 7L, 7L))
    assert(buf.ids.toSeq === Seq(9L, 1L, 2L))
    // merge two disjoint partials — same bound, same order
    val other = Seq((9L, 1L), (6L, 4L)).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(buf, other)
    assert(m.keys.toSeq === Seq(9L, 9L, 7L))
    assert(m.ids.toSeq === Seq(1L, 9L, 1L))
    // merging with zero is identity; worse-than-last inserts are no-ops
    assert(agg.merge(buf, agg.zero).keys.toSeq === buf.keys.toSeq)
    assert(agg.reduce(buf, (1L, 99L)).keys.toSeq === buf.keys.toSeq)
  }

  test("perGroup equals the window row_number form on real data, any partitioning") {
    val docs = model.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_tokens").desc, col("doc_id").asc)
    val viaWindow = docs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 3).select("lang", "rnk", "doc_id", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // skewed repartitioning exercises the cross-partition merge path
    for (parts <- Seq(1, 7)) {
      val got = TopK.perGroup(docs.repartition(parts), "lang", "n_tokens", "doc_id", 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === viaWindow, s"parts=$parts")
    }
    // the plan aggregates (map-side combine), it does not window-sort
    // the whole table
    val plan = TopK.perGroup(docs, "lang", "n_tokens", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), plan.take(400))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      "bounded top-k must not fall back to a window")
  }
}
