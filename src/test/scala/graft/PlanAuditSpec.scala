package graft

import org.apache.spark.sql.functions._

/** Plan-shape regressions are silent — the result stays right while
  * the 100 TB story quietly breaks. These specs pin the load-bearing
  * physical-plan properties of the r9 operators the way PLANS.md
  * documents them.
  */
class PlanAuditSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range join never plans a nested loop") {
    val p = plan(SparkEntry.queries("q200_range_join")(spark, sf))
    assert(!p.contains("NestedLoop"), s"nested loop leaked into:\n$p")
  }

  test("bm25 reads the corpus once — no file scan survives the postings checkpoint") {
    val df = SparkEntry.queries("q198_bm25_topk")(spark, sf)
    val p = plan(df)
    // the tf checkpoint is the only corpus read; downstream branches
    // must consume it (ExistingRDD), never re-scan the parquet
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
      s"a corpus re-scan appeared below the postings checkpoint:\n$p")
    assert(p.contains("ExistingRDD"), s"expected checkpointed postings reads:\n$p")
  }

  test("bloom decontamination probes via broadcast joins only before the verify") {
    val docs = graft.model.Tables.documents(spark, sf)
    val df = graft.functions.Corpus.bloomDecontaminate(
      docs.where(col("doc_id") % 10 =!= 7), docs.where(col("doc_id") % 10 === 7))
    assert(!plan(df).contains("NestedLoop"))
  }
}
