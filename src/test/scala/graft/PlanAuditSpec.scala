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

  test("bloom decontamination verify branch re-reads train text ONLY below the candidate semi-join") {
    // the probe pass (tokenize + shingle of the FULL train side) runs
    // once, eagerly, inside the candidate checkpoint; the RETURNED plan
    // may scan the train text a second time only candidate-filtered —
    // exactly one text-reading scan, sitting under a LeftSemi against
    // the checkpointed candidates (VERDICT r10 "what's wrong" #1).
    // Read from a private parquet copy: another suite may have CACHED
    // the shared documents table, and an InMemoryTableScan carries no
    // ReadSchema line to count
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_plan").toString
    graft.model.Tables.documents(spark, sf).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val df = graft.functions.Corpus.bloomDecontaminate(
      docs.where(col("doc_id") % 10 =!= 7), docs.where(col("doc_id") % 10 === 7))
    val p = plan(df)
    val textScans = "ReadSchema:[^\\n]*text".r.findAllIn(p).size
    assert(textScans == 1,
      s"expected exactly 1 text-reading scan in the served plan, got $textScans:\n${p.take(1200)}")
    assert(p.contains("LeftSemi"), s"candidate semi-join missing:\n${p.take(1200)}")
  }

  test("gap-fill grid is contiguous, conserves counts; rolling head windows divide by true length") {
    val filled = SparkEntry.queries("q207_gapfill")(spark, sf)
    // per user: the win set is a dense hourly grid over [min, max]
    val bad = filled.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min("win").as("w0"), max("win").as("w1"),
        sum("cnt").as("total"))
      .where(col("n") =!= (col("w1") - col("w0")) / 3600 + 1)
      .count()
    assert(bad == 0, s"$bad users have holes in the filled grid")
    // zero rows must actually exist (else the fill is vacuous here)
    assert(filled.where(col("cnt") === 0).count() > 0)
    // count conservation: filling adds zeros, never moves events
    val evTotal = graft.model.Tables.events(spark, sf).count()
    val filledTotal = filled.agg(sum("cnt")).head().getLong(0)
    assert(filledTotal == evTotal, s"$filledTotal != $evTotal")
    // each user's FIRST rolling row averages over exactly 1 element
    val roll = SparkEntry.queries("q208_rolling_counts")(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("win")
    val firstBad = roll
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("ma_micro") =!= col("cnt") * 1000000L).count()
    assert(firstBad == 0, s"$firstBad head windows divided by a padded length")
  }

  test("dedup-index probe re-reads corpus text ONLY below the candidate semi-join") {
    // the bloomDecontaminate confinement rule applied to the persisted
    // LSH index: the served plan's only text-reading scan is the
    // candidate-confined corpus verify (query shingles and candidates
    // are checkpointed); a corpus-wide re-shingle would show up as a
    // second scan. Private parquet copy for the same cached-table
    // reason as the bloom test.
    val dir = java.nio.file.Files.createTempDirectory("graft_didx_plan").toString
    graft.model.Tables.documents(spark, sf).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    graft.functions.DedupIndex.save(
      docs.where(col("doc_id") % 10 =!= 7), "graft_didx_plan")
    val df = graft.functions.DedupIndex.probe(spark, "graft_didx_plan",
      docs.where(col("doc_id") % 10 === 7),
      docs.where(col("doc_id") % 10 =!= 7), 0.5)
    val p = plan(df)
    val textScans = "ReadSchema:[^\\n]*text".r.findAllIn(p).size
    assert(textScans == 1,
      s"expected exactly 1 text-reading scan in the served plan, got $textScans:\n${p.take(1200)}")
    assert(p.contains("LeftSemi"), s"candidate semi-join missing:\n${p.take(1200)}")
  }
}
