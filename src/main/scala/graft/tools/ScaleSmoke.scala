package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale smoke (results recorded in SCALE.md): drive the
  * dedup/similarity scale paths on a deterministic synthetic corpus well
  * past the bench scale factors — generated distributed (no driver-side
  * data), duplicates planted so recall is checkable.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[smoke] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // 30 tokens/doc from a 10k vocab, seeded per (id, pos); every 20th doc
    // gets a near-dup twin (first token perturbed) in the upper id range
    val tokenCols = (0 until 30).map(p =>
      concat(lit("w"), pmod(xxhash64(col("id"), lit(p)), lit(10000))))
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", tokenCols: _*).as("text"))
    val twins = spark.range(nDocs).where(col("id") % 20 === 0)
      .select((col("id") + nDocs).as("doc_id"),
        concat_ws(" ", lit("perturbed") +: tokenCols.tail: _*).as("text"))
    val docs = base.unionByName(twins).localCheckpoint(true)
    println(s"[smoke] corpus: ${docs.count()} docs")

    val pairs = t(s"minhashPairs (j>=0.5)")(
      graft.functions.Dedup.minhashPairs(docs, 2, 0.5).count())
    println(s"[smoke] near-dup pairs found: $pairs (planted ${nDocs / 20})")
    val clusters = t("nearDupClusters end-to-end")(
      graft.functions.Dedup.nearDupClusters(docs, 2, 0.5)
        .where(col("doc_id") =!= col("cluster")).count())
    println(s"[smoke] docs clustered to a smaller id: $clusters")
    t("simhashPairs (dist<=3)")(
      graft.functions.Dedup.simhashPairs(docs, 3).count())
    t("exact dedup counts")(
      graft.functions.Dedup.exactCountsByLang(
        docs.withColumn("lang", lit("en"))).count())
    t("fingerprints")(
      graft.functions.TextStats.fingerprints(docs)
        .write.format("noop").mode("overwrite").save())

    // traversal smoke: same deterministic 10M-edge / 1M-vertex graph as
    // the r1 core smoke (xxhash64 endpoints => connected, ~20 avg degree)
    val nEdges = 10000000L
    val nVerts = 1000000L
    val g = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nVerts)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(nVerts)).as("dst"),
      (pmod(xxhash64(col("id"), lit(3)), lit(50)) + 1).cast("double").as("value"))
      .localCheckpoint(true)
    println(s"[smoke] graph: ${g.count()} edges / ~$nVerts vertices")
    t("bfsDepths (10M edges)")(
      graft.operators.Traversals.bfsDepths(g, 0L).count())
    t("sssp Bellman-Ford (10M edges)")(
      graft.operators.Traversals.sssp(g, 0L).count())
    t("kcore k=25 (10M edges)")(
      graft.operators.Traversals.kcore(g, 25).count())
    t("pagerank fixed-point 5 rounds (10M)")(
      graft.operators.PageRank.fixedPoint(g, 5).count())
    spark.stop()
  }
}
