package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for driver queries (args =
  * query names, default the historically audited pair) plus the
  * snapshot-pushdown evidence (a fixture, not a driver query).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q51_asof_join", "q25_ngram_jaccard")
    for (q <- qs) {
      if (q == "snapshot") {
        println("=== PLAN snapshot (ts range pushdown) ===")
        graft.GraphStream(graft.model.GraphFixtures.edgeStream(spark, dir))
          .snapshot("30 days", atEpochSec = 867715200L)
          .getDegrees.explain("formatted")
      } else {
        println(s"=== PLAN $q ===")
        graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
