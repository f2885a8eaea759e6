package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: iterative-CC convergence on a worst-case-diameter path. */
object PathProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val maxIter = args.lift(1).map(_.toInt).getOrElse(200)
    // permuted mode: same path topology, ids scattered by a bijection
    // (odd multiplier coprime to n) — breaks the sequential-id best case
    val permuted = args.lift(2).contains("permuted")
    def perm(c: org.apache.spark.sql.Column) =
      if (permuted) (c * 1000003L) % n else c
    val e = spark.range(n - 1).select(
      perm(col("id")).as("src"), perm(col("id") + 1).as("dst"))
    val t0 = System.nanoTime()
    val cc = graft.operators.ConnectedComponents.iterative(e, maxIter = maxIter)
    val bad = cc.where(col("component") =!= 0).count()
    println(f"[probe] n=$n maxIter=$maxIter wrong-label=$bad wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
