package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-build cost of the shared graph fixtures at a given SF
  * (the cross-query-memo sizing question: what does every consumer pay
  * to rebuild C10 from parquet?).
  */
object FixtureProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $l%-32s n=$n%10d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    t("warm lineitem count")(spark.read.parquet(dir + "/lineitem.parquet").count())
    for (i <- 1 to 3)
      t(s"coPurchase10 build $i")(graft.model.GraphFixtures.coPurchase10(spark, dir).count())
    t("coPurchase (full) build")(graft.model.GraphFixtures.coPurchase(spark, dir).count())
    t("edgeStream build")(graft.model.GraphFixtures.edgeStream(spark, dir).count())
    spark.stop()
  }
}
