package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (Test / runMain graft.ProbeMain) — round counts and raw
  * output of in-progress operators at small SFs; not part of any gate.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]").appName("probe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val te = graft.model.GraphFixtures.coPurchaseTemporal(spark, dir)
      val tgt = te.agg(min(col("src")).cast("long")).collect()(0).getLong(0)
      val tr = scala.collection.mutable.ArrayBuffer.empty[Long]
      val td = graft.operators.Traversals.temporalDeparture(te, tgt, 4102444800L, 64, Some(tr))
      println(s"== $sf temporalDeparture tgt=$tgt reached=${td.count()} rounds=${tr.length} trace=${tr.mkString(",")}")
    }
    spark.stop()
  }
}
