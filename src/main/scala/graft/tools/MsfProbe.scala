package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: Borůvka diagnostics on the uniform hash graph family. */
object MsfProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nVerts = args.lift(1).map(_.toLong).getOrElse(nEdges / 10)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nVerts)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(nVerts)).as("dst"))
    val gw = g.withColumn("weight",
      pmod(xxhash64(col("src"), col("dst")), lit(2147483648L)))
    val msf = graft.operators.SpanningForest.boruvka(gw).localCheckpoint(true)
    val cnt = msf.count()
    val dst = msf.select("u", "v").distinct().count()
    val ccTree = graft.operators.ConnectedComponents.iterative(
      msf.select(col("u").as("src"), col("v").as("dst")), maxIter = 500)
    val nCompTree = ccTree.select("component").distinct().count()
    val ccG = graft.operators.ConnectedComponents.iterative(g, maxIter = 500)
    val nCompG = ccG.select("component").distinct().count()
    val nVertsTree = ccTree.count()
    val nVertsG = ccG.count()
    println(s"[probe] msf=$cnt distinct=$dst treeComps=$nCompTree/" +
      s"$nVertsTree gComps=$nCompG/$nVertsG expectEdges=${nVertsG - nCompG}")
    // does the DEFAULT 50-round budget converge on the tree?
    val cc50 = graft.operators.ConnectedComponents.iterative(
      msf.select(col("u").as("src"), col("v").as("dst")), maxIter = 50)
    val nComp50 = cc50.select("component").distinct().count()
    println(s"[probe] treeComps at maxIter=50: $nComp50")
    spark.stop()
  }
}
