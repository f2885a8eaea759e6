package graft

class ExtensionsSpec extends SparkTestBase {

  test("dot_product is callable from SQL and codegen agrees with Scala eval") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
    // over a real table: self dot product equals squared norm
    val emb = graft.model.Tables.embeddings(spark, sf)
    emb.createOrReplaceTempView("emb")
    val row = spark.sql(
      """SELECT vec_id,
         dot_product(cast(embedding AS array<double>), cast(embedding AS array<double>)) AS sq
         FROM emb ORDER BY vec_id LIMIT 1""").head
    assert(row.getDouble(1) > 0)
  }

  test("session built withExtensions resolves dot_product") {
    val s2 = spark.newSession()
    // newSession shares the registry state? ensure explicit registration path works
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT dot_product(array(1.0d), array(2.0d))").head.getDouble(0) == 2.0)
  }
}
