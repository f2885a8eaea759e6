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

  test("bit_and_count, unit_vector and ints_to_bitset are callable from SQL") {
    GraftExtensions.register(spark)
    // {0,1,64} ∩ {1,64,65} = {1,64}
    assert(spark.sql(
      """SELECT bit_and_count(ints_to_bitset(array(0, 1, 64), 2),
                              ints_to_bitset(array(1, 64, 65), 2)) AS c""")
      .head.getInt(0) == 2)
    val u = spark.sql("SELECT unit_vector(array(3.0d, 4.0d)) AS u")
      .head.getSeq[Double](0)
    assert(u == Seq(0.6, 0.8))
    // zero vector passes through unchanged, no NaNs
    assert(spark.sql("SELECT unit_vector(array(0.0d, 0.0d)) AS u")
      .head.getSeq[Double](0) == Seq(0.0, 0.0))
    // non-literal nWords is rejected, not silently miscompiled
    val e = intercept[Exception] {
      spark.sql("SELECT ints_to_bitset(array(1), cast(rand() * 2 AS int))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("winnow_select is callable from SQL and agrees with the Scala-side expression") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    df.createOrReplaceTempView("wtmp")
    val got = spark.sql("SELECT winnow_select(t, 5, 4) AS s FROM wtmp")
      .head.getSeq[Long](0)
    val direct = df.select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.WinnowSelect(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("t")), 5, 4)).as("s"))
      .head.getSeq[Long](0)
    assert(got == direct && got.nonEmpty)
    // non-literal window is rejected loudly
    val e = intercept[Exception] {
      spark.sql("SELECT winnow_select(t, 5, cast(rand() * 4 AS int)) FROM wtmp").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(77)
    val rows = (1 to 200).map { i =>
      def set() = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong).distinct.sorted
      (i.toLong, set(), set())
    }
    val df = rows.toDF("i", "a", "b")
    val out = df.select(col("i"),
        graft.expressions.VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .where(col("m") =!= col("ref"))
    assert(out.isEmpty, s"mismatches: ${out.count()}")
    // SQL surface + empty-set edge
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L,3L,5L), array(3L,4L,5L))").head.getLong(0) == 2L)
    // an untyped empty literal is ARRAY<VOID>: the r4 ExpectsInputTypes
    // hardening rejects it at analysis (the silent-miscount guard), so
    // the empty-set edge now requires an explicit element type
    assert(spark.sql(
      "SELECT sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L))")
      .head.getLong(0) == 0L)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(array(1), array(2))").collect()
    }
  }

  test("session built withExtensions resolves dot_product") {
    val s2 = spark.newSession()
    // newSession shares the registry state? ensure explicit registration path works
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT dot_product(array(1.0d), array(2.0d))").head.getDouble(0) == 2.0)
  }
}
