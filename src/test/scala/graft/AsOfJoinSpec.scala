package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {

  test("as-of join picks the latest right row at or before each left ts") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 10L, 100L), // before any purchase → null
      (2L, 10L, 200L), // exactly at purchase ts 200 → matches (<=)
      (3L, 10L, 250L), // between 200 and 300 → 200's value
      (4L, 10L, 301L), // after 300 → 300's value
      (5L, 20L, 500L)) // user with no purchases → null
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, 200L, 2.0),
      (10L, 300L, 3.0))
      .toDF("user_id", "ts", "p_value")
    val got = AsOfJoin(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(3.0), 5L -> None))
  }

  test("payload name collisions and key/ts payloads are rejected") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("event_id", "user_id", "ts")
    val r = Seq((1L, 1L, 1.0)).toDF("user_id", "ts", "event_id2")
    intercept[IllegalArgumentException] {
      AsOfJoin(l, r, "user_id", "ts", Seq("ts"))
    }
    val rClash = Seq((1L, 1L, 1.0)).toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException] {
      AsOfJoin(l, rClash, "user_id", "ts", Seq("event_id"))
    }
  }
}
