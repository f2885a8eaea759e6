package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach payload columns of the LATEST
  * right row with the same key and `right.ts <= left.ts`. The staple
  * event-time join of feature/training pipelines ("state as of the
  * event"), which Spark has no built-in operator for.
  *
  * Physical shape: union both sides and run ONE windowed
  * `last(_, ignoreNulls)` per key ordered by (ts, side) — right rows
  * sort before left rows at equal ts, so ties match ASOF `<=`
  * semantics. Cost is a single shuffle on the key plus a per-key sort:
  * no range-join explosion, no per-row probe; skewed keys behave like
  * any window function (AQE handles the shuffle; a pathological single
  * key is bounded by its own event history, same as sessionization).
  *
  * Right rows must be unique per (key, ts) — dedupe upstream, or the
  * match among equal timestamps is tie-ambiguous (DuckDB's ASOF JOIN
  * has the same contract).
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
            payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(key) && !payload.contains(ts),
      "payload must not include the key/ts columns")
    require(leftCols.intersect(payload).isEmpty,
      s"payload ${payload.mkString(",")} collides with left columns — alias first")
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    filled.where(col("__side") === 1).drop("__side")
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
