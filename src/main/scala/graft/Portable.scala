package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE engine-portable priority hash, defined once. Every operator that
  * needs a deterministic pseudo-random total order (MIS selection,
  * stratified sampling, hash walks) uses this Knuth multiplicative hash
  * with the id reduced mod 2³¹ BEFORE any multiply, so no intermediate
  * exceeds 2⁶³ on any Long input — Spark (non-ANSI) would wrap silently
  * while ANSI engines raise, which is exactly the cross-engine
  * divergence the reduction prevents. The DuckDB oracles replay the same
  * arithmetic as SQL strings; if this formula ever changes, every
  * `2654435761` literal in SparkEntry's oracle SQL changes with it.
  */
object Portable {
  private val Two31 = lit(2147483648L)
  private val Knuth = lit(2654435761L)

  /** `((c mod 2³¹)·2654435761) mod 2³¹` — the MIS / stratified-sample
    * priority. Break ties with the raw id (struct (p, id) order).
    */
  def prio31(c: Column): Column = pmod(pmod(c, Two31) * Knuth, Two31)

  /** Step-salted variant for per-round orders (hash walks):
    * `((((c mod 2³¹)·31 + step) mod 2³¹)·2654435761) mod 2³¹`.
    */
  def prio31(c: Column, step: Int): Column =
    pmod(pmod(pmod(c, Two31) * 31 + lit(step), Two31) * Knuth, Two31)
}
