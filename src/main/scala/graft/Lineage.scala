package graft

import org.apache.spark.sql.DataFrame

/** The per-round lineage cut for iterative operators. */
object Lineage {

  /** Eagerly `localCheckpoint` AND strip the checkpoint's inherited
    * origin statistics ([[org.apache.spark.sql.graftbridge.PlanBridge
    * .withoutOriginStats]]).
    *
    * Plain `localCheckpoint(true)` truncates lineage for EXECUTION but
    * Spark 4 preserves the origin plan's size estimate for PLANNING —
    * and in a round-based operator whose output self-joins the previous
    * round's checkpoint, that preserved `BigInt` estimate compounds
    * multiplicatively (digit count ~4× per round). After a few dozen
    * rounds the optimizer burns minutes multiplying million-digit
    * integers inside size-only stats estimation: planning, not
    * execution, becomes the ceiling — measured as a live hang in the
    * pointer-jumping CC at a few thousand vertices. Stripping the
    * estimate resets every round's leaves to `defaultSizeInBytes`,
    * keeping planning O(plan shape) per round forever; runtime size
    * facts still reach join planning through AQE, which re-plans from
    * ACTUAL shuffle sizes, so broadcast opportunities are not lost.
    */
  def cut(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.withoutOriginStats(df.localCheckpoint(true))

  /** Drop-in syntax for the cut: `df.cutLineage()` reads like the
    * `df.localCheckpoint(true)` it replaces at every per-round site.
    */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
  }
}
