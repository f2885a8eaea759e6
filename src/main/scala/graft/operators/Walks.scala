package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic "random" walks — the DeepWalk / node2vec
  * corpus-generation shape (Perozzi et al. 2014; Grover & Leskovec
  * 2016, both public): graph → vertex sequences, the training-data
  * precursor for graph embeddings. From every start vertex, `len`
  * steps over the undirected view; the step-t successor of vertex c is
  * the neighbor n minimizing the portable integer hash h(c, t, n) — a
  * deterministic stand-in for uniform neighbor sampling that is
  * (a) exactly replayable in any engine (pure 64-bit integer
  * arithmetic, the q191 multiplicative-hash family, so the DuckDB
  * oracle unrolls the walk step by step), and (b) STEP-KEYED, so a
  * walk revisiting a vertex at a different step draws a different
  * "coin" and does not lock into 2-cycles.
  *
  * Output: (start_id, step, vertex) rows, step 0..len. Dead ends
  * cannot occur on the symmetrized view (every start has ≥1 neighbor
  * by construction — starts are edge endpoints).
  *
  * Scale shape: `len` rounds, each ONE join of the |starts|-row walker
  * frontier against the adjacency (keyed on the current vertex — the
  * adjacency is the big, co-located side; the frontier is the small
  * shuffling side) + one min(struct) argmin per walker — map-side
  * partial aggregation, work ∝ Σ deg(cur) per round, no driver action
  * in the loop. A biased (node2vec p/q) variant is the same plan with
  * the hash comparison domain weighted; uniform here.
  */
object Walks {

  def deterministicWalks(edges: DataFrame, len: Int): DataFrame = {
    require(len >= 0, s"walk length must be non-negative, got $len")
    val half = edges.select(col("src").cast("long").as("u"),
      col("dst").cast("long").as("v"))
    val sym = half.union(half.select(col("v"), col("u")))
      .where(col("u") =!= col("v")).distinct().cutLineage()
    val t31 = lit(2147483648L)
    var cur = sym.select(col("u").as("start_id")).distinct()
      .withColumn("cur", col("start_id")).cutLineage()
    val frames = scala.collection.mutable.ArrayBuffer(
      cur.select(col("start_id"), lit(0L).as("step"), col("cur").as("vertex")))
    for (t <- 1 to len) {
      val h = pmod(pmod(pmod(col("cur") % t31 * 31 + lit(t.toLong), t31) * 31
        + col("v"), t31) * lit(2654435761L), t31)
      cur = cur.join(sym, cur("cur") === sym("u"))
        .groupBy("start_id")
        .agg(min(struct(h.as("h"), col("v").as("n"))).as("m"))
        .select(col("start_id"), col("m.n").as("cur"))
        .cutLineage()
      frames += cur.select(col("start_id"), lit(t.toLong).as("step"),
        col("cur").as("vertex"))
    }
    frames.reduce(_ unionByName _)
  }
}
