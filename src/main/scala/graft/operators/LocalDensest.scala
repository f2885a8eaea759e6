package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-task EXACT replays of the greedy densest-subgraph peels
  * ([[Traversals.densestSubgraph]] / [[Traversals.densestByComponent]])
  * — the (1+ε)·avg-degree round peel is a deterministic pure function
  * of the edge set, and the twin replays the identical rounds (same
  * drop rule 10·deg·n ≤ 11·m_sym, same per-round stats rows, same
  * exact-integer earliest-max argmax, same maxRounds fail-loud budget)
  * in one `coalesce(1).mapPartitions` task.
  */
object LocalDensest {

  import scala.collection.mutable.{ArrayBuffer, LongMap}

  /** Replay of the GLOBAL peel over the symmetric arc list. Returns
    * (round, n_vertices, n_edges, density_micro, is_best).
    */
  def densestLocal(sym: DataFrame, maxRounds: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        var arcs = it.toArray
        val stats = new ArrayBuffer[(Long, Long, Long)]() // (round, n, msym)
        var r = 0L
        while (arcs.nonEmpty && r < maxRounds) {
          val deg = new LongMap[Long]()
          arcs.foreach { case (u, _) => deg(u) = deg.getOrElse(u, 0L) + 1L }
          val n = deg.size.toLong
          val ms = arcs.length.toLong
          stats += ((r, n, ms))
          // keep v iff 10·deg(v)·n > 11·m_sym (exact integers — the
          // round path's DECIMAL(38,0) product, exact in Long under the
          // one-task bar)
          val keep = new LongMap[Unit]()
          deg.foreach { case (u, d) =>
            if (BigInt(d) * BigInt(10L * n) > BigInt(11L * ms)) keep(u) = ()
          }
          arcs = arcs.filter { case (u, v) => keep.contains(u) && keep.contains(v) }
          r += 1
        }
        require(arcs.isEmpty,
          s"densestSubgraph: ${arcs.length} arcs remain after $maxRounds rounds — " +
            "raise maxRounds; a truncated peel may miss the densest prefix")
        if (stats.isEmpty) Iterator.empty
        else {
          val bestRound = stats.reduceLeft { (a, b) =>
            val cmp = BigInt(a._3) * BigInt(b._2) - BigInt(b._3) * BigInt(a._2)
            if (cmp > 0 || (cmp == 0 && a._1 < b._1)) a else b
          }._1
          stats.iterator.map { case (rd, n, ms) =>
            (rd, n, ms / 2, (BigInt(ms) * 500000L / n).toLong,
              if (rd == bestRound) 1L else 0L)
          }
        }
      }
      .toDF("round", "n_vertices", "n_edges", "density_micro", "is_best")
  }

  /** Replay of the COMPONENT-LOCAL peel: min-label components, each
    * peeled against its own threshold (components advance in lockstep
    * in the round path, but the peel is component-independent, so
    * per-component simulation yields the identical rows). Returns
    * (component, round, n_vertices, n_edges, density_micro, is_best).
    */
  def densestByComponentLocal(sym: DataFrame, maxRounds: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val all = it.toArray
        // min-label union-find
        val parent = new LongMap[Long]()
        def find(x: Long): Long = {
          var root = x
          while (parent.getOrElse(root, root) != root) root = parent(root)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = root; c = n
          }
          root
        }
        all.foreach { case (u, v) =>
          parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
          val ru = find(u); val rv = find(v)
          if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
        }
        val byComp = new LongMap[ArrayBuffer[(Long, Long)]]()
        all.foreach { case (u, v) =>
          byComp.getOrElseUpdate(find(u), new ArrayBuffer[(Long, Long)]()) += ((u, v))
        }
        var leftover = 0L
        val rows = new ArrayBuffer[(Long, Long, Long, Long, Long, Long)]()
        byComp.foreach { case (cmp, buf) =>
          var arcs = buf.toArray
          val stats = new ArrayBuffer[(Long, Long, Long)]()
          var r = 0L
          while (arcs.nonEmpty && r < maxRounds) {
            val deg = new LongMap[Long]()
            arcs.foreach { case (u, _) => deg(u) = deg.getOrElse(u, 0L) + 1L }
            val n = deg.size.toLong
            val ms = arcs.length.toLong
            stats += ((r, n, ms))
            val keep = new LongMap[Unit]()
            deg.foreach { case (u, d) =>
              if (BigInt(d) * BigInt(n) * 10 > BigInt(ms) * 11) keep(u) = ()
            }
            arcs = arcs.filter { case (u, v) => keep.contains(u) && keep.contains(v) }
            r += 1
          }
          leftover += arcs.length.toLong
          if (arcs.isEmpty && stats.nonEmpty) {
            // earliest-max argmax by exact cross-multiplication
            val best = stats.reduceLeft { (a, b) =>
              val cmp = BigInt(a._3) * BigInt(b._2) - BigInt(b._3) * BigInt(a._2)
              if (cmp > 0 || (cmp == 0 && a._1 < b._1)) a else b
            }._1
            stats.foreach { case (rd, n, ms) =>
              rows += ((cmp, rd, n, ms / 2,
                (ms / n) * 500000L + (ms % n) * 500000L / n,
                if (rd == best) 1L else 0L))
            }
          }
        }
        require(leftover == 0L,
          s"densestByComponent: $leftover arcs remain after $maxRounds rounds — " +
            "raise maxRounds; a truncated peel may miss the densest prefix")
        rows.iterator
      }
      .toDF("component", "round", "n_vertices", "n_edges", "density_micro", "is_best")
  }
}
