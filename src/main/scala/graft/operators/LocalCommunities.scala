package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-task EXACT replays of the community-detection fixpoints — the
  * [[LocalGraph]] discipline (optimization guide §1.2/§2.2) applied to
  * the Louvain/LPA/bipartiteness family. Unlike the peeling twins
  * (which compute a provably unique result by a different algorithm),
  * these twins REPLAY the identical synchronous round dynamics of the
  * distributed operators in one task — same round function, same
  * exact-integer arithmetic, same tie-breaks, same gate decisions — so
  * bit-equality holds by construction, not by theorem: every
  * aggregation the round path performs is a sum/max/min over the same
  * operands, and Long arithmetic (including silent overflow wrap and
  * truncating division) is identical in-JVM and in codegen.
  *
  * Why (measured r12/r13): the move passes are round-latency-bound at
  * small scale — each pass costs 5+ jobs (joins, windows, gate scalars)
  * while the actual work shrinks to kilobytes. Below the size bar the
  * whole unroll fits one `coalesce(1).mapPartitions` job; above it the
  * distributed passes run unchanged (the 100 TB path).
  */
object LocalCommunities {

  import scala.collection.mutable.{ArrayBuffer, LongMap}

  private type Adj = LongMap[ArrayBuffer[Long]]

  /** Replay of [[Communities.labelPropagation]]'s synchronous rounds
    * over the SYMMETRIC dedup'd pair list (u, v): each round every
    * vertex adopts the most frequent neighbor label, ties by smallest
    * label. Returns (id, label).
    */
  def lpaLocal(sym: DataFrame, rounds: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val adj = new Adj()
        it.foreach { case (u, v) =>
          adj.getOrElseUpdate(u, new ArrayBuffer[Long]()) += v
        }
        var labels = new LongMap[Long](adj.size * 2)
        adj.foreachKey(u => labels(u) = u)
        for (_ <- 1 to rounds) {
          val next = new LongMap[Long](adj.size * 2)
          adj.foreach { case (u, nbrs) =>
            // count neighbor labels; best = (max count, min label)
            val cnt = new LongMap[Long]()
            nbrs.foreach { v =>
              val nl = labels(v)
              cnt(nl) = cnt.getOrElse(nl, 0L) + 1L
            }
            var bestL = Long.MaxValue
            var bestC = -1L
            cnt.foreach { case (l, c) =>
              if (c > bestC || (c == bestC && l < bestL)) { bestL = l; bestC = c }
            }
            next(u) = bestL
          }
          labels = next
        }
        val out = new ArrayBuffer[(Long, Long)](labels.size)
        labels.foreach { case (id, l) => out += ((id, l)) }
        out.iterator
      }
      .toDF("id", "label")
  }

  /** Replay of [[Communities.modularityRefine]]: one synchronous greedy
    * modularity-gain pass plus the exact-integer monotonicity gate.
    * Input is the TAGGED union of the raw edge rows (t=0, x, y) and the
    * label rows (t=1, id, label) so both land in the one task; m is the
    * raw EDGE ROW count (the round path's `c.count()`), degrees are
    * distinct-neighbor counts over the symmetrized dedup'd pairs.
    */
  def refineLocal(c: DataFrame, labels: DataFrame): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val tagged = c
      .select(lit(0).as("t"), col("x").cast("long").as("a"), col("y").cast("long").as("b"))
      .unionByName(labels.select(lit(1).as("t"),
        col("id").cast("long").as("a"), col("label").cast("long").as("b")))
    tagged.as[(Int, Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val rows = new ArrayBuffer[(Long, Long)]()
        val l0 = new LongMap[Long]()
        it.foreach { case (t, a, b) =>
          if (t == 0) rows += ((a, b)) else l0(a) = b
        }
        val m = rows.length.toLong
        // sym: distinct symmetrized pairs, u != v
        val nbrSet = new LongMap[LongMap[Unit]]()
        rows.foreach { case (x, y) =>
          if (x != y) {
            nbrSet.getOrElseUpdate(x, new LongMap[Unit]())(y) = ()
            nbrSet.getOrElseUpdate(y, new LongMap[Unit]())(x) = ()
          }
        }
        // deg + stot (labeled vertices with a degree only — the round
        // path's inner joins)
        val stot = new LongMap[Long]()
        nbrSet.foreach { case (u, s) =>
          l0.get(u).foreach { lu => stot(lu) = stot.getOrElse(lu, 0L) + s.size }
        }
        // one synchronous pass: every vertex, no parity filter
        val l1 = new LongMap[Long](l0.size * 2)
        l0.foreach { case (id, l) => l1(id) = l }
        nbrSet.foreach { case (u, s) =>
          l0.get(u).foreach { lu =>
            val k = s.size.toLong
            val kic = new LongMap[Long]()
            s.foreachKey { v =>
              l0.get(v).foreach { lv => kic(lv) = kic.getOrElse(lv, 0L) + 1L }
            }
            val kd = kic.getOrElse(lu, 0L)
            val stotd = stot(lu)
            var bestLv = Long.MaxValue
            var bestGain = Long.MinValue
            kic.foreach { case (lv, kc) =>
              if (lv != lu) {
                val gain = 2L * m * (kc - kd) - k * (stot(lv) - stotd + k)
                if (gain > 0 &&
                    (gain > bestGain || (gain == bestGain && lv < bestLv))) {
                  bestGain = gain; bestLv = lv
                }
              }
            }
            if (bestGain > Long.MinValue) l1(u) = bestLv
          }
        }
        // gate: exact integer modularity 4m·internal − Σ stot² over the
        // RAW rows (the round path's integerModularity on c)
        def im(lab: LongMap[Long]): Long = {
          var internal = 0L
          val kRows = new LongMap[Long]() // endpoint occurrence counts
          rows.foreach { case (x, y) =>
            kRows(x) = kRows.getOrElse(x, 0L) + 1L
            kRows(y) = kRows.getOrElse(y, 0L) + 1L
            (lab.get(x), lab.get(y)) match {
              case (Some(lx), Some(ly)) if lx == ly => internal += 1L
              case _ => ()
            }
          }
          val st = new LongMap[Long]()
          kRows.foreach { case (id, k) =>
            lab.get(id).foreach { l => st(l) = st.getOrElse(l, 0L) + k }
          }
          var sumD2 = 0L
          st.foreach { case (_, s) => sumD2 += s * s }
          4L * m * internal - sumD2
        }
        val keep = if (im(l1) >= im(l0)) l1 else l0
        val out = new ArrayBuffer[(Long, Long)](keep.size)
        keep.foreach { case (id, l) => out += ((id, l)) }
        out.iterator
      }
      .toDF("id", "label")
  }

  /** Replay of [[Communities]]'s multi-level loop — both the global-m
    * variant (`louvainCore`, with optional Leiden connectivity
    * refinement) and the component-local variant (`louvainCompCore`).
    * Input: the canonical weighted graph (u ≤ v, integer w). Returns
    * (id, community) in the original vertex-id space.
    */
  def louvainLocal(g0: DataFrame, levels: Int, movesPerLevel: Int,
                   leiden: Boolean, compLocal: Boolean): DataFrame = {
    val spark = g0.sparkSession
    import spark.implicits._
    g0.select(col("u").cast("long"), col("v").cast("long"), col("w").cast("long"))
      .as[(Long, Long, Long)]
      .coalesce(1)
      .mapPartitions(it =>
        louvainReplay(it.toArray, levels, movesPerLevel, leiden, compLocal))
      .toDF("id", "community")
  }

  private def endpoints(es: Array[(Long, Long, Long)]): LongMap[Unit] = {
    val s = new LongMap[Unit]()
    es.foreach { case (u, v, _) => s(u) = (); s(v) = () }
    s
  }

  /** Weighted degrees k_i = Σ_{j≠i} w(i,j) + 2·w(i,i). */
  private def weightedDeg(es: Array[(Long, Long, Long)]): LongMap[Long] = {
    val k = new LongMap[Long]()
    es.foreach { case (u, v, w) =>
      if (u != v) {
        k(u) = k.getOrElse(u, 0L) + w
        k(v) = k.getOrElse(v, 0L) + w
      } else k(u) = k.getOrElse(u, 0L) + 2L * w
    }
    k
  }

  /** Min-label union-find over the non-self edges. */
  private def minLabelComponents(es: Array[(Long, Long, Long)]): LongMap[Long] = {
    val parent = new LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (u, v, _) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      if (u != v) {
        val ru = find(u); val rv = find(v)
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
    }
    val out = new LongMap[Long]()
    parent.foreachKey(x => out(x) = find(x))
    out
  }

  private def louvainReplay(es0: Array[(Long, Long, Long)], levels: Int,
                            movesPerLevel: Int, leiden: Boolean,
                            compLocal: Boolean): Iterator[(Long, Long)] = {
    if (es0.isEmpty) return Iterator.empty
    // component structures (component-local variant): min-label CC of
    // the LEVEL-1 graph; per-component edge mass is constant across
    // levels (coarsening preserves each component's total weight)
    val comp0: LongMap[Long] =
      if (compLocal) minLabelComponents(es0) else null
    val mC: LongMap[Long] =
      if (compLocal) {
        val m = new LongMap[Long]()
        es0.foreach { case (u, _, w) =>
          val c = comp0(u); m(c) = m.getOrElse(c, 0L) + w
        }
        m
      } else null
    val mGlobal: Long = if (compLocal) 0L else es0.map(_._3).sum

    // per-(component,) modularity of a labeling: 4m·in − Σ stot²
    // (global: one scalar; component-local: keyed by cmp)
    def modularity(es: Array[(Long, Long, Long)], labels: LongMap[Long],
                   vcomp: LongMap[Long]): LongMap[Long] = {
      val in = new LongMap[Long]()
      es.foreach { case (u, v, w) =>
        if (labels(u) == labels(v)) {
          val key = if (compLocal) vcomp(u) else 0L
          in(key) = in.getOrElse(key, 0L) + w
        }
      }
      val k = weightedDeg(es)
      // stot per label; labels never span components, so a label's
      // component is any member's
      val stot = new LongMap[Long]()
      val labComp = new LongMap[Long]()
      k.foreach { case (id, kk) =>
        val l = labels(id)
        stot(l) = stot.getOrElse(l, 0L) + kk
        if (compLocal) labComp(l) = vcomp(id)
      }
      // vertices with only self-loops still carry k (2w) — included
      // above since weightedDeg covers them
      val s2 = new LongMap[Long]()
      stot.foreach { case (l, s) =>
        val key = if (compLocal) labComp(l) else 0L
        s2(key) = s2.getOrElse(key, 0L) + s * s
      }
      val q = new LongMap[Long]()
      if (compLocal) {
        mC.foreach { case (c, m) =>
          q(c) = 4L * m * in.getOrElse(c, 0L) - s2.getOrElse(c, 0L)
        }
      } else q(0L) = 4L * mGlobal * in.getOrElse(0L, 0L) - s2.getOrElse(0L, 0L)
      q
    }

    // one synchronous gated move pass (candidate labeling): vertices
    // with id % 2 == parity evaluate moving to a neighboring community
    def movePass(es: Array[(Long, Long, Long)], l0: LongMap[Long],
                 parity: Int, vcomp: LongMap[Long]): LongMap[Long] = {
      val k = weightedDeg(es)
      val stot = new LongMap[Long]()
      k.foreach { case (id, kk) =>
        val l = l0(id); stot(l) = stot.getOrElse(l, 0L) + kk
      }
      // kic per vertex over non-self incident edges
      val kic = new LongMap[LongMap[Long]]()
      es.foreach { case (u, v, w) =>
        if (u != v) {
          val lu = l0(u); val lv = l0(v)
          val mu = kic.getOrElseUpdate(u, new LongMap[Long]())
          mu(lv) = mu.getOrElse(lv, 0L) + w
          val mv = kic.getOrElseUpdate(v, new LongMap[Long]())
          mv(lu) = mv.getOrElse(lu, 0L) + w
        }
      }
      val l1 = new LongMap[Long](l0.size * 2)
      l0.foreach { case (id, l) => l1(id) = l }
      kic.foreach { case (u, ks) =>
        if (java.lang.Math.floorMod(u, 2L) == parity.toLong) {
          val lu = l0(u)
          val ku = k(u)
          val kd = ks.getOrElse(lu, 0L)
          val stotd = stot(lu)
          val m2 = if (compLocal) 2L * mC(vcomp(u)) else 2L * mGlobal
          var bestLv = Long.MaxValue
          var bestGain = Long.MinValue
          ks.foreach { case (lv, kc) =>
            if (lv != lu) {
              val gain = m2 * (kc - kd) - ku * (stot(lv) - stotd + ku)
              if (gain > 0 &&
                  (gain > bestGain || (gain == bestGain && lv < bestLv))) {
                bestGain = gain; bestLv = lv
              }
            }
          }
          if (bestGain > Long.MinValue) l1(u) = bestLv
        }
      }
      l1
    }

    // Leiden connectivity refinement: per community, connected parts of
    // the induced subgraph, each named by its min member; vertices with
    // no intra-community edge become singletons named by their own id
    def connRefine(es: Array[(Long, Long, Long)],
                   labels: LongMap[Long]): LongMap[Long] = {
      val intra = es.filter { case (u, v, _) => u != v && labels(u) == labels(v) }
      val cc = minLabelComponents(intra)
      val out = new LongMap[Long](labels.size * 2)
      labels.foreachKey { id => out(id) = cc.getOrElse(id, id) }
      out
    }

    var g = es0
    var vcomp = comp0
    // mapping: original id -> current coarse vertex
    val mapping = new LongMap[Long]()
    endpoints(es0).foreachKey(id => mapping(id) = id)
    var curQ: LongMap[Long] = null
    var lastHist = 0L // global variant's cross-level memo (hist.last)
    for (lvl <- 1 to levels) {
      var labels = new LongMap[Long]()
      endpoints(g).foreachKey(id => labels(id) = id)
      if (lvl == 1) curQ = modularity(g, labels, vcomp)
      else if (!compLocal) { curQ = new LongMap[Long](); curQ(0L) = lastHist }
      for (p <- 1 to movesPerLevel) {
        val cand = movePass(g, labels, p % 2, vcomp)
        val candQ = modularity(g, cand, vcomp)
        if (compLocal) {
          // per-component gate: members of an accepting component take
          // the candidate label, the rest keep theirs
          val nq = new LongMap[Long]()
          val acc = new LongMap[Boolean]()
          curQ.foreach { case (c, qi) =>
            val qc = candQ.getOrElse(c, qi)
            acc(c) = qc >= qi
            nq(c) = if (qc >= qi) qc else qi
          }
          val nl = new LongMap[Long](labels.size * 2)
          labels.foreach { case (id, l) =>
            nl(id) = if (acc(vcomp(id))) cand(id) else l
          }
          labels = nl
          curQ = nq
        } else {
          if (candQ(0L) >= curQ(0L)) { labels = cand; curQ = candQ }
          lastHist = curQ(0L)
        }
      }
      if (leiden) {
        val refined = connRefine(g, labels)
        val refinedQ = modularity(g, refined, vcomp)
        require(refinedQ(0L) >= curQ(0L),
          s"connectivityRefine lowered exact-integer modularity " +
            s"(${curQ(0L)} -> ${refinedQ(0L)}) " +
            "— impossible for a pure component split; the labeling is corrupt")
        labels = refined
        lastHist = refinedQ(0L)
      }
      val lab = labels
      // value-only updates of existing keys: no structural change, so
      // updating under foreachKey is safe
      mapping.foreachKey { id => mapping(id) = lab(mapping(id)) }
      if (lvl < levels) {
        // coarsen: communities collapse to vertices named by their
        // label, parallel edges sum, internal edges become self-loops
        val coarse = new scala.collection.mutable.HashMap[(Long, Long), Long]()
        g.foreach { case (u, v, w) =>
          val la = lab(u); val lb = lab(v)
          val key = (math.min(la, lb), math.max(la, lb))
          coarse(key) = coarse.getOrElse(key, 0L) + w
        }
        g = coarse.iterator.map { case ((u, v), w) => (u, v, w) }.toArray
        if (compLocal) {
          val nv = new LongMap[Long]()
          lab.foreach { case (id, l) => nv(l) = vcomp(id) }
          vcomp = nv
        }
      }
    }
    val out = new ArrayBuffer[(Long, Long)](mapping.size)
    mapping.foreach { case (id, c) => out += ((id, c)) }
    out.iterator
  }

  /** Replay of [[Bipartiteness.bipartitenessByComponent]]: the
    * synchronous parity-pair min-label propagation run to its global
    * fixpoint (same per-round state, same fingerprint-based convergence
    * detection and `maxIter` fail-loud budget), then the per-component
    * verdict readout. Input: the SYMMETRIC distinct pair list
    * (self-loops kept — they are odd cycles). Returns
    * (component, is_bipartite).
    */
  def bipartiteByComponentLocal(sym: DataFrame, maxIter: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val adj = new Adj()
        it.foreach { case (u, v) =>
          adj.getOrElseUpdate(u, new ArrayBuffer[Long]()) += v
        }
        val st = parityFixpoint(adj, maxIter,
          budgetMsg = iters =>
            s"bipartitenessByComponent: no fixpoint after $iters rounds — " +
              "raise maxIter; an unconverged state could mis-certify a component")
        // verdict per component: key = least(e, o or e); bipartite iff
        // no member has e == o
        val conflicts = new LongMap[Long]()
        st.foreach { case (id, eo) =>
          val (e, o) = eo
          val key = if (o == Long.MinValue) e else math.min(e, o)
          val bad = if (o != Long.MinValue && e == o) 1L else 0L
          conflicts(key) = conflicts.getOrElse(key, 0L) + bad
        }
        val out = new ArrayBuffer[(Long, Long)](conflicts.size)
        conflicts.foreach { case (c, bad) =>
          out += ((c, if (bad == 0L) 1L else 0L))
        }
        out.iterator
      }
      .toDF("component", "is_bipartite")
  }

  /** The synchronous parity rounds shared by the bipartiteness twins:
    * state (e, o) per vertex — min id reachable by an even/odd walk so
    * far (o = MinValue encodes the round path's NULL). One hop per
    * round; stops when the state stops changing (the fingerprint
    * convergence the round path detects one aggregate later — same
    * round count bound, see below) or `maxIter` rounds, then fails
    * loud via `budgetMsg` if still changing.
    *
    * Round-count parity with the distributed loop: the round path
    * declares convergence when two consecutive rounds produce the same
    * (conflicts, Σe, Σo, count o) aggregate, which happens exactly at
    * the first round whose hop changes nothing (labels are monotone
    * non-increasing, so an unchanged aggregate means unchanged state).
    * This replay detects the same "round r+1 changed nothing"
    * condition directly and therefore fails the budget in exactly the
    * same cases.
    */
  private def parityFixpoint(adj: Adj, maxIter: Int,
                             budgetMsg: Int => String): LongMap[(Long, Long)] = {
    val st = new ParityState(adj)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      if (!st.hop()) converged = true
      iter += 1
    }
    require(converged, budgetMsg(maxIter))
    val out = new LongMap[(Long, Long)](adj.size * 2)
    adj.foreachKey { id => out(id) = (st.e(id), st.o(id)) }
    out
  }

  /** Mutable (e, o) parity-label state with one synchronous hop per
    * call — e'(v) = min(e, min over neighbors of o), o'(v) = min(o, min
    * of e); o = MaxValue encodes the round path's NULL internally
    * (MinValue at the [[e]]/[[o]] accessors). `hop()` returns whether
    * anything changed (labels are monotone non-increasing, so "no
    * change" is exactly the round path's equal-aggregate fingerprint
    * condition). Dense-index CSR layout: the hop is two flat array
    * scans, not hash probes.
    */
  private final class ParityState(adj: Adj) {
    private val idx = new LongMap[Int](adj.size * 2)
    adj.foreachKey { id => idx(id) = idx.size }
    private val n = idx.size
    private val ids = new Array[Long](n)
    idx.foreach { case (id, i) => ids(i) = id }
    // CSR adjacency over dense indices
    private val off = new Array[Int](n + 1)
    adj.foreach { case (u, nbrs) => off(idx(u) + 1) = nbrs.length }
    locally { var i = 0; while (i < n) { off(i + 1) += off(i); i += 1 } }
    private val tgt = new Array[Int](off(n))
    locally {
      val fill = java.util.Arrays.copyOf(off, n)
      adj.foreach { case (u, nbrs) =>
        val ui = idx(u)
        nbrs.foreach { v => tgt(fill(ui)) = idx(v); fill(ui) += 1 }
      }
    }
    private var eArr = ids.clone()
    private var oArr = Array.fill(n)(Long.MaxValue)
    def hop(): Boolean = {
      val ne = new Array[Long](n)
      val no = new Array[Long](n)
      var changed = false
      var ui = 0
      while (ui < n) {
        var be = eArr(ui)
        var bo = oArr(ui)
        var p = off(ui)
        val end = off(ui + 1)
        while (p < end) {
          val vi = tgt(p)
          val vo = oArr(vi); if (vo < be) be = vo
          val ve = eArr(vi); if (ve < bo) bo = ve
          p += 1
        }
        if (be != eArr(ui) || bo != oArr(ui)) changed = true
        ne(ui) = be; no(ui) = bo
        ui += 1
      }
      eArr = ne; oArr = no
      changed
    }
    def hasConflict: Boolean = {
      var ui = 0
      while (ui < n) {
        if (oArr(ui) != Long.MaxValue && eArr(ui) == oArr(ui)) return true
        ui += 1
      }
      false
    }
    def e(id: Long): Long = eArr(idx(id))
    def o(id: Long): Long =
      { val x = oArr(idx(id)); if (x == Long.MaxValue) Long.MinValue else x }
  }

  /** Replay of [[Bipartiteness.iterativeByGroup]] for the one-task leg:
    * per group, the parity fixpoint with the round path's TWO-hops-per-
    * round budget (maxIter driver rounds = 2·maxIter hops) and its
    * defaults — conflict ⇒ false, convergence ⇒ true, budget exhausted
    * without either ⇒ true. Input: tagged (g, u, v) symmetric pairs.
    * Returns (g, bipartite) sorted by g.
    */
  def bipartiteByGroupLocal(sym: DataFrame, maxIter: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("g").cast("string"), col("u").cast("long"), col("v").cast("long"))
      .as[(String, Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val groups = new scala.collection.mutable.HashMap[String, Adj]()
        it.foreach { case (g, u, v) =>
          groups.getOrElseUpdate(g, new Adj())
            .getOrElseUpdate(u, new ArrayBuffer[Long]()) += v
        }
        groups.toSeq.sortBy(_._1).iterator.map { case (g, adj) =>
          (g, groupVerdict(adj, maxIter))
        }
      }
      .toDF("g", "bipartite")
  }

  /** One group's verdict under the iterativeByGroup dynamics: per
    * driver round, TWO hops; then conflict check (⇒ false), then
    * fingerprint convergence — the round path stores the aggregate
    * fingerprint each round and declares true when two consecutive
    * rounds' fingerprints match, which (labels being monotone
    * non-increasing) is exactly "this round's two hops changed nothing
    * and a previous round's fingerprint exists". `maxIter` rounds
    * without either verdict ⇒ true (the round path's never-converged
    * default).
    */
  private def groupVerdict(adj: Adj, maxIter: Int): Boolean = {
    val st = new ParityState(adj)
    var round = 1
    while (round <= maxIter) {
      val c1 = st.hop(); val c2 = st.hop()
      if (st.hasConflict) return false
      if (!c1 && !c2 && round >= 2) return true
      round += 1
    }
    true
  }
}
