package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartiteness — two implementations with one contract (a single
  * boolean row `bipartite`):
  *
  *  - [[SummaryAggregations.bipartiteness]]: the reference's single-pass
  *    mergeable parity union-find (GS/library/BipartitenessCheck
  *    .java:~40). One job; summary ≤|V| entries in one final task.
  *  - [[Bipartiteness.iterative]]: fully partitioned parity-pair
  *    min-label propagation for vertex sets beyond single-task memory.
  *
  * Iterative formulation: per vertex track E(v)/O(v) = the minimum
  * vertex id reachable by an even/odd-length walk. Each round:
  * E'(v) = min(E(v), min over neighbors of O(u)) and symmetrically
  * O'(v) = min(O(v), min of E(u)) — an edge flips parity. In a
  * bipartite component every walk between two vertices has fixed
  * parity, so E(v) and O(v) can never agree; an odd cycle makes the
  * component's minimum reachable both ways ⇒ E(v) = O(v) for some v.
  * Early-exits on first conflict; otherwise converges (labels are
  * monotone non-increasing) in O(diameter) rounds.
  */
object Bipartiteness {

  def singlePass(edges: DataFrame): DataFrame =
    SummaryAggregations.bipartiteness(edges)

  def iterative(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val sym = edges.select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .union(edges.select(col("dst").cast("long"), col("src").cast("long")))
      .distinct()
      .cutLineage()

    // state: (id, e = min id reachable by even walk, o = … odd walk or null)
    var state = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("e"), lit(null).cast("long").as("o"))
      .cutLineage()

    var verdict: Option[Boolean] = None
    var fingerprint = (-1L, -1L, -1L)
    var iter = 0
    while (verdict.isEmpty && iter < maxIter) {
      val nbr = sym.join(state, sym("v") === state("id"))
        .groupBy(col("u")).agg(min(col("e")).as("ne"), min(col("o")).as("no"))
      val next = state.join(nbr, state("id") === nbr("u"), "left")
        .select(col("id"),
          least(col("e"), col("no")).as("e"), // least ignores nulls
          least(col("o"), col("ne")).as("o"))
        .cutLineage()
      state = next
      // ONE driver action per round: odd-cycle conflict count and the
      // convergence fingerprint come from the same aggregate
      val row = state.agg(
        coalesce(sum(when(col("e") === col("o"), 1L).otherwise(0L)), lit(0L)),
        coalesce(sum("e"), lit(0L)), coalesce(sum("o"), lit(0L)), count("o")).head()
      if (row.getLong(0) > 0) {
        verdict = Some(false)
      } else {
        val fp = (row.getLong(1), row.getLong(2), row.getLong(3))
        if (fp == fingerprint) verdict = Some(true)
        fingerprint = fp
      }
      iter += 1
    }
    Seq(verdict.getOrElse(true)).toDF("bipartite")
  }

  /** [[iterative]] over SEVERAL graphs at once: input carries a group
    * column `g`; every join/agg is keyed by (g, id), so one round
    * advances every graph and total rounds = the MAX diameter instead of
    * the sum (q90 certifies two fixture graphs — running them fused
    * halves the per-round scheduler overhead). Groups retire
    * individually: a conflicted or converged graph is dropped from the
    * working set while the others keep iterating. Returns
    * `(g, bipartite)` — verdict scalars, built driver-side.
    */
  def iterativeByGroup(edges: DataFrame, maxIter: Int = 100,
                       oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val sym = edges.select(col("g").cast("string").as("g"),
        col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .union(edges.select(col("g").cast("string"),
        col("dst").cast("long"), col("src").cast("long")))
      .distinct()
      .cutLineage()

    // scale-adaptive: per-group replay of the same 2-hop rounds,
    // conflict checks and convergence defaults in one task — bit-equal
    // verdicts by construction (spec A/B at oneTaskBar = 0); the fused
    // keyed rounds remain the over-bar path.
    if (sym.count() <= oneTaskBar)
      return LocalCommunities.bipartiteByGroupLocal(sym, maxIter)

    var state = sym.select(col("g"), col("u").as("id")).distinct()
      .select(col("g"), col("id"), col("id").as("e"), lit(null).cast("long").as("o"))
      .cutLineage()

    // one parity-propagation hop (a pure plan — no action)
    def hop(st: DataFrame, symA: DataFrame): DataFrame = {
      val nbr = symA.as("s").join(st.as("t"),
          col("s.g") === col("t.g") && col("s.v") === col("t.id"))
        .groupBy(col("s.g"), col("s.u"))
        .agg(min(col("t.e")).as("ne"), min(col("t.o")).as("no"))
        .toDF("g", "u", "ne", "no")
      st.as("t2").join(nbr,
          col("t2.g") === nbr("g") && col("t2.id") === nbr("u"), "left")
        .select(col("t2.g").as("g"), col("t2.id").as("id"),
          least(col("t2.e"), nbr("no")).as("e"),
          least(col("t2.o"), nbr("ne")).as("o"))
    }

    val verdict = scala.collection.mutable.Map.empty[String, Boolean]
    var prints = Map.empty[String, (Long, Long, Long)]
    var active = sym.select("g").distinct().as[String].collect().toSet
    var iter = 0
    while (active.nonEmpty && iter < maxIter) {
      val symA = sym.where(col("g").isin(active.toSeq: _*))
      // TWO hops per driver round: halves the checkpoints + aggregate
      // actions per hop, and is hop-optimal for the dense odd-cycle
      // case too (a conflict needs ≥2 hops, so it is caught at the
      // first check). Identical fixpoint — labels stay walk-reachability
      // minima after every hop, so conflict detection stays sound; a
      // double-hop may fire one check later, never wrongly. Measured at
      // sf0.1: round cost is join-bound, so this is action-hygiene, not
      // a big wall-clock cut (BASELINE r4 note).
      state = hop(hop(state, symA), symA).cutLineage()
      // one driver action per round for ALL graphs
      val rows = state.groupBy("g").agg(
        coalesce(sum(when(col("e") === col("o"), 1L).otherwise(0L)), lit(0L)).as("c"),
        coalesce(sum("e"), lit(0L)).as("se"),
        coalesce(sum("o"), lit(0L)).as("so"), count("o").as("co")).collect()
      for (r <- rows; gx = r.getString(0); if active.contains(gx)) {
        if (r.getLong(1) > 0) verdict(gx) = false
        else {
          val fp = (r.getLong(2), r.getLong(3), r.getLong(4))
          if (prints.get(gx).contains(fp)) verdict(gx) = true
          prints += gx -> fp
        }
      }
      val settled = verdict.keySet.toSet
      if (settled.nonEmpty) {
        active = active -- settled
        if (active.nonEmpty) state = state.where(col("g").isin(active.toSeq: _*))
      }
      iter += 1
    }
    // never-converged groups (maxIter hit) default true like [[iterative]]
    val all = prints.keySet ++ verdict.keySet
    all.toSeq.sorted.map(gx => (gx, verdict.getOrElse(gx, true)))
      .toDF("g", "bipartite")
  }

  /** PER-COMPONENT bipartiteness — `(component, is_bipartite)` for
    * every connected component, component = the min-label CC id. A
    * graph is bipartite iff every component is, so this is the
    * decomposable refinement of [[iterative]]'s single boolean (the
    * densestByComponent/louvainByComponent move applied to
    * 2-colorability), and decomposability is what makes the result
    * MAINTAINABLE under a changelog ([[bipartitenessMaintain]]) —
    * including DELETIONS, the classically hard direction for
    * incremental bipartiteness (removing an odd cycle's last edge
    * flips a component back to bipartite; the carve-out handles it by
    * in-component recompute instead of trying to un-merge parity
    * state).
    *
    * Unlike [[iterativeByGroup]] (which retires groups through a
    * per-group driver map — fine for a handful of fixture graphs,
    * wrong for 10⁶ components), this runs the parity-pair propagation
    * to the GLOBAL fixpoint with ONE scalar driver action per round
    * (conflict count + convergence fingerprint), then reads every
    * component's verdict out of the converged state in one aggregation.
    * Rounds = O(max component diameter); labels are monotone
    * non-increasing so the fingerprint converges. Self-loops are odd
    * cycles and are KEPT (the [[iterative]] contract — symmetrize-style
    * loop-dropping would silently mis-certify them).
    *
    * At the fixpoint every vertex's least(e, o) equals its component's
    * min label (even∪odd walks cover the component), so the component
    * key needs no separate CC pass; `labels` is accepted only for the
    * maintenance path's carve-out consistency and ignored here.
    */
  def bipartitenessByComponent(edges: DataFrame, maxIter: Int = 100,
                               oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .union(edges.select(col("dst").cast("long"), col("src").cast("long")))
      .distinct()
      .cutLineage()
    val arcs = sym.count()
    if (arcs == 0)
      return Seq.empty[(Long, Long)].toDF("component", "is_bipartite")
    // scale-adaptive (the LocalGraph twin discipline): the parity-pair
    // fixpoint is replayed round for round in one task (same monotone
    // labels, same convergence detection, same maxIter budget), so the
    // per-component verdicts are bit-equal by construction — spec A/B
    // at oneTaskBar = 0; the propagation rounds remain the over-bar
    // 100 TB path. One count replaces the isEmpty probe.
    if (arcs <= oneTaskBar)
      return LocalCommunities.bipartiteByComponentLocal(sym, maxIter)
    var state = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("e"), lit(null).cast("long").as("o"))
      .cutLineage()
    var fingerprint = (-1L, -1L, -1L, -1L)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbr = sym.join(state, sym("v") === state("id"))
        .groupBy(col("u")).agg(min(col("e")).as("ne"), min(col("o")).as("no"))
      state = state.join(nbr, state("id") === nbr("u"), "left")
        .select(col("id"),
          least(col("e"), col("no")).as("e"), // least ignores nulls
          least(col("o"), col("ne")).as("o"))
        .cutLineage()
      // ONE driver action per round: the convergence fingerprint (the
      // conflict count is part of it — conflicts don't early-exit here,
      // other components must keep converging)
      val row = state.agg(
        coalesce(sum(when(col("e") === col("o"), 1L).otherwise(0L)), lit(0L)),
        coalesce(sum("e"), lit(0L)), coalesce(sum("o"), lit(0L)), count("o")).head()
      val fp = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      if (fp == fingerprint) converged = true
      fingerprint = fp
      iter += 1
    }
    require(converged,
      s"bipartitenessByComponent: no fixpoint after $maxIter rounds — " +
        "raise maxIter; an unconverged state could mis-certify a component")
    state.groupBy(least(col("e"), coalesce(col("o"), col("e"))).as("component"))
      .agg(when(coalesce(sum(when(col("e") === col("o"), 1L).otherwise(0L)),
          lit(0L)) === 0L, 1L).otherwise(0L).as("is_bipartite"))
  }

  /** CDC-MAINTAINED per-component bipartiteness — the 2-colorability
    * family joins the maintenance matrix, DELETIONS included: given
    * the previous [[bipartitenessByComponent]] verdicts, the previous
    * edges and insert/delete deltas, produce the NET graph's verdicts
    * without recomputing unaffected components. Soundness is the
    * [[Maintenance]] carve-out argument — a component's verdict is a
    * pure function of its induced edges, an unaffected supergraph
    * component keeps an identical induced net edge set AND its
    * min-vertex label, so its row passes through verbatim; affected
    * components re-run the parity fixpoint on their induced net edges.
    *
    * CONTRACT: the maintenance path operates on the CANONICAL
    * self-loop-free edge model (the shared [[Maintenance.canonPairs]]
    * resolution of the whole C10 maintenance family) — `oldVerdicts`
    * must come from [[bipartitenessByComponent]] of the canonicalized
    * old edges. A deployment whose deltas carry self-loops (odd cycles
    * by definition) must resolve them upstream; the standalone
    * [[bipartitenessByComponent]] certifies them directly.
    */
  def bipartitenessMaintain(oldVerdicts: DataFrame, oldEdges: DataFrame,
                            inserts: DataFrame, deletes: DataFrame,
                            maxIter: Int = 100,
                            labels: Option[DataFrame] = None,
                            trace: Option[scala.collection.mutable.Buffer[Long]] = None,
                            oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val (netC, affVerts) =
      Maintenance.carve(oldEdges, inserts, deletes, labels, trace)
    // the component label is a vertex id inside the component — one
    // anti-join is the membership test
    val passThrough = oldVerdicts.join(
      affVerts.toDF("component"), Seq("component"), "left_anti")
    // component-closed in the net graph: one endpoint test suffices
    val sub = netC.join(affVerts.toDF("u"), Seq("u"), "left_semi")
    passThrough.unionByName(bipartitenessByComponent(
      sub.select(col("u").as("src"), col("v").as("dst")), maxIter, oneTaskBar))
  }
}
