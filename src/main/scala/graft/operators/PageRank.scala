package graft.operators

import graft.Lineage.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank over a directed edge list.
  *
  * The GraphX bridge ([[Snapshots.pageRank]]) computes float ranks whose
  * last ulps depend on summation order, so it can only ever be
  * rows-checked. This variant keeps ranks in integer micro-units
  * (SCALE = 1e6) and uses integer division at every step, so the result
  * is bit-identical under any partitioning / parallelism / merge order —
  * an exact, oracle-checkable contract, at the cost of sub-micro-unit
  * precision (immaterial after the driver's 6-dp rounding anyway).
  *
  * Semantics (the simple non-redistributing form of the PageRank paper —
  * dangling mass is dropped, keeping every term integer):
  *
  *   r_0(v)    = SCALE
  *   r_{k+1}(v) = (15 * SCALE) div 100
  *              + (85 * Σ_{u→v} (r_k(u) div outdeg(u))) div 100
  *
  * Distributed shape — identical to float power iteration and the right
  * one at 100 TB: per round, one join of ranks against the (static,
  * pre-partitioned) edge list on `u` and one aggregation shuffle on `v`.
  * The edge list is hash-partitioned on `u` once and localCheckpointed,
  * so each round shuffles only the (|V|-sized) rank table; lineage is
  * truncated per round. Rounds are fixed (no convergence probe ⇒ no
  * per-round driver action).
  */
object PageRank {

  val Scale = 1000000L

  /** `edges`: (src, dst, …) directed; returns (id BIGINT, rank BIGINT)
    * with rank in micro-units after `iters` rounds.
    */
  def fixedPoint(edges: DataFrame, iters: Int = 10,
                 oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
    // scale-adaptive (the LocalGraph twin discipline): the integer round
    // map is a pure function of the arc multiset, so under the one-task
    // bar a single-task replay of the same rounds is bit-equal by
    // construction (spec A/B at oneTaskBar = 0); the pre-partitioned
    // distributed rounds remain the over-bar 100 TB path.
    if (e.count() <= oneTaskBar)
      return LocalRank.pageRankLocal(e, iters, None)
    val deg = e.groupBy("u").agg(count(lit(1)).as("outdeg"))
    // static per-round join input, partitioned once on the join key
    val eDeg = e.join(deg, "u").repartition(col("u")).cutLineage()
    val verts = e.select(col("u").as("id")).union(e.select(col("v")))
      .distinct().cutLineage()

    var ranks = verts.withColumn("rank", lit(Scale))
    for (k <- 1 to iters) {
      val contrib = eDeg
        .join(ranks, eDeg("u") === ranks("id"))
        .select(col("v").as("id"), expr("rank div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = verts
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(15L * Scale / 100) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      // no convergence probe ⇒ no need to materialize every round; cut
      // lineage every few rounds to bound plan depth without paying a
      // synchronous job barrier per iteration
      if (k % 3 == 0 || k == iters) ranks = ranks.cutLineage()
    }
    ranks
  }

  /** WARM-START maintenance for [[fixedPoint]] — the incremental leg of
    * the centrality family (the walk-maintenance view is Bahmani,
    * Chowdhury & Goel 2012; this is its simpler deterministic cousin,
    * the warm restart every production ranking pipeline runs on a
    * delta): the SAME integer round map over the NET graph, seeded
    * from the previous deployment's ranks instead of the uniform
    * start. Vertices new to the graph seed at SCALE; vanished vertices
    * drop with their rows. The output contract is the seeded
    * iteration's exact integer state after `iters` rounds — a pure
    * function of (net edges, prev ranks, iters) that the q240 oracle
    * replays bit-for-bit (base rounds → seed → warm rounds).
    *
    * WHY the contract is NOT "equals a cold recompute": integer
    * truncation gives the round map many stationary states — measured
    * on the C10 CDC fixture, warm and cold both go stationary but 83
    * vertices apart at sf0.001, and the cold iteration 2-cycles
    * forever at sf0.01 — so no round count makes the two bit-equal.
    * What warm-starting buys, and what the spec + tier-2 probe PROVE
    * with the per-round max-|Δ| sentinel (`trace`), is reaching any
    * stationarity tolerance in far fewer rounds after a small delta:
    * the previous ranks already sit within O(‖delta‖) of a stationary
    * state, while the uniform start must re-mix the whole graph.
    *
    * Passing an EMPTY `prev` reproduces [[fixedPoint]] exactly (every
    * seed coalesces to SCALE) — the spec's cold baseline arm.
    * `trace`, when given, records max per-vertex |Δrank| after each
    * round (micro-units; one extra action per round, certification
    * only — production leaves it None and pays no per-round barrier).
    */
  def fixedPointFrom(edges: DataFrame, prev: DataFrame, iters: Int = 5,
                     trace: Option[scala.collection.mutable.Buffer[Long]] = None,
                     oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
    // `trace` callers (per-round Δ-sentinel probes) always take the
    // round path — the twin has no per-round driver channel
    if (trace.isEmpty && e.count() <= oneTaskBar)
      return LocalRank.pageRankLocal(e, iters, Some(prev))
    val deg = e.groupBy("u").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "u").repartition(col("u")).cutLineage()
    val verts = e.select(col("u").as("id")).union(e.select(col("v")))
      .distinct().cutLineage()

    var ranks = verts
      .join(prev.select(col("id"), col("rank").as("pr")), Seq("id"), "left")
      .select(col("id"), coalesce(col("pr"), lit(Scale)).as("rank"))
      .cutLineage()
    for (k <- 1 to iters) {
      val contrib = eDeg
        .join(ranks, eDeg("u") === ranks("id"))
        .select(col("v").as("id"), expr("rank div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      val next = verts
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(15L * Scale / 100) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      if (trace.isDefined) {
        val nx = next.cutLineage()
        trace.foreach(_ += nx.toDF("id", "nr")
          .join(ranks.toDF("id", "or"), Seq("id"))
          .agg(coalesce(max(abs(col("nr") - col("or"))), lit(0L)))
          .head().getLong(0))
        // release the superseded round's checkpoint — the Δ above was
        // its last reader, and a traced certification loop would
        // otherwise pin O(iters) |V|-sized frames (OOM'd live in
        // tier2prwarm at 2 × 30 rounds)
        org.apache.spark.sql.graftbridge.PlanBridge.checkpointRddId(ranks)
          .foreach(id => edges.sparkSession.sparkContext.getPersistentRDDs
            .get(id).foreach(_.unpersist(false)))
        ranks = nx
      } else ranks = if (k % 3 == 0 || k == iters) next.cutLineage() else next
    }
    ranks
  }

  /** Weighted PageRank: each out-edge carries mass proportional to its
    * integer weight (`value` cast to BIGINT) instead of 1/outdeg. Same
    * micro-unit determinism contract — the per-edge share
    * `(rank·w) div totw(u)` is an independent exact integer, so the
    * inbound sum is order-free. Same per-round plan as [[fixedPoint]];
    * the static edge list just carries (w, totw) columns.
    */
  def weightedFixedPoint(edges: DataFrame, iters: Int = 10,
                         oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val e = edges.select(col("src").cast("long").as("u"),
      col("dst").cast("long").as("v"), col("value").cast("long").as("w"))
    if (e.count() <= oneTaskBar)
      return LocalRank.weightedPageRankLocal(e, iters)
    val tot = e.groupBy("u").agg(sum("w").as("totw"))
    val eW = e.join(tot, "u").where(col("totw") > 0)
      .repartition(col("u")).cutLineage()
    val verts = e.select(col("u").as("id")).union(e.select(col("v")))
      .distinct().cutLineage()

    var ranks = verts.withColumn("rank", lit(Scale))
    for (k <- 1 to iters) {
      val contrib = eW
        .join(ranks, eW("u") === ranks("id"))
        .select(col("v").as("id"), expr("(rank * w) div totw").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = verts
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(15L * Scale / 100) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      if (k % 3 == 0 || k == iters) ranks = ranks.cutLineage()
    }
    ranks
  }

  /** Personalized PageRank: the teleport term lands only on `sources`
    * instead of uniformly — the standard random-walk-with-restart
    * scoring used for seed-set expansion / related-item retrieval. Same
    * integer micro-unit contract and identical distributed shape as
    * [[fixedPoint]] (the teleport mask is one extra broadcast-joined
    * column on the static vertex table):
    *
    *   r_0(v)     = SCALE·[v ∈ S]
    *   r_{k+1}(v) = (15·SCALE div 100)·[v ∈ S]
    *              + (85 · Σ_{u→v} (r_k(u) div outdeg(u))) div 100
    */
  def personalized(edges: DataFrame, sources: Seq[Long], iters: Int = 10,
                   oneTaskBar: Long = LocalGraph.SymRowBar): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
    if (e.count() <= oneTaskBar)
      return LocalRank.personalizedLocal(e, sources, iters)
    val deg = e.groupBy("u").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "u").repartition(col("u")).cutLineage()
    val verts = e.select(col("u").as("id")).union(e.select(col("v")))
      .distinct()
      .withColumn("is_src", col("id").isInCollection(sources))
      .cutLineage()

    var ranks = verts.withColumn("rank",
      when(col("is_src"), lit(Scale)).otherwise(lit(0L)))
    for (k <- 1 to iters) {
      val contrib = eDeg
        .join(ranks, eDeg("u") === ranks("id"))
        .select(col("v").as("id"), expr("rank div outdeg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      ranks = verts
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("is_src"),
          (when(col("is_src"), lit(15L * Scale / 100)).otherwise(lit(0L)) +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      if (k % 3 == 0 || k == iters) ranks = ranks.cutLineage()
    }
    ranks.select(col("id"), col("rank"))
  }
}
