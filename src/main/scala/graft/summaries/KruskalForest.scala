package graft.summaries

import scala.collection.mutable

/** Mergeable partial-MSF summary — the classic "local MST then merge"
  * identity MSF(A ∪ B) = MSF(MSF(A) ∪ MSF(B)) (the red rule: an edge
  * outside MSF(A) is the maximum of a cycle in A, stays the maximum of
  * that cycle in A ∪ B, so never enters the union's MSF). Each buffer
  * holds the partial forest of the edges it has seen, under the SAME
  * deterministic lexicographic total order (w, u, v) as
  * [[graft.operators.SpanningForest.boruvka]] — effectively-distinct
  * weights make the MSF unique, so any partition/merge order yields the
  * SAME edge set and the summary is a drop-in for the distributed
  * rounds (MsfSpec pins boruvka ≡ in-JVM Kruskal under this order).
  *
  * Rows carry the CONTRACTED component keys (a, b) the union-find runs
  * on, plus the original (u, v, w) the forest reports — the shape
  * Borůvka's tail needs after k rounds of contraction (MSF(G) =
  * picked ∪ MSF(G / picked)); for an uncontracted graph pass a = u,
  * b = v. Buffer growth is bounded by lazy compaction: inserts append,
  * and once the pending block exceeds max(4096, 2 × last compacted
  * size) the buffer re-runs Kruskal over (kept ∪ pending), keeping
  * ≤ (#components − 1) tree edges — amortized O(n log n) per task,
  * ≤ forest-size wire format at partial-merge boundaries.
  */
final class KruskalForest extends Serializable {
  // parallel arrays of the held edges: contracted keys + original edge
  var a: mutable.ArrayBuilder.ofLong = new mutable.ArrayBuilder.ofLong
  var b: mutable.ArrayBuilder.ofLong = new mutable.ArrayBuilder.ofLong
  var u: mutable.ArrayBuilder.ofLong = new mutable.ArrayBuilder.ofLong
  var v: mutable.ArrayBuilder.ofLong = new mutable.ArrayBuilder.ofLong
  var w: mutable.ArrayBuilder.ofLong = new mutable.ArrayBuilder.ofLong
  var held: Int = 0
  private var lastCompacted: Int = 0

  def add(ca: Long, cb: Long, eu: Long, ev: Long, ew: Long): Unit = {
    a += ca; b += cb; u += eu; v += ev; w += ew
    held += 1
    if (held > math.max(4096, 2 * lastCompacted)) compact()
  }

  /** Kruskal over the held edges under (w, u, v): keep tree edges only. */
  def compact(): Unit = {
    val aa = a.result(); val bb = b.result()
    val uu = u.result(); val vv = v.result(); val ww = w.result()
    val idx = Array.range(0, held)
    // sort indices by the total order (w, u, v) — deterministic, and
    // (u, v) is unique per input edge so the order is total
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      def compare(x: Integer, y: Integer): Int = {
        val i = x.intValue; val j = y.intValue
        var c = java.lang.Long.compare(ww(i), ww(j))
        if (c == 0) c = java.lang.Long.compare(uu(i), uu(j))
        if (c == 0) c = java.lang.Long.compare(vv(i), vv(j))
        c
      }
    })
    val uf = new DisjointSet
    val na = new mutable.ArrayBuilder.ofLong; val nb = new mutable.ArrayBuilder.ofLong
    val nu = new mutable.ArrayBuilder.ofLong; val nv = new mutable.ArrayBuilder.ofLong
    val nw = new mutable.ArrayBuilder.ofLong
    var kept = 0
    var k = 0
    while (k < boxed.length) {
      val i = boxed(k).intValue
      if (aa(i) != bb(i)) {
        uf.makeSet(aa(i)); uf.makeSet(bb(i))
        if (uf.find(aa(i)) != uf.find(bb(i))) {
          uf.union(aa(i), bb(i))
          na += aa(i); nb += bb(i); nu += uu(i); nv += vv(i); nw += ww(i)
          kept += 1
        }
      }
      k += 1
    }
    a = na; b = nb; u = nu; v = nv; w = nw
    held = kept
    lastCompacted = kept
  }

  def mergeFrom(other: KruskalForest): KruskalForest = {
    val oa = other.a.result(); val ob = other.b.result()
    val ou = other.u.result(); val ov = other.v.result(); val ow = other.w.result()
    var i = 0
    while (i < other.held) { add(oa(i), ob(i), ou(i), ov(i), ow(i)); i += 1 }
    this
  }

  /** The forest's original edges (u, v, w), compacted first. */
  def forest: Seq[(Long, Long, Long)] = {
    compact()
    val uu = u.result(); val vv = v.result(); val ww = w.result()
    (0 until held).map(i => (uu(i), vv(i), ww(i)))
  }
}
