package graft.summaries

import scala.collection.mutable

/** Bipartiteness summary — re-expression of the reference's `Candidates` +
  * `SignedVertex` structures (GS/summaries/Candidates.java:~60–180): a
  * union-find where each vertex carries a parity (its 2-coloring side)
  * relative to its parent. An edge whose endpoints land in the same
  * component with equal parity is an odd cycle ⇒ not bipartite; the
  * `conflict` flag is absorbing, exactly like the reference's failed
  * candidates state.
  */
final class ParityDisjointSet extends Serializable {
  val parent: mutable.LongMap[Long] = mutable.LongMap.empty
  /** parity of x relative to parent(x): 0 = same side, 1 = opposite. */
  val par: mutable.LongMap[Int] = mutable.LongMap.empty
  val treeSize: mutable.LongMap[Long] = mutable.LongMap.empty
  var conflict: Boolean = false

  def makeSet(x: Long): Unit =
    if (!parent.contains(x)) { parent(x) = x; par(x) = 0; treeSize(x) = 1L }

  /** (root, parity of x relative to root), with path compression. */
  def find(x: Long): (Long, Int) = {
    var root = x
    var p = 0
    while (parent(root) != root) { p ^= par(root); root = parent(root) }
    // compress: point everything on the path at root with absolute parity
    var cur = x
    var curP = p
    while (parent(cur) != root) {
      val next = parent(cur); val nextP = curP ^ par(cur)
      parent(cur) = root; par(cur) = curP
      cur = next; curP = nextP
    }
    (root, p)
  }

  /** Add the constraint parity(a) XOR parity(b) == rel (an edge is rel=1). */
  def unionWithParity(a: Long, b: Long, rel: Int): Unit = {
    makeSet(a); makeSet(b)
    val (ra, pa) = find(a); val (rb, pb) = find(b)
    if (ra == rb) {
      if ((pa ^ pb) != rel) conflict = true
    } else {
      val relRoots = pa ^ pb ^ rel // parity of rb relative to ra
      if (treeSize(ra) >= treeSize(rb)) {
        parent(rb) = ra; par(rb) = relRoots; treeSize(ra) += treeSize(rb)
      } else {
        parent(ra) = rb; par(ra) = relRoots; treeSize(rb) += treeSize(ra)
      }
    }
  }

  def addEdge(src: Long, dst: Long): Unit = unionWithParity(src, dst, 1)

  /** Replay the other summary's (vertex, root, parity) constraints. */
  def mergeFrom(other: ParityDisjointSet): ParityDisjointSet = {
    conflict ||= other.conflict
    if (!conflict) {
      other.parent.foreachKey { v =>
        val (r, p) = other.find(v)
        if (v != r) unionWithParity(v, r, p)
        else makeSet(v)
      }
    }
    this
  }

  def isBipartite: Boolean = !conflict
}
