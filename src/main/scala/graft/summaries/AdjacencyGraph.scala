package graft.summaries

import scala.collection.mutable

/** Spanner summary — re-expression of the reference's
  * `AdjacencyListGraph<K>` (GS/summaries/AdjacencyListGraph.java, BFS at
  * :~50): keeps only edges whose endpoints are currently more than k hops
  * apart, yielding a k-spanner (stretch factor k). Order-sensitive by
  * nature (like the reference) — verified by property tests, not hashes.
  */
final class AdjacencyGraph(val k: Int) extends Serializable {
  val adj: mutable.LongMap[mutable.LongMap[Unit]] = mutable.LongMap.empty

  private def nbrs(v: Long): mutable.LongMap[Unit] =
    adj.getOrElseUpdate(v, mutable.LongMap.empty)

  /** Bounded BFS: is `b` within `k` hops of `a` in the current summary? */
  def withinK(a: Long, b: Long): Boolean = {
    if (a == b) return true
    if (!adj.contains(a) || !adj.contains(b)) return false
    var frontier = List(a)
    val seen = mutable.LongMap.empty[Unit]
    seen(a) = ()
    var depth = 0
    while (depth < k && frontier.nonEmpty) {
      val next = mutable.ListBuffer.empty[Long]
      for (v <- frontier; u <- adj.getOrElse(v, mutable.LongMap.empty).keysIterator) {
        if (u == b) return true
        if (!seen.contains(u)) { seen(u) = (); next += u }
      }
      frontier = next.toList
      depth += 1
    }
    false
  }

  /** Add edge only if the summary distance exceeds k
    * (GS/library/Spanner.java:~40).
    */
  def addEdgeIfFar(a: Long, b: Long): Unit =
    if (!withinK(a, b)) { nbrs(a)(b) = (); nbrs(b)(a) = () }

  /** Unconditional insert — codec decode only (exact structural rebuild,
    * no distance check).
    */
  private[summaries] def addEdgeRaw(a: Long, b: Long): Unit = { nbrs(a)(b) = (); nbrs(b)(a) = () }

  def mergeFrom(other: AdjacencyGraph): AdjacencyGraph = {
    for ((v, ns) <- other.adj; u <- ns.keysIterator; if v < u)
      addEdgeIfFar(v, u)
    this
  }

  def edgeList: Seq[(Long, Long)] =
    (for ((v, ns) <- adj.toSeq; u <- ns.keysIterator; if v < u) yield (v, u)).sorted
}
