package graft.summaries

import scala.reflect.classTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.ScalaReflection
import org.apache.spark.sql.catalyst.encoders.{Codec, ExpressionEncoder}
import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.TransformingEncoder

/** Compact, product-encoded wire formats for the mutable graph summaries.
  *
  * The summaries (union-find, parity union-find, spanner adjacency) stay
  * mutable objects inside a partition — `Aggregator.reduce` mutates in
  * place per edge. Serialization only happens at partition boundaries
  * (partial → merge shuffle), and THERE the format matters at scale: the
  * previous `Encoders.javaSerialization` round-tripped a
  * `mutable.LongMap`-backed object graph through Java serialization
  * (SURVEY §7 hard-part #1 flagged exactly this). These codecs instead
  * encode each summary as parallel primitive `Array[Long]` columns —
  * sorted ids + parent + size — via Spark's `TransformingEncoder`, so the
  * shuffled bytes are a Catalyst struct of packed long arrays
  * (~24 B/vertex, no object headers, no class descriptors) and stay
  * Tungsten-managed.
  *
  * Reference: the summaries re-express GS/summaries/DisjointSet.java and
  * GS/summaries/Candidates.java; the wire format is ours (the reference
  * relies on Flink's TupleSerializer).
  */
object SummaryCodecs {

  /** Union-find as parallel arrays: `ids` sorted ascending; `parent(i)` /
    * `size(i)` correspond to `ids(i)`.
    */
  final case class UnionFindRows(ids: Array[Long], parent: Array[Long], size: Array[Long])

  /** Parity union-find: as [[UnionFindRows]] plus the relative 2-coloring
    * bit per vertex and the absorbing odd-cycle flag.
    */
  final case class ParityRows(
      ids: Array[Long], parent: Array[Long], parity: Array[Long],
      size: Array[Long], conflict: Boolean)

  /** Spanner adjacency as a canonical (src < dst) edge list. */
  final case class SpannerRows(k: Int, src: Array[Long], dst: Array[Long])

  /** Partial MSF as parallel arrays: contracted keys (a, b) the
    * union-find runs on plus the original (u, v, w) the forest reports.
    * Compacted before encoding, so the wire format is ≤ forest-sized.
    */
  final case class ForestRows(a: Array[Long], b: Array[Long],
      u: Array[Long], v: Array[Long], w: Array[Long])

  private def sortedKeys(m: scala.collection.mutable.LongMap[_]): Array[Long] = {
    val ids = new Array[Long](m.size)
    var i = 0
    m.foreachKey { k => ids(i) = k; i += 1 }
    java.util.Arrays.sort(ids)
    ids
  }

  class DisjointSetCodec extends Codec[DisjointSet, UnionFindRows] {
    override def encode(ds: DisjointSet): UnionFindRows = {
      val ids = sortedKeys(ds.parent)
      val n = ids.length
      val par = new Array[Long](n)
      val sz = new Array[Long](n)
      var i = 0
      while (i < n) { par(i) = ds.parent(ids(i)); sz(i) = ds.treeSize(ids(i)); i += 1 }
      UnionFindRows(ids, par, sz)
    }
    override def decode(r: UnionFindRows): DisjointSet = {
      val ds = new DisjointSet
      var i = 0
      while (i < r.ids.length) {
        ds.parent(r.ids(i)) = r.parent(i); ds.treeSize(r.ids(i)) = r.size(i); i += 1
      }
      ds
    }
  }

  class ParityDisjointSetCodec extends Codec[ParityDisjointSet, ParityRows] {
    override def encode(ds: ParityDisjointSet): ParityRows = {
      val ids = sortedKeys(ds.parent)
      val n = ids.length
      val par = new Array[Long](n)
      val parity = new Array[Long](n)
      val sz = new Array[Long](n)
      var i = 0
      while (i < n) {
        par(i) = ds.parent(ids(i)); parity(i) = ds.par(ids(i)).toLong
        sz(i) = ds.treeSize(ids(i)); i += 1
      }
      ParityRows(ids, par, parity, sz, ds.conflict)
    }
    override def decode(r: ParityRows): ParityDisjointSet = {
      val ds = new ParityDisjointSet
      var i = 0
      while (i < r.ids.length) {
        ds.parent(r.ids(i)) = r.parent(i); ds.par(r.ids(i)) = r.parity(i).toInt
        ds.treeSize(r.ids(i)) = r.size(i); i += 1
      }
      ds.conflict = r.conflict
      ds
    }
  }

  class AdjacencyGraphCodec extends Codec[AdjacencyGraph, SpannerRows] {
    override def encode(g: AdjacencyGraph): SpannerRows = {
      val src = scala.collection.mutable.ArrayBuilder.make[Long]
      val dst = scala.collection.mutable.ArrayBuilder.make[Long]
      g.adj.foreach { case (v, ns) =>
        ns.foreachKey { u => if (v < u) { src += v; dst += u } }
      }
      SpannerRows(g.k, src.result(), dst.result())
    }
    override def decode(r: SpannerRows): AdjacencyGraph = {
      val g = new AdjacencyGraph(r.k)
      var i = 0
      while (i < r.src.length) { g.addEdgeRaw(r.src(i), r.dst(i)); i += 1 }
      g
    }
  }

  class KruskalForestCodec extends Codec[KruskalForest, ForestRows] {
    override def encode(f: KruskalForest): ForestRows = {
      f.compact()
      // result() consumes the builders — restore them so the buffer
      // object stays usable if the runtime encodes mid-aggregation
      val (aa, bb, uu, vv, ww) =
        (f.a.result(), f.b.result(), f.u.result(), f.v.result(), f.w.result())
      val restored = new KruskalForest
      var i = 0
      while (i < aa.length) {
        restored.a += aa(i); restored.b += bb(i); restored.u += uu(i)
        restored.v += vv(i); restored.w += ww(i); i += 1
      }
      f.a = restored.a; f.b = restored.b; f.u = restored.u
      f.v = restored.v; f.w = restored.w
      ForestRows(aa, bb, uu, vv, ww)
    }
    override def decode(r: ForestRows): KruskalForest = {
      val f = new KruskalForest
      var i = 0
      while (i < r.a.length) { f.add(r.a(i), r.b(i), r.u(i), r.v(i), r.w(i)); i += 1 }
      f
    }
  }

  private def transforming[B, S](codec: () => Codec[B, S])(
      implicit bt: scala.reflect.ClassTag[B], st: scala.reflect.runtime.universe.TypeTag[S]): Encoder[B] =
    ExpressionEncoder(
      TransformingEncoder(classTag[B](bt), ScalaReflection.encoderFor[S], () => codec(), false))

  /** `DisjointSet` ⇔ struct<ids:array<bigint>, parent:array<bigint>, size:array<bigint>> */
  def disjointSetEncoder: Encoder[DisjointSet] =
    transforming[DisjointSet, UnionFindRows](() => new DisjointSetCodec)

  def parityDisjointSetEncoder: Encoder[ParityDisjointSet] =
    transforming[ParityDisjointSet, ParityRows](() => new ParityDisjointSetCodec)

  def adjacencyGraphEncoder: Encoder[AdjacencyGraph] =
    transforming[AdjacencyGraph, SpannerRows](() => new AdjacencyGraphCodec)

  /** `KruskalForest` ⇔ struct of five packed long arrays. */
  def kruskalForestEncoder: Encoder[KruskalForest] =
    transforming[KruskalForest, ForestRows](() => new KruskalForestCodec)
}
