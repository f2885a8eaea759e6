package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The pluggable resumable-source seam (O27). The reference ingests edge
  * streams from text files and sockets (GS example mains, each `:~30`);
  * a production deployment ingests from a log bus. What makes a source
  * SAFE to resume is one contract, and this trait names it so operators
  * and harnesses depend on the contract, not a concrete connector:
  *
  *   - the source exposes a totally-ordered **offset** per partition of
  *     the external system (file index, Kafka partition offset, chunk
  *     sequence number);
  *   - `load` returns the canonical edge schema `(src, dst, value, ts)`
  *     as an UNBOUNDED streaming DataFrame whose underlying Spark source
  *     records consumed offsets in the query checkpoint's offset log;
  *   - re-reading any committed offset range yields the SAME rows
  *     (replayability) — so a query restarted from its checkpoint
  *     continues with no duplicated and no lost edges.
  *
  * Implementations: [[CsvDirEdgeSource]] (append-only directory; offsets
  * = consumed file names — the offline stand-in), [[EdgeBusSource]] (the
  * in-process DataSource-V2 log bus below — the seam's test double,
  * proving the offset contract end-to-end through Spark's own
  * MicroBatchStream machinery), and [[KafkaEdgeSource]] (the real log
  * bus; requires the `spark-sql-kafka` connector jar on the cluster —
  * absent in this offline container, so it is construction-only here).
  */
trait ResumableEdgeSource {
  /** Canonical-schema streaming edges; resuming from a checkpoint must
    * continue exactly past the committed offsets (no dup, no loss). */
  def load(spark: SparkSession): DataFrame
  /** What one offset identifies in the external system. */
  def offsetSemantics: String
}

/** Append-only CSV directory: the offset log records consumed FILES. */
case class CsvDirEdgeSource(dir: String, sep: String = ",") extends ResumableEdgeSource {
  override def load(spark: SparkSession): DataFrame = Sources.csvEdgeStream(spark, dir, sep)
  override def offsetSemantics: String =
    "one offset entry per consumed file path; files are immutable once written"
}

/** In-process log bus (DSv2, [[ChunkedEdgeSourceProvider]]): offsets are
  * chunk sequence numbers, exactly Kafka's per-partition offset shape. */
case class EdgeBusSource(topic: String) extends ResumableEdgeSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream.format(classOf[ChunkedEdgeSourceProvider].getName)
      .option("topic", topic).load()
  override def offsetSemantics: String =
    "offset N = first unconsumed chunk; a batch covers chunks [start, end)"
}

/** The real log bus. One reader swap against [[EdgeBusSource]] — every
  * operator consumes the canonical schema, not the source. Offsets are
  * per-topic-partition positions recorded by Spark's Kafka source in the
  * checkpoint offset log; one Spark input partition per topic partition.
  * Needs the `spark-sql-kafka-0-10` jar (not in this offline container).
  */
case class KafkaEdgeSource(brokers: String, topic: String,
                           startingOffsets: String = "earliest") extends ResumableEdgeSource {
  override def load(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(from_csv(col("value").cast("string"),
          Sources.edgeSchema, Map.empty[String, String]).as("e"),
        col("timestamp"))
      .select(col("e.src"), col("e.dst"),
        coalesce(col("e.value"), lit(1.0)).as("value"),
        coalesce(col("e.ts"), col("timestamp")).as("ts"))
  override def offsetSemantics: String =
    "per-topic-partition Kafka offsets, committed to the checkpoint offset log"
}

/** Driver-side registry backing the in-process log bus: an append-only
  * sequence of immutable edge chunks per topic (a single-partition topic
  * with chunk-granular offsets). Executors read chunks by index — in
  * local mode the registry is in the same JVM; a real connector performs
  * the external fetch at exactly this point in [[ChunkedEdgeReader]]
  * (Kafka's PartitionReader owns a consumer and seeks to the offset).
  * Commit callbacks are recorded so tests can assert Spark drives the
  * full offset lifecycle, not just the happy read path.
  */
object ChunkedEdgeBus {
  /** (src, dst, value, tsMicros) — InternalRow-ready. */
  type EdgeRec = (Long, Long, Double, Long)
  private val topics = new ConcurrentHashMap[String, ArrayBuffer[Array[EdgeRec]]]()
  private val committed = new ConcurrentHashMap[String, Long]()

  def append(topic: String, rows: Seq[EdgeRec]): Unit = {
    val buf = topics.computeIfAbsent(topic, _ => ArrayBuffer.empty)
    buf.synchronized { buf += rows.toArray }
  }
  def chunkCount(topic: String): Long = {
    val buf = topics.get(topic)
    if (buf == null) 0L else buf.synchronized { buf.length.toLong }
  }
  def chunk(topic: String, i: Int): Array[EdgeRec] = {
    val buf = topics.get(topic)
    require(buf != null, s"edge-bus topic '$topic' does not exist")
    buf.synchronized { buf(i) }
  }
  def recordCommit(topic: String, upTo: Long): Unit =
    committed.merge(topic, upTo, (a, b) => math.max(a, b))
  /** Highest chunk offset Spark has committed for `topic` (-1 if none). */
  def lastCommitted(topic: String): Long = committed.getOrDefault(topic, -1L)
  def drop(topic: String): Unit = { topics.remove(topic); committed.remove(topic) }
}

/** Offset = number of chunks fully consumed (first unconsumed index). */
case class ChunkOffset(chunk: Long) extends Offset {
  override def json: String = s"""{"chunk":$chunk}"""
}
object ChunkOffset {
  def parse(json: String): ChunkOffset = ChunkOffset(json.filter(_.isDigit).toLong)
}

case class ChunkPartition(topic: String, idx: Int) extends InputPartition

/** DataSource V2 provider for the in-process log bus — registered by
  * class name (`spark.readStream.format(classOf[...].getName)`), the
  * standard DSv2 discovery path. MICRO_BATCH_READ only: this is an
  * unbounded source.
  */
class ChunkedEdgeSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Sources.edgeSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChunkedEdgeTable(properties.get("topic"))
}

class ChunkedEdgeTable(topic: String) extends Table with SupportsRead {
  require(topic != null && topic.nonEmpty, "edge-bus source requires option 'topic'")
  override def name(): String = s"graft_edge_bus($topic)"
  override def schema(): StructType = Sources.edgeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new ChunkedEdgeScan(topic) }
}

class ChunkedEdgeScan(topic: String) extends Scan {
  override def readSchema(): StructType = Sources.edgeSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChunkedEdgeMicroBatchStream(topic)
}

/** The offset lifecycle a Kafka implementation would mirror 1:1:
  * `initialOffset` (earliest), `latestOffset` (what exists now),
  * `planInputPartitions(start, end)` (the replayable half-open range a
  * batch covers — called again with the SAME range on restart recovery),
  * `deserializeOffset` (checkpoint log replay), `commit` (batch durably
  * processed; a real source may garbage-collect below it).
  */
class ChunkedEdgeMicroBatchStream(topic: String) extends MicroBatchStream {
  override def initialOffset(): Offset = ChunkOffset(0L)
  override def latestOffset(): Offset = ChunkOffset(ChunkedEdgeBus.chunkCount(topic))
  override def deserializeOffset(json: String): Offset = ChunkOffset.parse(json)
  override def commit(end: Offset): Unit =
    ChunkedEdgeBus.recordCommit(topic, end.asInstanceOf[ChunkOffset].chunk)
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChunkOffset].chunk
    val e = end.asInstanceOf[ChunkOffset].chunk
    (s until e).map(i => ChunkPartition(topic, i.toInt)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = ChunkedEdgeReaderFactory
}

object ChunkedEdgeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ChunkedEdgeReader(partition.asInstanceOf[ChunkPartition])
}

class ChunkedEdgeReader(p: ChunkPartition) extends PartitionReader[InternalRow] {
  private val rows = ChunkedEdgeBus.chunk(p.topic, p.idx)
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows.length }
  override def get(): InternalRow = {
    val (src, dst, value, tsMicros) = rows(i)
    new GenericInternalRow(Array[Any](src, dst, value, tsMicros))
  }
  override def close(): Unit = ()
}
