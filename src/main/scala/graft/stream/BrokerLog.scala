package graft.stream

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** An executed in-sandbox broker: an offset-addressed, partitioned,
  * append-only record log exposed as a DataSource V2
  * [[MicroBatchStream]] (SURVEY S13/S13c; reference README.md:11 names
  * Kafka/Kinesis as the stream transports,
  * workflow_definition.json:77-81 "stream is processed when data
  * arrives").
  *
  * The connector jars for the real transports cannot exist in this
  * offline environment, but the part of the contract that is ENGINE
  * work — per-partition offset tracking, micro-batch planning between
  * two offset vectors, checkpointed restart recovery, and the payload
  * parse — is transport-independent. This source implements exactly
  * that contract over a directory log with broker semantics:
  *
  *   - a "topic" is a directory; partition `p` is subdirectory `p<p>`;
  *   - a record is one immutable file `<seq>.rec` (8-byte timestamp
  *     header + payload bytes), appended atomically via temp+rename,
  *     never rewritten — offsets are the contiguous sequence numbers;
  *   - `latestOffset` is a directory listing per partition;
  *     `planInputPartitions(start, end)` emits one split per broker
  *     partition covering `[start(p), end(p))` — identical planning to
  *     the Kafka source's (topic-partition, fromOffset, untilOffset);
  *   - restart recovery comes from Spark's checkpointed offset log:
  *     after a crash the stream resumes from the committed offset
  *     vector via [[BrokerOffsets.fromJson]] (proved by
  *     `BrokerLogStreamSpec`'s stop/append/restart round trip);
  *   - records are retained (broker-style), so a fresh checkpoint
  *     replays from offset zero, and `.read` (batch) scans everything.
  *
  * Schema mirrors the Kafka source's metadata+payload shape:
  * `partition INT, offset BIGINT, ts TIMESTAMP, value BINARY`; the
  * payload parse downstream is the shared
  * [[StreamSource.parseJsonPayload]], so swapping in the real
  * Kafka/Kinesis transport changes only the `.format(...)` line.
  */
object BrokerLog {

  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  private val RecordSuffix = ".rec"

  private def partDir(dir: String, partition: Int): Path =
    Paths.get(dir, s"p$partition")

  /** Append one record; returns its offset. Atomic (temp file + rename)
    * so a concurrently listing reader never observes a torn record;
    * single-writer-per-partition, like a broker partition's log head.
    */
  def append(dir: String, partition: Int, payload: Array[Byte], tsMicros: Long): Long = {
    val pd = partDir(dir, partition)
    Files.createDirectories(pd)
    val offset = nextSeq(pd)
    val body = new Array[Byte](8 + payload.length)
    val bb = java.nio.ByteBuffer.wrap(body)
    bb.putLong(tsMicros)
    bb.put(payload)
    val tmp = pd.resolve(s".tmp-$offset")
    Files.write(tmp, body)
    Files.move(tmp, pd.resolve(f"$offset%020d$RecordSuffix"),
      StandardCopyOption.ATOMIC_MOVE)
    offset
  }

  /** Append UTF-8 text records round-robin-keyed by the caller. */
  def appendText(dir: String, partition: Int, text: String, tsMicros: Long): Long =
    append(dir, partition, text.getBytes(StandardCharsets.UTF_8), tsMicros)

  private def nextSeq(pd: Path): Long = {
    val existing = listSeqs(pd)
    if (existing.isEmpty) 0L else existing.max + 1L
  }

  private def listSeqs(pd: Path): Seq[Long] =
    if (!Files.isDirectory(pd)) Nil
    else Files.list(pd).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(RecordSuffix))
      .map(n => n.dropRight(RecordSuffix.length).toLong)
      .toSeq

  /** Per-partition end offsets (one past the last record): the broker's
    * high-water mark, and the source's `latestOffset`.
    */
  def latestOffsets(dir: String): Map[Int, Long] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Map.empty
    Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.matches("p\\d+"))
      .map { pd =>
        val part = pd.getFileName.toString.drop(1).toInt
        val seqs = listSeqs(pd)
        part -> (if (seqs.isEmpty) 0L else seqs.max + 1L)
      }.toMap
  }

  /** Read one record file: (tsMicros, payload). */
  private[stream] def readRecord(dir: String, partition: Int, offset: Long): (Long, Array[Byte]) = {
    val body = Files.readAllBytes(
      partDir(dir, partition).resolve(f"$offset%020d$RecordSuffix"))
    val bb = java.nio.ByteBuffer.wrap(body)
    val ts = bb.getLong
    val payload = new Array[Byte](body.length - 8)
    bb.get(payload)
    (ts, payload)
  }
}

/** Offset vector: per-partition end offsets, JSON round-tripped through
  * Spark's checkpoint offset log. Serialization is a sorted flat object
  * (`{"0":5,"2":3}`) — deterministic, diff-friendly, and parsed without
  * any JSON library dependency.
  */
final case class BrokerOffsets(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

object BrokerOffsets {
  private val Entry = """"(\d+)"\s*:\s*(\d+)""".r
  def fromJson(s: String): BrokerOffsets =
    BrokerOffsets(Entry.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

/** One planned split: a contiguous offset range of one broker
  * partition — the exact planning granularity of the Kafka source.
  */
final case class BrokerSplit(dir: String, partition: Int, from: Long, until: Long)
  extends InputPartition

class BrokerLogProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-broker"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BrokerLog.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-broker requires option(\"path\", brokerDir)")
    new BrokerLogTable(path)
  }
}

class BrokerLogTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-broker($dir)"
  override def schema(): StructType = BrokerLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new BrokerLogScan(dir) }
}

class BrokerLogScan(dir: String) extends Scan {
  override def readSchema(): StructType = BrokerLog.schema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BrokerLogMicroBatchStream(dir)

  /** Batch read of the full retained log (offset 0 → high-water mark per
    * partition) — the replay/backfill path.
    */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      BrokerLog.latestOffsets(dir).toSeq.sortBy(_._1)
        .map { case (p, end) => BrokerSplit(dir, p, 0L, end): InputPartition }
        .toArray
    override def createReaderFactory(): PartitionReaderFactory = new BrokerReaderFactory
  }
}

class BrokerLogMicroBatchStream(dir: String) extends MicroBatchStream {

  override def initialOffset(): Offset = BrokerOffsets(Map.empty)

  override def latestOffset(): Offset = BrokerOffsets(BrokerLog.latestOffsets(dir))

  override def deserializeOffset(json: String): Offset = BrokerOffsets.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BrokerOffsets].ends
    val e = end.asInstanceOf[BrokerOffsets].ends
    // Partitions present at `end` drive the plan; a partition first seen
    // mid-stream starts from offset 0 (broker "earliest" for new
    // partitions, matching Kafka's new-partition discovery). The same
    // rule gives retirement semantics for free: a partition missing
    // from `end` (its directory retired) plans no split, the run's
    // committed vector drops it, and a later partition REUSING the id
    // is a new partition replaying from zero — Kinesis shard
    // retire/recreate, spec-asserted in BrokerLogStreamSpec.
    e.toSeq.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from) Some(BrokerSplit(dir, p, from, until): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new BrokerReaderFactory

  /** The broker retains records (replay is a feature); commit is a
    * no-op, like Kafka without consumer-group offset storage — the
    * durable progress record is Spark's own checkpoint offset log.
    */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

class BrokerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[BrokerSplit]
    new PartitionReader[InternalRow] {
      private var cur = split.from - 1
      override def next(): Boolean = { cur += 1; cur < split.until }
      override def get(): InternalRow = {
        val (ts, payload) = BrokerLog.readRecord(split.dir, split.partition, cur)
        new GenericInternalRow(Array[Any](split.partition, cur, ts, payload))
      }
      override def close(): Unit = ()
    }
  }
}
