package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the binary trace-file format (SURVEY §2.1
  * S6) — the idiomatic Spark rendering of the reference's trace-file
  * reader (`/root/reference/trace-reader/src/loader.rs:10-135`):
  *
  * {{{
  * spark.read.format("trace-file").load(path)
  * }}}
  *
  * Planning splits the fixed-stride event records into event-range input
  * partitions sized on the driver from the header alone; each task opens
  * the file once and seeks directly to its slice. COLUMN PRUNING is
  * pushed into the reader: when `channels` isn't required (e.g. a
  * timestamp bisect or a count), each record read is 8 bytes + a seek
  * instead of the full multi-KB payload — the physical analogue of a
  * parquet scan skipping column chunks.
  *
  * [[TraceFile.load]] remains the typed-Dataset path; this connector is
  * the `spark.read` surface with pruning and split planning.
  */
class TraceFileSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "trace-file"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TraceFileSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("trace-file source requires a path"))
    new TraceFileTable(path)
  }
}

object TraceFileSource {
  val schema: StructType = StructType(Seq(
    StructField("event_index", LongType, nullable = false),
    StructField("timestamp_ns", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField(
      "channels",
      ArrayType(
        StructType(Seq(
          StructField("channel", LongType, nullable = false),
          StructField("voltage", ArrayType(IntegerType, containsNull = false), nullable = false))),
        containsNull = false),
      nullable = false)))
}

private[sources] class TraceFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"trace-file($path)"
  override def schema(): StructType = TraceFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TraceFileScanBuilder(path)
}

private[sources] class TraceFileScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = TraceFileSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of projection order
    required = StructType(
      TraceFileSource.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new TraceFileScan(path, required)
}

private[sources] class TraceFileScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TraceFileScan(path=$path, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val header = TraceFile.readHeader(path)
    // target ~16 MiB of payload per split, at least one event each
    val perSplit = math.max(1L, (16L << 20) / math.max(1L, header.eventBytes))
    (0L until header.nEvents.toLong by perSplit).map { start =>
      TraceFilePartition(
        path,
        start,
        math.min(start + perSplit, header.nEvents.toLong)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TraceFileReaderFactory(required.fieldNames)
}

private[sources] final case class TraceFilePartition(path: String, start: Long, end: Long)
    extends InputPartition

private[sources] class TraceFileReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TraceFilePartition]
    new TraceFilePartitionReader(p, columns)
  }
}

/** One open channel per task; sequential stride reads over the slice.
  * When `channels` isn't in the projection only the 8-byte timestamp is
  * read per record and the payload is skipped by seek.
  */
private[sources] class TraceFilePartitionReader(
    partition: TraceFilePartition,
    columns: Array[String])
    extends PartitionReader[InternalRow] {

  private val header = TraceFile.readHeader(partition.path)
  private val sampleRate = math.round(1e9 / header.sampleTimeNs)
  private val needChannels = columns.contains("channels")
  private val needTimestamp = columns.contains("timestamp_ns")
  private val ch = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(partition.path))
  private var index = partition.start
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (index >= partition.end) return false
    val base = header.headerBytes + index * header.eventBytes
    val payload = header.eventBytes.toInt - 8
    var ts = 0L
    var channels: GenericArrayData = null
    if (needTimestamp || needChannels) {
      ch.position(base)
      val want = if (needChannels) 8 + payload else 8
      val buf = java.nio.ByteBuffer.allocate(want)
      var read = 0
      while (read < want) {
        val n = ch.read(buf)
        if (n < 0) throw new java.io.EOFException(s"truncated event $index in ${partition.path}")
        read += n
      }
      buf.flip()
      ts = buf.getLong
      if (needChannels) {
        channels = new GenericArrayData(Array.tabulate[Any](header.nChannels) { c =>
          val voltage = Array.fill(header.nSamples)(buf.getShort.toInt & 0xffff)
          new GenericInternalRow(Array[Any](c.toLong, new GenericArrayData(voltage)))
        })
      }
    }
    val values = columns.map {
      case "event_index" => index: Any
      case "timestamp_ns" => ts: Any
      case "sample_rate" => sampleRate: Any
      case "channels" => channels: Any
    }
    row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    index += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit = ch.close()
}
