package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources
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

  /** Writes carry the query's own schema (`event_index` is derived on
    * READ from the record position — a writing frame doesn't have it);
    * external metadata lets Spark validate the incoming frame against
    * itself, and [[TraceFileBatchWrite]] enforces the columns the format
    * actually needs.
    */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // `load(p)` arrives as the 'path' property; `load(p1, p2, ...)` as a
    // 'paths' JSON array — accept both (each entry may be a file or a
    // directory of .gtf files)
    val multi = Option(properties.get("paths")).map { json =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(json, classOf[Array[String]])
        .toSeq
    }
    val single = Option(properties.get("path")).map(Seq(_))
    val paths = (multi, single) match {
      case (Some(m), Some(s)) => m ++ s
      case (m, s) =>
        m.orElse(s).getOrElse(
          throw new IllegalArgumentException("trace-file source requires a path"))
    }
    new TraceFileTable(paths, Option(schema).getOrElse(TraceFileSource.schema))
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

private[sources] class TraceFileTable(paths: Seq[String], tableSchema: StructType)
    extends Table
    with SupportsRead
    with SupportsWrite {
  override def name(): String = s"trace-file(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // supportsExternalMetadata exists for the WRITE side (the incoming
    // frame's own schema); reads always produce the canonical schema, so
    // a user-specified read schema would be silently ignored — reject it
    // up front instead
    require(
      tableSchema == TraceFileSource.schema,
      "trace-file reads do not support a user-specified schema; " +
        "omit .schema(...) — the source reports its own")
    new TraceFileScanBuilder(paths)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(
      paths.length == 1,
      s"trace-file writes target exactly one directory, got: ${paths.mkString(",")}")
    new TraceFileWriteBuilder(paths.head, info)
  }
}

private[sources] class TraceFileScanBuilder(paths: Seq[String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = TraceFileSource.schema
  private var tsLower: Option[Long] = None
  private var tsUpper: Option[Long] = None
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of projection order
    required = StructType(
      TraceFileSource.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** Timestamp-range predicates prune the planned event range via the O4
    * bisect (records are in capture/timestamp order — the same contract
    * the reference's offset search relies on). Pushdown is INEXACT: the
    * bounds narrow the scan, and every filter is also returned as a
    * residual so Spark re-applies it — correct even on an unsorted file.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    def widen(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    filters.foreach {
      case sources.GreaterThan("timestamp_ns", v) =>
        widen(v).foreach(l => { tsLower = Some(tsLower.fold(l)(math.max(_, l))); pushed :+= sources.GreaterThan("timestamp_ns", v) })
      case sources.GreaterThanOrEqual("timestamp_ns", v) =>
        widen(v).foreach(l => { tsLower = Some(tsLower.fold(l)(math.max(_, l))); pushed :+= sources.GreaterThanOrEqual("timestamp_ns", v) })
      case sources.LessThan("timestamp_ns", v) =>
        widen(v).foreach(l => { tsUpper = Some(tsUpper.fold(l)(math.min(_, l))); pushed :+= sources.LessThan("timestamp_ns", v) })
      case sources.LessThanOrEqual("timestamp_ns", v) =>
        widen(v).foreach(l => { tsUpper = Some(tsUpper.fold(l)(math.min(_, l))); pushed :+= sources.LessThanOrEqual("timestamp_ns", v) })
      case sources.EqualTo("timestamp_ns", v) =>
        widen(v).foreach { l =>
          tsLower = Some(tsLower.fold(l)(math.max(_, l)))
          tsUpper = Some(tsUpper.fold(l)(math.min(_, l)))
          pushed :+= sources.EqualTo("timestamp_ns", v)
        }
      case _ => ()
    }
    filters // all residual: the range prune is advisory, Spark re-filters
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = new TraceFileScan(paths, required, tsLower, tsUpper)
}

private[sources] class TraceFileScan(
    paths: Seq[String],
    required: StructType,
    tsLower: Option[Long] = None,
    tsUpper: Option[Long] = None)
    extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TraceFileScan(paths=${paths.mkString(",")}, columns=${required.fieldNames.mkString(",")}," +
      s" tsRange=[${tsLower.getOrElse("-inf")}, ${tsUpper.getOrElse("+inf")}])"

  /** First index with timestamp ≥ target. Probes read ONLY the 8-byte
    * timestamp — planning latency is log(n) × 8 B, independent of
    * payload size. Requires the format's timestamp-order invariant
    * (enforced by [[TraceFile.write]]); the residual filters keep
    * results correct, though a foreign unsorted file may under-scan —
    * the same trust a parquet reader puts in writer-produced stats.
    */
  private def bisect(file: String, header: TraceFile.Header, target: Long): Long = {
    val ch = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(file))
    try {
      var lo = 0L
      var hi = header.nEvents.toLong
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (TraceFile.readTimestamp(ch, header, mid) < target) lo = mid + 1 else hi = mid
      }
      lo
    } finally ch.close()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // a capture deployment produces a DIRECTORY of trace files — plan
    // per file (headers are a few hundred bytes each on the driver)
    paths.flatMap(TraceFileScan.resolveFiles).flatMap { file =>
      val header = TraceFile.readHeader(file)
      // timestamp bounds → event-range prune, O(log n) 8-byte probes on
      // the driver (conservative: >= lower, <= upper; residual filter
      // handles strictness)
      val lo = tsLower.map(bisect(file, header, _)).getOrElse(0L)
      // saturate: u + 1 for u == MaxValue would wrap negative and plan
      // zero partitions for a filter that matches everything
      val hi = tsUpper
        .map(u =>
          if (u == Long.MaxValue) header.nEvents.toLong else bisect(file, header, u + 1L))
        .getOrElse(header.nEvents.toLong)
      // target ~16 MiB of payload per split, at least one event each
      val perSplit = math.max(1L, (16L << 20) / math.max(1L, header.eventBytes))
      (lo until hi by perSplit).map { start =>
        TraceFilePartition(file, start, math.min(start + perSplit, hi)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TraceFileReaderFactory(required.fieldNames)
}

private[sources] object TraceFileScan {
  /** A file path as-is; a directory expands to its `.gtf` files sorted
    * by name (capture tools name files in time order).
    */
  def resolveFiles(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      import scala.jdk.CollectionConverters._
      val stream = java.nio.file.Files.list(p)
      try stream
        .iterator()
        .asScala
        .filter(_.getFileName.toString.endsWith(".gtf"))
        .map(_.toString)
        .toSeq
        .sorted
      finally stream.close()
    } else Seq(path)
  }
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
  // one reusable buffer; full-payload reads are SEQUENTIAL (records are
  // contiguous — position once, then stream), timestamp-only reads seek
  // per record but still reuse the 8-byte buffer
  private val want = if (needChannels) header.eventBytes.toInt else 8
  private val buf = java.nio.ByteBuffer.allocate(math.max(want, 8))
  private var positioned = false
  private var index = partition.start
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (index >= partition.end) return false
    var ts = 0L
    var channels: GenericArrayData = null
    if (needTimestamp || needChannels) {
      if (needChannels) {
        if (!positioned) {
          ch.position(header.headerBytes + index * header.eventBytes)
          positioned = true
        } // sequential from here on
      } else {
        ch.position(header.headerBytes + index * header.eventBytes)
      }
      buf.clear().limit(want)
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

/** Write side of the connector (`df.write.format("trace-file").save(dir)`):
  * one `.gtf` file per non-empty input partition, streamed through
  * [[TraceFile.IncrementalWriter]] — a task never buffers its partition.
  *
  * Commit protocol: tasks write dot-prefixed temp files (invisible to the
  * reader's `.gtf` glob); the DRIVER's job commit renames every committed
  * temp to its final name — and, for overwrite, deletes the previous
  * `.gtf` set first — so a failed job leaves the target either untouched
  * or fully replaced, never interleaved. Aborted tasks delete their temps.
  *
  * Input contract (fail-closed in the task): `timestamp_ns` non-decreasing
  * within each partition (`sortWithinPartitions("timestamp_ns")`), uniform
  * channel/sample shape — the format's fixed-stride + bisect invariants.
  * `sample_time_ns` comes from the writer option of that name (default:
  * derived from a `sample_rate` column when present — which must then be
  * a positive value in the first row of each partition, fail-closed —
  * else 1.0).
  *
  * DEPLOYMENT contract: driver and executors must share the target
  * filesystem (local mode, NFS, or any shared mount) — the commit
  * protocol promotes executor-written temps with driver-local renames.
  * This is verified, not assumed: the driver drops a visibility probe
  * next to the temps and every task fails fast when it cannot see it,
  * instead of the job "succeeding" with nothing promoted.
  */
private[sources] class TraceFileWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder
    with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TraceFileBatchWrite(path, info.schema(), info.options(), doTruncate, info.queryId())
  }
}

private[sources] final case class TraceFileCommit(tmpPath: String, finalPath: String)
    extends WriterCommitMessage

private[sources] class TraceFileBatchWrite(
    path: String,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    truncate: Boolean,
    queryId: String)
    extends BatchWrite {

  private val probeName = s".graft-fs-probe-$queryId"

  require(
    schema.fieldNames.contains("timestamp_ns") && schema.fieldNames.contains("channels"),
    s"trace-file writes need timestamp_ns and channels columns, got: ${schema.fieldNames.mkString(",")}")
  // types too — a mistyped frame would otherwise be reinterpreted into
  // silently corrupt bytes by the ordinal-based InternalRow getters
  require(
    schema(schema.fieldIndex("timestamp_ns")).dataType == LongType,
    s"timestamp_ns must be BIGINT, got ${schema(schema.fieldIndex("timestamp_ns")).dataType}")
  schema(schema.fieldIndex("channels")).dataType match {
    // nullability is irrelevant to the byte layout — match element types
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("channel") && st.fieldNames.contains("voltage") &&
          st(st.fieldIndex("channel")).dataType == LongType &&
          (st(st.fieldIndex("voltage")).dataType match {
            case ArrayType(IntegerType, _) => true
            case _ => false
          }) => ()
    case other =>
      throw new IllegalArgumentException(
        s"channels must be array<struct<channel: bigint, voltage: array<int>>>, got $other")
  }
  require(
    !schema.fieldNames.contains("sample_rate") ||
      schema(schema.fieldIndex("sample_rate")).dataType == LongType,
    "sample_rate must be BIGINT when present")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    // shared-filesystem visibility probe: the commit below promotes
    // executor-written temps with DRIVER-local renames, which on a
    // cluster with executor-local disks would silently promote nothing.
    // Every task checks this driver-written marker and fails fast with
    // the deployment contract instead (ADVICE r5).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path).resolve(probeName), "")
    val sampleTimeNs =
      Option(options.get("sample_time_ns")).map(_.toDouble)
    new TraceFileWriterFactory(path, schema, sampleTimeNs, queryId, probeName)
  }

  /** Job commit: promote the new files FIRST, then (for truncate) delete
    * the superseded set, then sweep stale temps. A driver crash
    * mid-commit can briefly leave BOTH file sets visible — duplication a
    * re-run resolves — but never an empty directory: data is not lost in
    * any crash window. The sweep also clears `.part-*.tmp` leftovers
    * from jobs that died before abort ran (the directory has a single
    * writer by contract, so any temp not in this commit is stale).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    val committed = messages.collect {
      // empty-partition sentinel (tmpPath == "") carries no file
      case TraceFileCommit(tmp, fin) if tmp.nonEmpty =>
        val src = java.nio.file.Paths.get(tmp)
        // the probe check in the task should make this unreachable, but
        // a temp that vanished between task and job commit must fail the
        // job loudly, never "succeed" with files missing
        require(
          java.nio.file.Files.exists(src),
          s"committed temp $tmp is not visible to the driver — trace-file " +
            "writes require a filesystem shared between driver and executors")
        if (truncate)
          java.nio.file.Files.move(
            src,
            java.nio.file.Paths.get(fin),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else
          // non-truncate commits never clobber: file names carry the
          // queryId, so a collision means something is wrong — throws
          // FileAlreadyExistsException instead of destroying data
          java.nio.file.Files.move(src, java.nio.file.Paths.get(fin))
        java.nio.file.Paths.get(fin).getFileName.toString
    }.toSet
    val stream = java.nio.file.Files.list(dir)
    try {
      stream.iterator().asScala.foreach { f =>
        val name = f.getFileName.toString
        val superseded = truncate && name.endsWith(".gtf") && !committed.contains(name)
        // sweep scope is mode-dependent: truncate owns the whole
        // directory (it just replaced every .gtf), so it clears ALL
        // stale temps and probes; append sweeps only THIS job's
        // artifacts — a concurrent append's live temps and probe carry a
        // different queryId and deleting them would fail that job with a
        // phantom "filesystem not shared" diagnosis. Foreign leftovers
        // from crashed append jobs stay (dot-prefixed — invisible to the
        // reader) until the next truncate write clears them.
        val tmp = name.startsWith(".part-") && name.endsWith(".tmp")
        val probe = name.startsWith(".graft-fs-probe-")
        val mine = name.contains(queryId)
        if (superseded || ((tmp || probe) && (truncate || mine)))
          java.nio.file.Files.deleteIfExists(f)
      }
    } finally stream.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case TraceFileCommit(tmp, _) if tmp.nonEmpty =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      case _ => ()
    }
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path).resolve(probeName))
  }
}

private[sources] class TraceFileWriterFactory(
    path: String,
    schema: StructType,
    sampleTimeNs: Option[Double],
    queryId: String,
    probeName: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TraceFileDataWriter(path, schema, sampleTimeNs, partitionId, taskId, queryId, probeName)
}

private[sources] class TraceFileDataWriter(
    path: String,
    schema: StructType,
    sampleTimeNsOpt: Option[Double],
    partitionId: Int,
    taskId: Long,
    queryId: String,
    probeName: String)
    extends DataWriter[InternalRow] {

  // the driver dropped this marker in createBatchWriterFactory; a task
  // that cannot see it is writing to a DIFFERENT filesystem than the one
  // the driver will promote temps on — fail the job now, not silently
  // after "success" (ADVICE r5)
  require(
    java.nio.file.Files.exists(java.nio.file.Paths.get(path).resolve(probeName)),
    s"target $path is not visible from this executor — trace-file writes " +
      "require a filesystem shared between driver and executors (local " +
      "mode or a shared mount such as NFS/object-store gateway)")

  private val tsIdx = schema.fieldIndex("timestamp_ns")
  private val chIdx = schema.fieldIndex("channels")
  private val srIdx =
    if (schema.fieldNames.contains("sample_rate")) Some(schema.fieldIndex("sample_rate")) else None
  // the channels struct carries the query's own field ORDER (external
  // metadata) — resolve ordinals by name, never assume (channel, voltage)
  private val chStruct = schema(chIdx).dataType match {
    case ArrayType(st: StructType, _) => st
    case other =>
      throw new IllegalArgumentException(
        s"trace-file writes need channels: array<struct<channel,voltage>>, got $other")
  }
  private val chFieldIdx = chStruct.fieldIndex("channel")
  private val voltFieldIdx = chStruct.fieldIndex("voltage")

  // job-unique names: taskId restarts from 0 in every new SparkContext,
  // so partitionId+taskId alone would regenerate the same names across
  // applications and mode("append") would clobber earlier files via the
  // commit rename (ADVICE r5) — the queryId disambiguates per write job
  private val finalName = f"part-$partitionId%05d-$taskId-$queryId.gtf"
  private val tmpPath = s"$path/.$finalName.tmp"
  private var writer: TraceFile.IncrementalWriter = _
  private var wrote = false

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      val stns = sampleTimeNsOpt.getOrElse(
        srIdx.map { i =>
          // fail closed like every other shape guard: a null/zero rate
          // would silently write Infinity as the header's sample_time_ns
          // (InternalRow.getLong(null) unboxes to 0)
          require(
            !row.isNullAt(i) && row.getLong(i) > 0,
            "sample_rate must be a positive BIGINT when used to derive " +
              "sample_time_ns — set the sample_time_ns writer option " +
              "explicitly when the column is absent or unreliable")
          1e9 / row.getLong(i)
        }.getOrElse(1.0))
      writer = new TraceFile.IncrementalWriter(tmpPath, stns)
    }
    val arr = row.getArray(chIdx)
    val channels = Array.tabulate(arr.numElements()) { i =>
      val st = arr.getStruct(i, chStruct.length)
      // the format stores traces positionally; the reader re-derives
      // channel = position, so an out-of-order channels array would be
      // silently relabeled on read-back — fail closed instead
      val ch = st.getLong(chFieldIdx)
      require(
        ch == i,
        s"channels must be listed in channel order (channel $ch at position $i) — " +
          "sort the channels array before writing")
      st.getArray(voltFieldIdx).toIntArray()
    }
    writer.append(row.getLong(tsIdx), channels)
    wrote = true
  }

  override def commit(): WriterCommitMessage = {
    // empty partition → no file at all (a 0-event header is noise in a
    // capture directory)
    if (!wrote) {
      if (writer != null) { writer.close(); java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmpPath)) }
      return TraceFileCommit("", "")
    }
    writer.close()
    TraceFileCommit(tmpPath, s"$path/$finalName")
  }

  override def abort(): Unit = {
    // close() flushes and patches the header of a file we are about to
    // delete — and under the disk-full conditions that abort tasks it is
    // the call most likely to throw, which would skip the cleanup
    if (writer != null) try writer.close() catch { case _: java.io.IOException => () }
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmpPath))
  }

  override def close(): Unit = ()
}
