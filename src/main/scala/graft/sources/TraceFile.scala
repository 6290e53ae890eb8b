package graft.sources

import graft.schemas.{ChannelTrace, FrameMetadata, TraceMessage}
import org.apache.spark.sql.{Dataset, SparkSession}

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Paths}

/** Binary trace-file source (SURVEY §2.1 S6) — the engine's equivalent of
  * the reference's proprietary trace-file reader
  * (`/root/reference/trace-reader/src/loader.rs:10-135`): a self-describing
  * header (version, description, channel count, per-channel calibration,
  * sample time, samples per event) followed by fixed-size event records
  * of per-channel u16 traces, supporting random access by event index.
  *
  * The on-disk format here is this engine's own (the reference's exact
  * byte layout is proprietary to its capture tool); the capability —
  * header-described fixed-stride records, O(1) seek to event `i`, Spark
  * ingestion — is equivalent.
  *
  * Scale: files are split by EVENT RANGES — each task seeks directly to
  * its slice (`headerSize + i × eventSize`), so a directory of trace
  * files parallelises without reading whole files per task and without a
  * shuffle.
  */
object TraceFile {

  final case class Header(
      version: String,
      description: String,
      nChannels: Int,
      voltsScale: Array[Double],
      sampleTimeNs: Double,
      nSamples: Int,
      nEvents: Int,
      headerBytes: Long) {
    def eventBytes: Long = 8L + nChannels.toLong * nSamples * 2 // timestamp + u16 samples
  }

  private val Magic = 0x47524654 // "GRFT"

  /** Write a trace file: header + `events` fixed-size records. Records
    * MUST be in non-decreasing timestamp order — capture order equals
    * time order, the same invariant the reference's offset search relies
    * on, and the one the DSv2 connector's bisect pruning assumes.
    * Enforced here so every file this engine produces upholds it.
    */
  def write(path: String, sampleTimeNs: Double, events: Seq[(Long, Array[Array[Int]])]): Unit = {
    // one encoder: the streaming writer owns the byte layout (order and
    // shape checks included); this Seq facade just drives it
    val w = new IncrementalWriter(path, sampleTimeNs)
    events.foreach { case (ts, channels) => w.append(ts, channels) }
    w.close()
  }

  /** Streaming single-file writer for executor-side use (the DSv2 write
    * path): records arrive one at a time, so buffering a whole partition
    * the way [[write]]'s `Seq` signature implies is not an option. The
    * header needs the record shape (channel/sample counts) and the final
    * event count; the shape comes from the FIRST record (lazy header
    * write), and `nEvents` — the last 4 header bytes — is patched in
    * place on [[close]] (a seekable-filesystem operation; an
    * object-store deployment stages locally and uploads on commit, which
    * is what the DSv2 tmp-rename commit does anyway).
    *
    * Enforces the format's two invariants fail-closed: non-decreasing
    * timestamps (the bisect-pruning contract) and a uniform record
    * shape (fixed-stride seeks).
    */
  final class IncrementalWriter(path: String, sampleTimeNs: Double) {
    private var out: DataOutputStream = _
    private var nChannels = -1
    private var nSamples = -1
    private var headerBytes = -1L
    private var nEvents = 0
    private var lastTs = Long.MinValue

    private def writeHeader(): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val h = new DataOutputStream(bos)
      h.writeInt(Magic)
      writeString(h, "graft-1")
      writeString(h, "synthetic trace capture")
      h.writeInt(math.max(nChannels, 0))
      (0 until math.max(nChannels, 0)).foreach(_ => h.writeDouble(1.0))
      h.writeDouble(sampleTimeNs)
      h.writeInt(math.max(nSamples, 0))
      h.writeInt(0) // patched on close
      h.flush()
      headerBytes = bos.size().toLong
      out = new DataOutputStream(
        new java.io.BufferedOutputStream(Files.newOutputStream(Paths.get(path))))
      out.write(bos.toByteArray)
    }

    def append(ts: Long, channels: Array[Array[Int]]): Unit = {
      require(
        ts >= lastTs,
        s"trace-file records must be timestamp-ordered (got $lastTs then $ts) — " +
          "sortWithinPartitions(\"timestamp_ns\") before writing")
      lastTs = ts
      if (out == null) {
        nChannels = channels.length
        nSamples = if (channels.nonEmpty) channels(0).length else 0
        writeHeader()
      }
      require(
        channels.length == nChannels && channels.forall(_.length == nSamples),
        s"trace-file records must share one shape (${nChannels}ch × ${nSamples}s); " +
          s"got ${channels.length}ch × ${channels.headOption.map(_.length).getOrElse(0)}s")
      out.writeLong(ts)
      channels.foreach(_.foreach { v =>
        require(
          v >= 0 && v <= 0xffff,
          s"trace-file samples are u16 (0..65535); got $v — scale or clamp before writing")
        out.writeShort(v)
      })
      nEvents += 1
    }

    /** Flush, patch `nEvents` into the header, return the event count. */
    def close(): Int = {
      if (out == null) writeHeader() // empty file: header describes 0 events
      out.close()
      val ch = Files.newByteChannel(
        Paths.get(path),
        java.nio.file.StandardOpenOption.WRITE)
      try {
        ch.position(headerBytes - 4)
        val buf = java.nio.ByteBuffer.allocate(4).putInt(nEvents)
        buf.flip()
        while (buf.hasRemaining) ch.write(buf)
      } finally ch.close()
      nEvents
    }
  }

  def readHeader(path: String): Header = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(Files.newInputStream(Paths.get(path))))
    try {
      var pos = 0L
      require(in.readInt() == Magic, s"not a graft trace file: $path")
      pos += 4
      val (version, b1) = readString(in); pos += b1
      val (description, b2) = readString(in); pos += b2
      val nChannels = in.readInt(); pos += 4
      val voltsScale = Array.fill(nChannels) { pos += 8; in.readDouble() }
      val sampleTimeNs = in.readDouble(); pos += 8
      val nSamples = in.readInt(); pos += 4
      val nEvents = in.readInt(); pos += 4
      Header(version, description, nChannels, voltsScale, sampleTimeNs, nSamples, nEvents, pos)
    } finally in.close()
  }

  /** Read only one event's 8-byte timestamp — the bisect probe. */
  def readTimestamp(path: String, header: Header, index: Long): Long = {
    val ch = Files.newByteChannel(Paths.get(path))
    try readTimestamp(ch, header, index)
    finally ch.close()
  }

  /** As above over an already-open channel, so a bisect pays one file
    * open total instead of one per probe.
    */
  def readTimestamp(
      ch: java.nio.channels.SeekableByteChannel,
      header: Header,
      index: Long): Long = {
    require(index >= 0 && index < header.nEvents, s"event $index out of range")
    ch.position(header.headerBytes + index * header.eventBytes)
    val buf = java.nio.ByteBuffer.allocate(8)
    var read = 0
    while (read < 8) {
      val n = ch.read(buf)
      if (n < 0) throw new EOFException(s"truncated event $index")
      read += n
    }
    buf.flip()
    buf.getLong
  }

  /** Read one event by index — O(1) seek (`loader.rs:101-135` semantics). */
  def readEvent(path: String, header: Header, index: Int): (Long, Array[Array[Int]]) = {
    require(index >= 0 && index < header.nEvents, s"event $index out of range")
    val ch = Files.newByteChannel(Paths.get(path))
    try {
      ch.position(header.headerBytes + index.toLong * header.eventBytes)
      val buf = java.nio.ByteBuffer.allocate(header.eventBytes.toInt)
      var read = 0
      while (read < buf.capacity()) {
        val n = ch.read(buf)
        if (n < 0) throw new EOFException(s"truncated event $index in $path")
        read += n
      }
      buf.flip()
      val ts = buf.getLong
      val channels = Array.fill(header.nChannels)(Array.fill(header.nSamples)(buf.getShort & 0xffff))
      (ts, channels)
    } finally ch.close()
  }

  /** Distributed load: one task per event-range slice, each seeking into
    * the file directly. Emits dat2-shaped [[TraceMessage]]s (digitiser id
    * from the file sequence number).
    */
  def load(spark: SparkSession, path: String, digitizerId: Int = 0): Dataset[TraceMessage] = {
    import spark.implicits._
    val header = readHeader(path)
    val sampleRate = math.round(1e9 / header.sampleTimeNs)
    spark
      .range(0, header.nEvents)
      .mapPartitions { indices =>
        // header is tiny and serialised with the closure; file reopened per task
        indices.map { i =>
          val (ts, channels) = readEvent(path, header, i.toInt)
          TraceMessage(
            digitizerId = digitizerId,
            metadata = FrameMetadata(
              timestampNs = ts,
              periodNumber = 0L,
              protonsPerPulse = 0,
              running = true,
              frameNumber = i,
              vetoFlags = 0),
            sampleRate = sampleRate,
            channels = Array.tabulate(header.nChannels)(c =>
              ChannelTrace(channel = c.toLong, voltage = channels(c))))
        }
      }
  }

  /** Bisect by timestamp (SURVEY §2.8 O4/O5 — the trace-viewer's
    * offset-space binary search, `trace-viewer/src/finder/task/binary_by_timestamp.rs:13-72`):
    * binary-search the fixed-stride records for the target timestamp,
    * step back `backstep` events, then scan forward collecting up to
    * `limit` events whose timestamp is within `forwardDistanceNs`.
    * Requires records in timestamp order (capture order), like the
    * reference requires ordered Kafka offsets.
    */
  def findByTimestamp(
      path: String,
      targetTs: Long,
      backstep: Int = 4,
      limit: Int = 8,
      forwardDistanceNs: Long = Long.MaxValue): Seq[(Int, Long, Array[Array[Int]])] = {
    val header = readHeader(path)
    if (header.nEvents == 0) return Seq.empty
    var lo = 0
    var hi = header.nEvents - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (readTimestamp(path, header, mid) < targetTs) lo = mid + 1 else hi = mid
    }
    val start = math.max(0, lo - backstep)
    // saturating bound — targetTs + MaxValue must not wrap negative
    val horizon =
      if (forwardDistanceNs > Long.MaxValue - targetTs) Long.MaxValue
      else targetTs + forwardDistanceNs
    Iterator
      .range(start, header.nEvents)
      .map(i => (i, readEvent(path, header, i)))
      .dropWhile(_._2._1 < targetTs)
      .takeWhile(_._2._1 <= horizon)
      .take(limit)
      .map { case (i, (ts, ch)) => (i, ts, ch) }
      .toSeq
  }

  private def writeString(out: DataOutputStream, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  private def readString(in: DataInputStream): (String, Long) = {
    val n = in.readInt()
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    (new String(bytes, "UTF-8"), 4L + n)
  }
}
