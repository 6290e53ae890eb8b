package graft.schemas

import graft.functions.{FlatBufBuilder, FlatBufReader, GpsTime, TimeFunctions}

/** FlatBuffers wire codecs for the pipeline's message schemas (K3 +
  * S2/S3 decode): dat2 traces (`schemas/dat2_digitizer_analog_trace_v2
  * .fbs`), dev2 event lists (`schemas/dev2_digitizer_event_v2.fbs`),
  * aev2 assembled frames (`schemas/aev2_frame_assembled_event_v2.fbs`),
  * each with the embedded `FrameMetadataV2` table and inline `GpsTime`
  * struct (`schemas/frame_metadata_v2.fbs`). Field ids follow schema
  * declaration order; timestamps convert through the [[TimeFunctions]]
  * GpsTime codec (exact ns round trip, locked by q_gps_round_trip).
  *
  * Unsigned mapping at the Scala boundary mirrors the wire types the
  * engine already uses internally: u32 → Long, u16 → Int, u8 → Int/Byte.
  */
object WireCodecs {

  val Dev2Id = "dev2"
  val Dat2Id = "dat2"
  val Aev2Id = "aev2"
  val Pl72Id = "pl72"
  val Run6s4tId = "6s4t"
  val Al00Id = "al00"

  /** S2 identifier check (`common/src/lib.rs` message dispatch): cheap
    * 4-byte probe without decoding. Null-safe: a null payload (Kafka
    * tombstone) is simply not this message type.
    */
  def hasIdentifier(bytes: Array[Byte], id: String): Boolean =
    bytes != null && bytes.length >= 8 &&
      bytes(4) == id.charAt(0).toByte && bytes(5) == id.charAt(1).toByte &&
      bytes(6) == id.charAt(2).toByte && bytes(7) == id.charAt(3).toByte

  // ---- FrameMetadataV2 (table) + GpsTime (inline struct, 14 B) ----

  /** Encode-side range check: a value outside its wire type must FAIL,
    * not silently truncate — the reference's `TryFrom` conversions error
    * the same way. (Decode needs no mirror: bytes can't be out of
    * range.)
    */
  private def checkU(name: String, v: Long, max: Long): Unit =
    require(v >= 0 && v <= max, s"$name=$v outside wire range [0, $max]")

  private def checkUArr(name: String, vs: Array[Long], max: Long): Unit = {
    var i = 0
    while (i < vs.length) { checkU(name, vs(i), max); i += 1 }
  }

  private val U8 = 255L
  private val U16 = 65535L
  private val U32 = 4294967295L

  private def writeMetadata(b: FlatBufBuilder, m: FrameMetadata): Int = {
    val g = TimeFunctions.epochNsToGps(m.timestampNs)
    checkU("gps_year (timestamp before 2000 or after 2255?)", g.year.toLong, U8)
    checkU("period_number", m.periodNumber, Long.MaxValue)
    checkU("protons_per_pulse", m.protonsPerPulse.toLong, U8)
    checkU("frame_number", m.frameNumber, U32)
    checkU("veto_flags", m.vetoFlags.toLong, U16)
    b.startTable(6)
    b.slotShort(5, (m.vetoFlags & 0xffff).toShort)
    b.slotInt(4, (m.frameNumber & 0xffffffffL).toInt)
    b.slotBool(3, m.running)
    b.slotByte(2, (m.protonsPerPulse & 0xff).toByte)
    b.slotLong(1, m.periodNumber)
    // GpsTime struct layout: year u8 @0, day u16 @2, hour/minute/second
    // u8 @4/5/6, millisecond u16 @8, microsecond u16 @10, nanosecond u16
    // @12 — written back-to-front (grow-down)
    b.prepStruct(2, 14)
    b.pushShort(g.nanosecond.toShort)
    b.pushShort(g.microsecond.toShort)
    b.pushShort(g.millisecond.toShort)
    b.pushByte(0) // pad @7
    b.pushByte(g.second.toByte)
    b.pushByte(g.minute.toByte)
    b.pushByte(g.hour.toByte)
    b.pushShort(g.day.toShort)
    b.pushByte(0) // pad @1
    b.pushByte(g.year.toByte)
    b.slotStructHere(0)
    b.endTable()
  }

  private def readMetadata(r: FlatBufReader, tablePos: Int): FrameMetadata = {
    val tsPos = r.fieldPos(tablePos, 0)
    require(tsPos >= 0, "FrameMetadataV2.timestamp is required")
    val gps = GpsTime(
      year = r.u8(tsPos),
      day = r.u16(tsPos + 2),
      hour = r.u8(tsPos + 4),
      minute = r.u8(tsPos + 5),
      second = r.u8(tsPos + 6),
      millisecond = r.u16(tsPos + 8),
      microsecond = r.u16(tsPos + 10),
      nanosecond = r.u16(tsPos + 12))
    def scalarLong(id: Int, dflt: Long)(read: Int => Long): Long = {
      val p = r.fieldPos(tablePos, id)
      if (p < 0) dflt else read(p)
    }
    FrameMetadata(
      timestampNs = TimeFunctions.gpsToEpochNs(gps),
      periodNumber = scalarLong(1, 0L)(r.u64),
      protonsPerPulse = scalarLong(2, 0L)(p => r.u8(p).toLong).toInt,
      running = { val p = r.fieldPos(tablePos, 3); p >= 0 && r.bool(p) },
      frameNumber = scalarLong(4, 0L)(r.u32),
      vetoFlags = scalarLong(5, 0L)(p => r.u16(p).toLong).toInt)
  }

  // ---- dev2: DigitizerEventListMessage ----

  def encodeDev2(m: EventListMessage): Array[Byte] = {
    checkU("digitizer_id", m.digitizerId.toLong, U8)
    checkUArr("time", m.time, U32)
    var i = 0
    while (i < m.voltage.length) { checkU("voltage", m.voltage(i).toLong, U16); i += 1 }
    checkUArr("channel", m.channel, U32)
    val b = FlatBufBuilder.threadLocal()
    val timeOff = b.createUIntVector(m.time)
    val voltOff = b.createUShortVector(m.voltage)
    val chanOff = b.createUIntVector(m.channel)
    val metaOff = writeMetadata(b, m.metadata)
    b.startTable(5)
    b.slotUOffset(4, chanOff)
    b.slotUOffset(3, voltOff)
    b.slotUOffset(2, timeOff)
    b.slotUOffset(1, metaOff)
    b.slotByte(0, (m.digitizerId & 0xff).toByte)
    b.finish(b.endTable(), Dev2Id)
  }

  def decodeDev2(bytes: Array[Byte]): EventListMessage = {
    require(hasIdentifier(bytes, Dev2Id), s"not a $Dev2Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    val metaPos = r.fieldPos(t, 1)
    require(metaPos >= 0, "metadata is required")
    def vecU32(id: Int): Array[Long] = {
      val p = r.fieldPos(t, id); if (p < 0) Array.emptyLongArray else r.u32Vector(p)
    }
    def vecU16(id: Int): Array[Int] = {
      val p = r.fieldPos(t, id); if (p < 0) Array.emptyIntArray else r.u16Vector(p)
    }
    EventListMessage(
      digitizerId = { val p = r.fieldPos(t, 0); if (p < 0) 0 else r.u8(p) },
      metadata = readMetadata(r, r.indirect(metaPos)),
      time = vecU32(2),
      voltage = vecU16(3),
      channel = vecU32(4))
  }

  // ---- dat2: DigitizerAnalogTraceMessage ----

  def encodeDat2(m: TraceMessage): Array[Byte] = {
    checkU("digitizer_id", m.digitizerId.toLong, U8)
    checkU("sample_rate", m.sampleRate, Long.MaxValue)
    val b = FlatBufBuilder.threadLocal()
    val channelOffs = m.channels.map { ct =>
      checkU("channel", ct.channel, U32)
      var i = 0
      while (i < ct.voltage.length) { checkU("voltage", ct.voltage(i).toLong, U16); i += 1 }
      val voltOff = b.createUShortVector(ct.voltage)
      b.startTable(2)
      b.slotUOffset(1, voltOff)
      b.slotInt(0, (ct.channel & 0xffffffffL).toInt)
      b.endTable()
    }
    val chansVec = b.createOffsetVector(channelOffs)
    val metaOff = writeMetadata(b, m.metadata)
    b.startTable(4)
    b.slotUOffset(3, chansVec)
    b.slotLong(2, m.sampleRate)
    b.slotUOffset(1, metaOff)
    b.slotByte(0, (m.digitizerId & 0xff).toByte)
    b.finish(b.endTable(), Dat2Id)
  }

  def decodeDat2(bytes: Array[Byte]): TraceMessage = {
    require(hasIdentifier(bytes, Dat2Id), s"not a $Dat2Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    val metaPos = r.fieldPos(t, 1)
    require(metaPos >= 0, "metadata is required")
    val channels: Array[ChannelTrace] = {
      val p = r.fieldPos(t, 3)
      if (p < 0) Array.empty
      else {
        val vec = r.indirect(p)
        val n = r.offsetVectorLength(vec)
        Array.tabulate(n) { i =>
          val ct = r.indirect(r.vectorElems(vec) + i * 4)
          val chan = { val cp = r.fieldPos(ct, 0); if (cp < 0) 0L else r.u32(cp) }
          val volts = { val vp = r.fieldPos(ct, 1); if (vp < 0) Array.emptyIntArray else r.u16Vector(vp) }
          ChannelTrace(chan, volts)
        }
      }
    }
    TraceMessage(
      digitizerId = { val p = r.fieldPos(t, 0); if (p < 0) 0 else r.u8(p) },
      metadata = readMetadata(r, r.indirect(metaPos)),
      sampleRate = { val p = r.fieldPos(t, 2); if (p < 0) 0L else r.u64(p) },
      channels = channels)
  }

  // ---- control plane: pl72 RunStart / 6s4t RunStop / al00 Alarm ----
  // (the engine's typed model is the documented consumed subset — absent
  // optional fields decode to defaults, extra producer fields are simply
  // not written; field ids follow .fbs declaration order)

  def encodePl72(m: RunStart): Array[Byte] = {
    checkU("start_time", m.startTimeMs, Long.MaxValue)
    checkU("n_periods", m.nPeriods, U32)
    val b = FlatBufBuilder.threadLocal()
    val nameOff = b.createString(m.runName)
    val instrOff = b.createString(m.instrumentName)
    b.startTable(13)
    b.slotInt(9, (m.nPeriods & 0xffffffffL).toInt)
    b.slotUOffset(3, instrOff)
    b.slotUOffset(2, nameOff)
    b.slotLong(0, m.startTimeMs)
    b.finish(b.endTable(), Pl72Id)
  }

  def decodePl72(bytes: Array[Byte]): RunStart = {
    require(hasIdentifier(bytes, Pl72Id), s"not a $Pl72Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    def str(id: Int): String = {
      val p = r.fieldPos(t, id); if (p < 0) "" else r.string(p)
    }
    RunStart(
      runName = str(2),
      startTimeMs = { val p = r.fieldPos(t, 0); if (p < 0) 0L else r.u64(p) },
      instrumentName = str(3),
      nPeriods = { val p = r.fieldPos(t, 9); if (p < 0) 1L else r.u32(p) })
  }

  def encode6s4t(m: RunStop): Array[Byte] = {
    checkU("stop_time", m.stopTimeMs, Long.MaxValue)
    val b = FlatBufBuilder.threadLocal()
    val nameOff = b.createString(m.runName)
    b.startTable(5)
    b.slotUOffset(1, nameOff)
    b.slotLong(0, m.stopTimeMs)
    b.finish(b.endTable(), Run6s4tId)
  }

  def decode6s4t(bytes: Array[Byte]): RunStop = {
    require(hasIdentifier(bytes, Run6s4tId), s"not a $Run6s4tId buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    RunStop(
      runName = { val p = r.fieldPos(t, 1); if (p < 0) "" else r.string(p) },
      stopTimeMs = { val p = r.fieldPos(t, 0); if (p < 0) 0L else r.u64(p) })
  }

  private val severities = Array("OK", "MINOR", "MAJOR", "INVALID")

  def encodeAl00(m: Alarm): Array[Byte] = {
    val sev = severities.indexOf(m.severity)
    require(sev >= 0, s"unknown severity ${m.severity} (one of ${severities.mkString(", ")})")
    val b = FlatBufBuilder.threadLocal()
    val srcOff = b.createString(m.sourceName)
    val msgOff = b.createString(m.message)
    b.startTable(4)
    b.slotUOffset(3, msgOff)
    b.slotShort(2, sev.toShort)
    b.slotLong(1, m.timestampNs)
    b.slotUOffset(0, srcOff)
    b.finish(b.endTable(), Al00Id)
  }

  def decodeAl00(bytes: Array[Byte]): Alarm = {
    require(hasIdentifier(bytes, Al00Id), s"not a $Al00Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    val sevCode = { val p = r.fieldPos(t, 2); if (p < 0) 0 else r.u16(p) }
    require(sevCode < severities.length, s"severity enum $sevCode out of range")
    Alarm(
      sourceName = { val p = r.fieldPos(t, 0); if (p < 0) "" else r.string(p) },
      timestampNs = { val p = r.fieldPos(t, 1); if (p < 0) 0L else r.u64(p) },
      severity = severities(sevCode),
      message = { val p = r.fieldPos(t, 3); if (p < 0) "" else r.string(p) })
  }

  // ---- aev2: FrameAssembledEventListMessage ----

  def encodeAev2(m: AssembledFrame): Array[Byte] = {
    checkUArr("time", m.time, U32)
    var i = 0
    while (i < m.voltage.length) { checkU("voltage", m.voltage(i).toLong, U16); i += 1 }
    checkUArr("channel", m.channel, U32)
    i = 0
    while (i < m.digitizersPresent.length) {
      checkU("digitizers_present", m.digitizersPresent(i).toLong, U8); i += 1
    }
    val b = FlatBufBuilder.threadLocal()
    val timeOff = b.createUIntVector(m.time)
    val voltOff = b.createUShortVector(m.voltage)
    val chanOff = b.createUIntVector(m.channel)
    val presentOff = b.createUByteVector(m.digitizersPresent)
    val metaOff = writeMetadata(b, m.metadata)
    b.startTable(6)
    b.slotUOffset(5, presentOff)
    b.slotBool(4, m.complete)
    b.slotUOffset(3, chanOff)
    b.slotUOffset(2, voltOff)
    b.slotUOffset(1, timeOff)
    b.slotUOffset(0, metaOff)
    b.finish(b.endTable(), Aev2Id)
  }

  def decodeAev2(bytes: Array[Byte]): AssembledFrame = {
    require(hasIdentifier(bytes, Aev2Id), s"not a $Aev2Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    val metaPos = r.fieldPos(t, 0)
    require(metaPos >= 0, "metadata is required")
    def vecU32(id: Int): Array[Long] = {
      val p = r.fieldPos(t, id); if (p < 0) Array.emptyLongArray else r.u32Vector(p)
    }
    AssembledFrame(
      metadata = readMetadata(r, r.indirect(metaPos)),
      time = vecU32(1),
      voltage = { val p = r.fieldPos(t, 2); if (p < 0) Array.emptyIntArray else r.u16Vector(p) },
      channel = vecU32(3),
      complete = { val p = r.fieldPos(t, 4); p >= 0 && r.bool(p) },
      digitizersPresent = { val p = r.fieldPos(t, 5); if (p < 0) Array.emptyIntArray else r.u8Vector(p) })
  }
}
