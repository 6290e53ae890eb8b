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
  val F144Id = "f144"
  val Se00Id = "se00"

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

  /** pl72 field ids in `.fbs` declaration order: start_time 0, stop_time 1,
    * run_name 2, instrument_name 3, nexus_structure 4, job_id 5, broker 6,
    * service_id 7, filename 8, n_periods 9, detector_spectrum_map 10,
    * metadata 11, control_topic 12. Optional strings are written only when
    * non-empty (absent field decodes to the same default), matching how
    * the reference producers omit fields their consumer ignores.
    */
  def encodePl72(m: RunStart): Array[Byte] = {
    checkU("start_time", m.startTimeMs, Long.MaxValue)
    checkU("n_periods", m.nPeriods, U32)
    val b = FlatBufBuilder.threadLocal()
    // nested df12 SpectraDetectorMapping table: child vectors first
    val mapOff = m.detectorSpectrumMap.map { sm =>
      require(
        sm.spectrum.length == sm.detectorId.length,
        s"df12 spectrum (${sm.spectrum.length}) and detector_id (${sm.detectorId.length}) must be parallel")
      val specOff = b.createUIntVector(sm.spectrum.map(_.toLong & 0xffffffffL).toArray)
      val detOff = b.createUIntVector(sm.detectorId.map(_.toLong & 0xffffffffL).toArray)
      b.startTable(3)
      b.slotInt(2, sm.nSpectra)
      b.slotUOffset(1, detOff)
      b.slotUOffset(0, specOff)
      b.endTable()
    }
    def optString(v: String): Int = if (v.nonEmpty) b.createString(v) else -1
    val ctlOff = optString(m.controlTopic)
    val fileOff = optString(m.filename)
    val jobOff = optString(m.jobId)
    val nexusOff = optString(m.nexusStructure)
    val nameOff = b.createString(m.runName)
    val instrOff = b.createString(m.instrumentName)
    b.startTable(13)
    if (ctlOff >= 0) b.slotUOffset(12, ctlOff)
    mapOff.foreach(b.slotUOffset(10, _))
    b.slotInt(9, (m.nPeriods & 0xffffffffL).toInt)
    if (fileOff >= 0) b.slotUOffset(8, fileOff)
    if (jobOff >= 0) b.slotUOffset(5, jobOff)
    if (nexusOff >= 0) b.slotUOffset(4, nexusOff)
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
    val detSpecMap = {
      val p = r.fieldPos(t, 10)
      if (p < 0) None
      else {
        val mt = r.indirect(p)
        def intVec(id: Int): Seq[Int] = {
          val vp = r.fieldPos(mt, id)
          if (vp < 0) Nil else scala.collection.immutable.ArraySeq.unsafeWrapArray(r.readVector(vp, 4)(r.i32))
        }
        Some(SpectraDetectorMap(
          spectrum = intVec(0),
          detectorId = intVec(1),
          nSpectra = { val np = r.fieldPos(mt, 2); if (np < 0) 0 else r.i32(np) }))
      }
    }
    RunStart(
      runName = str(2),
      startTimeMs = { val p = r.fieldPos(t, 0); if (p < 0) 0L else r.u64(p) },
      instrumentName = str(3),
      nPeriods = { val p = r.fieldPos(t, 9); if (p < 0) 1L else r.u32(p) },
      nexusStructure = str(4),
      jobId = str(5),
      filename = str(8),
      controlTopic = str(12),
      detectorSpectrumMap = detSpecMap)
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

  // ---- f144 LogData: 20-member scalar/array value union ----
  // Union wire rules (format spec): the union field occupies TWO slots —
  // a hidden `value_type` utype (u8, member index + 1; 0 = NONE) at the
  // field id before the value's uoffset. Member tables each hold one
  // `value` field at id 0. The typed model stores (valueType name,
  // widened double[s]); encode narrows with fail-closed exactness/range
  // checks, decode widens — the same resolution the reference sink
  // applies at first append (`nexus-writer/src/nexus/logs/f114.rs:35-57`).

  private val f144Members = Vector(
    "Byte", "UByte", "Short", "UShort", "Int", "UInt", "Long", "ULong",
    "Float", "Double",
    "ArrayByte", "ArrayUByte", "ArrayShort", "ArrayUShort", "ArrayInt",
    "ArrayUInt", "ArrayLong", "ArrayULong", "ArrayFloat", "ArrayDouble")

  private def wholeIn(member: String, v: Double, min: Long, max: Long): Long = {
    val lv = v.toLong
    require(
      lv.toDouble == v && lv >= min && lv <= max,
      s"$v is not a whole number in [$min, $max] for $member")
    lv
  }

  private def floatExact(member: String, v: Double): Float = {
    require(v.toFloat.toDouble == v || v.isNaN, s"$v is not float-exact for $member")
    v.toFloat
  }

  private def unsignedToDouble(l: Long): Double =
    if (l >= 0) l.toDouble else ((l >>> 1).toDouble * 2.0 + (l & 1L))

  private val Two63 = 9.223372036854776e18 // 2^63, exactly representable
  private val Two64 = 1.8446744073709552e19 // 2^64

  /** Whole-double → i64/u64 bits, fail closed. The subtle corner:
    * `x.toLong` SATURATES, and `Long.MaxValue.toDouble` rounds back to
    * exactly 2^63 — so a naive `lv.toDouble == x` check silently writes
    * `Long.MaxValue` for x == 2^63. Bounds are therefore explicit, and
    * the u64 upper half [2^63, 2^64) is reconstructed via exact halving
    * (doubles there have ulp ≥ 2048, so every representable value is
    * even and x/2 is exact) — keeping encode(decode(bits)) total over
    * the full u64 range [[unsignedToDouble]] can produce. The very top
    * of each range widens to exactly 2^63 / 2^64 (values within half an
    * ulp of the boundary round UP); those boundary doubles map back to
    * the canonical MAX bits, so the sentinel u64::MAX survives a
    * decode→encode round trip instead of failing the require.
    */
  private def longBits64(member: String, x: Double, signed: Boolean): Long =
    if (signed) {
      // x == 2^63 IS in decode's image: i64 values in [2^63-512, 2^63-1]
      // round to exactly 2^63 when widened — map the boundary back to
      // the canonical MAX sentinel so encode stays total over decode's
      // image (the widening was already lossy above 2^53)
      if (x == Two63) Long.MaxValue
      else {
        require(
          x >= Long.MinValue.toDouble && x < Two63 && x.toLong.toDouble == x,
          s"$x is not a whole number in i64 range for $member")
        x.toLong
      }
    } else if (x < Two63) {
      require(x >= 0 && x.toLong.toDouble == x, s"$x is not a whole number in u64 range for $member")
      x.toLong
    } else if (x == Two64) {
      // same boundary for u64: [2^64-1024, 2^64-1] (u64::MAX included)
      // widens to exactly 2^64 — canonical MAX bits on the way back
      -1L
    } else {
      require(x < Two64, s"$x out of u64 range for $member")
      val half = x / 2.0
      require(half.toLong.toDouble == half, s"$x is not a whole number for $member")
      half.toLong << 1
    }

  /** Narrow a widened double array back to its wire element type and
    * write the vector — the shared encode half of [[readArrayMember]],
    * used by both schemas' array unions (fail-closed: a value the target
    * type can't hold exactly is an error, never a truncation).
    */
  private def createNarrowedVector(
      b: FlatBufBuilder,
      kind: String,
      name: String,
      arr: Array[Double]): Int =
    kind match {
      case "i8" => b.createUByteVector(arr.map(x => (wholeIn(name, x, -128, 127) & 0xff).toInt))
      case "u8" => b.createUByteVector(arr.map(x => (wholeIn(name, x, 0, 255) & 0xff).toInt))
      case "i16" => b.createUShortVector(arr.map(x => (wholeIn(name, x, -32768, 32767) & 0xffff).toInt))
      case "u16" => b.createUShortVector(arr.map(x => (wholeIn(name, x, 0, 65535) & 0xffff).toInt))
      case "i32" => b.createUIntVector(arr.map(x => wholeIn(name, x, Int.MinValue, Int.MaxValue) & 0xffffffffL))
      case "u32" => b.createUIntVector(arr.map(x => wholeIn(name, x, 0, U32) & 0xffffffffL))
      case "i64" => b.createLongVector(arr.map(longBits64(name, _, signed = true)))
      case "u64" => b.createLongVector(arr.map(longBits64(name, _, signed = false)))
      case "f32" => b.createFloatVector(arr.map(floatExact(name, _)))
      case "f64" => b.createDoubleVector(arr)
    }

  /** Write one union member table; returns its from-end offset. For
    * array members the vector must be created BEFORE the table — handled
    * here since each member is self-contained.
    */
  private def writeF144Member(b: FlatBufBuilder, tag: Int, v: Double, arr: Array[Double]): Int = {
    val name = f144Members(tag - 1)
    def bits64(x: Double, signed: Boolean) = longBits64(name, x, signed)
    // array members: vector first, then the one-field table
    val vecOff =
      if (tag >= 11) createNarrowedVector(b, f144ArrayKinds(tag - 11), name, arr) else -1
    b.startTable(1)
    tag match {
      case 1 => b.slotByte(0, wholeIn(name, v, -128, 127).toByte)
      case 2 => b.slotByte(0, wholeIn(name, v, 0, 255).toByte)
      case 3 => b.slotShort(0, wholeIn(name, v, -32768, 32767).toShort)
      case 4 => b.slotShort(0, wholeIn(name, v, 0, 65535).toShort)
      case 5 => b.slotInt(0, wholeIn(name, v, Int.MinValue, Int.MaxValue).toInt)
      case 6 => b.slotInt(0, (wholeIn(name, v, 0, U32) & 0xffffffffL).toInt)
      case 7 => b.slotLong(0, bits64(v, signed = true))
      case 8 => b.slotLong(0, bits64(v, signed = false))
      case 9 => b.slotFloat(0, floatExact(name, v))
      case 10 => b.slotDouble(0, v)
      case _ => b.slotUOffset(0, vecOff)
    }
    b.endTable()
  }

  /** Shared widening element readers — ONE (elemSize, reader) mapping for
    * both schemas' array unions; each schema supplies its own member
    * ORDER list so the per-schema tag assignment stays explicit.
    */
  private def readArrayMember(r: FlatBufReader, p: Int, kind: String): Array[Double] =
    kind match {
      case "i8" => r.readVector(p, 1)(r.i8(_).toDouble)
      case "u8" => r.readVector(p, 1)(r.u8(_).toDouble)
      case "i16" => r.readVector(p, 2)(r.i16(_).toDouble)
      case "u16" => r.readVector(p, 2)(r.u16(_).toDouble)
      case "i32" => r.readVector(p, 4)(r.i32(_).toDouble)
      case "u32" => r.readVector(p, 4)(r.u32(_).toDouble)
      case "i64" => r.readVector(p, 8)(r.u64(_).toDouble)
      case "u64" => r.readVector(p, 8)(pos => unsignedToDouble(r.u64(pos)))
      case "f32" => r.readVector(p, 4)(r.f32(_).toDouble)
      case "f64" => r.readVector(p, 8)(r.f64(_))
    }

  /** f144 union member kinds in tag order 11..20 (array half). */
  private val f144ArrayKinds =
    Vector("i8", "u8", "i16", "u16", "i32", "u32", "i64", "u64", "f32", "f64")

  /** se00 union member kinds in tag order 1..10 — note Double(9) before
    * Float(10), the reverse of f144's tail.
    */
  private val se00ArrayKinds =
    Vector("i8", "u8", "i16", "u16", "i32", "u32", "i64", "u64", "f64", "f32")

  private def readF144Member(r: FlatBufReader, tag: Int, member: Int): (Double, Array[Double]) = {
    val p = r.fieldPos(member, 0)
    def scalar(read: Int => Double, dflt: Double = 0.0): (Double, Array[Double]) =
      (if (p < 0) dflt else read(p), Array.empty[Double])
    tag match {
      case 1 => scalar(r.i8(_).toDouble)
      case 2 => scalar(r.u8(_).toDouble)
      case 3 => scalar(r.i16(_).toDouble)
      case 4 => scalar(r.u16(_).toDouble)
      case 5 => scalar(r.i32(_).toDouble)
      case 6 => scalar(r.u32(_).toDouble)
      case 7 => scalar(r.u64(_).toDouble)
      case 8 => scalar(p => unsignedToDouble(r.u64(p)))
      case 9 => scalar(r.f32(_).toDouble)
      case 10 => scalar(r.f64(_))
      case t if t >= 11 && t <= 20 =>
        (0.0,
          if (p < 0) Array.empty[Double]
          else readArrayMember(r, p, f144ArrayKinds(t - 11)))
      case t => throw new IllegalArgumentException(s"f144 union tag $t out of range")
    }
  }

  def encodeF144(m: LogData): Array[Byte] = {
    val tag = f144Members.indexOf(m.valueType) + 1
    require(tag > 0, s"unknown f144 value type ${m.valueType}")
    val b = FlatBufBuilder.threadLocal()
    val memberOff = writeF144Member(b, tag, m.value, m.arrayValue)
    val nameOff = b.createString(m.sourceName)
    b.startTable(4)
    b.slotUOffset(3, memberOff)
    b.slotByte(2, tag.toByte)
    b.slotLong(1, m.timestampNs)
    b.slotUOffset(0, nameOff)
    b.finish(b.endTable(), F144Id)
  }

  def decodeF144(bytes: Array[Byte]): LogData = {
    require(hasIdentifier(bytes, F144Id), s"not a $F144Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    val tag = { val p = r.fieldPos(t, 2); if (p < 0) 0 else r.u8(p) }
    require(tag >= 1 && tag <= 20, s"f144 union tag $tag out of range")
    val memberPos = r.fieldPos(t, 3)
    require(memberPos >= 0, "f144 value is required")
    val (v, arr) = readF144Member(r, tag, r.indirect(memberPos))
    LogData(
      sourceName = { val p = r.fieldPos(t, 0); if (p < 0) "" else r.string(p) },
      timestampNs = { val p = r.fieldPos(t, 1); if (p < 0) 0L else r.u64(p) },
      valueType = f144Members(tag - 1),
      value = v,
      arrayValue = arr)
  }

  // ---- se00 SampleEnvironmentData: 10-member array union ----

  private val se00Locations = Array("Unknown", "Start", "Middle", "End")

  /** se00 ValueUnion member names in tag order 1..10
    * (`schemas/ecs_se00_data.fbs:17-28`) — note DoubleArray(9) before
    * FloatArray(10), the reverse of f144's tail.
    */
  private val se00Members = Vector(
    "Int8Array", "UInt8Array", "Int16Array", "UInt16Array", "Int32Array",
    "UInt32Array", "Int64Array", "UInt64Array", "DoubleArray", "FloatArray")

  /** Encode emits the member named by `valuesType`, narrowing the widened
    * doubles with the same fail-closed checks as f144's 20-member encode;
    * decode accepts all ten members and records which one arrived, so
    * decode∘encode = id over the full union.
    */
  def encodeSe00(m: SampleEnvLog): Array[Byte] = {
    val loc = se00Locations.indexOf(m.timestampLocation)
    require(loc >= 0, s"unknown timestamp_location ${m.timestampLocation}")
    val tag = se00Members.indexOf(m.valuesType) + 1
    require(tag > 0, s"unknown se00 values type ${m.valuesType} (one of ${se00Members.mkString(", ")})")
    val b = FlatBufBuilder.threadLocal()
    val valuesOff = createNarrowedVector(b, se00ArrayKinds(tag - 1), m.valuesType, m.values)
    val member = { b.startTable(1); b.slotUOffset(0, valuesOff); b.endTable() }
    val tsOff = if (m.timestamps.nonEmpty) b.createLongVector(m.timestamps) else -1
    val nameOff = b.createString(m.name)
    b.startTable(9)
    b.slotLong(8, m.messageCounter)
    if (tsOff >= 0) b.slotUOffset(7, tsOff)
    b.slotUOffset(6, member)
    b.slotByte(5, tag.toByte)
    b.slotByte(4, loc.toByte)
    b.slotDouble(3, m.timeDelta)
    b.slotLong(2, m.packetTimestampNs)
    b.slotInt(1, m.channel)
    b.slotUOffset(0, nameOff)
    b.finish(b.endTable(), Se00Id)
  }

  def decodeSe00(bytes: Array[Byte]): SampleEnvLog = {
    require(hasIdentifier(bytes, Se00Id), s"not a $Se00Id buffer")
    val r = new FlatBufReader(bytes)
    val t = r.rootTable
    val tag = { val p = r.fieldPos(t, 5); if (p < 0) 0 else r.u8(p) }
    require(tag >= 1 && tag <= 10, s"se00 union tag $tag out of range")
    val memberPos = r.fieldPos(t, 6)
    require(memberPos >= 0, "se00 values is required")
    val member = r.indirect(memberPos)
    val p0 = r.fieldPos(member, 0)
    require(p0 >= 0, "se00 member value is required")
    val values: Array[Double] = readArrayMember(r, p0, se00ArrayKinds(tag - 1))
    val loc = { val p = r.fieldPos(t, 4); if (p < 0) 0 else r.i8(p) }
    require(loc >= 0 && loc < se00Locations.length, s"se00 location $loc out of range")
    SampleEnvLog(
      name = { val p = r.fieldPos(t, 0); if (p < 0) "" else r.string(p) },
      channel = { val p = r.fieldPos(t, 1); if (p < 0) 0 else r.i32(p) },
      packetTimestampNs = { val p = r.fieldPos(t, 2); if (p < 0) 0L else r.u64(p) },
      timeDelta = { val p = r.fieldPos(t, 3); if (p < 0) 0.0 else r.f64(p) },
      timestampLocation = se00Locations(loc),
      values = values,
      timestamps = { val p = r.fieldPos(t, 7); if (p < 0) Array.emptyLongArray else r.readVector(p, 8)(r.u64) },
      messageCounter = { val p = r.fieldPos(t, 8); if (p < 0) 0L else r.u64(p) },
      valuesType = se00Members(tag - 1))
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
