package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal FlatBuffers wire-format writer/reader (K3/S2/S3 encode+decode),
  * implemented from the PUBLIC format specification
  * (https://flatbuffers.dev/internals — vtables, uoffsets, inline
  * structs, vectors), sized to the pipeline's fixed schemas
  * (the `.fbs` files under `/root/reference/schemas/`). No generated
  * code, no external
  * dependency: the builder grows the buffer downward exactly like the
  * official builders, so emitted buffers are readable by any conformant
  * FlatBuffers reader and vice versa.
  *
  * Wire rules implemented:
  *   - root: `uint32` uoffset to the root table, bytes 4–8 the 4-char
  *     file identifier;
  *   - table: `int32` soffset at the table position pointing BACK to its
  *     vtable (`vtable_pos = table_pos - soffset`); vtable =
  *     `uint16 vtable_bytes, uint16 table_bytes, uint16 field_off*`
  *     with field offsets relative to the table position, 0 = absent;
  *   - scalars inline little-endian at natural alignment; structs fully
  *     inline; strings/vectors/sub-tables referenced by `uint32` uoffset
  *     (target_pos = field_pos + uoffset);
  *   - vectors: `uint32` element count then packed elements.
  *
  * Scale note: one builder per row on the hot path would churn; codecs
  * reuse a thread-local builder ([[FlatBufBuilder.threadLocal]]) the same
  * way the per-partition decode loops reuse read buffers.
  */
final class FlatBufBuilder(initialCapacity: Int = 1024) {

  private var buf: Array[Byte] = new Array[Byte](math.max(initialCapacity, 64))
  private var space: Int = buf.length // grows downward: next write ends here
  private var minalign: Int = 1

  // in-flight table state
  private var vtableSlots: Array[Int] = new Array[Int](16) // from-end offsets per field id
  private var numFields: Int = 0
  private var inTable = false
  private var tableDataStart: Int = 0 // from-end offset when the table opened

  def reset(): Unit = {
    space = buf.length
    minalign = 1
    inTable = false
  }

  /** From-end offset of everything written so far. */
  private def offset: Int = buf.length - space

  private def grow(): Unit = {
    val old = buf
    // growing doubles and keeps data at the END (from-end offsets stable)
    val next = new Array[Byte](old.length << 1)
    System.arraycopy(old, 0, next, old.length, old.length)
    buf = next
    space += old.length
  }

  private def prep(size: Int, additionalBytes: Int): Unit = {
    if (size > minalign) minalign = size
    // pad so the write that follows `additionalBytes` lands size-aligned
    val alignSize = (~(offset + additionalBytes) + 1) & (size - 1)
    while (space < alignSize + size + additionalBytes) grow()
    var i = 0
    while (i < alignSize) { space -= 1; buf(space) = 0; i += 1 }
  }

  private def putByte(b: Byte): Unit = { space -= 1; buf(space) = b }
  private def putShort(v: Short): Unit = {
    space -= 2
    buf(space) = (v & 0xff).toByte
    buf(space + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putInt(v: Int): Unit = {
    space -= 4
    buf(space) = (v & 0xff).toByte
    buf(space + 1) = ((v >> 8) & 0xff).toByte
    buf(space + 2) = ((v >> 16) & 0xff).toByte
    buf(space + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putLong(v: Long): Unit = {
    space -= 8
    var i = 0
    while (i < 8) { buf(space + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** Align for an inline struct of `totalBytes` with alignment `align`
    * about to be written via push* calls (most-significant field first —
    * grow-down writing reverses memory order).
    */
  def prepStruct(align: Int, totalBytes: Int): Unit = prep(align, totalBytes)

  def pushByte(b: Byte): Unit = { prep(1, 0); putByte(b) }
  def pushShort(v: Short): Unit = { prep(2, 0); putShort(v) }
  def pushInt(v: Int): Unit = { prep(4, 0); putInt(v) }
  def pushLong(v: Long): Unit = { prep(8, 0); putLong(v) }
  def pushFloat(v: Float): Unit = { prep(4, 0); putInt(java.lang.Float.floatToIntBits(v)) }
  def pushDouble(v: Double): Unit = { prep(8, 0); putLong(java.lang.Double.doubleToLongBits(v)) }

  /** Write a uoffset field value pointing at from-end offset `off`. */
  private def pushUOffset(off: Int): Unit = {
    prep(4, 0)
    require(off <= offset, "offset points forward")
    putInt(offset - off + 4)
  }

  /** Vector of u16 values (stored low 16 bits of each Int). */
  def createUShortVector(values: Array[Int]): Int = {
    prep(4, values.length * 2) // length prefix 4-aligned; elements 2-aligned
    var i = values.length - 1
    while (i >= 0) { putShort((values(i) & 0xffff).toShort); i -= 1 }
    putInt(values.length)
    offset
  }

  /** Vector of u32 values (stored low 32 bits of each Long). */
  def createUIntVector(values: Array[Long]): Int = {
    prep(4, values.length * 4)
    var i = values.length - 1
    while (i >= 0) { putInt((values(i) & 0xffffffffL).toInt); i -= 1 }
    putInt(values.length)
    offset
  }

  /** Vector of u8 values. */
  def createUByteVector(values: Array[Int]): Int = {
    prep(4, values.length)
    var i = values.length - 1
    while (i >= 0) { putByte((values(i) & 0xff).toByte); i -= 1 }
    putInt(values.length)
    offset
  }

  /** Vector of i64/u64 values (raw 8-byte bits). Elements must be
    * 8-ALIGNED per the spec (the length prefix sits in the 4 bytes just
    * below them) — aligned-access readers and the official verifier
    * reject 4-aligned 8-byte elements even though unaligned readers like
    * [[FlatBufReader]] would not notice.
    */
  def createLongVector(values: Array[Long]): Int = {
    prep(8, values.length * 8)
    var i = values.length - 1
    while (i >= 0) { putLong(values(i)); i -= 1 }
    putInt(values.length)
    offset
  }

  /** Vector of f32 values. */
  def createFloatVector(values: Array[Float]): Int = {
    prep(4, values.length * 4)
    var i = values.length - 1
    while (i >= 0) { putInt(java.lang.Float.floatToIntBits(values(i))); i -= 1 }
    putInt(values.length)
    offset
  }

  /** Vector of f64 values. */
  def createDoubleVector(values: Array[Double]): Int = {
    prep(8, values.length * 8)
    var i = values.length - 1
    while (i >= 0) { putLong(java.lang.Double.doubleToLongBits(values(i))); i -= 1 }
    putInt(values.length)
    offset
  }

  /** UTF-8 string: `uint32` length + bytes + NUL terminator. */
  def createString(s: String): Int = {
    val utf8 = s.getBytes("UTF-8")
    prep(4, utf8.length + 1)
    putByte(0) // NUL terminator (spec: for C-string interop)
    var i = utf8.length - 1
    while (i >= 0) { putByte(utf8(i)); i -= 1 }
    putInt(utf8.length)
    offset
  }

  /** Vector of table references (from-end offsets from endTable). */
  def createOffsetVector(offsets: Array[Int]): Int = {
    prep(4, offsets.length * 4)
    var i = offsets.length - 1
    while (i >= 0) { pushUOffset(offsets(i)); i -= 1 }
    putInt(offsets.length)
    offset
  }

  def startTable(maxFields: Int): Unit = {
    require(!inTable, "nested startTable — create vectors/sub-tables first")
    if (vtableSlots.length < maxFields) vtableSlots = new Array[Int](maxFields)
    java.util.Arrays.fill(vtableSlots, 0, maxFields, 0)
    numFields = maxFields
    inTable = true
    tableDataStart = offset
  }

  def slotByte(id: Int, v: Byte): Unit = { pushByte(v); vtableSlots(id) = offset }
  def slotShort(id: Int, v: Short): Unit = { pushShort(v); vtableSlots(id) = offset }
  def slotInt(id: Int, v: Int): Unit = { pushInt(v); vtableSlots(id) = offset }
  def slotLong(id: Int, v: Long): Unit = { pushLong(v); vtableSlots(id) = offset }
  def slotFloat(id: Int, v: Float): Unit = { pushFloat(v); vtableSlots(id) = offset }
  def slotDouble(id: Int, v: Double): Unit = { pushDouble(v); vtableSlots(id) = offset }
  def slotBool(id: Int, v: Boolean): Unit = slotByte(id, if (v) 1 else 0)
  def slotUOffset(id: Int, target: Int): Unit = { pushUOffset(target); vtableSlots(id) = offset }

  /** Record the just-written inline struct (written via push* calls, most
    * significant field first) as field `id`.
    */
  def slotStructHere(id: Int): Unit = vtableSlots(id) = offset

  /** Close the table: write the soffset placeholder (the table position),
    * then the vtable, then patch the soffset. Returns the table's
    * from-end offset.
    */
  def endTable(): Int = {
    require(inTable, "endTable outside table")
    prep(4, 0)
    putInt(0) // soffset placeholder
    val tableOff = offset
    // vtable entries are field offsets relative to the table position:
    // grow-down writes mean earlier (field) writes sit at HIGHER absolute
    // addresses / smaller from-end offsets, so entry = tableOff - slot > 0
    val tableBytes = tableOff - tableDataStart // soffset + fields + padding
    val vtableBytes = 4 + numFields * 2
    var i = numFields - 1
    while (i >= 0) {
      val entry = if (vtableSlots(i) == 0) 0 else tableOff - vtableSlots(i)
      pushShort(entry.toShort)
      i -= 1
    }
    pushShort(tableBytes.toShort)
    pushShort(vtableBytes.toShort)
    val vtableOff = offset
    // patch soffset at the table position: table_abs - vtable_abs =
    // vtableOff - tableOff (vtable written later → lower address →
    // larger from-end offset → positive soffset)
    val pos = buf.length - tableOff
    val so = vtableOff - tableOff
    buf(pos) = (so & 0xff).toByte
    buf(pos + 1) = ((so >> 8) & 0xff).toByte
    buf(pos + 2) = ((so >> 16) & 0xff).toByte
    buf(pos + 3) = ((so >> 24) & 0xff).toByte
    inTable = false
    tableOff
  }

  /** Finish with a root table and 4-char file identifier; returns the
    * trimmed buffer.
    */
  def finish(rootTable: Int, identifier: String): Array[Byte] = {
    require(identifier.length == 4, "file identifier must be 4 chars")
    prep(minalign, 4 + 4)
    var i = 3
    while (i >= 0) { putByte(identifier.charAt(i).toByte); i -= 1 }
    pushUOffset(rootTable)
    java.util.Arrays.copyOfRange(buf, space, buf.length)
  }
}

object FlatBufBuilder {
  private val tl = new ThreadLocal[FlatBufBuilder] {
    override def initialValue(): FlatBufBuilder = new FlatBufBuilder(4096)
  }

  /** Reused per-thread builder (reset before each message). */
  def threadLocal(): FlatBufBuilder = { val b = tl.get(); b.reset(); b }
}

/** Absolute-position reader over a finished FlatBuffers buffer. */
final class FlatBufReader(bytes: Array[Byte]) {
  private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  def identifier: String =
    new String(Array(bytes(4), bytes(5), bytes(6), bytes(7)), "US-ASCII")

  def rootTable: Int = bb.getInt(0)

  /** Absolute position of field `id` inside the table at `tablePos`, or
    * -1 when absent.
    */
  def fieldPos(tablePos: Int, id: Int): Int = {
    val vtable = tablePos - bb.getInt(tablePos)
    val vtableBytes = bb.getShort(vtable) & 0xffff
    val slot = 4 + id * 2
    if (slot >= vtableBytes) -1
    else {
      val off = bb.getShort(vtable + slot) & 0xffff
      if (off == 0) -1 else tablePos + off
    }
  }

  def u8(pos: Int): Int = bb.get(pos) & 0xff
  def u16(pos: Int): Int = bb.getShort(pos) & 0xffff
  def u32(pos: Int): Long = bb.getInt(pos) & 0xffffffffL
  def i8(pos: Int): Int = bb.get(pos).toInt
  def i16(pos: Int): Int = bb.getShort(pos).toInt
  def i32(pos: Int): Int = bb.getInt(pos)
  def u64(pos: Int): Long = bb.getLong(pos)
  def f32(pos: Int): Float = bb.getFloat(pos)
  def f64(pos: Int): Double = bb.getDouble(pos)
  def bool(pos: Int): Boolean = bb.get(pos) != 0

  /** Follow a uoffset field to its target's absolute position. */
  def indirect(pos: Int): Int = pos + bb.getInt(pos)

  def vectorLength(vecPos: Int): Int = bb.getInt(vecPos)
  def vectorElems(vecPos: Int): Int = vecPos + 4

  /** Validate a vector length against the buffer size BEFORE allocating:
    * a corrupt length field must fail as a catchable decode error (the
    * ingest router's "malformed" bucket), never as an executor-killing
    * multi-GB allocation.
    */
  private def boundedLength(vecPos: Int, elemSize: Int): Int = {
    val n = bb.getInt(vecPos)
    require(
      n >= 0 && vecPos + 4 + n.toLong * elemSize <= bytes.length,
      s"vector length $n (elem $elemSize B) exceeds buffer (${bytes.length} B)")
    n
  }

  /** Bounds-checked element count for a vector of uoffsets (tables). */
  def offsetVectorLength(vecPos: Int): Int = boundedLength(vecPos, 4)

  /** UTF-8 string at a uoffset field position (length bounds-checked). */
  def string(fieldPos: Int): String = {
    val v = indirect(fieldPos)
    val n = boundedLength(v, 1)
    new String(bytes, v + 4, n, "UTF-8")
  }

  def u16Vector(fieldPos: Int): Array[Int] = {
    val v = indirect(fieldPos)
    val n = boundedLength(v, 2)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = u16(vectorElems(v) + i * 2); i += 1 }
    out
  }

  def u32Vector(fieldPos: Int): Array[Long] = {
    val v = indirect(fieldPos)
    val n = boundedLength(v, 4)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = u32(vectorElems(v) + i * 4); i += 1 }
    out
  }

  def u8Vector(fieldPos: Int): Array[Int] = {
    val v = indirect(fieldPos)
    val n = boundedLength(v, 1)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = u8(vectorElems(v) + i); i += 1 }
    out
  }

  /** Generic bounds-checked element read: `elemSize` in {1,2,4,8},
    * `read(absolutePos)` per element.
    */
  def readVector[T: scala.reflect.ClassTag](
      fieldPos: Int,
      elemSize: Int)(read: Int => T): Array[T] = {
    val v = indirect(fieldPos)
    val n = boundedLength(v, elemSize)
    val out = new Array[T](n)
    var i = 0
    while (i < n) { out(i) = read(vectorElems(v) + i * elemSize); i += 1 }
    out
  }
}
