package graft.streaming

import graft.schemas.{AssembledFrame, EventListMessage, LogData, SampleEnvLog, TraceMessage, WireCodecs}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** S1/S4/S5 over REAL wire bytes: the reference consumer's loop — peek
  * the 4-byte FlatBuffers file identifier, route, decode, and count what
  * was dropped (`trace-to-events/src/main.rs:200-256`: unexpected
  * identifier → warn+skip, failed parse → error+skip) — as a declarative
  * stream transform. Works identically on a batch Dataset, a
  * MemoryStream, a file stream, or a Kafka `value` column (the
  * environment has no broker; the transform is the part the engine
  * owns). Null payloads (Kafka tombstone records) and undersized buffers
  * count as foreign; buffers with the right identifier that fail to
  * parse count as malformed — nothing throws, nothing kills the stream.
  *
  * Scale: one narrow map — identifier probe is 4 bytes, decode touches
  * each buffer once, the status taxonomy rides `observe()` so the
  * dropped-message counters (P5/A6) cost no extra pass or shuffle.
  * Observed metric columns are uniform across codecs (`n_messages` /
  * `n_ok` / `n_foreign` / `n_malformed`), so monitoring treats every
  * ingest stream the same; `observeName` is a parameter because Spark
  * rejects duplicate observation names within one query — a topology
  * routing two sources through the same codec names each leg.
  */
object WireIngest {

  /** The shared drop-taxonomy tail: observe the uniform metric columns
    * over a (msg, status) stream, then keep only the decoded rows. ONE
    * definition so the cross-codec metric uniformity monitoring relies
    * on cannot drift between the router and the control plane.
    */
  private def observedOk[T](
      decoded: Dataset[(T, String)],
      observeName: String)(implicit enc: Encoder[T]): Dataset[T] =
    decoded
      .toDF("msg", "status")
      .observe(
        observeName,
        count(lit(1)).as("n_messages"),
        count(when(col("status") === "ok", 1)).as("n_ok"),
        count(when(col("status") === "foreign", 1)).as("n_foreign"),
        count(when(col("status") === "malformed", 1)).as("n_malformed"))
      .filter(col("status") === "ok")
      .select("msg.*")
      .as[T]

  private def routed[T <: Product](
      raw: Dataset[Array[Byte]],
      id: String,
      observeName: String,
      decode: Array[Byte] => T)(implicit enc: Encoder[T], pairEnc: Encoder[(T, String)]): Dataset[T] =
    observedOk(
      raw.map { bytes =>
        if (!WireCodecs.hasIdentifier(bytes, id)) (null.asInstanceOf[T], "foreign")
        else
          try (decode(bytes), "ok")
          catch { case scala.util.control.NonFatal(_) => (null.asInstanceOf[T], "malformed") }
      },
      observeName)

  /** Route + decode dev2 event-list buffers; drops surface in the
    * `wire_ingest` observed metrics.
    */
  def dev2FromBinary(
      raw: Dataset[Array[Byte]],
      observeName: String = "wire_ingest"): Dataset[EventListMessage] = {
    implicit val enc = Encoders.product[EventListMessage]
    implicit val pairEnc = Encoders.product[(EventListMessage, String)]
    routed(raw, WireCodecs.Dev2Id, observeName, WireCodecs.decodeDev2)
  }

  /** Same router for dat2 trace buffers (the trace-to-events input side);
    * metrics under `wire_ingest_dat2`.
    */
  def dat2FromBinary(
      raw: Dataset[Array[Byte]],
      observeName: String = "wire_ingest_dat2"): Dataset[TraceMessage] = {
    implicit val enc = Encoders.product[TraceMessage]
    implicit val pairEnc = Encoders.product[(TraceMessage, String)]
    routed(raw, WireCodecs.Dat2Id, observeName, WireCodecs.decodeDat2)
  }

  private def decodeControl(bytes: Array[Byte], ingestMs: Long): (ControlMessage, String) =
    try {
      if (WireCodecs.hasIdentifier(bytes, WireCodecs.Pl72Id)) {
        val s = WireCodecs.decodePl72(bytes)
        (ControlMessage("start", s.runName, s.startTimeMs, s.instrumentName, ingestMs), "ok")
      } else if (WireCodecs.hasIdentifier(bytes, WireCodecs.Run6s4tId)) {
        val s = WireCodecs.decode6s4t(bytes)
        (ControlMessage("stop", s.runName, s.stopTimeMs, "", ingestMs), "ok")
      } else (null: ControlMessage, "foreign")
    } catch {
      case scala.util.control.NonFatal(_) => (null: ControlMessage, "malformed")
    }

  private def controlObserved(
      decoded: Dataset[(ControlMessage, String)],
      observeName: String): Dataset[ControlMessage] = {
    implicit val enc = Encoders.product[ControlMessage]
    observedOk(decoded, observeName)
  }

  /** The control topic (S5): pl72 RunStart and 6s4t RunStop share one
    * topic in the reference, discriminated by buffer identifier
    * (`nexus-writer/src/message_handlers.rs:108-127`) — this router maps
    * both to [[ControlMessage]]; anything else counts as foreign.
    * `ingestTimeMs` (the base "stop NOW" resolves against) comes from the
    * injectable `clock`, defaulting to the decode-time wall clock — which
    * is NOT replay-deterministic: a checkpoint recovery that re-decodes a
    * stop-NOW message stamps a new wall time. Deployments with a record
    * timestamp (Kafka's broker/ingest timestamp) should prefer
    * [[controlFromBinaryTimestamped]], which is replay-stable because the
    * timestamp is part of the replayed record; tests inject a fixed clock
    * here for determinism.
    */
  def controlFromBinary(
      raw: Dataset[Array[Byte]],
      observeName: String = "wire_ingest_control",
      clock: () => Long = () => System.currentTimeMillis()): Dataset[ControlMessage] = {
    implicit val pairEnc = Encoders.product[(ControlMessage, String)]
    controlObserved(raw.map(bytes => decodeControl(bytes, clock())), observeName)
  }

  /** [[controlFromBinary]] over `(payload, recordTimestampMs)` pairs —
    * the Kafka shape (`value` + broker `timestamp`). The record timestamp
    * replays identically from the checkpointed offsets, so "stop NOW"
    * resolution is deterministic under recovery — the preferred wiring
    * when the transport supplies a timestamp.
    */
  def controlFromBinaryTimestamped(
      raw: Dataset[(Array[Byte], Long)],
      observeName: String = "wire_ingest_control"): Dataset[ControlMessage] = {
    implicit val pairEnc = Encoders.product[(ControlMessage, String)]
    controlObserved(raw.map { case (bytes, ts) => decodeControl(bytes, ts) }, observeName)
  }

  /** Same router for aev2 assembled-frame buffers — the nexus-writer's
    * consumer side of the Frame Events topic
    * (`nexus-writer/src/main.rs` frame-assembled subscription); metrics
    * under `wire_ingest_aev2`.
    */
  def aev2FromBinary(
      raw: Dataset[Array[Byte]],
      observeName: String = "wire_ingest_aev2"): Dataset[AssembledFrame] = {
    implicit val enc = Encoders.product[AssembledFrame]
    implicit val pairEnc = Encoders.product[(AssembledFrame, String)]
    routed(raw, WireCodecs.Aev2Id, observeName, WireCodecs.decodeAev2)
  }

  /** f144 run-log topic (all 20 value-union variants widen into the typed
    * [[LogData]] model); metrics under `wire_ingest_f144`.
    */
  def f144FromBinary(
      raw: Dataset[Array[Byte]],
      observeName: String = "wire_ingest_f144"): Dataset[LogData] = {
    implicit val enc = Encoders.product[LogData]
    implicit val pairEnc = Encoders.product[(LogData, String)]
    routed(raw, WireCodecs.F144Id, observeName, WireCodecs.decodeF144)
  }

  /** se00 sample-environment topic (10 array-union members widen to
    * doubles); metrics under `wire_ingest_se00`.
    */
  def se00FromBinary(
      raw: Dataset[Array[Byte]],
      observeName: String = "wire_ingest_se00"): Dataset[SampleEnvLog] = {
    implicit val enc = Encoders.product[SampleEnvLog]
    implicit val pairEnc = Encoders.product[(SampleEnvLog, String)]
    routed(raw, WireCodecs.Se00Id, observeName, WireCodecs.decodeSe00)
  }
}
