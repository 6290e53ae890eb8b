package graft.streaming

import graft.schemas.{EventListMessage, TraceMessage, WireCodecs}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._

/** S1/S4/S5 over REAL wire bytes: the reference consumer's loop — peek
  * the 4-byte FlatBuffers file identifier, route, decode, and count what
  * was dropped (`trace-to-events/src/main.rs:200-256`: unexpected
  * identifier → warn+skip, failed parse → error+skip) — as a declarative
  * stream transform. Works identically on a batch Dataset, a
  * MemoryStream, a file stream, or a Kafka `value` column (the
  * environment has no broker; the transform is the part the engine
  * owns).
  *
  * Scale: one narrow map — identifier probe is 4 bytes, decode touches
  * each buffer once, the status taxonomy rides `observe()` so the
  * dropped-message counters (P5/A6) cost no extra pass or shuffle.
  */
object WireIngest {

  /** Route + decode dev2 event-list buffers; foreign identifiers and
    * malformed buffers are dropped and surface in the `wire_ingest`
    * observed metrics (`n_messages` / `n_ok` / `n_foreign` /
    * `n_malformed`).
    */
  def dev2FromBinary(raw: Dataset[Array[Byte]]): Dataset[EventListMessage] = {
    implicit val enc = Encoders.product[(EventListMessage, String)]
    implicit val outEnc = Encoders.product[EventListMessage]
    raw
      .map { bytes =>
        if (!WireCodecs.hasIdentifier(bytes, WireCodecs.Dev2Id)) (null: EventListMessage, "foreign")
        else
          try (WireCodecs.decodeDev2(bytes), "ok")
          catch { case scala.util.control.NonFatal(_) => (null: EventListMessage, "malformed") }
      }
      .toDF("msg", "status")
      .observe(
        "wire_ingest",
        count(lit(1)).as("n_messages"),
        count(when(col("status") === "ok", 1)).as("n_ok"),
        count(when(col("status") === "foreign", 1)).as("n_foreign"),
        count(when(col("status") === "malformed", 1)).as("n_malformed"))
      .filter(col("status") === "ok")
      .select("msg.*")
      .as[EventListMessage]
  }

  /** Same router for dat2 trace buffers (the trace-to-events input side). */
  def dat2FromBinary(raw: Dataset[Array[Byte]]): Dataset[TraceMessage] = {
    implicit val enc = Encoders.product[(TraceMessage, String)]
    implicit val outEnc = Encoders.product[TraceMessage]
    raw
      .map { bytes =>
        if (!WireCodecs.hasIdentifier(bytes, WireCodecs.Dat2Id)) (null: TraceMessage, "foreign")
        else
          try (WireCodecs.decodeDat2(bytes), "ok")
          catch { case scala.util.control.NonFatal(_) => (null: TraceMessage, "malformed") }
      }
      .toDF("msg", "status")
      .observe(
        "wire_ingest_dat2",
        count(lit(1)).as("n_messages"),
        count(when(col("status") === "ok", 1)).as("n_ok"),
        count(when(col("status") =!= "ok", 1)).as("n_dropped"))
      .filter(col("status") === "ok")
      .select("msg.*")
      .as[TraceMessage]
  }
}
