package graft.operators

import graft.dsp.{ChannelEvents, DetectorSettings}
import graft.schemas._
import org.apache.spark.sql.Dataset

/** Event formation: dat2 trace messages → dev2 event-list messages.
  *
  * This is the Spark shape of the reference's `trace-to-events` pipeline
  * (`/root/reference/trace-to-events/src/processing.rs:20-100`): per
  * message, each channel trace runs the configured window→detector chain
  * single-pass, and the per-channel results concatenate into one SoA event
  * list in channel order with the channel id repeated per event
  * (`processing.rs:58-73`, SURVEY §2.6 A1).
  *
  * Design: ONE narrow map per message, no shuffle — Spark's row parallelism
  * replaces the reference's per-channel rayon pool. A trace message is the
  * natural work unit (≤ 8 channels × ≤ 30k samples); at 100 TB the stage
  * stays embarrassingly parallel and pipelines into whatever follows.
  */
object EventFormation {

  def formEvents(
      traces: Dataset[TraceMessage],
      settings: DetectorSettings): Dataset[EventListMessage] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[EventListMessage]
    traces.map { m =>
      val sampleTimeNs = 1e9 / m.sampleRate
      val times = Array.newBuilder[Long]
      val heights = Array.newBuilder[Int]
      val channels = Array.newBuilder[Long]
      var i = 0
      while (i < m.channels.length) {
        val ct = m.channels(i)
        val (t, v) = ChannelEvents.findChannelEvents(ct.voltage, sampleTimeNs, settings)
        var j = 0
        while (j < t.length) {
          times += t(j)
          heights += v(j)
          channels += ct.channel
          j += 1
        }
        i += 1
      }
      EventListMessage(m.digitizerId, m.metadata, times.result(), heights.result(), channels.result())
    }
  }
}
