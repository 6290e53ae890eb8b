package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Control message in stream form: one topic carries both RunStart and
  * RunStop, discriminated by `kind` — the Spark shape of the reference's
  * buffer-identifier dispatch (SURVEY §2.1 S5,
  * `/root/reference/nexus-writer/src/message_handlers.rs:108-127`).
  */
final case class ControlMessage(
    kind: String, // "start" | "stop"
    runName: String,
    timeMs: Long,
    instrumentName: String,
    // Ingest wall-clock stamped when the message entered the stream
    // (e.g. `current_timestamp` at source read). "stop NOW" (timeMs == 0)
    // resolves to THIS when present; when no ingest path stamped it
    // (left 0), the operator falls back to the micro-batch processing
    // timestamp, which Spark checkpoints per batch — either way a
    // checkpoint-recovery replay re-executes with identical input and
    // recovered state matches the original exactly.
    ingestTimeMs: Long = 0L)

/** Current interval for one run; `collectUntilNs` None while open. */
final case class RunInterval(
    runName: String,
    collectFromNs: Long,
    collectUntilNs: Option[Long])

/** Run-lifecycle state machine per run name (SURVEY §2.7 J3,
  * `/root/reference/nexus-writer/src/run_engine/engine.rs:190-309`):
  * start opens the interval; a start over a still-open run ABORTS the
  * predecessor — its effective end becomes the successor's start — and
  * opens the new generation (`engine.rs:199-204`); a stop pairs with the
  * open run of the same name and must be strictly after the start
  * (`run_parameters.rs:94-127`);
  * `stop_time == 0` means "stop NOW" — resolved to the ingest timestamp
  * carried on the message, falling back to the checkpointed micro-batch
  * processing time when no ingest path stamped one (the reference uses
  * arrival wall-clock; both choices keep replays deterministic). Emits
  * the updated interval on every accepted transition (Update output).
  *
  * Cross-run abort-on-restart is a global (cross-key) rule and is applied
  * where runs are collected per micro-batch ([[graft.operators.RunAssignment.runs]]).
  */
object RunStream {

  final case class RunState(startMs: Long, stopMs: Option[Long])

  def runIntervals(control: Dataset[ControlMessage]): Dataset[RunInterval] = {
    implicit val stateEnc = Encoders.product[RunState]
    implicit val outEnc = Encoders.product[RunInterval]
    import control.sparkSession.implicits._
    control
      .groupByKey(_.runName)
      .flatMapGroupsWithState[RunState, RunInterval](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (runName: String, msgs: Iterator[ControlMessage], state: GroupState[RunState]) =>
          var st = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[RunInterval]
          def interval(s: RunState): RunInterval =
            RunInterval(runName, s.startMs * 1000000L, s.stopMs.map(_ * 1000000L))
          // "stop NOW" (timeMs == 0) means "close whatever was open when
          // it ARRIVED". Its batch position: the ingest stamp when the
          // source provided one (epoch ms — the same domain as pl72
          // start times, so the sort interleaves them faithfully: a
          // stop-NOW followed by a same-batch restart closes the OLD
          // generation, not the fresh one); only an UNstamped stop-NOW
          // falls back to end-of-batch ("after everything already
          // ingested" — the coarse approximation, safe when no restart
          // shares the batch).
          msgs.toSeq
            .sortBy { m =>
              val pos =
                if (m.kind == "stop" && m.timeMs == 0L)
                  if (m.ingestTimeMs != 0L) m.ingestTimeMs else Long.MaxValue
                else m.timeMs
              (pos, m.kind)
            }
            .foreach { m =>
            (m.kind, st) match {
              case ("start", None) =>
                st = Some(RunState(m.timeMs, None))
                out += interval(st.get)
              case ("start", Some(RunState(prevStart, Some(_)))) if m.timeMs > prevStart =>
                // previous run of this name finished; new generation.
                // Generation starts are MONOTONE per name (mirrors the
                // abort-on-restart guard below): an at-least-once
                // redelivery of the closed generation's own start — or of
                // any OLDER start — must not resurrect a finalized
                // generation (the sink would recreate its local/
                // partitions with event_index restarting at 0 and later
                // merge conflicting rows into completed/). The stop time
                // is deliberately not compared: it may sit on the
                // processing-time base when resolved from "stop NOW".
                st = Some(RunState(m.timeMs, None))
                out += interval(st.get)
              case ("start", Some(RunState(prevStart, None))) if m.timeMs > prevStart =>
                // abort-on-restart (engine.rs:199-204): the unstopped
                // predecessor's effective end becomes the successor's
                // start — emit the capped old generation AND the new one
                out += interval(RunState(prevStart, Some(m.timeMs)))
                st = Some(RunState(m.timeMs, None))
                out += interval(st.get)
              case ("stop", Some(RunState(start, None))) =>
                // "stop NOW" → the ingest stamp when the source provided
                // one, else the micro-batch processing timestamp (both are
                // replay-stable: input replays identically, and the batch
                // timestamp is checkpointed)
                val effective =
                  if (m.timeMs != 0L) m.timeMs
                  else if (m.ingestTimeMs != 0L) m.ingestTimeMs
                  else state.getCurrentProcessingTimeMs()
                if (effective > start) {
                  st = Some(RunState(start, Some(effective)))
                  out += interval(st.get)
                } // stop ≤ start → rejected (run_parameters.rs:105-116)
              case _ => // stop with no open run, or non-later duplicate start → rejected
            }
          }
          st.foreach(state.update)
          // last emission wins per (name, start) downstream — dedupe here
          out.toList.distinct.iterator
      }
  }
}
