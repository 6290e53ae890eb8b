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
    // Ingest wall-clock stamped when the message entered the stream.
    // "stop NOW" (timeMs == 0) resolves to THIS, never to operator
    // wall-clock: a checkpoint-recovery replay re-executes the batch with
    // identical input, so recovered state matches the original exactly.
    ingestTimeMs: Long = 0L)

/** Current interval for one run; `collectUntilNs` None while open. */
final case class RunInterval(
    runName: String,
    collectFromNs: Long,
    collectUntilNs: Option[Long])

/** Run-lifecycle state machine per run name (SURVEY §2.7 J3,
  * `/root/reference/nexus-writer/src/run_engine/engine.rs:190-309`):
  * start opens the interval; a stop pairs with the open run of the same
  * name and must be strictly after the start (`run_parameters.rs:94-127`);
  * `stop_time == 0` means "stop NOW" — resolved to the ingest timestamp
  * carried on the message (the reference uses arrival wall-clock; stamping
  * it at ingest keeps checkpoint-recovery replays deterministic). Emits
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
          var changed = false
          msgs.toSeq.sortBy(m => (m.timeMs, m.kind)).foreach { m =>
            (m.kind, st) match {
              case ("start", None) =>
                st = Some(RunState(m.timeMs, None))
                changed = true
              case ("start", Some(RunState(_, Some(_)))) =>
                // previous run of this name finished; new generation
                st = Some(RunState(m.timeMs, None))
                changed = true
              case ("stop", Some(RunState(start, None))) =>
                // "stop NOW" → the batch-stable ingest stamp (replay-safe)
                val effective = if (m.timeMs == 0L) m.ingestTimeMs else m.timeMs
                if (effective > start) {
                  st = Some(RunState(start, Some(effective)))
                  changed = true
                } // stop ≤ start → rejected (run_parameters.rs:105-116)
              case _ => // stop with no open run, or duplicate start → rejected
            }
          }
          st.foreach(state.update)
          if (changed)
            Iterator.single(
              RunInterval(
                runName,
                st.get.startMs * 1000000L,
                st.get.stopMs.map(_ * 1000000L)))
          else Iterator.empty
      }
  }
}
