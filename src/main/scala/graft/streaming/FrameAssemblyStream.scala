package graft.streaming

import graft.schemas._
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming frame assembly — the faithful rendering of the reference's
  * digitiser-aggregator cache (SURVEY §2.6 A2,
  * `/root/reference/digitiser-aggregator/src/frame/cache.rs:49-142`):
  *
  *   - state is keyed by the veto-flag-free frame identity;
  *   - a frame dispatches EARLY when all expected digitisers have
  *     contributed (`partial.rs:56-60`), or on TTL expiry measured from
  *     the first message (`partial.rs:30-31`) — `ProcessingTimeTimeout`
  *     is exactly the reference's poll-loop expiry;
  *   - duplicate digitisers are rejected (`cache.rs:71-74`);
  *   - messages for an already-dispatched frame are rejected
  *     (`cache.rs:55-63`) — a tombstone state lingers one TTL to absorb
  *     them, mirroring the reference's monotone-dispatch late rejection;
  *   - veto flags OR together; `digitizers_present` is sorted; concat is
  *     in ascending digitiser order (batch-deterministic equivalent of
  *     the reference's arrival order).
  *
  * Scale: state per in-flight frame only (bounded by TTL × frame rate);
  * one shuffle on the frame key — identical topology to the batch
  * operator, plus state cleanup by timeout.
  *
  * DEMOTED (r9): [[FrameAssemblyTws]] is THE production A2 assembler —
  * typed MapState (no whole-frame rewrite per contribution), a real
  * once-armed TTL timer, and the oracle-checked path behind
  * q_stream_frame_assembly. This fMGWS twin survives for exactly two
  * jobs: (a) the cross-API equivalence fixture (StreamingSpec twin
  * parity locks the two implementations to the same frame set, which is
  * what keeps EITHER from drifting), and (b) the micro-batch pacemaker
  * inside [[PipelineJobs.traceToNexusWithLifecycle]] —
  * `ProcessingTimeTimeout` never lets the engine quiesce, and that
  * perpetual empty-batch cadence IS the reference nexus-writer's
  * `--cache-poll-interval-ms` loop the linger/archive tiers poll on
  * (TWS quiesces once its timers drain, which would stall finalization
  * of already-stopped runs). Do not reach for this in new code.
  */
@deprecated(
  "FrameAssemblyTws is the production A2 assembler; this fMGWS twin is " +
    "kept only as the equivalence fixture and the lifecycle-job pacemaker",
  "round 9")
object FrameAssemblyStream {

  /** Per-frame mutable state: one SoA contribution per digitiser. */
  final case class FrameState(
      contributions: Map[Int, (Array[Long], Array[Int], Array[Long])],
      vetoFlags: Int,
      dispatched: Boolean,
      firstSeenMs: Long = 0L)

  def assemble(
      dev2: Dataset[EventListMessage],
      expectedDigitizers: Seq[Int],
      ttlMs: Long = 500L): Dataset[AssembledFrame] = {
    val expected = expectedDigitizers.sorted
    implicit val keyEnc = Encoders.product[FrameKey]
    implicit val stateEnc = Encoders.kryo[FrameState]
    implicit val outEnc = Encoders.product[AssembledFrame]

    def emit(key: FrameKey, st: FrameState): AssembledFrame = {
      val present = st.contributions.keys.toArray.sorted
      val times = Array.newBuilder[Long]
      val volts = Array.newBuilder[Int]
      val chans = Array.newBuilder[Long]
      present.foreach { did =>
        val (t, v, c) = st.contributions(did)
        times ++= t; volts ++= v; chans ++= c
      }
      AssembledFrame(
        metadata = FrameMetadata(key.timestampNs, key.periodNumber, key.protonsPerPulse,
          key.running, key.frameNumber, st.vetoFlags),
        time = times.result(),
        voltage = volts.result(),
        channel = chans.result(),
        complete = present.toSeq == expected,
        digitizersPresent = present)
    }

    dev2
      .groupByKey(m => FrameKey.of(m.metadata))
      .flatMapGroupsWithState[FrameState, AssembledFrame](
        OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (key: FrameKey, msgs: Iterator[EventListMessage], state: GroupState[FrameState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // TTL expiry: dispatch incomplete frame (or clear tombstone)
            if (st.dispatched) Iterator.empty else Iterator.single(emit(key, st))
          } else {
            var st = state.getOption.getOrElse(
              FrameState(
                Map.empty,
                0,
                dispatched = false,
                firstSeenMs = System.currentTimeMillis()))
            // firstSeenMs == 0 means "unknown": state restored from a
            // checkpoint written before the field existed decodes the
            // default 0 (ADVICE r9 — clamping against 0 would instantly
            // TTL-flush every restored in-flight frame). Repair to "first
            // seen NOW", re-starting the full TTL once post-upgrade.
            if (st.firstSeenMs == 0L)
              st = st.copy(firstSeenMs = System.currentTimeMillis())
            // Spark CLEARS the timeout on every invocation, so each
            // re-arm must use the REMAINING time from first sight —
            // re-arming the full ttlMs would make the flush
            // TTL-from-LAST-message: contributions (or redeliveries)
            // arriving faster than the TTL would defer an incomplete
            // frame's dispatch indefinitely, diverging from the
            // reference (partial.rs:30-31) and the TWS twin.
            def remainingTtl: Long =
              math.max(1L, st.firstSeenMs + ttlMs - System.currentTimeMillis())
            if (st.dispatched) {
              // late message after dispatch → reject (cache.rs:55-63);
              // the tombstone's TTL must be re-armed or it would never
              // expire (permanent state-store leak)
              state.update(st)
              state.setTimeoutDuration(remainingTtl)
              Iterator.empty
            } else {
              msgs.foreach { m =>
                if (!st.contributions.contains(m.digitizerId)) {
                  st = st.copy(
                    contributions =
                      st.contributions + (m.digitizerId -> ((m.time, m.voltage, m.channel))),
                    vetoFlags = st.vetoFlags | m.metadata.vetoFlags)
                } // duplicate digitiser → rejected (cache.rs:71-74)
              }
              if (st.contributions.keys.toSeq.sorted == expected) {
                val out = emit(key, st)
                // tombstone absorbs late repeats for one more FULL TTL
                // from dispatch (reset the clock: the absorption window
                // is its own lifetime, not the frame's remainder)
                state.update(st.copy(
                  dispatched = true,
                  firstSeenMs = System.currentTimeMillis()))
                state.setTimeoutDuration(ttlMs)
                Iterator.single(out)
              } else {
                state.update(st)
                state.setTimeoutDuration(remainingTtl)
                Iterator.empty
              }
            }
          }
      }
  }
}
