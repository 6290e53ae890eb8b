package graft.sources

import graft.schemas._
import graft.sources.TraceGenerator.GeneratorConfig
import graft.streaming.ControlMessage
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ListBuffer

/** Scriptable simulator schedule — the declarative core of the reference
  * simulator's integrated mode (SURVEY §2.1 S7,
  * `simulator/src/integrated/simulation_engine/actions.rs:83-137`): a
  * scenario like "start run → N frames across M digitisers → alarm
  * mid-run → stop run" is ONE value, compiled into the typed message
  * streams the pipeline jobs consume. The reference walks its schedule
  * against Kafka in real time; here the walk happens on the driver (a
  * schedule is a few dozen entries — run control, not data) and only the
  * trace synthesis is distributed: frame loops compile to per-(frame,
  * digitiser) descriptors that executors render with the same pulse
  * templates, noise model, and per-frame seeding as
  * [[TraceGenerator.traces]] — deterministic under any partitioning.
  *
  * Schedule time is a virtual clock: `WaitMs` advances it, frame loops
  * advance it by the frame interval per frame, and every emitted message
  * is stamped from it — so a compiled scenario is reproducible data, not
  * a wall-clock side effect.
  */
object ActionSchedule {

  sealed trait Action

  /** `actions.rs` Comment — documentation inside a scenario, no effect. */
  final case class Comment(text: String) extends Action

  /** Advance the schedule clock (`actions.rs` WaitMs). */
  final case class WaitMs(ms: Long) extends Action

  /** pl72 run start at the current clock (`SendRunStart`). */
  final case class SendRunStart(runName: String, instrument: String = "muon") extends Action

  /** 6s4t run stop at the current clock (`SendRunStop`); `stopNow` sends
    * the reference's stop-time-0 "stop NOW" marker instead.
    */
  final case class SendRunStop(runName: String, stopNow: Boolean = false) extends Action

  /** f144 run-log sample at the current clock (`SendRunLogData`). */
  final case class SendRunLog(
      sourceName: String,
      valueType: String,
      value: Double = 0.0,
      arrayValue: Array[Double] = Array.empty)
      extends Action

  /** se00 sample-environment packet at the current clock (`SendSampleEnvLog`). */
  final case class SendSampleEnv(
      name: String,
      channel: Int,
      values: Array[Double],
      timeDeltaNs: Double = 0.0,
      location: String = "Start")
      extends Action

  /** al00 alarm at the current clock (`SendAlarm`). */
  final case class SendAlarm(sourceName: String, severity: String, message: String)
      extends Action

  /** Frame-metadata mutations (`SetVetoFlags` / `SetPeriod` /
    * `SetProtonsPerPulse` / `SetRunning`) — apply to every frame emitted
    * after them.
    */
  final case class SetVetoFlags(flags: Int) extends Action
  final case class SetPeriod(period: Long) extends Action
  final case class SetProtonsPerPulse(protons: Int) extends Action
  final case class SetRunning(running: Boolean) extends Action

  /** `FrameLoop(Loop<FrameAction>)` with a nested `DigitiserLoop`: emit
    * `nFrames` frames, one dat2 trace message per digitiser per frame,
    * advancing the clock by the frame interval each frame.
    */
  final case class FrameLoop(nFrames: Int, digitizers: Seq[Int]) extends Action

  /** One scheduled dat2 message, rendered distributedly by [[traces]]. */
  final case class FrameSpec(
      timestampNs: Long,
      frameNumber: Long,
      digitizerId: Int,
      periodNumber: Long,
      protonsPerPulse: Int,
      running: Boolean,
      vetoFlags: Int)

  /** A compiled scenario: every message stream the DAQ jobs consume. */
  final case class Compiled(
      control: Seq[ControlMessage],
      runlog: Seq[LogData],
      selog: Seq[SampleEnvLog],
      alarms: Seq[Alarm],
      frameSpecs: Seq[FrameSpec])

  /** Walk the schedule once, folding the virtual clock and metadata
    * state — the engine loop of `simulation_engine/engine.rs:234-429`
    * reduced to a pure fold.
    */
  def compile(schedule: Seq[Action], cfg: GeneratorConfig): Compiled = {
    var clockNs = cfg.startTimestampNs
    var veto = 0
    var period = 0L
    var protons = 4
    var running = true
    var frameCounter = 0L
    var selogCounter = 0L
    val control = ListBuffer.empty[ControlMessage]
    val runlog = ListBuffer.empty[LogData]
    val selog = ListBuffer.empty[SampleEnvLog]
    val alarms = ListBuffer.empty[Alarm]
    val frames = ListBuffer.empty[FrameSpec]
    schedule.foreach {
      case Comment(_) => ()
      case WaitMs(ms) => clockNs += ms * 1000000L
      case SendRunStart(name, instrument) =>
        control += ControlMessage("start", name, clockNs / 1000000L, instrument)
      case SendRunStop(name, stopNow) =>
        control += ControlMessage(
          "stop",
          name,
          if (stopNow) 0L else clockNs / 1000000L,
          "",
          // a scheduled "stop NOW" resolves against the schedule clock,
          // keeping compiled scenarios deterministic end to end
          ingestTimeMs = if (stopNow) clockNs / 1000000L else 0L)
      case SendRunLog(source, valueType, value, arrayValue) =>
        runlog += LogData(source, clockNs, valueType, value, arrayValue)
      case SendSampleEnv(name, channel, values, timeDeltaNs, location) =>
        selog += SampleEnvLog(
          name, channel, clockNs, timeDeltaNs, location, values,
          timestamps = Array.empty, messageCounter = { selogCounter += 1; selogCounter })
      case SendAlarm(source, severity, message) =>
        alarms += Alarm(source, clockNs, severity, message)
      case SetVetoFlags(f) => veto = f
      case SetPeriod(p) => period = p
      case SetProtonsPerPulse(p) => protons = p
      case SetRunning(r) => running = r
      case FrameLoop(nFrames, digitizers) =>
        var f = 0
        while (f < nFrames) {
          digitizers.foreach { d =>
            frames += FrameSpec(clockNs, frameCounter, d, period, protons, running, veto)
          }
          frameCounter += 1
          clockNs += cfg.frameIntervalNs
          f += 1
        }
    }
    Compiled(control.toList, runlog.toList, selog.toList, alarms.toList, frames.toList)
  }

  /** Render a compiled scenario's frame specs as the dat2 trace stream —
    * the distributed half: specs parallelize over executors and each
    * message synthesises its channels with [[TraceGenerator]]'s pulse
    * templates + EWMA noise, seeded per (frame, digitiser) exactly like
    * the free-running generator.
    */
  def traces(spark: SparkSession, cfg: GeneratorConfig, compiled: Compiled): Dataset[TraceMessage] = {
    import spark.implicits._
    spark
      .createDataset(compiled.frameSpecs)
      .repartition(math.max(1, math.min(compiled.frameSpecs.size, spark.sparkContext.defaultParallelism)))
      .map { spec =>
        val rng = new scala.util.Random(
          TraceGenerator.frameDigSeed(cfg.seed, spec.frameNumber, spec.digitizerId))
        // the free-running generator draws its veto-flag random BEFORE
        // synthesising channels; burn the same draw so a scheduled frame
        // renders bit-identical voltages to the generator's same
        // (seed, frame, digitiser) — veto here comes from schedule state
        rng.nextDouble()
        val metadata = FrameMetadata(
          timestampNs = spec.timestampNs,
          periodNumber = spec.periodNumber,
          protonsPerPulse = spec.protonsPerPulse,
          running = spec.running,
          frameNumber = spec.frameNumber,
          vetoFlags = spec.vetoFlags)
        val channels = Array.tabulate(cfg.channelsPerDigitizer) { c =>
          ChannelTrace(
            channel = spec.digitizerId.toLong * cfg.channelsPerDigitizer + c,
            voltage = TraceGenerator.synthChannelFor(rng, cfg))
        }
        TraceMessage(spec.digitizerId, metadata, cfg.sampleRate, channels)
      }
  }
}
