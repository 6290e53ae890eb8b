package graft.sources

import graft.sources.ActionSchedule._
import graft.sources.TraceGenerator.GeneratorConfig
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Schedule-compiler semantics (`actions.rs:83-137` analog): virtual
  * clock, metadata state folds, message stamping, and parity between
  * scheduled and free-running trace synthesis.
  */
class ActionScheduleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cfg = GeneratorConfig(nFrames = 4, nDigitizers = 2)
  private val t0 = cfg.startTimestampNs

  test("compile: clock, metadata state, and message stamps fold in schedule order") {
    val scenario = Seq(
      Comment("lifecycle scenario"),
      SendRunStart("run_s"),
      WaitMs(5),
      SetVetoFlags(2),
      SetPeriod(7L),
      FrameLoop(nFrames = 2, digitizers = Seq(0, 1)),
      SendRunLog("IN:MUSR:CS:SB:temp", "Double", 1.5),
      SendAlarm("hv", "MINOR", "warn"),
      SendSampleEnv("field", 3, Array(0.25, 0.5), timeDeltaNs = 1000.0, location = "Middle"),
      WaitMs(100),
      SendRunStop("run_s"))
    val c = compile(scenario, cfg)

    assert(c.control.map(_.kind) === Seq("start", "stop"))
    assert(c.control.head.timeMs === t0 / 1000000L)
    // stop clock: 5 ms wait + 2 frames × 20 ms + 100 ms wait
    assert(c.control(1).timeMs === (t0 + 5000000L + 2 * cfg.frameIntervalNs + 100000000L) / 1000000L)

    // frames: 2 × 2 digitisers, stamped at the post-wait clock, metadata
    // from the Set* state active when the loop ran
    assert(c.frameSpecs.size === 4)
    assert(c.frameSpecs.map(_.timestampNs).distinct ===
      Seq(t0 + 5000000L, t0 + 5000000L + cfg.frameIntervalNs))
    assert(c.frameSpecs.forall(s => s.vetoFlags == 2 && s.periodNumber == 7L))
    assert(c.frameSpecs.map(_.frameNumber).distinct === Seq(0L, 1L))

    // logs stamp at the clock AFTER the frame loop advanced it
    val postFrames = t0 + 5000000L + 2 * cfg.frameIntervalNs
    assert(c.runlog.head.timestampNs === postFrames)
    assert(c.alarms.head.timestampNs === postFrames)
    assert(c.selog.head.packetTimestampNs === postFrames)

    // pure fold: compiling twice is identical (array fields compared by
    // value — Array equality is referential)
    val c2 = compile(scenario, cfg)
    assert(c2.control === c.control)
    assert(c2.frameSpecs === c.frameSpecs)
    assert(c2.alarms === c.alarms)
    assert(c2.runlog.map(l => (l.sourceName, l.timestampNs, l.valueType, l.value, l.arrayValue.toSeq))
      === c.runlog.map(l => (l.sourceName, l.timestampNs, l.valueType, l.value, l.arrayValue.toSeq)))
    assert(c2.selog.map(l => (l.name, l.packetTimestampNs, l.values.toSeq, l.messageCounter))
      === c.selog.map(l => (l.name, l.packetTimestampNs, l.values.toSeq, l.messageCounter)))
  }

  test("scheduled 'stop NOW' carries the schedule clock as its ingest stamp") {
    val c = compile(Seq(SendRunStart("r"), WaitMs(50), SendRunStop("r", stopNow = true)), cfg)
    assert(c.control(1).timeMs === 0L)
    assert(c.control(1).ingestTimeMs === (t0 + 50000000L) / 1000000L)
  }

  test("scheduled traces match the free-running generator bit for bit on shared frames") {
    import spark.implicits._
    // a schedule that replays the generator's own layout: frames 0..3 at
    // the default clock with no waits
    val c = compile(Seq(FrameLoop(nFrames = 4, digitizers = Seq(0, 1))), cfg)
    val scheduled = ActionSchedule.traces(spark, cfg, c).collect()
      .map(m => ((m.metadata.frameNumber, m.digitizerId), m)).toMap
    val free = TraceGenerator.traces(spark, cfg).collect()
    assert(scheduled.size === free.length)
    free.foreach { f =>
      val s = scheduled((f.metadata.frameNumber, f.digitizerId))
      assert(s.metadata.timestampNs === f.metadata.timestampNs)
      // same (seed, frame, digitiser) → bit-identical channel synthesis:
      // the scheduled path burns the generator's veto draw to keep the
      // RNG streams aligned, so only the veto SOURCE differs (schedule
      // state vs random), never the waveforms
      assert(s.channels.map(_.voltage.toSeq).toSeq === f.channels.map(_.voltage.toSeq).toSeq)
    }
  }
}
