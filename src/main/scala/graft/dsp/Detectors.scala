package graft.dsp

/** Pulse-detection state machines over ordered `(time, value)` samples.
  *
  * These are deliberately sequential FSMs — the semantics (cool-off windows,
  * sustain durations, end-of-trace flush) are inherently order-dependent and
  * are NOT reformulated as SQL windows (see SURVEY.md §7.4). Spark runs one
  * FSM per channel-trace array, parallelising across rows.
  *
  * Reference semantics: `/root/reference/trace-to-events/src/pulse_detection/detectors/`.
  */
trait DetectorFn[V, E] {
  /** Feed one sample; optionally emits a completed event. */
  def signal(time: Double, value: V): Option[E]
  /** End-of-trace flush of a pending event. */
  def finish(): Option[E]
}

object DetectorFn {
  /** Stream `src` through detector `d`, flushing once at end of input,
    * mirroring the reference's `EventIter`
    * (`pulse_detection/iterators/event.rs:21-36`).
    */
  def over[V, E](src: Iterator[(Double, V)], d: DetectorFn[V, E]): Iterator[E] =
    src.flatMap { case (t, v) => d.signal(t, v) } ++
      new Iterator[E] {
        private var done = false
        private var pending: Option[E] = None
        private def compute(): Unit = if (!done) { pending = d.finish(); done = true }
        def hasNext: Boolean = { compute(); pending.isDefined }
        def next(): E = { compute(); val e = pending.get; pending = None; e }
      }
}

/** An event produced by the threshold discriminators: crossing time and
  * pulse height.
  */
final case class ThresholdEvent(time: Double, pulseHeight: Double)

/** Fixed-threshold discriminator.
  *
  * Arms when the signal rises strictly above `threshold`, provided at least
  * `coolOff` samples have elapsed since the last return below threshold.
  * While armed it tracks the running maximum; once armed for exactly
  * `duration` samples the crossing time is latched as a pending event. When
  * the signal returns to or below threshold after at least `duration`
  * samples, the pending event `(crossing_time, max_height)` is emitted.
  * End-of-trace flushes a latched pending event.
  * Reference: `trace-to-events/src/pulse_detection/detectors/threshold_detector.rs:44-118`.
  */
final class ThresholdDetector(threshold: Double, duration: Int, coolOff: Int)
    extends DetectorFn[Double, ThresholdEvent] {
  private var timeOfLastReturn: Option[Double] = None
  private var timeCrossed: Option[Double] = None
  private var tempTime: Option[Double] = None
  private var maxPulseHeight = 0.0

  def signal(time: Double, value: Double): Option[ThresholdEvent] =
    timeCrossed match {
      case Some(tc) =>
        maxPulseHeight = math.max(maxPulseHeight, value)
        if (time - tc == duration.toDouble) tempTime = Some(tc)
        if (value <= threshold) {
          timeCrossed = None
          if (time - tc >= duration.toDouble) {
            timeOfLastReturn = Some(time)
            val out = tempTime.map(t => ThresholdEvent(t, maxPulseHeight))
            tempTime = None
            out
          } else None
        } else None
      case None =>
        if (value > threshold) {
          val coolOk = timeOfLastReturn.forall(tr => time - tr >= coolOff.toDouble)
          if (coolOk) {
            maxPulseHeight = value
            timeCrossed = Some(time)
          }
        }
        None
    }

  def finish(): Option[ThresholdEvent] = {
    val out = tempTime.map(t => ThresholdEvent(t, maxPulseHeight))
    tempTime = None
    out
  }
}

/** Differential threshold discriminator over `[value, dvalue]` pairs
  * (composed after an order-2 finite-difference window).
  *
  * Arms when the derivative exceeds `threshold` (same cool-off rule as the
  * fixed discriminator); disarms when the derivative becomes non-positive.
  * With `constantMultiple` set, the event time tracks the steepest-rise
  * sample and the height is `value_at_steepest_rise * constantMultiple`;
  * otherwise the height is the maximum value seen while armed.
  * Reference: `detectors/differential_threshold_detector.rs:46-128`.
  */
final class DifferentialThresholdDetector(
    threshold: Double,
    duration: Int,
    coolOff: Int,
    constantMultiple: Option[Double])
    extends DetectorFn[Array[Double], ThresholdEvent] {
  private var timeOfLastReturn: Option[Double] = None
  private var timeCrossed: Option[Double] = None
  private var tempTime: Option[Double] = None
  private var maxDeriv: Array[Double] = Array(0.0, 0.0)

  private def height: Double =
    constantMultiple.map(_ * maxDeriv(0)).getOrElse(maxDeriv(0))

  def signal(time: Double, value: Array[Double]): Option[ThresholdEvent] =
    timeCrossed match {
      case Some(tc) =>
        if (constantMultiple.isDefined) {
          if (maxDeriv(1) < value(1)) {
            maxDeriv = value.clone()
            if (tempTime.isDefined) tempTime = Some(time)
          }
        } else {
          maxDeriv(0) = math.max(maxDeriv(0), value(0))
        }
        if (time - tc == duration.toDouble) tempTime = Some(tc)
        if (value(1) <= 0.0) {
          timeCrossed = None
          if (time - tc >= duration.toDouble) {
            timeOfLastReturn = Some(time)
            val out = tempTime.map(t => ThresholdEvent(t, height))
            tempTime = None
            out
          } else None
        } else None
      case None =>
        if (value(1) > threshold) {
          val coolOk = timeOfLastReturn.forall(tr => time - tr >= coolOff.toDouble)
          if (coolOk) {
            maxDeriv = value.clone()
            timeCrossed = Some(time)
          }
        }
        None
    }

  def finish(): Option[ThresholdEvent] = {
    val out = tempTime.map(t => ThresholdEvent(t, height))
    tempTime = None
    out
  }
}

/** Time-stamped scalar used across the advanced detector/assembler. */
final case class TimeValue(time: Double, value: Double)

/** Time-stamped `[value, dvalue]` pair (superlative tracking). */
final case class TimeValue2(time: Double, value: Array[Double])

/** Event classes emitted by [[AdvancedMuonDetector]]. */
object PulseClass extends Enumeration {
  val Onset, Peak, End = Value
}

/** Event emitted by the advanced detector: class, trace value, and the
  * superlative (steepest rise while rising / sharpest fall while falling).
  */
final case class AdvancedEvent(
    time: Double,
    cls: PulseClass.Value,
    value: Double,
    superlative: Option[TimeValue2])

/** Three-phase muon-pulse detector over `[value, dvalue]` pairs.
  *
  * Phase transitions trigger when the derivative crosses the
  * onset / fall / termination thresholds sustained for `duration` samples:
  * quiescent → rising emits Onset, rising → falling emits Peak (carrying the
  * steepest rise), falling → quiescent emits End (carrying the sharpest
  * fall). While in a phase the extreme value and extreme derivative are
  * tracked continuously.
  * Reference: `detectors/advanced_muon_detector.rs:127-225`.
  */
final class AdvancedMuonDetector(
    onsetThreshold: Double,
    fallThreshold: Double,
    terminationThreshold: Double,
    duration: Double)
    extends DetectorFn[Array[Double], AdvancedEvent] {

  private sealed trait Mode
  private case object Rise extends Mode
  private case object Fall extends Mode

  // state = (mode, extreme value, extreme [value, dvalue])
  private final class State(var mode: Mode, var extreme: TimeValue, var extremeDiff: TimeValue2)

  private var state: Option[State] = None
  private var timeCrossed: Option[Double] = None

  private def testThreshold(value: Array[Double]): Boolean = state match {
    case Some(s) if s.mode == Rise => value(1) <= fallThreshold
    case Some(_)                   => value(1) >= terminationThreshold
    case None                      => value(1) >= onsetThreshold
  }

  private def thresholdSustained(time: Double): Boolean =
    timeCrossed.exists(tc => time - tc >= duration)

  private def updateThreshold(time: Double, value: Array[Double]): Unit =
    if (timeCrossed.isDefined) {
      if (!testThreshold(value)) timeCrossed = None
    } else if (testThreshold(value)) timeCrossed = Some(time)

  private def updateSuperlatives(s: State, time: Double, value: Array[Double]): Unit =
    s.mode match {
      case Rise =>
        if (value(1) >= s.extremeDiff.value(1)) s.extremeDiff = TimeValue2(time, value.clone())
        if (value(0) >= s.extreme.value) s.extreme = TimeValue(time, value(0))
      case Fall =>
        if (value(1) <= s.extremeDiff.value(1)) s.extremeDiff = TimeValue2(time, value.clone())
        if (value(0) <= s.extreme.value) s.extreme = TimeValue(time, value(0))
    }

  private def freshState(mode: Mode, time: Double, value: Array[Double]): State =
    new State(mode, TimeValue(time, value(0)), TimeValue2(time, value.clone()))

  def signal(time: Double, value: Array[Double]): Option[AdvancedEvent] = {
    updateThreshold(time, value)
    state.foreach(updateSuperlatives(_, time, value))
    state match {
      case Some(s) =>
        if (thresholdSustained(time)) {
          val event = AdvancedEvent(
            s.extreme.time,
            if (s.mode == Rise) PulseClass.Peak else PulseClass.End,
            s.extreme.value,
            Some(s.extremeDiff))
          state = s.mode match {
            case Rise => Some(freshState(Fall, time, value))
            case Fall => None
          }
          Some(event)
        } else None
      case None =>
        if (thresholdSustained(time)) {
          val event = AdvancedEvent(time, PulseClass.Onset, value(0), None)
          state = Some(freshState(Rise, time, value))
          Some(event)
        } else None
    }
  }

  def finish(): Option[AdvancedEvent] = None
}

/** Fully-assembled pulse: onset/peak/end plus steepest-rise / sharpest-fall
  * superlatives, baseline-degradient-corrected.
  */
final case class Pulse(
    start: Option[TimeValue],
    end: Option[TimeValue],
    peak: Option[TimeValue],
    steepestRise: Option[TimeValue2],
    sharpestFall: Option[TimeValue2])

/** Pairs Onset → Peak → End event triples from [[AdvancedMuonDetector]] into
  * [[Pulse]]s, correcting peak / superlative values for linear baseline
  * drift between onset and end.
  * Reference: `detectors/advanced_muon_detector.rs:227-310`.
  */
final class AdvancedMuonAssembler {
  private sealed trait Mode
  private case object Waiting extends Mode
  private final case class Rising(start: TimeValue) extends Mode
  private final case class Falling(
      start: TimeValue,
      steepestRise: Option[TimeValue2],
      peak: TimeValue)
      extends Mode

  private var mode: Mode = Waiting

  def assemble(ev: AdvancedEvent): Option[Pulse] = mode match {
    case Waiting =>
      if (ev.cls == PulseClass.Onset) mode = Rising(TimeValue(ev.time, ev.value))
      None
    case Rising(start) =>
      if (ev.cls == PulseClass.Peak)
        mode = Falling(start, ev.superlative, TimeValue(ev.time, ev.value))
      None
    case Falling(start, steepestRise, peak) =>
      if (ev.cls == PulseClass.End) {
        mode = Waiting
        val end = TimeValue(ev.time, ev.value)
        val rise = steepestRise.getOrElse(TimeValue2(0.0, Array(0.0, 0.0)))
        val fall = ev.superlative.getOrElse(TimeValue2(0.0, Array(0.0, 0.0)))
        val gradient =
          (peak.time - start.time) / (end.time - start.time)
        val peakCorr = peak.value - (peak.value - start.value) * gradient
        val riseCorr = rise.value.clone()
        riseCorr(0) -= (riseCorr(0) - start.value) * gradient
        val fallCorr = fall.value.clone()
        fallCorr(0) -= (fallCorr(0) - start.value) * gradient
        Some(
          Pulse(
            start = Some(start),
            end = Some(end),
            peak = Some(TimeValue(peak.time, peakCorr)),
            steepestRise = Some(TimeValue2(rise.time, riseCorr)),
            sharpestFall = Some(TimeValue2(fall.time, fallCorr))))
      } else None
  }
}

object AdvancedMuonAssembler {
  /** Stream events through an assembler, mirroring `AssemblerIter`
    * (`pulse_detection/iterators/event.rs:71-87`).
    */
  def over(src: Iterator[AdvancedEvent]): Iterator[Pulse] = {
    val asm = new AdvancedMuonAssembler
    src.flatMap(asm.assemble)
  }
}
