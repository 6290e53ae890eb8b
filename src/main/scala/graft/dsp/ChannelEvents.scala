package graft.dsp

/** Detector configuration surface, mirroring the reference's CLI parameter
  * space (`/root/reference/trace-to-events/src/parameters.rs:18-101`).
  */
sealed trait DetectorMode
final case class FixedThreshold(threshold: Double, duration: Int = 1, coolOff: Int = 0)
    extends DetectorMode
final case class DifferentialThreshold(
    threshold: Double,
    duration: Int = 1,
    coolOff: Int = 0,
    constantMultiple: Option[Double] = None)
    extends DetectorMode
final case class AdvancedMuon(
    muonOnset: Double,
    muonFall: Double,
    muonTermination: Double,
    duration: Double,
    baselineLength: Option[Int] = None,
    smoothingWindowSize: Option[Int] = None,
    minAmplitude: Option[Double] = None,
    maxAmplitude: Option[Double] = None)
    extends DetectorMode

final case class DetectorSettings(
    mode: DetectorMode,
    positivePolarity: Boolean = true,
    baseline: Double = 0.0)

/** Per-channel event formation: one ordered voltage trace in, SoA event
  * lists (time ns, intensity) out. The single-pass window→detector chain
  * mirrors `/root/reference/trace-to-events/src/channels.rs:19-184`; outputs
  * are saturating-cast to the wire types (u32 time, u16 intensity) exactly
  * as the reference does with Rust `as` casts.
  */
object ChannelEvents {

  /** Saturating f64 → u32 cast (Rust `as Time`). */
  private def toTimeU32(t: Double): Long =
    if (t.isNaN) 0L else math.min(math.max(t, 0.0), 4294967295.0).toLong

  /** Saturating f64 → u16 cast (Rust `as Intensity`). */
  private def toIntensityU16(v: Double): Int =
    if (v.isNaN) 0 else math.min(math.max(v, 0.0), 65535.0).toInt

  private def normalised(
      voltage: Array[Int],
      sampleTimeNs: Double,
      settings: DetectorSettings): Iterator[(Double, Double)] = {
    val sign = if (settings.positivePolarity) 1.0 else -1.0
    voltage.iterator.zipWithIndex.map { case (v, i) =>
      (i * sampleTimeNs, sign * (v.toDouble - settings.baseline))
    }
  }

  /** Detect events on one channel trace; returns parallel (times, intensities).
    * `sampleTimeNs = 1e9 / sample_rate` (`processing.rs:31`).
    */
  def findChannelEvents(
      voltage: Array[Int],
      sampleTimeNs: Double,
      settings: DetectorSettings): (Array[Long], Array[Int]) = {
    val raw = normalised(voltage, sampleTimeNs, settings)
    val events: Iterator[(Double, Double)] = settings.mode match {
      case FixedThreshold(threshold, duration, coolOff) =>
        DetectorFn
          .over(raw, new ThresholdDetector(threshold, duration, coolOff))
          .map(e => (e.time, e.pulseHeight))

      case DifferentialThreshold(threshold, duration, coolOff, constantMultiple) =>
        DetectorFn
          .over(
            WindowFn.over(raw, new FiniteDifferencesWindow(2)),
            new DifferentialThresholdDetector(threshold, duration, coolOff, constantMultiple))
          .map(e => (e.time, e.pulseHeight))

      case AdvancedMuon(onset, fall, termination, duration, baselineLength,
            smoothingSize, minAmp, maxAmp) =>
        val smoothed = WindowFn
          .over(
            WindowFn.over(raw, new BaselineWindow(baselineLength.getOrElse(0), 0.1)),
            new SmoothingWindow(smoothingSize.getOrElse(1)))
          .map { case (t, stats) => (t, stats.mean) }
        val events = DetectorFn.over(
          WindowFn.over(smoothed, new FiniteDifferencesWindow(2)),
          new AdvancedMuonDetector(onset, fall, termination, duration))
        AdvancedMuonAssembler
          .over(events)
          .filter(p => minAmp.forall(min => p.peak.forall(min <= _.value)))
          .filter(p => maxAmp.forall(max => p.peak.forall(max >= _.value)))
          .map(p =>
            (p.steepestRise.map(_.time).getOrElse(0.0), p.peak.map(_.value).getOrElse(0.0)))
    }
    val times = Array.newBuilder[Long]
    val intensities = Array.newBuilder[Int]
    events.foreach { case (t, v) =>
      times += toTimeU32(t)
      intensities += toIntensityU16(v)
    }
    (times.result(), intensities.result())
  }
}
