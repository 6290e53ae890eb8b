package graft.sources

import graft.schemas._
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.util.Random

/** Deterministic distributed trace simulator — the engine's equivalent of
  * the reference's `simulator` crate (SURVEY.md §2.1 S7): per frame and
  * digitiser it synthesises 8-channel voltage traces from pulse templates
  * plus EWMA-smoothed noise, and the matching frame metadata.
  *
  * Pulse shapes mirror `simulator/src/integrated/simulation_elements/pulses.rs:174-229`
  * (flat / triangular / gaussian / bi-exponential); noise mirrors
  * `noise.rs:10-88` (uniform or gaussian samples smoothed with an EWMA).
  * Unlike the reference (which draws from the thread RNG), every value here
  * derives from a per-(frame, digitiser) seeded RNG, so the generated
  * Dataset is bit-identical across runs and partitionings — that is what
  * makes it usable as a test fixture and a benchmark source.
  *
  * Scale: generation is embarrassingly parallel — one task per range
  * partition, no shuffle; 1000 executors generate 1000× the data with the
  * same per-row cost.
  */
object TraceGenerator {

  sealed trait PulseShape {
    def valueAt(t: Double): Double
  }

  /** `pulses.rs:176-186` */
  final case class Flat(start: Double, stop: Double, amplitude: Double) extends PulseShape {
    def valueAt(t: Double): Double = if (start <= t && t < stop) amplitude else 0.0
  }

  /** `pulses.rs:187-200` */
  final case class Triangular(start: Double, peakTime: Double, stop: Double, amplitude: Double)
      extends PulseShape {
    def valueAt(t: Double): Double =
      if (start <= t && t < peakTime) amplitude * (t - start) / (peakTime - start)
      else if (peakTime <= t && t < stop) amplitude * (stop - t) / (stop - peakTime)
      else 0.0
  }

  /** `pulses.rs:201-212` — note the reference squares `0.5*(t-mean)/sd`,
    * i.e. exp(-((t-mean)/(2·sd))²), and clips beyond ±6σ.
    */
  final case class Gaussian(mean: Double, sd: Double, peakAmplitude: Double) extends PulseShape {
    def valueAt(t: Double): Double =
      if (mean - 6.0 * sd > t || t > mean + 6.0 * sd) 0.0
      else peakAmplitude * math.exp(-math.pow(0.5 * (t - mean) / sd, 2))
  }

  /** `pulses.rs:213-228` */
  final case class Biexp(start: Double, decay: Double, rise: Double, coef: Double)
      extends PulseShape {
    def valueAt(t: Double): Double =
      if (t < start) 0.0
      else {
        val x = t - start
        coef * (math.exp(-x / decay) - math.exp(-x / rise))
      }
  }

  final case class GeneratorConfig(
      nFrames: Int,
      nDigitizers: Int,
      channelsPerDigitizer: Int = 8,
      timeBins: Int = 500,
      sampleRate: Long = 1000000000L,
      baseline: Int = 50,
      pulsesPerChannel: Int = 10,
      maxAmplitude: Double = 800.0,
      noiseSd: Double = 4.0,
      noiseSmoothing: Double = 0.5,
      frameIntervalNs: Long = 20000000L, // 50 Hz accelerator frames
      startTimestampNs: Long = 1700000000000000000L,
      seed: Long = 42L)

  /** splitmix64 finaliser — decorrelates sequential seeds
    * ([[graft.functions.TextHash.mix64]], the repo's ONE copy of the
    * avalanche mix). Shared with [[ActionSchedule.traces]] so scheduled
    * and free-running generation produce identical traces for the same
    * (seed, frame, digitiser).
    */
  private[sources] def mixSeed(x: Long): Long = graft.functions.TextHash.mix64(x)

  /** Per-(frame, digitiser) RNG seed — INJECTIVE over the full u8
    * digitiser range: did ≤ 130 keeps the original `frame·131 + did`
    * packing bit-for-bit (every existing fixture and oracle is stable),
    * while did ≥ 131 adds a 2³² term the packing can never reach
    * (frames stay far below 2²⁵), removing the (frame+1, did−131)
    * alias that would make two "distinct" sources emit identical
    * noise/pulses/vetoes.
    */
  private[sources] def frameDigSeed(seed: Long, frame: Long, did: Int): Long =
    mixSeed(seed * 1000003L + frame * 131L + did + (did / 131).toLong * 4294967296L)

  /** Channel synthesis, shared with [[ActionSchedule.traces]]. */
  private[sources] def synthChannelFor(rng: Random, cfg: GeneratorConfig): Array[Int] =
    synthChannel(rng, cfg)

  /** Deterministically synthesise one channel trace. */
  private def synthChannel(rng: Random, cfg: GeneratorConfig): Array[Int] = {
    val pulses = Array.fill(cfg.pulsesPerChannel) {
      val t0 = rng.nextDouble() * cfg.timeBins
      val amp = 0.1 * cfg.maxAmplitude + 0.9 * cfg.maxAmplitude * rng.nextDouble()
      rng.nextInt(4) match {
        case 0 => Flat(t0, t0 + 2 + rng.nextDouble() * 6, amp)
        case 1 => Triangular(t0, t0 + 2 + rng.nextDouble() * 4, t0 + 8 + rng.nextDouble() * 6, amp)
        case 2 => Gaussian(t0, 1.0 + rng.nextDouble() * 2.0, amp)
        case _ => Biexp(t0, 5.0 + rng.nextDouble() * 5.0, 1.0 + rng.nextDouble(), amp)
      }
    }
    var noisePrev = 0.0
    Array.tabulate(cfg.timeBins) { i =>
      val t = i.toDouble
      var v = cfg.baseline.toDouble
      var p = 0
      while (p < pulses.length) { v += pulses(p).valueAt(t); p += 1 }
      // EWMA-smoothed gaussian noise (noise.rs:17-47)
      noisePrev = rng.nextGaussian() * cfg.noiseSd * (1.0 - cfg.noiseSmoothing) +
        noisePrev * cfg.noiseSmoothing
      math.min(math.max(v + noisePrev, 0.0), 65535.0).toInt
    }
  }

  /** Generate the dat2 stream: `nFrames × nDigitizers` trace messages. */
  def traces(spark: SparkSession, cfg: GeneratorConfig): Dataset[TraceMessage] = {
    import spark.implicits._
    spark
      .range(0, cfg.nFrames.toLong * cfg.nDigitizers)
      .map { id =>
        val frame = (id / cfg.nDigitizers).toInt
        val did = (id % cfg.nDigitizers).toInt
        // per-(frame, digitiser) seed → deterministic under any
        // partitioning; splitmix64-mixed because java.util.Random's first
        // draws are strongly correlated across sequential raw seeds
        val rng = new Random(frameDigSeed(cfg.seed, frame.toLong, did))
        val metadata = FrameMetadata(
          timestampNs = cfg.startTimestampNs + frame.toLong * cfg.frameIntervalNs,
          periodNumber = frame / 100L,
          protonsPerPulse = 4,
          running = true,
          frameNumber = frame.toLong,
          // digitisers may disagree on veto flags for one frame — exercise
          // the OR-accumulation path (frame/partial.rs:80-82)
          vetoFlags = if (rng.nextDouble() < 0.05) 1 << did % 8 else 0)
        val channels = Array.tabulate(cfg.channelsPerDigitizer) { c =>
          ChannelTrace(
            channel = did.toLong * cfg.channelsPerDigitizer + c,
            voltage = synthChannel(rng, cfg))
        }
        TraceMessage(did, metadata, cfg.sampleRate, channels)
      }
  }
}
