package graft.queries

import graft.schemas.{ChannelTrace, FrameMetadata, TraceMessage}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Closed-form dat2 trace fixture for oracle-backed FSM queries.
  *
  * Sample values are pure modular arithmetic —
  * `voltage(f,d,c,j) = 50 + ((f*31 + d*13 + c*7 + j*11) % 400)` — so a
  * DuckDB oracle regenerates the exact trace grid with `range()` and
  * re-derives what the detection FSM must produce. Under
  * `FixedThreshold(threshold=100, duration=1, coolOff=0)` with
  * `baseline=50` (normalised value `v' = voltage - 50 ∈ [0, 399]`), the
  * [[graft.dsp.ThresholdDetector]] FSM reduces to gaps-and-islands over
  * `v' > 100` (reference semantics,
  * `trace-to-events/src/pulse_detection/detectors/threshold_detector.rs:44-118`):
  *
  *   - one event per maximal run of consecutive samples with `v' > 100`;
  *   - event time = the run's first sample index (sampleRate 1 GS/s, so
  *     sample index == time in ns);
  *   - intensity = max `v'` over the run (the closing below-threshold
  *     sample also feeds the max tracker but can never exceed an
  *     above-threshold value, so it never changes the result);
  *   - EXCEPT a length-1 run at the very last sample index: the latch
  *     (`tempTime`) is only set when the sample at `crossing+duration`
  *     is processed, so a crossing with no following sample never emits —
  *     oracles must drop islands starting at `nSamples - 1`.
  *
  * Frame metadata mirrors [[PipelineQueries.arithmeticDev2]]: timestamps
  * `1.7e18 + f * 2e7` ns, period `f % 4`, veto `(f*7 + d) % 16`, channel
  * ids `d * nChannels + c` (F11).
  */
object TraceFixtures {

  val BaseNs: Long = 1700000000000000000L
  val FrameIntervalNs: Long = 20000000L

  def arithmeticTraces(
      s: SparkSession,
      nFrames: Int,
      nDigitizers: Int,
      nChannels: Int = 8,
      nSamples: Int = 500): Dataset[TraceMessage] = {
    import s.implicits._
    // generated DISTRIBUTED (range → map): the sample arrays materialize
    // executor-side, so the e2e bench units time the pipeline, not a
    // driver-built Seq being parallelized
    val (nd, nc, ns) = (nDigitizers, nChannels, nSamples)
    s.range(nFrames.toLong * nd).map { i =>
      val f = (i / nd).toInt
      val d = (i % nd).toInt
      TraceMessage(
        digitizerId = d,
        metadata = FrameMetadata(
          timestampNs = BaseNs + f.toLong * FrameIntervalNs,
          periodNumber = (f % 4).toLong,
          protonsPerPulse = 4,
          running = true,
          frameNumber = f.toLong,
          vetoFlags = (f * 7 + d) % 16),
        sampleRate = 1000000000L,
        channels = Array.tabulate(nc)(c =>
          ChannelTrace(
            channel = d.toLong * nc + c,
            voltage = Array.tabulate(ns)(j =>
              50 + ((f * 31 + d * 13 + c * 7 + j * 11) % 400)))))
    }
  }

  /** The shared DuckDB islands CTE prefix over the fixture grid: emits
    * `islands(f, d, c, t, h)` — event time (first index) and intensity
    * (max normalised value) per threshold run, with the last-sample
    * length-1 run dropped (see object Scaladoc).
    */
  def islandsSql(nFrames: Int, nDigitizers: Int, nChannels: Int = 8, nSamples: Int = 500): String =
    s"""WITH samp AS (
          SELECT f, d, c, j, ((f*31 + d*13 + c*7 + j*11) % 400) AS v
          FROM range($nFrames) rf(f), range($nDigitizers) rd(d),
               range($nChannels) rc(c), range($nSamples) rj(j)
        ), above AS (
          SELECT f, d, c, j, v,
                 j - row_number() OVER (PARTITION BY f, d, c ORDER BY j) AS grp
          FROM samp WHERE v > 100
        ), islands AS (
          SELECT f, d, c, min(j) AS t, max(v) AS h
          FROM above GROUP BY f, d, c, grp
          HAVING min(j) < ${nSamples - 1}
        )"""
}
