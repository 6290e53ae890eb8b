package graft.dsp

import scala.collection.mutable

/** Composable single-pass window functions over an ordered stream of
  * `(time, value)` trace points.
  *
  * Semantics derived from the reference pipeline's window stage
  * (see `/root/reference/trace-to-events/src/pulse_detection/window/mod.rs:10-17`):
  * a window consumes one sample per `push`, signals readiness, exposes the
  * current `output`, and re-aligns emission time via `timeShift`. The
  * pure-Scala formulation here is the unit-testable core; Spark operators
  * wrap these in array expressions / UDFs (one row = one channel trace).
  */
trait WindowFn[I, O] {
  /** Feed one sample; returns true when an output is available. */
  def push(value: I): Boolean
  /** Current output (defined when the last push returned true). */
  def output: Option[O]
  /** Emission-time re-alignment for the sample just pushed. */
  def timeShift(time: Double): Double
}

object WindowFn {
  /** Lazily stream `src` through window `w`, mirroring the reference's
    * `WindowIter` (`window/mod.rs:50-69`): samples that do not complete a
    * window emit nothing; emission time is shifted by the window.
    */
  def over[I, O](src: Iterator[(Double, I)], w: WindowFn[I, O]): Iterator[(Double, O)] =
    src.flatMap { case (t, v) =>
      if (w.push(v)) w.output.map(o => (w.timeShift(t), o)) else None
    }
}

/** Exponential-moving-average baseline estimator with warm-up.
  *
  * The first `warmUp` samples only update the EWMA baseline (smoothing factor
  * `alpha`, seeded with the first sample) and emit nothing; every later sample
  * emits `value - baseline` with time shifted back by `warmUp`.
  * Reference: `trace-to-events/src/pulse_detection/window/baseline.rs:22-49`.
  */
final class BaselineWindow(warmUp: Int, alpha: Double) extends WindowFn[Double, Double] {
  private var baseline = 0.0
  private var corrected = 0.0
  private var seen = 0

  def push(value: Double): Boolean = {
    corrected = value - baseline
    if (seen < warmUp) {
      baseline = if (seen == 0) value else value * alpha + baseline * (1.0 - alpha)
      seen += 1
      false
    } else true
  }

  def output: Option[Double] = if (seen == warmUp) Some(corrected) else None

  /** Allocation-free twin of `output.get` for the loop kernels —
    * valid only when the last `push` returned true; must stay equal to
    * `output`'s payload.
    */
  private[dsp] def currentCorrected: Double = corrected

  def timeShift(time: Double): Double = time - warmUp.toDouble
}

/** Per-window statistics emitted by [[SmoothingWindow]]. */
final case class Stats(value: Double, mean: Double, variance: Double)

/** Size-k moving average / variance with incremental sum and sum-of-squares,
  * emitting once the window is full; emission time is centred
  * (`t - (k-1)/2`). Size 1 degenerates to the identity with variance 0.
  * Reference: `trace-to-events/src/pulse_detection/window/smoothing_window.rs:41-83`.
  */
final class SmoothingWindow(size: Int) extends WindowFn[Double, Stats] {
  require(size >= 1, "Size must be >= 1")
  private val window = new mutable.ArrayDeque[Double](size + 1)
  private var last = 0.0
  private var sum = 0.0
  private var sumSq = 0.0
  private def isFull: Boolean = window.length == size

  def push(value: Double): Boolean = {
    last = value
    if (size == 1) return true
    if (isFull) {
      val old = window.removeHead()
      sum -= old
      sumSq -= old * old
    }
    sum += value
    sumSq += value * value
    window.append(value)
    isFull
  }

  def output: Option[Stats] =
    if (size == 1) Some(Stats(last, last, 0.0))
    else if (isFull)
      Some(Stats(last, sum / size, (sumSq - sum * sum / size) / (size - 1.0)))
    else None

  /** Allocation-free twin of `output.get.mean` for the loop kernels —
    * valid only when the last `push` returned true; the expression must
    * stay identical to `output`'s mean field.
    */
  private[dsp] def currentMean: Double = if (size == 1) last else sum / size

  def timeShift(time: Double): Double = time - (size - 1.0) / 2.0
}

/** Backward finite differences of orders `0..n-1` with binomial-coefficient
  * weights; emits an array `[f, Δf, Δ²f, …]` once `n` samples are buffered
  * (newest first). Order 2 (`[value, first difference]`) feeds the
  * differential/advanced detectors.
  * Reference: `trace-to-events/src/pulse_detection/window/finite_differences.rs:12-61`.
  */
final class FiniteDifferencesWindow(n: Int) extends WindowFn[Double, Array[Double]] {
  require(n >= 1)
  // coefficients(k) of order d: (-1)^k * C(d, k)
  private val coefficients: Array[Array[Double]] =
    Array.tabulate(n) { d =>
      Array.tabulate(d + 1) { k =>
        (if ((k & 1) == 1) -1.0 else 1.0) * binomial(d, k)
      }
    }
  private val values = new mutable.ArrayDeque[Double](n)
  private var diffs: Array[Double] = Array.fill(n)(0.0)

  private def binomial(a: Int, b: Int): Double = {
    var r = 1.0
    var i = 0
    while (i < b) { r = r * (a - i) / (i + 1); i += 1 }
    math.rint(r)
  }

  private def nthDifference(d: Int): Double = {
    var acc = 0.0
    var k = 0
    while (k <= d) { acc += coefficients(d)(k) * values(k); k += 1 }
    acc
  }

  def push(value: Double): Boolean =
    if (values.length + 1 < n) {
      values.prepend(value)
      false
    } else {
      values.prepend(value)
      // in-place fill (r14): the buffer is reused across pushes —
      // `output` hands out clones, so no caller can observe the
      // mutation
      var d = 0
      while (d < n) { diffs(d) = nthDifference(d); d += 1 }
      values.removeLast()
      true
    }

  def output: Option[Array[Double]] =
    if (values.length + 1 == n) Some(diffs.clone()) else None

  def timeShift(time: Double): Double = time
}
