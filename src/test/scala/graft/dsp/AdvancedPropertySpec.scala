package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property lock for the advanced muon FSM (D3) against an INDEPENDENT
  * reimplementation — the same technique that locks connected components
  * against a local union-find. The production detector is a mutable
  * 3-phase state machine; the model here is a purely functional fold
  * with immutable state, derived separately from the reference semantics
  * (`advanced_muon_detector.rs:140-225`): quiescent → rising on
  * `dv ≥ onset` sustained `duration`, rising → falling on `dv ≤ fall`
  * (emitting Peak with the steepest rise), falling → quiescent on
  * `dv ≥ termination` (emitting End with the sharpest fall), superlative
  * tracking with later-sample tie wins, crossing clock reset when the
  * test stops holding. If the two implementations agree on thousands of
  * random traces across random parameter draws, a regression in either
  * is caught for ARBITRARY durations and thresholds — complementing
  * q_trace_to_events_advanced's DuckDB oracle, which hash-checks the
  * full chain but only at duration = 0 (the recursive phase-walk CTE
  * in PipelineQueries.traceToEventsAdvancedSql).
  */
class AdvancedPropertySpec extends AnyFunSuite {

  // ---- independent functional model -----------------------------------

  private sealed trait Phase
  private case object Quiet extends Phase
  private case object Rising extends Phase
  private case object Falling extends Phase

  private final case class ModelState(
      phase: Phase,
      extremeT: Double,
      extremeV: Double,
      superT: Double,
      superV: Double,
      superD: Double,
      crossed: Option[Double])

  private final case class ModelEvent(
      time: Double,
      cls: String,
      value: Double,
      superlative: Option[(Double, Double, Double)])

  private def modelEvents(
      samples: Seq[(Double, Double, Double)], // (t, value, dvalue)
      onset: Double,
      fall: Double,
      termination: Double,
      duration: Double): List[ModelEvent] = {
    val init = ModelState(Quiet, 0, 0, 0, 0, 0, None)
    val (_, out) = samples.foldLeft((init, List.empty[ModelEvent])) {
      case ((s0, acc), (t, x, dx)) =>
        val test = s0.phase match {
          case Quiet => dx >= onset
          case Rising => dx <= fall
          case Falling => dx >= termination
        }
        // crossing clock: reset when the test stops holding, start when
        // it first holds
        val crossed = s0.crossed match {
          case Some(_) => if (!test) None else s0.crossed
          case None => if (test) Some(t) else None
        }
        // superlatives update on EVERY sample in a phase, ties to later
        val s1 = s0.phase match {
          case Quiet => s0.copy(crossed = crossed)
          case Rising =>
            val (st, sv, sd) =
              if (dx >= s0.superD) (t, x, dx) else (s0.superT, s0.superV, s0.superD)
            val (et, ev) = if (x >= s0.extremeV) (t, x) else (s0.extremeT, s0.extremeV)
            ModelState(Rising, et, ev, st, sv, sd, crossed)
          case Falling =>
            val (st, sv, sd) =
              if (dx <= s0.superD) (t, x, dx) else (s0.superT, s0.superV, s0.superD)
            val (et, ev) = if (x <= s0.extremeV) (t, x) else (s0.extremeT, s0.extremeV)
            ModelState(Falling, et, ev, st, sv, sd, crossed)
        }
        val sustained = crossed.exists(tc => t - tc >= duration)
        if (!sustained) (s1, acc)
        else
          s1.phase match {
            case Quiet =>
              (
                ModelState(Rising, t, x, t, x, dx, crossed),
                ModelEvent(t, "Onset", x, None) :: acc)
            case Rising =>
              (
                ModelState(Falling, t, x, t, x, dx, crossed),
                ModelEvent(
                  s1.extremeT,
                  "Peak",
                  s1.extremeV,
                  Some((s1.superT, s1.superV, s1.superD))) :: acc)
            case Falling =>
              (
                ModelState(Quiet, 0, 0, 0, 0, 0, crossed),
                ModelEvent(
                  s1.extremeT,
                  "End",
                  s1.extremeV,
                  Some((s1.superT, s1.superV, s1.superD))) :: acc)
          }
    }
    out.reverse
  }

  // ---- comparison harness ---------------------------------------------

  private def productionEvents(
      samples: Seq[(Double, Double, Double)],
      onset: Double,
      fall: Double,
      termination: Double,
      duration: Double): List[ModelEvent] =
    DetectorFn
      .over(
        samples.iterator.map { case (t, x, dx) => (t, Array(x, dx)) },
        new AdvancedMuonDetector(onset, fall, termination, duration))
      .toList
      .map(e =>
        ModelEvent(
          e.time,
          e.cls.toString,
          e.value,
          e.superlative.map(s => (s.time, s.value(0), s.value(1)))))

  test("functional model and production FSM agree on random traces and parameters") {
    val rng = new Random(42)
    var nonTrivial = 0
    for (_ <- 0 until 2000) {
      val n = rng.nextInt(120)
      // smooth-ish random walk so phases actually trigger
      var v = rng.nextDouble() * 20.0
      val values = Seq.fill(n) { v += rng.nextDouble() * 8.0 - 4.0; v }
      val samples = values.zipWithIndex.map { case (x, i) =>
        val dx = if (i == 0) 0.0 else x - values(i - 1)
        (i.toDouble, x, dx)
      }
      val onset = rng.nextDouble() * 3.0
      val fall = -rng.nextDouble() * 3.0
      val termination = rng.nextDouble() * 2.0
      val duration = rng.nextInt(3).toDouble
      val got = productionEvents(samples, onset, fall, termination, duration)
      val want = modelEvents(samples, onset, fall, termination, duration)
      assert(
        got == want,
        s"divergence for onset=$onset fall=$fall term=$termination dur=$duration\n" +
          s"prod : $got\nmodel: $want")
      if (got.nonEmpty) nonTrivial += 1
    }
    // the lock is vacuous if the random traces never trigger the FSM
    assert(nonTrivial > 500, s"only $nonTrivial non-trivial traces — generator too tame")
  }

  test("reference vector through both implementations (advanced_muon_detector.rs test data)") {
    val data = Seq[Double](4, 3, 2, 5, 6, 1, 5, 7, 2, 4)
    val samples = data.zipWithIndex.map { case (x, i) =>
      (i.toDouble, x, if (i == 0) 0.0 else x - data(i - 1))
    }
    val got = productionEvents(samples, 1.0, 1.0, 1.0, 0.0)
    val want = modelEvents(samples, 1.0, 1.0, 1.0, 0.0)
    assert(got == want && got.nonEmpty)
  }
}
