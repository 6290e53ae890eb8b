package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** Reference-vector lock for the pure-Scala DSP core. Every expected value
  * below comes from the reference's inline unit tests (cited per case), so
  * the Spark engine computes bit-identical event lists.
  */
class DspSpec extends AnyFunSuite {

  private def indexed(data: Seq[Double]): Iterator[(Double, Double)] =
    data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) }

  // --- ThresholdDetector (threshold_detector.rs:126-251) ---

  private def thresholdEvents(
      data: Seq[Double],
      threshold: Double,
      duration: Int,
      coolOff: Int): List[(Double, Double)] =
    DetectorFn
      .over(indexed(data), new ThresholdDetector(threshold, duration, coolOff))
      .map(e => (e.time, e.pulseHeight))
      .toList

  test("threshold: zero data") {
    assert(thresholdEvents(Nil, 2.0, 2, 0) === Nil)
  }

  test("threshold: positive threshold (threshold_detector.rs:143-159)") {
    val data = Seq[Double](4, 3, 2, 5, 6, 1, 5, 7, 2, 4)
    assert(thresholdEvents(data, 2.0, 2, 0) === List((0.0, 4.0), (3.0, 6.0), (6.0, 7.0)))
  }

  test("threshold: negative threshold (threshold_detector.rs:162-177)") {
    val data = Seq[Double](4, 3, 2, 5, 2, 1, 5, 7, 2, 2, 2, 4).map(-_)
    assert(thresholdEvents(data, -2.5, 2, 0) === List((4.0, -1.0), (8.0, -2.0)))
  }

  test("threshold: zero duration yields nothing (threshold_detector.rs:180-193)") {
    val data = Seq[Double](4, 3, 2, 5, 2, 1, 5, 7, 2, 2).map(-_)
    assert(thresholdEvents(data, -2.5, 0, 0) === Nil)
  }

  test("threshold: cool-off variants (threshold_detector.rs:196-251)") {
    val data = Seq[Double](4, 3, 2, 5, 2, 1, 5, 7, 2, 2).map(-_)
    assert(
      thresholdEvents(data, -2.5, 1, 2) ===
        List((2.0, -2.0), (5.0, -1.0), (8.0, -2.0)))
    assert(
      thresholdEvents(data, -2.5, 1, 1) ===
        List((2.0, -2.0), (4.0, -1.0), (8.0, -2.0)))
    assert(
      thresholdEvents(data, -2.5, 1, 0) ===
        List((2.0, -2.0), (4.0, -1.0), (8.0, -2.0)))
  }

  // --- DifferentialThresholdDetector (differential_threshold_detector.rs:138-292) ---

  private def diffEvents(
      data: Seq[Double],
      threshold: Double,
      duration: Int,
      coolOff: Int,
      cm: Option[Double]): List[(Double, Double)] =
    DetectorFn
      .over(
        WindowFn.over(indexed(data), new FiniteDifferencesWindow(2)),
        new DifferentialThresholdDetector(threshold, duration, coolOff, cm))
      .map(e => (e.time, e.pulseHeight))
      .toList

  test("differential: positive threshold with constant multiple (:159-178)") {
    val data = Seq[Double](4, 3, 2, 5, 6, 1, 5, 7, 2, 4)
    assert(diffEvents(data, 2.0, 2, 0, Some(2.0)) === List((3.0, 10.0), (6.0, 10.0)))
  }

  test("differential: positive threshold without constant multiple (:181-200)") {
    val data = Seq[Double](4, 3, 2, 5, 6, 1, 5, 7, 2, 4)
    assert(diffEvents(data, 2.0, 2, 0, None) === List((3.0, 6.0), (6.0, 7.0)))
  }

  test("differential: zero duration yields nothing (:203-220)") {
    val data = Seq[Double](4, 3, 2, 5, 2, 1, 5, 7, 2, 2).map(-_)
    assert(diffEvents(data, -2.5, 0, 0, Some(2.0)) === Nil)
  }

  test("differential: cool-off variants (:223-292)") {
    val data = Seq[Double](4, 3, 2, 5, 2, 1, 5, 7, 2, 6, 5, 8, 8, 11, 0)
    assert(
      diffEvents(data, 2.5, 1, 3, Some(2.0)) ===
        List((3.0, 10.0), (9.0, 12.0), (13.0, 22.0)))
    assert(
      diffEvents(data, 2.5, 1, 2, Some(2.0)) ===
        List((3.0, 10.0), (6.0, 10.0), (11.0, 16.0)))
    assert(
      diffEvents(data, 2.5, 1, 1, Some(2.0)) ===
        List((3.0, 10.0), (6.0, 10.0), (9.0, 12.0), (11.0, 16.0), (13.0, 22.0)))
  }

  // --- AdvancedMuonDetector (advanced_muon_detector.rs:319-408) ---

  test("advanced detector: event classes and superlatives") {
    val data = Seq[Double](4, 3, 2, 5, 6, 1, 5, 7, 2, 4)
    val events = DetectorFn
      .over(
        WindowFn.over(indexed(data), new FiniteDifferencesWindow(2)),
        new AdvancedMuonDetector(1.0, 1.0, 1.0, 0.0))
      .toList
    assert(events.length === 6)
    assert(events(0).time === 3.0 && events(0).cls === PulseClass.Onset && events(0).value === 5.0)
    assert(events(1).time === 4.0 && events(1).cls === PulseClass.Peak && events(1).value === 6.0)
    assert(events(1).superlative.get.time === 3.0)
    assert(events(1).superlative.get.value.toSeq === Seq(5.0, 3.0))
    assert(events(2).time === 5.0 && events(2).cls === PulseClass.End && events(2).value === 1.0)
    assert(events(2).superlative.get.time === 5.0)
    assert(events(2).superlative.get.value.toSeq === Seq(1.0, -5.0))
    assert(events(3).time === 7.0 && events(3).cls === PulseClass.Onset && events(3).value === 7.0)
    assert(events(4).time === 7.0 && events(4).cls === PulseClass.Peak && events(4).value === 7.0)
    assert(events(5).time === 8.0 && events(5).cls === PulseClass.End && events(5).value === 2.0)
  }

  // --- Windows ---

  test("baseline: zero warm-up is identity (baseline.rs:57-73)") {
    val out = WindowFn.over(indexed(Seq(1.0, 3.0, 6.0, -1.0, 5.0)), new BaselineWindow(0, 0.1)).toList
    assert(out === List((0.0, 1.0), (1.0, 3.0), (2.0, 6.0), (3.0, -1.0), (4.0, 5.0)))
  }

  test("baseline: constant data (baseline.rs:76-90)") {
    val out =
      WindowFn.over(indexed(Seq.fill(7)(1.0)), new BaselineWindow(3, 0.1)).toList
    assert(out === List((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0)))
  }

  test("baseline: initially constant data (baseline.rs:93-107)") {
    val out = WindowFn
      .over(indexed(Seq(1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 3.0)), new BaselineWindow(3, 0.1))
      .toList
    assert(out === List((0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (3.0, 2.0)))
  }

  test("baseline: varying data EWMA (baseline.rs:110-124)") {
    val out = WindowFn
      .over(indexed(Seq(1.0, 2.0, 0.0, 0.0, 1.0, 2.0, 3.0)), new BaselineWindow(3, 0.2))
      .map(_._2)
      .toList
    val expected = List(-0.96, 0.04, 1.04, 2.04)
    out.zip(expected).foreach { case (got, want) => assert(math.abs(got - want) < 1e-8) }
  }

  test("smoothing: size one is identity with zero variance (smoothing_window.rs:102-118)") {
    val out =
      WindowFn.over(indexed(Seq(4.0, 3.0, 2.0, 5.0)), new SmoothingWindow(1)).toList
    assert(out.map(_._2.value) === List(4.0, 3.0, 2.0, 5.0))
    assert(out.forall(o => o._2.variance === 0.0 && o._2.value === o._2.mean))
  }

  test("smoothing: minimal window of two (smoothing_window.rs:158-174)") {
    val (t, stats) =
      WindowFn.over(indexed(Seq(4.0, 3.0)), new SmoothingWindow(2)).next()
    assert(t === 0.5)
    assert(stats.value === 3.0)
    assert(math.abs(stats.mean - 3.5) < 1e-9)
    val wantVar = (math.pow(4.0 - 3.5, 2) + math.pow(3.0 - 3.5, 2)) / 1.0
    assert(math.abs(stats.variance - wantVar) < 1e-9)
  }

  test("smoothing: five data three window (smoothing_window.rs:217-259)") {
    val out =
      WindowFn.over(indexed(Seq(4.0, 3.0, 1.0, 5.0, 3.0)), new SmoothingWindow(3)).toList
    assert(out.map(_._1) === List(1.0, 2.0, 3.0))
    assert(out.map(_._2.value) === List(1.0, 5.0, 3.0))
    val means = out.map(_._2.mean)
    assert(math.abs(means(0) - 8.0 / 3) < 1e-9)
    assert(math.abs(means(1) - 3.0) < 1e-9)
    assert(math.abs(means(2) - 3.0) < 1e-9)
  }

  test("smoothing: insufficient data emits nothing (smoothing_window.rs:146-156)") {
    assert(WindowFn.over(indexed(Seq(4.0, 3.0)), new SmoothingWindow(3)).isEmpty)
  }

  test("finite differences order 3 (finite_differences.rs:70-85)") {
    val out = WindowFn
      .over(indexed(Seq(0.0, 6.0, 2.0, 1.0, 3.0, 1.0, 0.0)), new FiniteDifferencesWindow(3))
      .map(_._2.toSeq)
      .toList
    assert(
      out === List(
        Seq(2.0, -4.0, -10.0),
        Seq(1.0, -1.0, 3.0),
        Seq(3.0, 2.0, 3.0),
        Seq(1.0, -2.0, -4.0),
        Seq(0.0, -1.0, 1.0)))
  }

  // --- Full channel pipeline (processing.rs:168-511) ---

  private def fixed(th: Double) = DetectorSettings(FixedThreshold(th, 1, 0))

  test("channel: fixed threshold, positive, zero baseline (processing.rs:168-214)") {
    val v = Array(0, 1, 2, 1, 0, 1, 2, 1, 8, 0, 2, 8, 3, 1, 2)
    val (t, h) = ChannelEvents.findChannelEvents(v, 1.0, fixed(5.0))
    assert(t.toSeq === Seq(8L, 11L))
    assert(h.toSeq === Seq(8, 8))
  }

  test("channel: fixed threshold, positive, nonzero baseline (processing.rs:317-362)") {
    val v = Array(3, 4, 5, 4, 3, 4, 5, 4, 11, 3, 5, 11, 6, 4, 5)
    val (t, h) = ChannelEvents.findChannelEvents(
      v,
      1.0,
      DetectorSettings(FixedThreshold(5.0, 1, 0), positivePolarity = true, baseline = 3.0))
    assert(t.toSeq === Seq(8L, 11L))
    assert(h.toSeq === Seq(8, 8))
  }

  test("channel: fixed threshold, negative polarity, baseline 10 (processing.rs:415-460)") {
    val v = Array(10, 9, 8, 9, 10, 9, 8, 9, 2, 10, 8, 2, 7, 9, 8)
    val (t, h) = ChannelEvents.findChannelEvents(
      v,
      1.0,
      DetectorSettings(FixedThreshold(5.0, 1, 0), positivePolarity = false, baseline = 10.0))
    assert(t.toSeq === Seq(8L, 11L))
    assert(h.toSeq === Seq(8, 8))
  }

  test("channel: advanced detector (processing.rs:266-315)") {
    val v = Array(0, 1, 2, 1, 0, 1, 2, 1, 8, 0, 2, 8, 3, 1, 2)
    val (t, h) = ChannelEvents.findChannelEvents(
      v,
      1.0,
      DetectorSettings(
        AdvancedMuon(
          muonOnset = 0.5,
          muonFall = -0.01,
          muonTermination = 0.001,
          duration = 0.0,
          smoothingWindowSize = Some(2))))
    assert(t.toSeq === Seq(1L, 7L))
    assert(h.toSeq === Seq(1, 4))
  }
}
