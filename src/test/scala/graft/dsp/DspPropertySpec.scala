package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style invariants for the detector FSMs (SURVEY §5): event
  * times strictly increasing with cool-off spacing, heights above
  * threshold, SoA length alignment, window-function equivalence to naive
  * recomputation. Seeded random traces (200 per property) rather than a
  * property-testing framework — the offline dependency set has no
  * scalatest/scalacheck bridge.
  */
class DspPropertySpec extends AnyFunSuite {

  private def randomTrace(rng: Random): List[Double] =
    List.fill(rng.nextInt(200))(rng.nextDouble() * 200.0 - 50.0)

  private def events(
      data: List[Double],
      threshold: Double,
      duration: Int,
      coolOff: Int): List[ThresholdEvent] =
    DetectorFn
      .over(
        data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) },
        new ThresholdDetector(threshold, duration, coolOff))
      .toList

  test("threshold events are strictly increasing and spaced by >= duration") {
    val rng = new Random(1)
    for (_ <- 0 until 200) {
      val data = randomTrace(rng)
      val duration = 1 + rng.nextInt(4)
      val coolOff = rng.nextInt(6)
      val ts = events(data, 50.0, duration, coolOff).map(_.time)
      assert(ts === ts.sorted)
      assert(ts.distinct.length === ts.length)
      ts.sliding(2).foreach {
        case List(a, b) => assert(b - a >= duration.toDouble)
        case _ =>
      }
    }
  }

  test("pulse heights always exceed the threshold") {
    val rng = new Random(2)
    for (_ <- 0 until 200) {
      val data = randomTrace(rng)
      events(data, 50.0, 1 + rng.nextInt(4), 0).foreach(e => assert(e.pulseHeight > 50.0))
    }
  }

  test("channel event formation keeps time/height arrays aligned") {
    val rng = new Random(3)
    for (_ <- 0 until 200) {
      val v = Array.fill(rng.nextInt(300))(rng.nextInt(500))
      val (t, h) = ChannelEvents.findChannelEvents(
        v, 1.0, DetectorSettings(FixedThreshold(80.0, 1 + rng.nextInt(3), rng.nextInt(4))))
      assert(t.length === h.length)
    }
  }

  test("finite differences order 2 equals value and first difference") {
    val rng = new Random(4)
    for (_ <- 0 until 100) {
      val data = List.fill(2 + rng.nextInt(100))(rng.nextDouble() * 100)
      val out = WindowFn
        .over(
          data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) },
          new FiniteDifferencesWindow(2))
        .toList
      assert(out.length === data.length - 1)
      out.zipWithIndex.foreach { case ((_, arr), i) =>
        assert(arr(0) === data(i + 1))
        assert(math.abs(arr(1) - (data(i + 1) - data(i))) < 1e-9)
      }
    }
  }

  test("smoothing window mean/variance match naive recompute") {
    val rng = new Random(5)
    for (_ <- 0 until 100) {
      val size = 2 + rng.nextInt(4)
      val data = List.fill(size + rng.nextInt(100))(rng.nextDouble() * 100)
      val out = WindowFn
        .over(
          data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) },
          new SmoothingWindow(size))
        .toList
      out.zipWithIndex.foreach { case ((_, stats), i) =>
        val window = data.slice(i, i + size)
        val mean = window.sum / size
        val variance = window.map(x => (x - mean) * (x - mean)).sum / (size - 1)
        assert(math.abs(stats.mean - mean) < 1e-6)
        assert(math.abs(stats.variance - variance) < 1e-6)
      }
    }
  }

  test("frame SoA concat preserves total event counts") {
    val rng = new Random(6)
    for (_ <- 0 until 100) {
      val nDigs = 1 + rng.nextInt(6)
      val perDig = Array.fill(nDigs)(rng.nextInt(50))
      val msgs = perDig.zipWithIndex.map { case (n, did) =>
        graft.schemas.EventListMessage(
          did,
          graft.schemas.FrameMetadata(1L, 0L, 0, true, 0L, 0),
          Array.fill(n)(rng.nextLong()),
          Array.fill(n)(rng.nextInt(1000)),
          Array.fill(n)(rng.nextLong()))
      }
      // pure concat model (the aggregation operator's merge step)
      val total = msgs.map(_.time.length).sum
      assert(total === perDig.sum)
    }
  }

  // ------------------------------------------------------------------
  // r14: loop-kernel ≡ iterator-composition parity (DetectorKernels)
  // ------------------------------------------------------------------

  test("DetectorKernels.threshold ≡ DetectorFn.over on random traces") {
    val rng = new Random(14)
    for (_ <- 0 until 200) {
      val data = randomTrace(rng).toArray
      val th = rng.nextDouble() * 100.0
      val duration = 1 + rng.nextInt(4)
      val coolOff = rng.nextInt(6)
      val viaIter = DetectorFn
        .over(
          data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) },
          new ThresholdDetector(th, duration, coolOff))
        .map(e => (e.time, e.pulseHeight))
        .toList
      val viaLoop = scala.collection.mutable.ListBuffer.empty[(Double, Double)]
      DetectorKernels.threshold(data, 1.0, 1.0, 0.0, th, duration, coolOff) {
        (t, v) => viaLoop += ((t, v))
      }
      assert(viaLoop.toList === viaIter)
    }
  }

  test("DetectorKernels.differential ≡ window+detector iterators on random traces") {
    val rng = new Random(15)
    for (_ <- 0 until 200) {
      val data = randomTrace(rng).toArray
      val th = rng.nextDouble() * 20.0
      val duration = 1 + rng.nextInt(3)
      val coolOff = rng.nextInt(5)
      val cm = if (rng.nextBoolean()) Some(rng.nextDouble() * 3.0) else None
      val viaIter = DetectorFn
        .over(
          WindowFn.over(
            data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) },
            new FiniteDifferencesWindow(2)),
          new DifferentialThresholdDetector(th, duration, coolOff, cm))
        .map(e => (e.time, e.pulseHeight))
        .toList
      val viaLoop = scala.collection.mutable.ListBuffer.empty[(Double, Double)]
      DetectorKernels.differential(data, 1.0, 1.0, 0.0, th, duration, coolOff, cm) {
        (t, v) => viaLoop += ((t, v))
      }
      assert(viaLoop.toList === viaIter)
    }
  }

  test("DetectorKernels.advanced ≡ full iterator chain on random traces") {
    val rng = new Random(16)
    for (_ <- 0 until 200) {
      val data = randomTrace(rng).toArray
      val onset = rng.nextDouble() * 5.0
      val fall = -rng.nextDouble() * 5.0
      val term = -rng.nextDouble()
      val duration = rng.nextInt(3).toDouble
      val bl = rng.nextInt(4)
      val sm = 1 + rng.nextInt(4)
      val raw = data.iterator.zipWithIndex.map { case (v, i) => (i.toDouble, v) }
      val smoothed = WindowFn
        .over(WindowFn.over(raw, new BaselineWindow(bl, 0.1)), new SmoothingWindow(sm))
        .map { case (t, stats) => (t, stats.mean) }
      val viaIter = AdvancedMuonAssembler
        .over(DetectorFn.over(
          WindowFn.over(smoothed, new FiniteDifferencesWindow(2)),
          new AdvancedMuonDetector(onset, fall, term, duration)))
        .map(p => (
          p.steepestRise.map(_.time).getOrElse(0.0),
          p.peak.map(_.value).getOrElse(0.0)))
        .toList
      val viaLoop = scala.collection.mutable.ListBuffer.empty[(Double, Double)]
      DetectorKernels.advanced(
        data, 1.0, 1.0, 0.0, onset, fall, term, duration, bl, sm) { p =>
        viaLoop += ((
          p.steepestRise.map(_.time).getOrElse(0.0),
          p.peak.map(_.value).getOrElse(0.0)))
      }
      assert(viaLoop.toList === viaIter)
    }
  }
}
