package graft.sources

import graft.sources.TraceGenerator.GeneratorConfig
import org.scalatest.funsuite.AnyFunSuite

/** The generator's affine voltage transform (P8/F9: baseline offset +
  * amplitude scaling + u16 clamp, `simulator` voltage-transformation
  * semantics): same-seed runs isolate each affine component exactly —
  * shifting the baseline translates every sample, scaling maxAmplitude
  * scales every excursion, and the clamp pins the u16 range.
  */
class TraceGeneratorSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("trace-generator-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def voltages(cfg: GeneratorConfig): Array[Int] =
    TraceGenerator
      .traces(spark, cfg)
      .collect()
      .head
      .channels
      .head
      .voltage

  private val base = GeneratorConfig(
    nFrames = 1,
    nDigitizers = 1,
    channelsPerDigitizer = 1,
    timeBins = 200,
    noiseSd = 0.0)

  test("baseline shift is an exact translation of every sample (no clamp engaged)") {
    val v1 = voltages(base.copy(baseline = 50, maxAmplitude = 400.0))
    val v2 = voltages(base.copy(baseline = 150, maxAmplitude = 400.0))
    assert(v1.length == 200 && v2.length == 200)
    // identical seed → identical pulse draws; +100 baseline adds exactly
    // 100 to the double before truncation, so every sample shifts by 100
    assert(v1.indices.forall(i => v2(i) - v1(i) == 100), "baseline must translate affinely")
  }

  test("maxAmplitude scales every excursion linearly (within int truncation)") {
    val v1 = voltages(base.copy(baseline = 50, maxAmplitude = 300.0))
    val v2 = voltages(base.copy(baseline = 50, maxAmplitude = 600.0))
    // amp draws are linear in maxAmplitude under the same rng sequence,
    // so (v − baseline) doubles up to ±2 counts of double→int truncation
    v1.indices.foreach { i =>
      val e1 = v1(i) - 50
      val e2 = v2(i) - 50
      assert(math.abs(e2 - 2 * e1) <= 2, s"sample $i: $e1 vs $e2")
    }
    assert(v1.indices.exists(i => v1(i) - 50 > 10), "fixture must contain real pulses")
  }

  test("u16 clamp: huge amplitudes saturate at 65535, never overflow or go negative") {
    val v = voltages(base.copy(baseline = 50, maxAmplitude = 1e9))
    assert(v.forall(x => x >= 0 && x <= 65535))
    assert(v.exists(_ == 65535), "clamp must actually engage at this amplitude")
  }

  test("per-(frame, digitiser) seeds are injective over the full u8 id range") {
    // the old packing frame*131 + did aliased (f, 131) with (f+1, 0):
    // two "distinct" sources emitted bit-identical noise/pulses/vetoes
    val seeds = for {
      f <- 0L until 8L
      d <- 0 until 256
    } yield TraceGenerator.frameDigSeed(42L, f, d)
    assert(seeds.distinct.length == seeds.length,
      "seed collision across (frame, digitiser) pairs")
    // and did <= 130 stays bit-identical to the original packing, so
    // every existing fixture/oracle is unchanged
    assert(TraceGenerator.frameDigSeed(42L, 3L, 7) ==
      TraceGenerator.mixSeed(42L * 1000003L + 3L * 131L + 7L))
  }
}
