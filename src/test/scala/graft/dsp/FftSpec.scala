package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** The radix-2 FFT against a naive O(n²) DFT model plus closed forms:
  * impulse (flat spectrum), pure tone (single bin pair), Parseval's
  * identity, linearity under random inputs, and the power-of-two guard.
  */
class FftSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val ang = -2.0 * math.Pi * j * k / n
      re(k) += x(j) * math.cos(ang)
      im(k) += x(j) * math.sin(ang)
    }
    (re, im)
  }

  test("random signals match the naive DFT to 1e-9 (relative)") {
    val rnd = new scala.util.Random(5)
    for (n <- Seq(8, 64, 256); _ <- 1 to 5) {
      val x = Array.fill(n)(rnd.nextDouble() * 200.0 - 100.0)
      val re = x.clone(); val im = new Array[Double](n)
      Fft.fft(re, im)
      val (er, ei) = naiveDft(x)
      val scale = math.max(1.0, x.map(math.abs).sum)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) / scale < 1e-9, s"n=$n k=$k re")
        assert(math.abs(im(k) - ei(k)) / scale < 1e-9, s"n=$n k=$k im")
      }
    }
  }

  test("impulse → flat unit spectrum; constant → DC only") {
    val imp = Array.tabulate(16)(j => if (j == 0) 1.0 else 0.0)
    val ps = Fft.powerSpectrum(imp)
    assert(ps.forall(p => math.abs(p - 1.0 / (16.0 * 16.0)) < 1e-12))
    val const = Array.fill(16)(3.0)
    val psc = Fft.powerSpectrum(const)
    assert(math.abs(psc(0) - 9.0) < 1e-12) // (16*3)²/16² = 9
    assert(psc.tail.forall(p => math.abs(p) < 1e-12))
  }

  test("pure tone concentrates in its bin") {
    val n = 64
    val tone = Array.tabulate(n)(j => math.cos(2.0 * math.Pi * 5 * j / n))
    val ps = Fft.powerSpectrum(tone)
    // cos tone of amplitude 1 → |X_5|² = (n/2)², normalised (1/2)² = 0.25
    assert(math.abs(ps(5) - 0.25) < 1e-10)
    for (k <- ps.indices if k != 5) assert(math.abs(ps(k)) < 1e-10, s"bin $k leaks")
  }

  test("Parseval: sum |X|² == n · sum |x|²") {
    val rnd = new scala.util.Random(17)
    val n = 128
    val x = Array.fill(n)(rnd.nextDouble() * 10.0)
    val re = x.clone(); val im = new Array[Double](n)
    Fft.fft(re, im)
    val lhs = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum
    val rhs = n.toDouble * x.map(v => v * v).sum
    assert(math.abs(lhs - rhs) / rhs < 1e-12)
  }

  test("ifft inverts fft; FFT cross-correlation == direct sum") {
    val rnd = new scala.util.Random(23)
    val n = 64
    val x = Array.fill(n)(rnd.nextDouble() * 100.0)
    val re = x.clone(); val im = new Array[Double](n)
    Fft.fft(re, im)
    Fft.ifft(re, im)
    for (j <- 0 until n) {
      assert(math.abs(re(j) - x(j)) < 1e-10, s"re $j")
      assert(math.abs(im(j)) < 1e-10, s"im $j")
    }
    for (_ <- 1 to 10) {
      val sig = Array.fill(40 + rnd.nextInt(60))(rnd.nextDouble() * 50.0)
      val g = Array.fill(1 + rnd.nextInt(12))(rnd.nextDouble())
      val got = Fft.crossCorrelate(sig, g)
      assert(got.length == sig.length - g.length + 1)
      for (t <- got.indices) {
        val direct = g.indices.map(j => sig(t + j) * g(j)).sum
        assert(math.abs(got(t) - direct) < 1e-8, s"t=$t")
      }
    }
  }

  test("non-power-of-two lengths are rejected") {
    val e = intercept[IllegalArgumentException](Fft.fft(new Array[Double](6), new Array[Double](6)))
    assert(e.getMessage.contains("power of two"))
  }
}
