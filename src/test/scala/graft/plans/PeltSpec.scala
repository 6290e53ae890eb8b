package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** [[PeltSegments.decode]] against the un-pruned full O(T²) dynamic
  * program: PELT's candidate pruning must be lossless, so the pruned
  * kernel has to return the identical optimal segmentation (including
  * the smallest-argmin tie-break) on every random series. Also locks
  * the non-negative-domain guard and the planted-shift recovery.
  */
class PeltSpec extends AnyFunSuite {

  private val Scale = PeltSegments.Scale

  /** Naive full-scan DP over the identical scaled-integer cost. */
  private def naive(ys: Array[Long], mult: Long): Seq[Long] = {
    val t = ys.length
    val cum = ys.scanLeft(0L)(_ + _)
    val cumSq = ys.scanLeft(0L)((a, y) => a + y * y)
    val pen = (1L + mult * (cum(t) / t)) * Scale
    def cost(s: Int, e: Int): Long = {
      val sm = cum(e) - cum(s)
      (cumSq(e) - cumSq(s)) * Scale - (sm * sm * Scale) / (e - s)
    }
    val f = new Array[Long](t + 1)
    val am = new Array[Int](t + 1)
    f(0) = -pen
    for (e <- 1 to t) {
      var best = Long.MaxValue
      var arg = 0
      for (s <- 0 until e) {
        val v = f(s) + cost(s, e) + pen
        if (v < best) { best = v; arg = s } // ascending scan → first min
      }
      f(e) = best; am(e) = arg
    }
    var cps = List.empty[Long]
    var j = t
    while (j > 0) { val s = am(j); if (s > 0) cps = s.toLong :: cps; j = s }
    cps
  }

  private def decode(ys: Array[Long], mult: Long): Seq[Long] =
    PeltSegments.decode(new GenericArrayData(ys), mult).toLongArray().toSeq

  test("pruned kernel matches the full DP on random series") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 300) {
      val t = 1 + rnd.nextInt(40)
      // mix flat noise with occasional level shifts so both "no
      // changepoint" and "many changepoints" regimes are hit
      var level = 20L + rnd.nextInt(50)
      val ys = Array.fill(t) {
        if (rnd.nextInt(8) == 0) level = 20L + rnd.nextInt(50)
        math.max(0L, level + rnd.nextInt(11) - 5)
      }
      val mult = rnd.nextInt(4).toLong
      assert(decode(ys, mult) == naive(ys, mult),
        s"trial $trial ys=${ys.mkString(",")} mult=$mult")
    }
  }

  test("a planted large shift is recovered exactly") {
    val ys = Array.fill(12)(50L) ++ Array.fill(12)(200L)
    assert(decode(ys, 2L) == Seq(12L))
  }

  test("degenerate inputs: empty series, single point, negative value") {
    assert(decode(Array.empty[Long], 2L).isEmpty)
    assert(decode(Array(7L), 2L).isEmpty)
    intercept[IllegalArgumentException] {
      decode(Array(3L, -1L), 2L)
    }
  }
}
