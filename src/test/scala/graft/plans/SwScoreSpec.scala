package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[SwScore.score]] against a naive full-matrix Smith-Waterman. */
class SwScoreSpec extends AnyFunSuite {

  private def arr(ws: String*): GenericArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  private def naive(a: Seq[String], b: Seq[String], mt: Long, mm: Long, gap: Long): Long = {
    val n = a.length; val m = b.length
    val h = Array.ofDim[Long](n + 1, m + 1)
    var best = 0L
    for (i <- 1 to n; j <- 1 to m) {
      val s = if (a(i - 1) == b(j - 1)) mt else mm
      h(i)(j) = math.max(
        0L,
        math.max(h(i - 1)(j - 1) + s, math.max(h(i - 1)(j) - gap, h(i)(j - 1) - gap)))
      best = math.max(best, h(i)(j))
    }
    best
  }

  test("known alignments") {
    assert(SwScore.score(arr("a", "b"), arr("a", "b"), 3, -2, 2) == 6)
    assert(SwScore.score(arr("a", "b", "c"), arr("x", "y", "z"), 3, -2, 2) == 0)
    // gap bridging: a b X c vs a b c -> match match gap match = 3+3-2+3
    assert(SwScore.score(arr("a", "b", "X", "c"), arr("a", "b", "c"), 3, -2, 2) == 7)
    assert(SwScore.score(arr(), arr("a"), 3, -2, 2) == 0)
    assert(SwScore.score(arr("a"), arr(), 3, -2, 2) == 0)
  }

  test("matches naive full-matrix DP on random token sequences") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 300) {
      val a = Vector.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val b = Vector.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val fast = SwScore.score(arr(a: _*), arr(b: _*), 3, -2, 2)
      val slow = naive(a, b, 3, -2, 2)
      assert(fast == slow, s"a=$a b=$b fast=$fast slow=$slow")
      assert(fast <= 3L * math.min(a.size, b.size))
    }
  }
}
