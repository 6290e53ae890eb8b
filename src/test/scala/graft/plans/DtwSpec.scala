package graft.plans

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks [[DtwDistance]] to the textbook DTW recurrence: identical cost
  * to a naive full-matrix DP whenever the band covers the optimum,
  * band-clipped monotonicity, −1 sentinels, and the SQL/codegen surface.
  */
class DtwSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("dtw-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def ref(a: Array[Long], b: Array[Long], r: Int): Long = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0 || math.abs(n - m) > r) return -1L
    val INF = Long.MaxValue / 4
    val dp = Array.fill(n + 1, m + 1)(INF)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m if math.abs(i - j) <= r) {
      val best = math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
      if (best < INF) dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) + best
    }
    if (dp(n)(m) >= INF) -1L else dp(n)(m)
  }

  private def dist(a: Array[Long], b: Array[Long], r: Int): Long =
    DtwDistance.dist(ArrayData.toArrayData(a), ArrayData.toArrayData(b), r)

  test("dist: agrees with the full-matrix banded DP on a random corpus") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(24)
      val m = math.max(1, n + rnd.nextInt(7) - 3)
      val a = Array.fill(n)(rnd.nextInt(1000).toLong)
      val b = Array.fill(m)(rnd.nextInt(1000).toLong)
      for (r <- Seq(0, 1, 3, 8, 50)) {
        assert(dist(a, b, r) == ref(a, b, r), s"n=$n m=$m r=$r")
      }
    }
  }

  test("dist: identical series cost 0; empty or unreachable is -1") {
    val a = Array(5L, 9L, 1L, 7L)
    assert(dist(a, a, 0) == 0L)
    assert(dist(Array.empty[Long], a, 10) == -1L)
    assert(dist(a, Array(1L), 1) == -1L) // |n-m|=3 > r=1
    // a wide band can only lower the cost
    val b = Array(9L, 5L, 7L, 1L)
    assert(dist(a, b, 8) <= dist(a, b, 1))
  }

  test("SQL surface: dtw_dist matches the reference DP through codegen") {
    DtwDistance.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map { i =>
      val n = 1 + rnd.nextInt(20)
      (i, Array.fill(n)(rnd.nextInt(500).toLong), Array.fill(n)(rnd.nextInt(500).toLong))
    }
    val got = rows
      .toDF("id", "a", "b")
      .select(col("id"), expr("dtw_dist(a, b, 5)").as("d"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    rows.foreach { case (i, a, b) =>
      assert(got(i) == ref(a, b, 5), s"row $i")
    }
  }
}
