package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** [[ViterbiPath.decode]] against exhaustive path enumeration: for every
  * short observation sequence, the decoded path must (a) score exactly
  * the brute-force max-plus optimum when re-scored from the weight
  * tables, and (b) be deterministic under the documented first-max
  * (lowest-state) tie-break.
  */
class ViterbiSpec extends AnyFunSuite {

  private val S = 3
  private val O = 4
  private val init = Array(0L, -500L, -900L)
  private val trans = Array(-100L, -700L, -900L, -600L, -200L, -800L, -500L, -700L, -300L)
  private val emit = Array(
    -100L, -400L, -900L, -1200L,
    -800L, -200L, -300L, -900L,
    -900L, -800L, -700L, -100L)

  private def score(obs: Array[Int], path: Array[Int]): Long = {
    var s = init(path(0)) + emit(path(0) * O + obs(0))
    var i = 1
    while (i < obs.length) {
      s += trans(path(i - 1) * S + path(i)) + emit(path(i) * O + obs(i))
      i += 1
    }
    s
  }

  private def bruteBest(obs: Array[Int]): Long = {
    var best = Long.MinValue
    val n = obs.length
    val total = math.pow(S, n).toInt
    var code = 0
    while (code < total) {
      val path = new Array[Int](n)
      var c = code
      var i = 0
      while (i < n) { path(i) = c % S; c /= S; i += 1 }
      val sc = score(obs, path)
      if (sc > best) best = sc
      code += 1
    }
    best
  }

  private def decode(obs: Array[Int]): Array[Long] =
    ViterbiPath
      .decode(new GenericArrayData(obs), init, trans, emit, S, O)
      .toLongArray()

  test("decoded path scores the brute-force optimum on every short sequence") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(7)
      val obs = Array.fill(n)(rnd.nextInt(O))
      val path = decode(obs)
      assert(path.length == n)
      val sc = score(obs, path.map(p => p.toInt - 1))
      assert(sc == bruteBest(obs), s"obs=${obs.mkString(",")} path=${path.mkString(",")}")
    }
  }

  test("ties break to the lowest state index and the decode is deterministic") {
    // symmetric weights force ties: identical init/trans/emit rows
    val tInit = Array(0L, 0L)
    val tTrans = Array(0L, 0L, 0L, 0L)
    val tEmit = Array(-1L, -1L, -1L, -1L)
    val path = ViterbiPath
      .decode(new GenericArrayData(Array(0, 1, 0)), tInit, tTrans, tEmit, 2, 2)
      .toLongArray()
    assert(path.toSeq == Seq(1L, 1L, 1L)) // every argmax tie → state 1
  }

  test("empty and malformed observation sequences yield empty paths") {
    assert(decode(Array.empty[Int]).isEmpty)
    assert(decode(Array(0, O, 1)).isEmpty) // out-of-range code
    assert(decode(Array(-1)).isEmpty)
  }

  test("more than 128 states fails type-check (byte backpointer bound)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val child = Literal.create(Array(0), ArrayType(IntegerType))
    def expr(s: Int) = ViterbiPath(
      child,
      init = new Array[Long](s),
      trans = new Array[Long](s * s),
      emit = new Array[Long](s * 2))
    assert(expr(128).checkInputDataTypes().isSuccess)
    val over = expr(129).checkInputDataTypes()
    assert(!over.isSuccess)
    assert(over.toString.contains("128"))
  }
}
