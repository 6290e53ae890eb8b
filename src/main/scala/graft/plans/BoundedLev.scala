package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded Levenshtein distance: `bounded_lev(a, b, k)` returns
  * the exact edit distance when it is ≤ k, else −1 — the same contract
  * as Spark's 3-argument `levenshtein`, but optimised for the
  * record-linkage hot loop ([[graft.queries.RelationalQueries.fuzzyMatch]]):
  *
  *   - common prefix/suffix TRIMMING first — linkage candidates share
  *     long constant prefixes (`Customer#0000…`), which collapses the DP
  *     to the few differing characters;
  *   - a banded O(k·n) byte-level DP with early row-min exit for the
  *     ASCII case (byte distance ≡ char distance there);
  *   - multi-byte input falls back to Spark's own char-level
  *     `UTF8String.levenshteinDistance`, so semantics match the builtin
  *     on ALL inputs.
  *
  * Registered for SQL as `bounded_lev` via [[BoundedLev.register]].
  */
case class BoundedLev(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && maxDist >= 0)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"bounded_lev requires (string, string, non-negative literal), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}, $maxDist")

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLev.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.BoundedLev.dist($a, $b, $maxDist);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): BoundedLev = copy(left = newLeft, right = newRight)
}

object BoundedLev {

  /** Exact bounded edit distance; −1 when the distance exceeds k. */
  def dist(a: UTF8String, b: UTF8String, k: Int): Int = {
    val na = a.numBytes()
    val nb = b.numBytes()
    var i = 0
    while (i < na) { if ((a.getByte(i) & 0x80) != 0) return fallback(a, b, k); i += 1 }
    i = 0
    while (i < nb) { if ((b.getByte(i) & 0x80) != 0) return fallback(a, b, k); i += 1 }
    // trim the common prefix and suffix — edits can only live in between
    var p = 0
    while (p < na && p < nb && a.getByte(p) == b.getByte(p)) p += 1
    var s = 0
    while (s < na - p && s < nb - p && a.getByte(na - 1 - s) == b.getByte(nb - 1 - s))
      s += 1
    val la = na - p - s
    val lb = nb - p - s
    // rows iterate the longer remainder, columns the shorter (m ≤ n);
    // both remainders start at byte offset p in their string
    val swap = la > lb
    val rs = if (swap) a else b
    val cs = if (swap) b else a
    val n = if (swap) la else lb
    val m = if (swap) lb else la
    if (n - m > k) return -1
    if (m == 0) return n // n ≤ k here
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(0) = if (i <= k) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var rowMin = cur(0)
      val ri = rs.getByte(p + i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ri == cs.getByte(p + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }

  private def fallback(a: UTF8String, b: UTF8String, k: Int): Int =
    a.levenshteinDistance(b, k)

  /** SQL builder shared by [[register]] and [[GraftExtensions]]. */
  val builder: Seq[Expression] => Expression = exprs =>
    BoundedLev(
      exprs(0),
      exprs(1),
      exprs(2).eval(null) match {
        case n: Int => n
        case n: java.lang.Integer => n.intValue()
        case other =>
          throw new IllegalArgumentException(
            s"bounded_lev threshold must be an int literal, got $other")
      })

  /** Register `bounded_lev(a, b, k)` (k a foldable int literal). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_lev",
      builder,
      "scala_udf")
}
