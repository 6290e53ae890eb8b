package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Smith-Waterman local-alignment score (Smith & Waterman 1981)
  * over two `array<string>` token sequences:
  * `sw_score(a, b, match, mismatch, gap)` = max over all cells of
  *
  *   H(i,j) = max(0, H(i-1,j-1) + s(aᵢ,bⱼ), H(i-1,j) − gap, H(i,j-1) − gap)
  *
  * with s = `match` on token equality else `mismatch` — the strongest-
  * shared-region score a curation pipeline uses for plagiarism /
  * quotation detection when global measures (Jaccard, containment)
  * dilute a verbatim span across a long document.
  *
  * A custom Catalyst expression ([[DtwDistance]]'s pattern): the
  * O(n·m) two-row DP runs as one static primitive call inside
  * whole-stage codegen. All scores are exact BIGINTs, so the DuckDB
  * oracle replays the identical DP by anti-diagonal recursion (carrying
  * the d−1 and d−2 diagonals plus the running max) and matches
  * hash-for-hash.
  *
  * Scale: per-pair independent — the intended shape is a bounded or
  * blocked pair set with the DP fused into the projection; cost is
  * pairs × n·m primitive ops, no shuffle beyond the pair join.
  */
case class SwScore(
    left: Expression,
    right: Expression,
    matchScore: Long,
    mismatchScore: Long,
    gapPenalty: Long)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"sw_score requires two array<string> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SwScore.score(
      a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData],
      matchScore,
      mismatchScore,
      gapPenalty)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.plans.SwScore.score(
         |  $a, $b, ${matchScore}L, ${mismatchScore}L, ${gapPenalty}L);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): SwScore = copy(left = newLeft, right = newRight)
}

object SwScore {

  /** Exact integer Smith-Waterman; 0 for empty inputs (the empty local
    * alignment). Two rolling rows, running max.
    */
  def score(a: ArrayData, b: ArrayData, mt: Long, mm: Long, gap: Long): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var best = 0L
    var i = 1
    while (i <= n) {
      val ai = a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val s = if (ai.equals(b.getUTF8String(j - 1))) mt else mm
        var h = prev(j - 1) + s // diagonal
        val up = prev(j) - gap
        if (up > h) h = up
        val lf = cur(j - 1) - gap
        if (lf > h) h = lf
        if (h < 0L) h = 0L
        cur(j) = h
        if (h > best) best = h
        j += 1
      }
      val t = prev; prev = cur; cur = t
      cur(0) = 0L
      i += 1
    }
    best
  }

  /** Register `sw_score(a, b)` with fixed scoring parameters. */
  def register(
      spark: SparkSession,
      matchScore: Long,
      mismatchScore: Long,
      gapPenalty: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sw_score",
      exprs => SwScore(exprs(0), exprs(1), matchScore, mismatchScore, gapPenalty),
      "scala_udf")
}
