package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PELT changepoint detection (Killick, Fearnhead & Eckley 2012) as a
  * codegen'd Catalyst expression: `pelt_cps(ys)` maps an `array<bigint>`
  * series to the `array<bigint>` of interior changepoint positions of
  * the GLOBALLY optimal segmentation under the within-segment
  * sum-of-squares cost plus a per-changepoint penalty.
  *
  * Exactness discipline (the board's DP-kernel pattern): the cost is
  * held in scaled integers — for segment (s, t]:
  * `C_q = (Σy² · SCALE) − ((Σy)² · SCALE) div L`, with div = exact
  * integer division (both operands non-negative, so Scala `/` and
  * DuckDB `//` agree) — so the DP over `F(t) = min_s F(s) + C_q + β_q`
  * compares BIGINTs, never doubles, and the DuckDB full-O(T²) replay is
  * bit-identical. Argmin ties break to the SMALLEST s (strict `<`
  * scan). PELT pruning drops s once
  * `F(s) + C_q(s,t) > F(t) + slack`: with the exact SSE cost the
  * decomposition C(s,u) ≥ C(s,t) + C(t,u) makes slack 0 sound; the two
  * floor-quantized cost terms can each be short by < 1 quantum, so a
  * slack of 4 keeps pruning STRICTLY conservative — the pruned DP
  * provably returns the same optimum as the full scan the oracle runs.
  *
  * Scale: per-series independent, fused into the projection after a
  * bounded per-key day aggregate; the kernel is O(T · |candidates|)
  * (near-linear on changepoint-dense series). The BIGINT domain bounds
  * |Σy| ≤ 2.5e6 per series ((2.5e6)² · 1e6 < 2⁶³); oversized series
  * fail loudly rather than overflow silently.
  */
case class PeltSegments(
    child: Expression,
    penaltyMult: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val childOk = child.dataType match {
      case ArrayType(LongType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (childOk && penaltyMult >= 0)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"pelt_cps requires array<bigint> series and penalty multiplier ≥ 0, " +
          s"got ${child.dataType.simpleString} with mult=$penaltyMult")
  }

  override def nullSafeEval(input: Any): Any =
    PeltSegments.decode(input.asInstanceOf[ArrayData], penaltyMult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ys =>
      s"${ev.value} = graft.plans.PeltSegments.decode($ys, ${penaltyMult}L);")

  override protected def withNewChildInternal(newChild: Expression): PeltSegments =
    copy(child = newChild)
}

object PeltSegments {

  /** Cost quantization scale; shared verbatim with the oracle SQL. */
  val Scale = 1000000L

  /** Quantization slack for the prune inequality (see class doc). */
  private val PruneSlack = 4L

  /** |Σy| bound keeping (Σy)²·Scale inside a Long. */
  private val MaxAbsSum = 2500000L

  /** Exact PELT over the scaled-integer SSE cost; returns the 1-based
    * interior changepoint positions (ascending). Empty input → empty.
    *
    * The per-changepoint penalty is SCALE-ADAPTIVE and integer-exact:
    * `β_q = (1 + mult · (Σy div T)) · SCALE`. For count series the
    * variance tracks the mean (Poisson), so a penalty proportional to
    * the mean level keeps the segment count stable as the corpus grows
    * 10×/100× — a fixed literal penalty would over-segment at every
    * larger SF. Both engines derive β from the same integer division,
    * so no data-dependent literal has to be injected into the oracle.
    */
  def decode(ys: ArrayData, penaltyMult: Long): GenericArrayData = {
    val t = ys.numElements()
    if (t == 0) return new GenericArrayData(Array.emptyLongArray)
    // prefix sums: cum(i) = Σ y_1..i, cumSq likewise; cum(0) = 0
    val cum = new Array[Long](t + 1)
    val cumSq = new Array[Long](t + 1)
    var i = 0
    while (i < t) {
      val y = ys.getLong(i)
      // non-negative domain: Scala's truncating division and DuckDB's
      // floor `//` only agree on non-negative operands, and the
      // penalty derivation divides Σy — fail loudly outside the domain
      require(y >= 0, s"pelt_cps requires non-negative series values, got $y")
      cum(i + 1) = cum(i) + y
      cumSq(i + 1) = cumSq(i) + y * y
      i += 1
    }
    require(
      math.abs(cum(t)) <= MaxAbsSum && cumSq(t) <= MaxAbsSum * MaxAbsSum,
      s"pelt_cps series magnitude |Σy|=${cum(t)} exceeds the exact-BIGINT " +
        s"bound $MaxAbsSum — rescale the series (e.g. coarser time bins)")
    val penaltyQ = (1L + penaltyMult * (cum(t) / t)) * Scale
    // C_q(s, t): scaled SSE of segment (s, t]
    def cost(s: Int, e: Int): Long = {
      val L = e - s
      val sm = cum(e) - cum(s)
      val sq = cumSq(e) - cumSq(s)
      sq * Scale - (sm * sm * Scale) / L
    }
    val f = new Array[Long](t + 1) // F(i)
    val am = new Array[Int](t + 1) // argmin s for F(i)
    f(0) = -penaltyQ
    // candidate set as a compact int array (PELT pruning)
    val cand = new Array[Int](t + 1)
    var nCand = 1
    cand(0) = 0
    var e = 1
    while (e <= t) {
      var best = Long.MaxValue
      var arg = 0
      var c = 0
      while (c < nCand) {
        val s = cand(c)
        val v = f(s) + cost(s, e) + penaltyQ
        if (v < best || (v == best && s < arg)) { best = v; arg = s }
        c += 1
      }
      f(e) = best
      am(e) = arg
      // prune: s with F(s) + C(s,e) > F(e) + slack can never win later
      var kept = 0
      c = 0
      while (c < nCand) {
        val s = cand(c)
        if (f(s) + cost(s, e) <= f(e) + PruneSlack) {
          cand(kept) = s
          kept += 1
        }
        c += 1
      }
      nCand = kept
      // e itself becomes a candidate split point for later ends
      cand(nCand) = e
      nCand += 1
      e += 1
    }
    // backtrack the interior changepoints
    var cps = List.empty[Long]
    var j = t
    while (j > 0) {
      val s = am(j)
      if (s > 0) cps = s.toLong :: cps
      j = s
    }
    new GenericArrayData(cps.toArray)
  }

  /** Register `pelt_cps(ys)` for a fixed penalty multiplier. */
  def register(spark: SparkSession, name: String, penaltyMult: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => PeltSegments(exprs.head, penaltyMult),
      "scala_udf")
}
