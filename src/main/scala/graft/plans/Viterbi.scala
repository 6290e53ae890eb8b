package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Viterbi decode (most-likely hidden-state path) of an HMM in
  * integer max-plus arithmetic: `viterbi_path(obs)` maps an
  * `array<int>` of observation codes (0-based, < O) to the
  * `array<bigint>` of 1-based hidden-state indices maximising
  * Σ init + Σ trans + Σ emit, where the weight tables are quantized
  * log-probabilities baked in as expression parameters (NOT child
  * expressions — they are model constants, referenced by codegen the
  * way [[DtwDistance]] carries its band).
  *
  * A custom Catalyst expression rather than a HOF `aggregate()` fold:
  * the O(T·S²) trellis runs as one static primitive call inside
  * whole-stage codegen — no per-step boxed struct state, no lambda
  * interpreter, no backpointer arrays churned through Catalyst values.
  * All weights are BIGINTs so the DP is EXACT end to end; ties in every
  * argmax break to the LOWEST state index (strict `>` scan), which the
  * DuckDB oracle mirrors with `list_position` on the first maximum in a
  * per-step recursive-CTE replay.
  *
  * Scale: per-sequence independent — one narrow scan, one keyed
  * aggregate to assemble each sequence, then the decode fused into the
  * projection. No shuffle beyond the sequence assembly itself.
  */
case class ViterbiPath(
    child: Expression,
    init: Array[Long],
    trans: Array[Long],
    emit: Array[Long])
    extends UnaryExpression {

  private val nStates = init.length
  private val nObs = if (nStates == 0) 0 else emit.length / nStates

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val childOk = child.dataType match {
      case ArrayType(IntegerType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    // nStates ≤ 128: backpointers are stored per-cell in a Byte array
    // (decode's `arg.toByte`), so a larger state space would silently
    // wrap indices and return corrupted paths — fail loudly instead.
    if (childOk && nStates > 0 && nStates <= 128 &&
      trans.length == nStates * nStates &&
      nObs > 0 && emit.length == nStates * nObs)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"viterbi_path requires array<int> observations and consistent " +
          s"S/S²/S·O weight tables with at most 128 states (byte " +
          s"backpointers), got ${child.dataType.simpleString} with " +
          s"|init|=${init.length}, |trans|=${trans.length}, |emit|=${emit.length}")
  }

  override def nullSafeEval(input: Any): Any =
    ViterbiPath.decode(input.asInstanceOf[ArrayData], init, trans, emit, nStates, nObs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val initRef = ctx.addReferenceObj("viterbiInit", init, "long[]")
    val transRef = ctx.addReferenceObj("viterbiTrans", trans, "long[]")
    val emitRef = ctx.addReferenceObj("viterbiEmit", emit, "long[]")
    nullSafeCodeGen(ctx, ev, obs =>
      s"""${ev.value} = graft.plans.ViterbiPath.decode(
         |  $obs, $initRef, $transRef, $emitRef, $nStates, $nObs);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiPath =
    copy(child = newChild)
}

object ViterbiPath {

  /** Exact integer max-plus Viterbi; returns the 1-based state path.
    * Observation codes outside [0, nObs) and empty inputs yield an
    * empty path (malformed sequences surface as zero-length, never a
    * crash mid-codegen). Argmax ties break to the lowest state index.
    */
  def decode(
      obs: ArrayData,
      init: Array[Long],
      trans: Array[Long],
      emit: Array[Long],
      nStates: Int,
      nObs: Int): GenericArrayData = {
    val t = obs.numElements()
    if (t == 0) return new GenericArrayData(Array.emptyLongArray)
    var i = 0
    while (i < t) {
      val o = obs.getInt(i)
      if (o < 0 || o >= nObs) return new GenericArrayData(Array.emptyLongArray)
      i += 1
    }
    val delta = new Array[Long](nStates)
    val next = new Array[Long](nStates)
    val bp = new Array[Byte](t.toLong.toInt * nStates) // backpointers, step-major
    val o0 = obs.getInt(0)
    var s = 0
    while (s < nStates) {
      delta(s) = init(s) + emit(s * nObs + o0)
      s += 1
    }
    var step = 1
    while (step < t) {
      val o = obs.getInt(step)
      var sp = 0
      while (sp < nStates) {
        var best = delta(0) + trans(sp) // s = 0: trans(0 * nStates + sp)
        var arg = 0
        var s2 = 1
        while (s2 < nStates) {
          val cand = delta(s2) + trans(s2 * nStates + sp)
          if (cand > best) { best = cand; arg = s2 } // strict: first max wins
          s2 += 1
        }
        next(sp) = best + emit(sp * nObs + o)
        bp(step * nStates + sp) = arg.toByte
        sp += 1
      }
      System.arraycopy(next, 0, delta, 0, nStates)
      step += 1
    }
    var last = 0
    s = 1
    while (s < nStates) {
      if (delta(s) > delta(last)) last = s
      s += 1
    }
    val path = new Array[Long](t)
    path(t - 1) = last + 1L
    var j = t - 1
    while (j > 0) {
      last = bp(j * nStates + last).toInt
      path(j - 1) = last + 1L
      j -= 1
    }
    new GenericArrayData(path)
  }

  /** Register `viterbi_path(obs)` for a fixed weight set. */
  def register(
      spark: SparkSession,
      name: String,
      init: Array[Long],
      trans: Array[Long],
      emit: Array[Long]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => ViterbiPath(exprs.head, init, trans, emit),
      "scala_udf")
}
