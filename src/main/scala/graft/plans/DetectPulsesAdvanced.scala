package graft.plans

import graft.dsp.DetectorKernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** The three-phase advanced muon detector (SURVEY §2.5 D3/D4,
  * `pulse_detection/detectors/advanced_muon_detector.rs:127-310`) as a
  * Catalyst expression:
  * `detect_pulses_advanced(samples, onset, fall, termination, duration,
  * baseline_length, smoothing_size)` →
  * `array<struct<time: double, height: double>>` — one entry per
  * assembled pulse, projected as the typed path does
  * ([[graft.dsp.ChannelEvents]]): time = steepest-rise time, height =
  * baseline-corrected peak value.
  *
  * The W1 (EWMA baseline) and W2 (smoothing) windows plus the W3
  * finite-difference front end are FUSED into the scan, like D2's
  * derivative: the raw trace is read from Tungsten `ArrayData` once and
  * flows through the window iterators lazily — no intermediate array is
  * materialised between stages. Seven parameters put it past the
  * fixed-arity [[DetectorExpression]] base (quaternary), so it extends
  * `Expression` directly with the same conventions: CodegenFallback for
  * the inherently sequential FSM, [[DetectPulses.outputType]] output,
  * NULL-samples → NULL. Amplitude band filters (P4 min/max) are not
  * parameters — apply them on `height` downstream, as the SQL-visible
  * projection makes them ordinary predicates.
  */
case class DetectPulsesAdvanced(
    samples: Expression,
    onset: Expression,
    fall: Expression,
    termination: Expression,
    duration: Expression,
    baselineLength: Expression,
    smoothingSize: Expression)
    extends Expression
    with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(samples, onset, fall, termination, duration, baselineLength, smoothingSize)

  override def nullable: Boolean = true

  override def dataType: DataType = DetectPulses.outputType

  override def checkInputDataTypes(): TypeCheckResult = {
    val okSamples = samples.dataType match {
      case ArrayType(DoubleType, _) | NullType => true
      case _ => false
    }
    val okDoubles =
      Seq(onset, fall, termination, duration).forall(_.dataType == DoubleType)
    val okInts = Seq(baselineLength, smoothingSize).forall(_.dataType == IntegerType)
    if (okSamples && okDoubles && okInts) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "detect_pulses_advanced(array<double>, double, double, double, double, int, int) — got " +
          children.map(_.dataType.simpleString).mkString(", "))
  }

  // the six scalar params are foldable literals at every call site — fold
  // them ONCE instead of allocating children.map(_.eval) per row on the
  // hottest scan; @transient lazy so the cache rebuilds after the
  // expression ships to executors
  @transient private lazy val paramExprs: Array[Expression] =
    Array(onset, fall, termination, duration, baselineLength, smoothingSize)
  @transient private lazy val foldedParams: Array[Any] =
    paramExprs.map(e => if (e.foldable) e.eval(InternalRow.empty) else null)

  private def param(i: Int, input: InternalRow): Any =
    if (paramExprs(i).foldable) foldedParams(i) else paramExprs(i).eval(input)

  override def eval(input: InternalRow): Any = {
    // null-safe like the quaternary base's nullSafeEval: ANY null child →
    // NULL result (null.asInstanceOf[Double] would silently unbox to 0.0
    // and run the FSM with garbage thresholds)
    val s = samples.eval(input)
    if (s == null) return null
    val onV = param(0, input)
    val faV = param(1, input)
    val teV = param(2, input)
    val duV = param(3, input)
    val blV = param(4, input)
    val smV = param(5, input)
    if (onV == null || faV == null || teV == null || duV == null || blV == null || smV == null)
      return null
    val trace = s.asInstanceOf[ArrayData].toDoubleArray()
    val on = onV.asInstanceOf[Double]
    val fa = faV.asInstanceOf[Double]
    val te = teV.asInstanceOf[Double]
    val du = duV.asInstanceOf[Double]
    val bl = blV.asInstanceOf[Int]
    val sm = smV.asInstanceOf[Int]
    // the typed path's window→detector→assembler chain through the
    // shared loop kernel (r14) — one implementation, two execution
    // skins, no per-sample tuple boxing (FormationBench)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    DetectorKernels.advanced(trace, 1.0, 1.0, 0.0, on, fa, te, du, bl, sm) { p =>
      out += InternalRow(
        p.steepestRise.map(_.time).getOrElse(0.0),
        p.peak.map(_.value).getOrElse(0.0))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DetectPulsesAdvanced =
    copy(
      samples = newChildren(0),
      onset = newChildren(1),
      fall = newChildren(2),
      termination = newChildren(3),
      duration = newChildren(4),
      baselineLength = newChildren(5),
      smoothingSize = newChildren(6))
}

object DetectPulsesAdvanced {
  /** Register `detect_pulses_advanced` in the session registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "detect_pulses_advanced",
      exprs =>
        DetectPulsesAdvanced(
          exprs(0), exprs(1), exprs(2), exprs(3), exprs(4), exprs(5), exprs(6)),
      "scala_udf")
}
