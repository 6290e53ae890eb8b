package graft.plans

import graft.dsp.DetectorKernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** The differential-threshold discriminator FSM (SURVEY §2.5 D2,
  * `pulse_detection/detectors/differential_threshold_detector.rs:46-130`)
  * as a Catalyst expression:
  * `detect_pulses_differential(samples, threshold, duration, cool_off)`
  * → `array<struct<time: double, height: double>>`.
  *
  * The finite-difference front end (W3 at N=2) is fused into the scan:
  * the expression reads the raw trace from Tungsten `ArrayData` once and
  * feeds the FSM `[v_i, v_i − v_{i−1}]` pairs starting from index 1 (the
  * window's warm-up sample), so no intermediate derivative array is ever
  * materialised. Event times are RAW trace indices. Same dsp core as the
  * typed path — one implementation, two execution skins
  * ([[graft.queries.SignalQueries.thresholdEventsDifferential]] shares
  * its gaps-and-islands oracle).
  */
case class DetectPulsesDifferential(
    samples: Expression,
    threshold: Expression,
    duration: Expression,
    coolOff: Expression)
    extends DetectorExpression {

  override protected def fnName: String = "detect_pulses_differential"

  override protected def nullSafeEval(s: Any, th: Any, dur: Any, cool: Any): Any = {
    val trace = s.asInstanceOf[ArrayData].toDoubleArray()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // loop kernel (r14): the W3 N=2 window emits [v_i, v_i − v_{i−1}]
    // from index 1 with identity time shift — identical to the fused
    // derivative this expression used to hand-roll, now shared with the
    // typed path through DetectorKernels (no per-sample allocation)
    DetectorKernels.differential(
      trace, 1.0, 1.0, 0.0,
      th.asInstanceOf[Double],
      dur.asInstanceOf[Int],
      cool.asInstanceOf[Int],
      constantMultiple = None) { (t, v) => out += InternalRow(t, v) }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression,
      newFourth: Expression): DetectPulsesDifferential =
    copy(samples = newFirst, threshold = newSecond, duration = newThird, coolOff = newFourth)
}

object DetectPulsesDifferential {
  /** Register `detect_pulses_differential` in the session registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "detect_pulses_differential",
      exprs => DetectPulsesDifferential(exprs(0), exprs(1), exprs(2), exprs(3)),
      "scala_udf")
}
