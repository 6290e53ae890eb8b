package graft.plans

import graft.dsp.DetectorKernels
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** The fixed-threshold discriminator FSM (SURVEY §2.5 D1) as a Catalyst
  * expression: `detect_pulses(samples, threshold, duration, cool_off)` →
  * `array<struct<time: double, height: double>>`.
  *
  * Why an expression rather than the typed-Dataset path: evaluation reads
  * the trace straight from Tungsten `ArrayData` (one primitive copy via
  * `toDoubleArray`, no row-object deserialisation, no Scala collection
  * boxing) and emits events into an `InternalRow` array. The FSM itself
  * is inherently sequential (SURVEY §7.4 — never reformulated as SQL
  * windows), so this uses `CodegenFallback` for the scan while the rest
  * of the projection stays inside whole-stage codegen. Semantics are the
  * dsp core's — one implementation, two execution skins.
  */
case class DetectPulses(
    samples: Expression,
    threshold: Expression,
    duration: Expression,
    coolOff: Expression)
    extends DetectorExpression {

  override protected def fnName: String = "detect_pulses"

  override protected def nullSafeEval(s: Any, th: Any, dur: Any, cool: Any): Any = {
    val trace = s.asInstanceOf[ArrayData].toDoubleArray()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    // loop kernel (r14): same FSM, same call order as the iterator
    // composition, no per-sample tuple boxing (FormationBench)
    DetectorKernels.threshold(
      trace, 1.0, 1.0, 0.0,
      th.asInstanceOf[Double],
      dur.asInstanceOf[Int],
      cool.asInstanceOf[Int]) { (t, v) => out += InternalRow(t, v) }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression,
      newFourth: Expression): DetectPulses =
    copy(samples = newFirst, threshold = newSecond, duration = newThird, coolOff = newFourth)
}

object DetectPulses {
  val outputType: DataType = ArrayType(
    StructType(Seq(
      StructField("time", DoubleType, nullable = false),
      StructField("height", DoubleType, nullable = false))),
    containsNull = false)

  /** Register `detect_pulses` in the session function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "detect_pulses",
      exprs => DetectPulses(exprs(0), exprs(1), exprs(2), exprs(3)),
      "scala_udf")
}
