package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Shared shape of the detector-FSM expressions (SURVEY §2.5):
  * `f(samples: array<double>, threshold: double, duration: int,
  * cool_off: int)` → `array<struct<time: double, height: double>>`.
  * The FSMs are inherently sequential (never reformulated as SQL
  * windows) so evaluation is CodegenFallback, while the surrounding
  * projection stays inside whole-stage codegen. Keeping the contract —
  * child ordinals, type rules, output type — in ONE place means a fix
  * to it cannot silently diverge between the detector variants.
  */
abstract class DetectorExpression extends QuaternaryExpression with CodegenFallback {
  def samples: Expression
  def threshold: Expression
  def duration: Expression
  def coolOff: Expression

  /** SQL-facing name, for the type-check error message. */
  protected def fnName: String

  override def first: Expression = samples
  override def second: Expression = threshold
  override def third: Expression = duration
  override def fourth: Expression = coolOff

  override def dataType: DataType = DetectPulses.outputType

  override def checkInputDataTypes(): TypeCheckResult = {
    val okSamples = samples.dataType match {
      case ArrayType(DoubleType, _) | NullType => true
      case _ => false
    }
    if (okSamples && threshold.dataType == DoubleType &&
      duration.dataType == IntegerType && coolOff.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$fnName(array<double>, double, int, int) — got " +
          Seq(samples, threshold, duration, coolOff).map(_.dataType.simpleString).mkString(", "))
  }
}
