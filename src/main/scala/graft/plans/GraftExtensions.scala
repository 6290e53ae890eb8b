package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY §2.11): registers the
  * library's native Catalyst expressions at session build time, so a
  * cluster deployment enables them with
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`) and every session — SQL,
  * thrift, notebook — sees `vec_dot` / `detect_pulses` without any
  * driver-side `register()` call. The per-session
  * `VecDot.register`/`DetectPulses.register` helpers remain for embedded
  * use; this is the idiomatic injection path Spark provides for
  * libraries.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension (§2.11 tier c): custom logical node +
    // strategy + exec for the as-of join
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // opt-in optimizer rewrite (spark.graft.bitmapCountDistinct.enabled):
    // count(DISTINCT <integral>) → the mergeable bitmap aggregate
    ext.injectOptimizerRule(_ => RewriteCountDistinctToBitmap)
    val vecDot: Seq[Expression] => Expression = exprs => VecDot(exprs(0), exprs(1))
    val detect: Seq[Expression] => Expression =
      exprs => DetectPulses(exprs(0), exprs(1), exprs(2), exprs(3))
    val detectDiff: Seq[Expression] => Expression =
      exprs => DetectPulsesDifferential(exprs(0), exprs(1), exprs(2), exprs(3))
    val detectAdv: Seq[Expression] => Expression =
      exprs =>
        DetectPulsesAdvanced(
          exprs(0), exprs(1), exprs(2), exprs(3), exprs(4), exprs(5), exprs(6))
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        info("vec_dot", "vec_dot(a, b) - sequential-fold dot product of two double arrays"),
        vecDot))
    ext.injectFunction(
      (
        FunctionIdentifier("detect_pulses"),
        info(
          "detect_pulses",
          "detect_pulses(samples, threshold, duration, cool_off) - threshold FSM over a trace"),
        detect))
    ext.injectFunction(
      (
        FunctionIdentifier("detect_pulses_differential"),
        info(
          "detect_pulses_differential",
          "detect_pulses_differential(samples, threshold, duration, cool_off) - derivative-threshold FSM over a trace"),
        detectDiff))
    ext.injectFunction(
      (
        FunctionIdentifier("detect_pulses_advanced"),
        info(
          "detect_pulses_advanced",
          "detect_pulses_advanced(samples, onset, fall, termination, duration, " +
            "baseline_length, smoothing_size) - three-phase muon FSM over a trace"),
        detectAdv))
    ext.injectFunction(
      (
        FunctionIdentifier("z_order_key"),
        info(
          "z_order_key",
          "z_order_key(a, b[, c[, d]]) - Morton interleave of 2-4 integral columns " +
            "for multi-dimensional layout clustering"),
        ZOrderKey.builder))
    ext.injectFunction(
      (
        FunctionIdentifier("dtw_dist"),
        info(
          "dtw_dist",
          "dtw_dist(a, b, r) - banded dynamic-time-warping distance over bigint series"),
        DtwDistance.builder))
    ext.injectFunction(
      (
        FunctionIdentifier("bounded_lev"),
        info(
          "bounded_lev",
          "bounded_lev(a, b, k) - Levenshtein distance early-exited at literal bound k"),
        BoundedLev.builder))
    // mergeable exact-distinct bitmap family (TypedImperativeAggregate →
    // ObjectHashAggregateExec with map-side partial OR)
    graft.functions.BitmapAgg.registrations.foreach(ext.injectFunction)
  }
}
