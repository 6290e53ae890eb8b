package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Z-order (Morton) key over two long columns: the low
  * 16 bits of each input interleave into a 32-bit curve position
  * (`a` on even bits, `b` on odd). Sorting or range-partitioning data
  * files by this key clusters BOTH dimensions at once, so min/max file
  * statistics prune scans filtered on either column — the multi-column
  * data-layout technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`
  * (public table-format docs; implementation here is the textbook bit
  * interleave).
  *
  * A native expression (with `doGenCode`) rather than a UDF: layout
  * jobs evaluate this once per row over entire tables, so it must stay
  * inside whole-stage codegen — the generated code is a branch-free
  * shift/mask spread of each 16-bit half, not a per-row lambda call.
  *
  * Registered for SQL as `z_order_key` via [[ZOrderKey.register]].
  */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"z_order_key requires two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // branch-free bit spread: 0x0000ffff -> one empty bit between
      // every payload bit (the classic Morton construction)
      s"""
         |long $x = $a & 0xffffL;
         |long $y = $b & 0xffffL;
         |$x = ($x | ($x << 8)) & 0x00ff00ffL;
         |$x = ($x | ($x << 4)) & 0x0f0f0f0fL;
         |$x = ($x | ($x << 2)) & 0x33333333L;
         |$x = ($x | ($x << 1)) & 0x55555555L;
         |$y = ($y | ($y << 8)) & 0x00ff00ffL;
         |$y = ($y | ($y << 4)) & 0x0f0f0f0fL;
         |$y = ($y | ($y << 2)) & 0x33333333L;
         |$y = ($y | ($y << 1)) & 0x55555555L;
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): ZOrderKey = copy(left = newLeft, right = newRight)
}

/** N-dimensional Morton key for 3 or 4 long columns (the 2-column case
  * stays on the specialized [[ZOrderKey]]): the low 16 bits of each
  * input interleave round-robin — dimension d's bit i lands at position
  * `i*n + d` — giving a 48-bit (n=3) or 64-bit (n=4) curve position.
  * Same layout contract as the binary expression, one more practical
  * dimension count: `OPTIMIZE ZORDER BY (a, b, c)` style layouts
  * typically use 2–4 columns before curve locality stops paying.
  *
  * Codegen is the branch-free stride-3 / stride-4 bit spread (the
  * public 3D/4D Morton magic-constant sequences), one spread per child,
  * OR-combined — no loops, no calls, inside whole-stage codegen.
  */
case class ZOrderKeyMulti(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length < 3 || children.length > 4)
      TypeCheckResult.TypeCheckFailure(
        s"z_order_key supports 2 to 4 arguments, got ${children.length}")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"z_order_key requires bigint arguments, got " +
          children.map(_.dataType.simpleString).mkString(", "))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderKey.interleaveN(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = children.length
    val childGens = children.map(_.genCode(ctx))
    def spread(src: String, dst: String): String =
      if (n == 3)
        // stride-3 spread (3D Morton magic, valid to 21 payload bits)
        s"""
           |long $dst = $src & 0xffffL;
           |$dst = ($dst | ($dst << 32)) & 0x1f00000000ffffL;
           |$dst = ($dst | ($dst << 16)) & 0x1f0000ff0000ffL;
           |$dst = ($dst | ($dst << 8)) & 0x100f00f00f00f00fL;
           |$dst = ($dst | ($dst << 4)) & 0x10c30c30c30c30c3L;
           |$dst = ($dst | ($dst << 2)) & 0x1249249249249249L;
         """.stripMargin
      else
        // stride-4 spread (4D Morton magic, 16 payload bits)
        s"""
           |long $dst = $src & 0xffffL;
           |$dst = ($dst | ($dst << 24)) & 0x000000ff000000ffL;
           |$dst = ($dst | ($dst << 12)) & 0x000f000f000f000fL;
           |$dst = ($dst | ($dst << 6)) & 0x0303030303030303L;
           |$dst = ($dst | ($dst << 3)) & 0x1111111111111111L;
         """.stripMargin
    val parts = childGens.zipWithIndex.map { case (g, d) =>
      val s = ctx.freshName(s"zs$d")
      (spread(g.value.toString, s), if (d == 0) s else s"($s << $d)")
    }
    val isNull = if (nullable) childGens.map(_.isNull.toString).mkString(" || ") else "false"
    val childCode = childGens.map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $isNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${parts.map(_._1).mkString("\n")}
        ${ev.value} = ${parts.map(_._2).mkString(" | ")};
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKeyMulti = copy(children = newChildren)
}

object ZOrderKey {

  /** Reference interleave for N dims (interpreted path and spec model):
    * bit i of dimension d lands at position i*n + d.
    */
  def interleaveN(vals: Array[Long]): Long = {
    val n = vals.length
    var r = 0L
    var d = 0
    while (d < n) {
      val v = vals(d) & 0xffffL
      var i = 0
      while (i < 16) {
        r |= ((v >> i) & 1L) << (i * n + d)
        i += 1
      }
      d += 1
    }
    r
  }

  /** Reference interleave (the interpreted path and the spec model). */
  def interleave(a: Long, b: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xffffL
      v = (v | (v << 8)) & 0x00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0fL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(a) | (spread(b) << 1)
  }

  /** SQL builder shared by [[register]] and
    * [[GraftExtensions]]: 2 args → the specialized stride-2 expression;
    * 3–4 → [[ZOrderKeyMulti]]; anything else → the same WRONG_NUM_ARGS
    * analysis error a built-in reports (ADVICE r8 — a bare exprs(1) on
    * z_order_key(a) would surface as IndexOutOfBounds).
    */
  val builder: Seq[Expression] => Expression = exprs => {
    if (exprs.length < 2 || exprs.length > 4)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> "`z_order_key`",
          "expectedNum" -> "[2, 3, 4]",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"),
        None)
    if (exprs.length == 2) ZOrderKey(exprs(0), exprs(1))
    else ZOrderKeyMulti(exprs)
  }

  /** Register `z_order_key(a, b[, c[, d]])`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order_key",
      builder,
      "scala_udf")
}
