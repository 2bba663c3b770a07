package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance of two float/double array columns as a native
  * codegen'd expression — the PQ metric (see
  * [[graft.operators.Similarity.sqDist]]).
  *
  * Same rationale as [[VecDot]]: the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` is
  * interpreted, and PQ encoding evaluates m×k of these folds per
  * corpus row — measured 6× of the whole v9 runtime before this
  * kernel. The accumulation is the same strict left-to-right double
  * fold, so values are bit-identical to the HOF version and to the
  * DuckDB `list_reduce` oracle mirror. Length mismatch truncates to
  * the shorter input; null elements are not expected (PQ operands are
  * dense vectors and literal codewords).
  */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(left.dataType) && supported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_sqdist inputs must be array<float> or array<double>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def accessor(e: Expression, side: String): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"vec_sqdist $side input must be array<float> or array<double>, got ${other.sql}")
  }
  private lazy val leftGet = accessor(left, "left")
  private lazy val rightGet = accessor(right, "right")

  override def dataType: DataType = DoubleType

  // null elements null the result — HOF parity, see VecDot
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = leftGet == "getFloat"
    val rf = rightGet == "getFloat"
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    throw new IllegalStateException("eval is overridden directly")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $d = ((double) $a.$leftGet($i)) - ((double) $b.$rightGet($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecSqDist {
  /** Column-level API: `vec_sqdist(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      VecSqDist(GraftShim.expression(a), GraftShim.expression(b)))
}
