package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `array<float>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * This is the one hot scalar kernel where the built-in algebra is
  * genuinely insufficient: `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is semantically right but higher-order functions are interpreted —
  * at millions of pairs × 64 lanes the lambda dispatch dominates. The
  * generated code is a tight primitive loop inside the surrounding
  * WholeStageCodegen stage.
  *
  * Semantics match the HOF formulation exactly for equal-length inputs
  * (strict left-to-right double accumulation → bit-identical results,
  * including vs the DuckDB oracle's `list_reduce` mirror); length
  * mismatch truncates to the shorter input.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql]);
  // checkInputDataTypes rejects anything but array<float>/array<double>
  // at analysis time — reading a double array with getFloat would
  // silently reinterpret bits and corrupt every score
  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(left.dataType) && supported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot inputs must be array<float> or array<double>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def accessor(e: Expression, side: String): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case other => throw new IllegalArgumentException(
      s"vec_dot $side input must be array<float> or array<double>, got ${other.sql}")
  }
  private lazy val leftGet = accessor(left, "left")
  private lazy val rightGet = accessor(right, "right")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  // a null ELEMENT nulls the whole product — matching the HOF
  // formulation (zip_with propagates null) instead of silently
  // reading the slot as 0.0 and scoring a corrupt vector
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
      acc += xv * yv
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
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $a.$leftGet($i)) * ((double) $b.$rightGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-level API: `vec_dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      VecDot(GraftShim.expression(a), GraftShim.expression(b)))
}
