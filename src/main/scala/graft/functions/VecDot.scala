package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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

  // inputs are produced only by the typed API below (array<float>);
  // no ExpectsInputTypes — AbstractDataType is private[sql]
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
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
