package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Packs an int8-quantized vector (`array<bigint>` with values in
  * [-128, 127], e.g. from [[graft.operators.Similarity.sq8]]) into a
  * `binary` of one byte per element.
  *
  * This is the physical half of scalar-quantized similarity search: a
  * 64-dim float32 embedding is 256 B + array overhead per row, the
  * packed code is 64 B flat — the difference between a corpus scan
  * that is memory-bandwidth-bound and one that fits 4× more vectors
  * per cache line. Values outside int8 range are clamped; null
  * elements pack as 0 (a zero contributes nothing to a dot product).
  */
case class PackI8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"veci8_pack input must be array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = a.getLong(i)
        out(i) = (if (v > 127L) 127L else if (v < -128L) -128L else v).toByte
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $v = $a.getLong($i);
         |    $out[$i] = (byte) ($v > 127L ? 127L : ($v < -128L ? -128L : $v));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two [[PackI8]]-packed vectors: Σ aᵢ·bᵢ over
  * sign-extended bytes, accumulated in long — exact, associative, and
  * therefore partition-order independent (unlike float sums). Length
  * mismatch truncates to the shorter input, mirroring
  * [[graft.functions.VecDot]].
  *
  * The generated code is a tight byte loop inside WholeStageCodegen;
  * with |q| ≤ 127 per lane a 64-dim product is ≤ ~1M, so the long
  * accumulator can never overflow for any realistic dimensionality.
  */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "veci8_dot inputs must be binary (veci8_pack output), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i) * y(i)
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
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a[$i]) * ((long) $b[$i]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecI8 {
  /** Column-level API: `veci8_pack(quantized)`. */
  def pack(a: Column): Column =
    GraftShim.column(PackI8(GraftShim.expression(a)))

  /** Column-level API: `veci8_dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(
      VecDotI8(GraftShim.expression(a), GraftShim.expression(b)))
}
