package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string column as a native Catalyst
  * expression: acc ← (acc·31 + codepoint) mod 1 000 000 007, left to
  * right.
  *
  * Replaces the HOF formulation
  * `aggregate(split(text, ""), 0L, (a, c) => (a*31 + ascii(c)) % M)`,
  * which materializes a per-character array and dispatches an
  * interpreted lambda per element — the dominant cost when
  * fingerprinting a large corpus. Semantics are identical (including
  * the DuckDB oracle mirror): iteration is per code point, matching
  * `split`'s code-point boundaries and `ascii`'s code-point value.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash input must be string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** The kernel — called from both interpreted eval and generated code. */
  def hash(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-level API: `rolling_hash(text)`. */
  def apply(c: Column): Column =
    GraftShim.column(RollingHash(GraftShim.expression(c)))
}
