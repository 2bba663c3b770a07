package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters, so graft's
  * native Catalyst expressions can surface as Columns. Lives in the
  * Spark SQL package by necessity; keep it to these two calls.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function on a LIVE session (sessionState is
    * private[sql]); the extensions path (GraftExtensions) covers
    * sessions built with spark.sql.extensions.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Apply a SparkSessionExtensions' injected functions to a live
    * session's registry — lets tests drive the exact injection path a
    * `spark.sql.extensions`-built session uses (registerFunctions is
    * private[sql]).
    */
  def applyInjectedFunctions(ext: SparkSessionExtensions,
      spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
