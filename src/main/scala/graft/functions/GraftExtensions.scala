package graft.functions

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT vec_dot(a, b)")` works like any built-in.
  *
  * Two paths:
  *  - cluster deploy: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (injected at session build, shared by every derived session)
  *  - live session (tests, notebooks): [[GraftExtensions.register]]
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"vec_dot expects 2 arguments, got ${es.length}")
        VecDot(es.head, es(1))
      }),
    ("rolling_hash",
      info("rolling_hash", "rolling_hash(str) - polynomial rolling hash mod 1e9+7"),
      (es: Seq[Expression]) => {
        require(es.length == 1, s"rolling_hash expects 1 argument, got ${es.length}")
        RollingHash(es.head)
      }),
    ("vec_sqdist",
      info("vec_sqdist",
        "vec_sqdist(a, b) - squared L2 distance of two float/double arrays"),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"vec_sqdist expects 2 arguments, got ${es.length}")
        VecSqDist(es.head, es(1))
      }),
    ("veci8_pack",
      info("veci8_pack",
        "veci8_pack(a) - pack an int8-range bigint array into binary codes"),
      (es: Seq[Expression]) => {
        require(es.length == 1, s"veci8_pack expects 1 argument, got ${es.length}")
        PackI8(es.head)
      }),
    ("veci8_dot",
      info("veci8_dot",
        "veci8_dot(a, b) - exact integer dot of two packed int8 code arrays"),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"veci8_dot expects 2 arguments, got ${es.length}")
        VecDotI8(es.head, es(1))
      }))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      GraftShim.registerFunction(spark, name, builder)
    }
}
