package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** The native PQ kernels ([[PqCodes]], [[AdcTable]]) must be
  * BIT-IDENTICAL to the composed forms they replace
  * (`array(least(struct(vecsqdist(slice…), cid)…))` /
  * `array(array(vecsqdist(slice…)…))`) — including the adversarial
  * edges whose semantics the composition defined implicitly: null
  * vectors (every distance null → null-d sorts first → cid 0), null
  * ELEMENTS, vectors shorter than the subspace layout (slice
  * truncates → partial folds; fully out-of-range slices fold zero
  * terms → distance 0.0), empty vectors, and double-typed inputs.
  * Both codegen and interpreted paths are exercised (the composed
  * form runs codegen'd; [[AdcTable]] is CodegenFallback by design).
  */
class PqKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cb: Similarity.PqCodebook = Seq(
    Seq(Seq(0.0, 0.5), Seq(1.0, -1.0), Seq(0.25, 0.25)),
    Seq(Seq(-0.5, 2.0), Seq(0.0, 0.0), Seq(1.5, -0.25)))

  private def fixture: DataFrame = Seq(
    (1L, Some(Seq(Some(0.1f), Some(0.2f), Some(0.3f), Some(0.4f)))),
    (2L, Some(Seq(Some(1.0f), Some(-1.0f), Some(2.0f), Some(0.0f)))),
    (3L, None), // null vector
    (4L, Some(Seq[Option[Float]]())), // empty vector
    (5L, Some(Seq(Some(0.7f)))), // shorter than one subspace
    (6L, Some(Seq(Some(0.7f), Some(0.1f), Some(0.9f)))), // partial 2nd
    (7L, Some(Seq(Some(0.1f), None, Some(0.3f), Some(0.4f)))), // null elem
    (8L, Some(Seq(None, None, None, None)): Option[Seq[Option[Float]]]))
    .toDF("id", "v")

  test("PqCodes equals the composed encode on every edge row") {
    val got = fixture.select(col("id"),
        Similarity.pqEncode(col("v"), cb).as("k"),
        Similarity.pqEncodeComposed(col("v"), cb).as("c"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    got.foreach { case (id, k, c) => assert(k === c, s"id=$id") }
    // and the dense rows actually discriminate (not all zeros)
    val dense = got.filter(r => Seq(1L, 2L).contains(r._1))
    assert(dense.exists(_._2.exists(_ != 0)))
  }

  test("AdcTable equals the composed table on every edge row") {
    val got = fixture.select(col("id"),
        graft.functions.AdcTable(col("v"), cb).as("k"),
        Similarity.adcTableComposed(col("v"), cb).as("c"))
      .as[(Long, Seq[Seq[Option[Double]]], Seq[Seq[Option[Double]]])]
      .collect()
    got.foreach { case (id, k, c) => assert(k === c, s"id=$id") }
  }

  test("double-typed vectors take the getDouble accessor path") {
    val df = Seq((1L, Seq(0.1, 0.2, 0.3, 0.4))).toDF("id", "v")
    val got = df.select(
        Similarity.pqEncode(col("v"), cb).as("k"),
        Similarity.pqEncodeComposed(col("v"), cb).as("c"),
        graft.functions.AdcTable(col("v"), cb).as("tk"),
        Similarity.adcTableComposed(col("v"), cb).as("tc"))
      .as[(Seq[Int], Seq[Int], Seq[Seq[Double]], Seq[Seq[Double]])]
      .head()
    assert(got._1 === got._2)
    assert(got._3 === got._4)
  }

  test("PqCodes codegen path equals its interpreted eval") {
    // force the interpreted path through a plan codegen can't compile
    // away: compare collect() under codegen (default) against direct
    // expression eval on the same rows
    val rows = fixture.select(col("id"), col("v")).collect()
    val enc = fixture.select(col("id"),
        Similarity.pqEncode(col("v"), cb).as("k"))
      .as[(Long, Seq[Int])].collect().toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val expr = PqCodes(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(r.get(1), fixture.schema("v").dataType), cb)
      val viaEval = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      assert(viaEval === enc(id), s"id=$id")
    }
  }
}
