package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins `Cents.halfUp` to the batch twin's `Graft.cents` drop set —
  * the shared ingestion contract of every money-folding streaming twin.
  * The invariant: for ANY double, either both sides produce the same
  * cents, both drop the row, or both raise — divergence nowhere.
  */
class SharedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def batchCents(v: Double): Option[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Seq(v).toDF("v").select(graft.core.Graft.cents(col("v")))
      .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  test("halfUp drops exactly the rows batch cents() nulls (finite >= 1e16 included)") {
    // the ADVICE-flagged case: finite 1e20 must DROP (None), not raise —
    // batch Graft.finite nulls |x| >= 1e16 before the decimal cast
    for (v <- Seq(1e16, -1e16, 1e20, -1e20, 9.99e15, -9.99e15,
                  Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
                  0.0, 10.005, -10.005, 123.456, -0.005)) {
      val b = batchCents(v)
      val s = Cents.halfUp(v)
      assert(s === b, s"halfUp($v) = $s but batch cents = $b")
    }
  }

  test("in-range values agree with DECIMAL(18,2) HALF_UP semantics") {
    assert(Cents.halfUp(10.005) === Some(1001L)) // half-up, away from zero
    assert(Cents.halfUp(-10.005) === Some(-1001L))
    assert(Cents.halfUp(9.994) === Some(999L))
  }

  test("the bound raise fires only on [bound, 1e16) — beyond 1e16 drops") {
    // inside the raise window: both sides error (batch boundedCents raises)
    assertThrows[IllegalArgumentException](Cents.halfUp(1e12, bound = 1000L))
    // beyond the finite horizon: silent drop on both sides, never a raise
    assert(Cents.halfUp(1e20, bound = 1000L) === None)
  }
}
