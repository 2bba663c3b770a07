package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Graft.floorDivExpr]]'s floor semantics — Spark's `DIV`
  * truncates toward zero while DuckDB's `//` floors, so every
  * epoch→bucket site routes through this helper; a pre-1970 timestamp
  * must land on the floor day on both engines.
  */
class FloorDivSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("floors on negative operands where DIV truncates") {
    val df = Seq(-7L, -6L, -1L, 0L, 1L, 6L, 7L).toDF("x")
    val got = df.select(col("x"),
        Graft.floorDivExpr("x", 3L).as("fd"),
        expr("x DIV 3").as("td"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val want = Seq(-7L, -6L, -1L, 0L, 1L, 6L, 7L)
      .map(x => (x, Math.floorDiv(x, 3L), x / 3L))
    assert(got.toSeq === want)
    // the two disagree exactly on negative non-multiples
    assert(got.exists { case (_, fd, td) => fd != td })
  }

  test("pre-1970 timestamps bucket to the floor day") {
    // 1969-12-31T23:00:00Z = -3600000 ms -> floor day -1, DIV says 0
    val df = Seq(java.sql.Timestamp.from(
      java.time.Instant.parse("1969-12-31T23:00:00Z"))).toDF("ts")
    val day = df.select(
      Graft.floorDivExpr("unix_millis(ts)", 86400000L).as("d"))
      .as[Long].head()
    assert(day === -1L)
  }

  test("identical to DIV on the non-negative range") {
    val df = spark.range(0, 1000).toDF("x")
    assert(df.filter(
      Graft.floorDivExpr("x", 7L) =!= expr("x DIV 7")).count() === 0)
  }

  test("rejects non-positive divisors") {
    intercept[IllegalArgumentException](Graft.floorDivExpr("x", 0L))
  }
}
