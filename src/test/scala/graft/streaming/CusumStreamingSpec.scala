package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the streaming CUSUM monitor to its batch twin
  * (`Series.cusumFixedTarget`) and to arrival-order independence —
  * the fold is order-sensitive, so these two properties ARE the
  * correctness contract.
  */
class CusumStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import CusumStreaming._

  private val Target = 1000L // cents: reference level 10.00
  private val Drift = 500L   // cents: flag at S > 5.00

  private def run(batches: Seq[Seq[Pt]],
                  delay: String = "5 seconds"): Set[(Long, Long, Double)] = {
    implicit val sq = spark.sqlContext
    val name = s"cu_out_${System.nanoTime()}"
    val input = MemoryStream[Pt]
    val query = cusumStreaming(withEventTime(input.toDS(), delay),
        Target, Drift)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      // drive the watermark far past every event so buffers drain
      input.addData(pt("flush", 0L, 10000000L, 0.0)); query.processAllAvailable()
      input.addData(pt("flush", 1L, 20000000L, 0.0)); query.processAllAvailable()
      spark.table(name).as[Flag].collect()
        .filter(_.key == "k")
        .map(f => (f.id, f.ts, f.cusum)).toSet
    } finally query.stop()
  }

  private def batchTwin(rows: Seq[(Long, Long, Double)]): Set[(Long, Long, Double)] = {
    val df = rows.map { case (id, ts, v) =>
      ("k", id, new java.sql.Timestamp(ts), v)
    }.toDF("key", "id", "ts", "v")
    graft.operators.Series
      .cusumFixedTarget(df, "key", "ts", "id", "v", Target, Drift)
      .selectExpr("id", "unix_micros(ts) DIV 1000", "cusum")
      .as[(Long, Long, Double)].collect().toSet
  }

  // values around 10.00: sustained positives accumulate, a deep dip
  // resets S to zero, then drift rebuilds — all three regimes flagged
  private val rows = Seq(
    (1L, 1000L, 13.00), (2L, 2000L, 14.50), (3L, 3000L, 9.00),
    (4L, 4000L, 2.00),  (5L, 5000L, 12.25), (6L, 6000L, 13.75),
    (7L, 7000L, 11.00), (8L, 8000L, 10.00), (9L, 9000L, 18.00))

  test("streaming CUSUM equals the batch twin on one batch") {
    val got = run(Seq(rows.map { case (id, ts, v) => pt("k", id, ts, v) }))
    val expect = batchTwin(rows)
    assert(got === expect)
    assert(got.nonEmpty) // the fixture must actually flag something
  }

  test("negative exact-half-cent values round like the batch DECIMAL cast") {
    // -0.125 is exact in binary; HALF_UP gives -13 cents where
    // Math.round(-12.5) would give -12 — the twin must agree with the
    // batch side's DECIMAL(18,2) semantics on exactly these inputs
    val rows = Seq(
      (1L, 1000L, 13.00), (2L, 2000L, 14.50),
      (3L, 3000L, -0.125), (4L, 4000L, -2.625),
      (5L, 5000L, 16.00), (6L, 6000L, 15.875))
    val got = run(Seq(rows.map { case (id, ts, v) => pt("k", id, ts, v) }))
    assert(got === batchTwin(rows))
  }

  test("arrival order and batch boundaries don't change the flags") {
    val expect = batchTwin(rows)
    // shuffled within-delay arrival, split across micro-batches
    val shuffled = Seq(
      Seq((3L, 3000L, 9.00), (1L, 1000L, 13.00), (2L, 2000L, 14.50)),
      Seq((6L, 6000L, 13.75), (4L, 4000L, 2.00), (5L, 5000L, 12.25)),
      Seq((9L, 9000L, 18.00), (7L, 7000L, 11.00), (8L, 8000L, 10.00)))
      .map(_.map { case (id, ts, v) => pt("k", id, ts, v) })
    assert(run(shuffled) === expect)
    // one event per batch, reverse-ish order inside the delay window
    val oneByOne = rows.reverse.grouped(1)
      .map(_.map { case (id, ts, v) => pt("k", id, ts, v) }).toSeq
    assert(run(oneByOne, delay = "20 seconds") === expect)
  }
}
