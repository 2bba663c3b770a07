package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EwmaStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import EwmaStreaming._

  private val Horizon = 4 // small horizon: ramp-up AND eviction both fire

  private def run(batches: Seq[Seq[Pt]],
                  delay: String = "5 seconds"): Set[(Long, Long, Double)] = {
    implicit val sq = spark.sqlContext
    val name = s"ew_out_${System.nanoTime()}"
    val input = MemoryStream[Pt]
    val query = ewmaStreaming(withEventTime(input.toDS(), delay), Horizon)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      // drive the watermark far past every event so buffers drain
      input.addData(pt("flush", 0L, 10000000L, 0.0)); query.processAllAvailable()
      input.addData(pt("flush", 1L, 20000000L, 0.0)); query.processAllAvailable()
      spark.table(name).as[Smoothed].collect()
        .filter(_.key == "k")
        .map(s => (s.id, s.ts, s.ewma)).toSet
    } finally query.stop()
  }

  private def batchTwin(rows: Seq[(Long, Long, Double)]): Set[(Long, Long, Double)] = {
    val df = rows.map { case (id, ts, v) =>
      ("k", id, new java.sql.Timestamp(ts), v)
    }.toDF("key", "id", "ts", "v")
    graft.operators.Series
      .ewma(df, "key", "id", "ts", "v", horizon = Horizon)
      .selectExpr("id", "unix_micros(ts) DIV 1000", "ewma")
      .as[(Long, Long, Double)].collect().toSet
  }

  // more events than the horizon so the frontier evicts; values with
  // exact and inexact cent representations mixed in
  private val rows = Seq(
    (1L, 1000L, 1.00), (2L, 2000L, 4.00), (3L, 3000L, 10.00),
    (4L, 4000L, 2.50), (5L, 5000L, 7.25), (6L, 6000L, 0.00),
    (7L, 7000L, 12.125), (8L, 8000L, 3.00))

  test("streaming EWMA is bit-equal to the batch twin") {
    val got = run(Seq(rows.map { case (id, ts, v) => pt("k", id, ts, v) }))
    val expect = batchTwin(rows)
    assert(got === expect)
    assert(got.size === rows.size) // one emission per event
  }

  test("ramp-up rows renormalize exactly like the batch lag chain") {
    val short = rows.take(2)
    val got = run(Seq(short.map { case (id, ts, v) => pt("k", id, ts, v) }))
    assert(got === batchTwin(short))
    // first event: EWMA == its own value
    assert(got.exists { case (id, _, e) => id == 1L && e == 1.0 })
  }

  test("arrival order and batch boundaries don't change the series") {
    val expect = batchTwin(rows)
    val shuffled = Seq(
      Seq(rows(2), rows(0), rows(1)).map { case (id, ts, v) => pt("k", id, ts, v) },
      Seq(rows(5), rows(3), rows(4)).map { case (id, ts, v) => pt("k", id, ts, v) },
      Seq(rows(7), rows(6)).map { case (id, ts, v) => pt("k", id, ts, v) })
    assert(run(shuffled) === expect)
    val oneByOne = rows.reverse.grouped(1)
      .map(_.map { case (id, ts, v) => pt("k", id, ts, v) }).toSeq
    assert(run(oneByOne, delay = "20 seconds") === expect)
  }
}
