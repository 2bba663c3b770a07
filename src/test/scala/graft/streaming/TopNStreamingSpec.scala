package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the streaming windowed top-N to its batch twin and to the
  * properties its correctness rests on: every closed window's groups
  * seal in one micro-batch (so the per-batch rank is the window's
  * global top-N), integer sums make the ranking arrival-order-free,
  * and ties break by ascending key exactly like the batch q19 shape.
  */
object TopNStreamingSpec {
  case class M(sku_id: Long, ts: Long, amount_cents: Long,
               event_time: Timestamp = null)
}

class TopNStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import TopNStreamingSpec.M

  private def m(sku: Long, ts: Long, cents: Long): M =
    M(sku, ts, cents, new Timestamp(ts))

  private val t0 = 1620043200000L // 2021-05-03 12:00:00 UTC

  // window [t0, t0+10s): four skus — 7 must be cut (rank 4), and skus
  // 5/9 TIE at 3000 so the ascending-key break is exercised; window 2
  // has a single sku; the far row only flushes the watermark
  private val rows = Seq(
    m(5, t0 + 1000, 1000), m(5, t0 + 2000, 2000),
    m(9, t0 + 3000, 3000),
    m(2, t0 + 4000, 9000),
    m(7, t0 + 5000, 500),
    m(3, t0 + 12000, 700),
    m(1, t0 + 90000000, 1))

  private def run(batches: Seq[Seq[M]]): Set[(Long, Long, Long, Int)] = {
    implicit val sq = spark.sqlContext
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Int)]()
    val input = MemoryStream[M]
    // 2-minute horizon: every in-window row stays admissible under any
    // arrival order the order-independence test generates, while the
    // far flush row still seals the data windows
    val query = TopNStreaming.windowedTopN(
      input.toDF().withWatermark("event_time", "2 minutes"),
      "10 seconds", n = 3, keyCol = "sku_id", centsCol = "amount_cents",
      tsCol = "event_time") { (_, ranked) =>
        buf ++= ranked
          .selectExpr("unix_millis(stt)", "sku_id", "amount_cents", "rnk")
          .as[(Long, Long, Long, Int)].collect()
      }.start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      query.processAllAvailable()
      assert(query.exception.isEmpty, query.exception.toString)
    } finally query.stop()
    buf.toSet
  }

  private def batchTwin(data: Seq[M]): Set[(Long, Long, Long, Int)] = {
    val agged = data.toDF()
      .groupBy(window(col("event_time"), "10 seconds").as("w"), col("sku_id"))
      .agg(sum(col("amount_cents")).as("amount_cents"))
      .select(col("w.start").as("stt"), col("sku_id"), col("amount_cents"))
    TopNStreaming.rankBatch(agged, 3, "sku_id")
      .selectExpr("unix_millis(stt)", "sku_id", "amount_cents", "rnk")
      .as[(Long, Long, Long, Int)].collect().toSet
  }

  test("streaming top-N equals the batch twin; ties break by key") {
    val got = run(Seq(rows))
    // the flush row's window never seals — compare on the sealed ones
    val expect = batchTwin(rows).filter(_._1 < t0 + 86400000L)
    assert(got === expect)
    // the cut and the tie, explicitly
    val w0 = got.filter(_._1 == t0).toSeq.sortBy(_._4)
    assert(w0.map(r => (r._2, r._4)) === Seq((2L, 1), (5L, 2), (9L, 3)))
    assert(!got.exists(_._2 == 7L)) // rank 4: cut
  }

  test("arrival order and batch boundaries do not change the ranking") {
    val shuffled = new scala.util.Random(7).shuffle(rows.dropRight(1)) :+ rows.last
    val a = run(Seq(rows))
    val b = run(Seq(shuffled))
    val c = run(shuffled.map(Seq(_)))
    assert(a === b)
    assert(a === c)
  }
}
