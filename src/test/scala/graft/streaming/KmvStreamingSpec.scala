package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the streaming windowed KMV sketch to the batch `kmvDistinct`
  * fold and to arrival-order independence.
  */
class KmvStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import KmvStreaming._

  private val Win = 60000L

  private def run(batches: Seq[Seq[ValueEvent]],
                  k: Int): Seq[(Long, Long, Option[Double])] = {
    implicit val sq = spark.sqlContext
    val name = s"kmv_out_${System.nanoTime()}"
    val input = MemoryStream[ValueEvent]
    val withWm = input.toDS().toDF()
      .withWatermark("event_time", "0 seconds").as[ValueEvent]
    val query = windowedDistinct(withWm, Win, k)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      // two extra batches: advance the watermark, then fire timeouts
      input.addData(ValueEvent.at("zz", 100 * Win)); query.processAllAvailable()
      input.addData(ValueEvent.at("zz", 101 * Win)); query.processAllAvailable()
      spark.table(name).as[WindowedDistinct].collect()
        .filter(_.window_start < 100 * Win)
        .map(w => (w.window_start, w.distinct_le_k,
          Option(w.kmv_estimate).map(_.doubleValue))).sorted.toSeq
    } finally query.stop()
  }

  test("closed windows match the batch kmv sketch bit-for-bit") {
    // window 0: 30 distinct of 60 rows (k=16 → estimator fires);
    // window 1: 5 distinct (below k → exact, null estimate)
    val w0 = (0 until 60).map(i => ValueEvent.at(s"v${i % 30}", 1000L + i))
    val w1 = (0 until 5).map(i => ValueEvent.at(s"u$i", Win + 1000L + i))
    val got = run(Seq(w0 ++ w1), k = 16)

    val batch = graft.operators.Dedup.kmvDistinct(
        (w0 ++ w1).map(e => (Math.floorDiv(e.ts, Win) * Win, e.value))
          .toDF("w", "text"),
        "w", "text", k = 16)
      .select(col("w"), col("distinct_le_k"), col("kmv_estimate"))
      .as[(Long, Long, Option[Double])].collect().sorted.toSeq
    assert(got === batch)
    assert(got.map(_._1) === Seq(0L, Win))
    assert(got(1)._2 === 5L && got(1)._3.isEmpty)
  }

  test("arrival order and batch boundaries cannot change the sketch") {
    val vals = (0 until 40).map(i => s"x$i")
    val fwd = vals.zipWithIndex.map { case (v, i) => ValueEvent.at(v, 1000L + i) }
    val a = run(Seq(fwd), k = 8)
    // reversed within one batch (a 0s watermark drops cross-batch
    // reversals as late — in-batch order is the free variable here)
    val b = run(Seq(fwd.reverse), k = 8)
    // same rows split across two forward batches
    val c = run(Seq(fwd.take(20), fwd.drop(20)), k = 8)
    assert(a === b && a === c)
  }

  test("duplicates never inflate the sketch") {
    val dup = (0 until 50).map(i => ValueEvent.at(s"d${i % 4}", 1000L + i))
    val got = run(Seq(dup), k = 16)
    assert(got === Seq((0L, 4L, None)))
  }

  test("an all-null window emits no phantom row (batch-twin parity)") {
    // window 0 (of Win): only null values; window 1: real values. The
    // batch twin filters nulls before groupBy and emits NO row for the
    // all-null group — streaming must not materialize state for it.
    val out = run(Seq(Seq(
      ValueEvent.at(null, 1000L), ValueEvent.at(null, 2000L),
      ValueEvent.at("a", Win + 1000L), ValueEvent.at("b", Win + 2000L))),
      k = 8)
    assert(out.map(_._1).toSet === Set(Win)) // no window-0 row
    assert(out === Seq((Win, 2L, None)))
  }
}
