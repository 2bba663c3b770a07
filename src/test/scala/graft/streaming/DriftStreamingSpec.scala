package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Series

/** Served drift must be bit-identical to the batch operator over the
  * same events — additive counts + the shared finisher — including
  * under replay and for late out-of-order days.
  */
class DriftStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000L
  private def ts(d: Long, i: Long) = new Timestamp(d * day + i * 1000L)

  // three days of shifting category mix; day 2 events arrive across
  // batches and one day-0 straggler lands in the LAST batch
  private val b0 = Seq((ts(0, 1), "view"), (ts(0, 2), "view"),
    (ts(0, 3), "cart"), (ts(1, 1), "view"))
  private val b1 = Seq((ts(1, 2), "cart"), (ts(1, 3), "cart"),
    (ts(2, 1), "order"), (ts(2, 2), "view"))
  private val b2 = Seq((ts(2, 3), "order"), (ts(0, 4), "view"))

  private def batchTwin(rows: Seq[(Timestamp, String)]) =
    Series.distributionDrift(rows.toDF("ts", "event_type"),
        "ts", "event_type")
      .as[(Long, Double)].collect().toSet

  test("served drift ≡ batch op, replay-safe, late days merge in") {
    val root = Files.createTempDirectory("driftstream").toString
    def df(rows: Seq[(Timestamp, String)]) = rows.toDF("ts", "event_type")

    DriftStreaming.mergeBatch(spark, df(b0), "ts", "event_type", root, 0L)
    assert(DriftStreaming.serve(spark, root)
      .as[(Long, Double)].collect().toSet === batchTwin(b0))

    DriftStreaming.mergeBatch(spark, df(b1), "ts", "event_type", root, 1L)
    // crash-replay of batch 1: the ledger must not double-count
    DriftStreaming.mergeBatch(spark, df(b1), "ts", "event_type", root, 1L)
    DriftStreaming.mergeBatch(spark, df(b2), "ts", "event_type", root, 2L)

    val got = DriftStreaming.serve(spark, root)
      .as[(Long, Double)].collect().toSet
    assert(got === batchTwin(b0 ++ b1 ++ b2))
    assert(got.size === 2) // days 1 and 2 have a previous day
    // the day-0 straggler genuinely moved day 1's drift: the final
    // view differs from what b0 ++ b1 alone would have served
    assert(got !== batchTwin(b0 ++ b1))
  }

  test("served SEASONAL decomposition ≡ batch twin from the same ledger") {
    val root = Files.createTempDirectory("driftseasonal").toString
    def df(rows: Seq[(Timestamp, String)]) = rows.toDF("ts", "event_type")
    DriftStreaming.mergeBatch(spark, df(b0), "ts", "event_type", root, 0L)
    DriftStreaming.mergeBatch(spark, df(b1), "ts", "event_type", root, 1L)
    // replay must not shift the decomposition either
    DriftStreaming.mergeBatch(spark, df(b1), "ts", "event_type", root, 1L)
    DriftStreaming.mergeBatch(spark, df(b2), "ts", "event_type", root, 2L)
    val got = DriftStreaming.serveSeasonal(spark, root)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = Series.seasonalDecompose(
        (b0 ++ b1 ++ b2).toDF("ts", "event_type"), "event_type", "ts")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("maintain() drives the same merge from a real streaming query") {
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("driftstream2").toString
    val input = MemoryStream[(Timestamp, String)]
    val q = DriftStreaming.maintain(
      input.toDF().toDF("ts", "event_type"), "ts", "event_type",
      s"$root/state", s"$root/ckpt")
    try {
      input.addData(b0: _*); q.processAllAvailable()
      input.addData(b1 ++ b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(DriftStreaming.serve(spark, s"$root/state")
      .as[(Long, Double)].collect().toSet === batchTwin(b0 ++ b1 ++ b2))
  }
}
