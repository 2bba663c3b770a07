package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Mixing

/** The streaming priority sampler must hold, after every batch, a
  * sample bit-equal to the batch operator run over everything seen so
  * far — for any batch slicing, and across a checkpoint restart.
  */
class SampleStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two strata, weights spread over two octaves so the sample is
  // weight-sensitive, ids interleaved across strata
  private val rows: Seq[(String, Long, Long)] =
    (1L to 40L).map(i => (if (i % 2 == 0) "a" else "b", i, 1L + i % 7))

  private def batchSample(seen: Seq[(String, Long, Long)]): Set[(String, Long)] =
    Mixing.prioritySample(seen.toDF("source", "doc_id", "wt"),
        "source", "doc_id", col("wt"), k = 3)
      .select(col("source"), col("doc_id"))
      .as[(String, Long)].collect().toSet

  test("held sample equals the batch op after every batch, any slicing") {
    for (nSlices <- Seq(1, 4)) {
      implicit val sq = spark.sqlContext
      val dir = java.nio.file.Files
        .createTempDirectory("sampstream").toString + "/state"
      val held = scala.collection.mutable.Map[Long, Set[(String, Long)]]()
      val input = MemoryStream[(String, Long, Long)]
      val q = SampleStreaming.prioritySampleStream(
          input.toDF().toDF("source", "doc_id", "wt"), dir,
          (id, df) => held(id) = df.select(col("source"), col("doc_id"))
            .as[(String, Long)].collect().toSet,
          "source", "doc_id", "wt", k = 3)
        .start()
      val slices = {
        val sz = math.ceil(rows.size.toDouble / nSlices).toInt
        rows.grouped(sz).toSeq
      }
      try {
        var seen = Seq.empty[(String, Long, Long)]
        slices.zipWithIndex.foreach { case (s, i) =>
          input.addData(s: _*)
          q.processAllAvailable()
          seen ++= s
          assert(held(i.toLong) === batchSample(seen),
            s"slices=$nSlices batch=$i")
        }
      } finally q.stop()
    }
  }

  test("state survives a checkpoint restart; duplicates merge idempotently") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sampstream2").toString
    val held = scala.collection.mutable.Map[Long, Set[(String, Long)]]()
    val input = MemoryStream[(String, Long, Long)]
    def start() = SampleStreaming.prioritySampleStream(
        input.toDF().toDF("source", "doc_id", "wt"), s"$base/state",
        (id, df) => held(id) = df.select(col("source"), col("doc_id"))
          .as[(String, Long)].collect().toSet,
        "source", "doc_id", "wt", k = 3)
      .option("checkpointLocation", s"$base/ckpt").start()
    val (h1, h2) = rows.splitAt(25)
    val q1 = start()
    try { input.addData(h1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      // re-send three already-sampled rows alongside the new half:
      // identical priorities, so the merge must not shift the sample
      input.addData(h2 ++ h1.take(3): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(held(1L) === batchSample(rows))
  }
}
