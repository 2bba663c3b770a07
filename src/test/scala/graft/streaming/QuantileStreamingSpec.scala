package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Quantiles

class QuantileStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qs = Seq(100, 500, 950)

  private def batchTwin(rows: Seq[(String, Long)]) =
    Quantiles.groupQuantiles(rows.toDF("g", "v"), "g", col("v"), qs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def served(path: String) =
    QuantileStreaming.serve(spark, path, "g", qs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("served quantiles are bit-identical to the batch twin, replay-safe") {
    val root = Files.createTempDirectory("qstream").toString
    val b0 = Seq(("a", 5L), ("a", 1L), ("b", 10L), ("a", 5L))
    val b1 = Seq(("a", 9L), ("b", 2L), ("b", 10L), ("c", 7L))
    val b2 = Seq(("a", 5L), ("c", 7L), ("c", 3L))

    QuantileStreaming.mergeBatch(spark, b0.toDF("g", "v"), "g", col("v"),
      root, batchId = 0L)
    assert(served(root) === batchTwin(b0))

    QuantileStreaming.mergeBatch(spark, b1.toDF("g", "v"), "g", col("v"),
      root, batchId = 1L)
    // a crash-replay of batch 1 must not double-count (ledger)
    QuantileStreaming.mergeBatch(spark, b1.toDF("g", "v"), "g", col("v"),
      root, batchId = 1L)
    QuantileStreaming.mergeBatch(spark, b2.toDF("g", "v"), "g", col("v"),
      root, batchId = 2L)

    assert(served(root) === batchTwin(b0 ++ b1 ++ b2))
  }

  test("streaming-maintained thresholds reproduce the batch percentile gate") {
    val root = Files.createTempDirectory("qgate").toString
    val b0 = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("b", 10L), ("b", 2L))
    val b1 = Seq(("a", 7L), ("b", 4L), ("b", 6L), ("b", 8L))
    QuantileStreaming.mergeBatch(spark, b0.toDF("g", "v"), "g", col("v"),
      root, batchId = 0L)
    QuantileStreaming.mergeBatch(spark, b1.toDF("g", "v"), "g", col("v"),
      root, batchId = 1L)
    // gate the full corpus with thresholds served from the streamed
    // counts table — must equal the one-shot batch gate
    val all = (b0 ++ b1).toDF("g", "v")
    val thr = QuantileStreaming.serve(spark, root, "g", Seq(500))
      .select(col("g"), col("p50").as("thr"))
    val streamed = all.join(thr, Seq("g"))
      .withColumn("kept", col("v") >= col("thr"))
      .select("g", "v", "kept").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    val batch = Quantiles.percentileGate(all, "g", col("v"), 500)
      .select("g", "v", "kept").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamed === batch)
  }

  test("maintain() drives the same merge from a real streaming query") {
    val root = Files.createTempDirectory("qstream2").toString
    val ck = Files.createTempDirectory("qstream2ck").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = QuantileStreaming.maintain(
      input.toDF().toDF("g", "v"), "g", col("v"), root, ck)
    try {
      input.addData(("a", 4L), ("a", 8L), ("b", 3L))
      q.processAllAvailable()
      input.addData(("a", 4L), ("b", 6L))
      q.processAllAvailable()
    } finally q.stop()
    assert(served(root) ===
      batchTwin(Seq(("a", 4L), ("a", 8L), ("b", 3L), ("a", 4L), ("b", 6L))))
  }
}
