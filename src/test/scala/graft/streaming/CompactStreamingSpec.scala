package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.sources.CdcRouter

/** Served compaction must be bit-identical to the batch operator over
  * the same feed — max-struct state is idempotent, so replayed batches
  * and late buckets cannot shift it.
  */
class CompactStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, seq, op, v); bucket = seq DIV 10. The day-0 straggler for A
  // ("A", 3) arrives in the LAST batch and must still lose to seq 5.
  private val b0 = Seq(("A", 1L, "insert", 10), ("A", 5L, "update", 11),
    ("B", 2L, "insert", 20))
  private val b1 = Seq(("A", 13L, "delete", 0), ("B", 14L, "update", 21))
  private val b2 = Seq(("A", 3L, "update", 99), ("C", 15L, "insert", 30))

  private def df(rows: Seq[(String, Long, String, Int)]) =
    rows.toDF("k", "seq", "op", "v")

  private def batchTwin(rows: Seq[(String, Long, String, Int)]) =
    CdcRouter.compactChangelog(df(rows), Seq("k"), Seq("seq"),
        bucket = expr("seq DIV 10"), bucketName = "day")
      .select(col("k"), col("day"), col("seq"), col("op"), col("v"))
      .as[(String, Long, Long, String, Int)].collect().toSet

  test("served compaction ≡ batch op across slicing, replay, late rows") {
    val root = Files.createTempDirectory("compactstream").toString
    def merge(rows: Seq[(String, Long, String, Int)], id: Long) =
      CompactStreaming.mergeBatch(spark, df(rows), Seq("k"), Seq("seq"),
        bucket = expr("seq DIV 10"), bucketName = "day", path = root,
        batchId = id)
    def served = CompactStreaming.serve(spark, root, Seq("k"), "day")
      .select(col("k"), col("day"), col("seq"), col("op"), col("v"))
      .as[(String, Long, Long, String, Int)].collect().toSet

    merge(b0, 0L)
    assert(served === batchTwin(b0))
    merge(b1, 1L)
    merge(b1, 1L) // crash-replay: idempotent state must not shift
    merge(b2, 2L)
    val got = served
    assert(got === batchTwin(b0 ++ b1 ++ b2))
    // the tombstone row is visible; the straggler did NOT displace
    // the later same-bucket update
    assert(got.contains(("A", 1L, 13L, "delete", 0)))
    assert(got.contains(("A", 0L, 5L, "update", 11)))
    assert(!got.exists(r => r._1 == "A" && r._5 == 99))
  }
}
