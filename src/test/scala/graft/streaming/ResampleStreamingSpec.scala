package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the streaming grid resample to its batch twin
  * (`Series.resample`) and to arrival-order independence.
  */
class ResampleStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import ResampleStreaming._

  private val Step = 10000L // ms

  /** Runs the streaming resample over the batches, flushing the
    * watermark far past every observation, and returns key-"k" rows.
    */
  private def run(batches: Seq[Seq[Obs]],
                  delay: String = "5 seconds"): Set[(Long, Double, Long)] = {
    implicit val sq = spark.sqlContext
    val name = s"rs_out_${System.nanoTime()}"
    val input = MemoryStream[Obs]
    val query = resampleStreaming(withEventTime(input.toDS(), delay),
        stepMs = Step)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      // push the watermark beyond every grid instant, then once more so
      // event-time timeouts fire for keys with no new data
      input.addData(obs("flush", 10000000L, 0.0)); query.processAllAvailable()
      input.addData(obs("flush", 20000000L, 0.0)); query.processAllAvailable()
      spark.table(name).as[GridPoint].collect()
        .filter(_.key == "k")
        .map(g => (g.grid_ts, g.value, g.obs_ts)).toSet
    } finally query.stop()
  }

  private def batchTwin(rows: Seq[(Long, Double)]): Set[(Long, Double, Long)] = {
    val df = rows.map { case (ts, v) =>
      ("k", new java.sql.Timestamp(ts), v)
    }.toDF("key", "ts", "value")
    graft.operators.Series.resample(df, "key", "ts", "value",
        stepMicros = Step * 1000)
      .selectExpr("unix_micros(grid_ts) DIV 1000", "value",
        "unix_micros(obs_ts) DIV 1000")
      .as[(Long, Double, Long)].collect().toSet
  }

  test("streaming resample equals the batch twin, including empty steps") {
    // a 3-step silence between 5s and 35s: steps 10s/20s/30s all fill
    // from the 5s observation
    val rows = Seq((5000L, 1.0), (35000L, 9.0), (47000L, 2.0))
    val got = run(Seq(rows.map { case (t, v) => obs("k", t, v) }))
    assert(got === batchTwin(rows))
    assert(got ===
      Set((10000L, 1.0, 5000L), (20000L, 1.0, 5000L), (30000L, 1.0, 5000L),
        (40000L, 9.0, 35000L)))
  }

  test("arrival order and batch boundaries don't change emitted rows") {
    val rows = Seq((3000L, 1.0), (15000L, 2.0), (27000L, 3.0))
    val oneBatch = run(Seq(rows.map { case (t, v) => obs("k", t, v) }))
    // same data, reordered within the 5s allowance and split across
    // batches
    val reordered = run(Seq(
      Seq(obs("k", 15000L, 2.0), obs("k", 12000L, -1.0)),
      Seq(obs("k", 27000L, 3.0), obs("k", 3000L, 1.0))),
      delay = "30 seconds")
    // the extra 12s obs is superseded inside its bucket before any
    // grid instant uses it… except 20s, which it can't fill because
    // 15s is later. So both runs agree on the shared rows from `rows`
    assert(oneBatch === batchTwin(rows))
    assert(reordered === batchTwin(rows ++ Seq((12000L, -1.0))))
  }

  test("streaming resample survives a checkpoint restart without dupes or loss") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("rs_ckpt").toString
    val (ckpt, outDir) = (s"$base/ckpt", s"$base/out")
    val input = MemoryStream[Obs]
    // parquet sink: the memory sink cannot recover from a checkpoint
    def start() = resampleStreaming(
        withEventTime(input.toDS(), "5 seconds"), stepMs = Step)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      input.addData(obs("k", 5000L, 1.0))
      q1.processAllAvailable()
      input.addData(obs("k", 22000L, 2.0)) // wm → 17s: emits grid 10s
      q1.processAllAvailable()
    } finally q1.stop()
    // restart: the floor row and the unemitted 20s instant must carry
    // over, emitting exactly once as the watermark passes them
    val q2 = start()
    try {
      input.addData(obs("k", 38000L, 3.0))
      q2.processAllAvailable()
      input.addData(obs("flush", 10000000L, 0.0))
      q2.processAllAvailable()
      input.addData(obs("flush", 20000000L, 0.0))
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).as[GridPoint].collect()
        .filter(_.key == "k").map(g => (g.grid_ts, g.value, g.obs_ts))
      assert(got.sortBy(_._1).toSeq === Seq(
        (10000L, 1.0, 5000L), (20000L, 1.0, 5000L),
        (30000L, 2.0, 22000L)))
    } finally q2.stop()
  }

  test("same-timestamp observations deduplicate to the max value") {
    val rows = Seq((10000L, 4.0), (10000L, 9.0), (20000L, 1.0))
    val got = run(Seq(rows.map { case (t, v) => obs("k", t, v) }))
    assert(got === Set((10000L, 9.0, 10000L), (20000L, 1.0, 20000L)))
    assert(got === batchTwin(rows))
  }
}
