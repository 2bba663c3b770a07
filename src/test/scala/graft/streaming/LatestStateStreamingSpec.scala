package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LatestStateStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import LatestStateStreaming._

  /** Drive the batches and return the FINAL snapshot per key (update
    * mode: the memory sink keeps every emission; last per key wins —
    * resolved by (ts, id), which mapGroupsWithState only ever
    * advances).
    */
  private def run(batches: Seq[Seq[Change]]): Map[Long, Snapshot] = {
    implicit val sq = spark.sqlContext
    val name = s"ls_out_${System.nanoTime()}"
    val input = MemoryStream[Change]
    val query = latestStateStreaming(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table(name).as[Snapshot].collect()
        .groupBy(_.key)
        .map { case (k, rows) => k -> rows.maxBy(s => (s.ts, s.id)) }
    } finally query.stop()
  }

  private val feed = Seq(
    Change(1L, 100L, 1L, "insert", "a", 1.0),
    Change(1L, 200L, 2L, "update", "b", 2.0),
    Change(2L, 100L, 3L, "insert", "c", 3.0),
    Change(2L, 300L, 4L, "delete", "c", 0.0),
    Change(3L, 100L, 5L, "delete", "d", 0.0),
    Change(3L, 200L, 6L, "insert", "e", 5.0))

  test("final snapshots equal the batch twin on the same feed") {
    val out = run(Seq(feed))
    // batch twin: CdcRouter.latestState drops deleted keys; the
    // streaming surface carries them with deleted=true instead
    val live = out.filter(!_._2.deleted)
    val batch = graft.sources.CdcRouter.latestState(
        feed.toDF(), keyCols = Seq("key"), orderCols = Seq("ts", "id"))
      .as[(Long, Long, Long, String, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(live.keySet === batch.keySet)
    live.foreach { case (k, s) =>
      assert(batch(k) === ((s.ts, s.id, s.op, s.payload, s.value)), s"key $k")
    }
    assert(out(2L).deleted) // tombstone surfaced, not silently dropped
  }

  test("arrival order and batch boundaries do not matter (max commutes)") {
    val shuffled = scala.util.Random.shuffle(feed)
    val oneRow = shuffled.map(Seq(_)) // one change per micro-batch
    val a = run(Seq(feed))
    val b = run(Seq(shuffled))
    val c = run(oneRow)
    assert(a === b)
    assert(a === c)
  }

  test("replayed duplicates are idempotent and emit NOTHING new") {
    implicit val sq = spark.sqlContext
    val name = s"ls_dup_${System.nanoTime()}"
    val input = MemoryStream[Change]
    val query = latestStateStreaming(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(feed: _*); query.processAllAvailable()
      val afterFirst = spark.table(name).count()
      // full replay + a stale change older than key 1's (200, 2)
      input.addData(feed: _*); query.processAllAvailable()
      input.addData(Change(1L, 150L, 99L, "update", "STALE", 9.9))
      query.processAllAvailable()
      // nothing advanced → zero redundant upsert rows
      assert(spark.table(name).count() === afterFirst)
      val k1 = spark.table(name).as[Snapshot].collect()
        .filter(_.key == 1L).maxBy(s => (s.ts, s.id))
      assert(k1.payload === "b" && k1.id === 2L)
    } finally query.stop()
  }

  test("TTL variant evicts dead tombstones but never a live or revived key") {
    implicit val sq = spark.sqlContext
    val name = s"ls_ttl_${System.nanoTime()}"
    val input = MemoryStream[Change]
    // watermark horizon 1s, tombstones evicted 1s past their event time
    val query = latestStateStreamingTtl(input.toDS(), "1 second", 1000L)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      input.addData(
        Change(1L, 100000L, 1L, "delete", "x", 0.0),
        Change(2L, 100000L, 2L, "delete", "x", 0.0),
        Change(3L, 100000L, 3L, "insert", "live", 1.0),
        Change(4L, 100000L, 4L, "delete", "x", 0.0))
      query.processAllAvailable()
      // revive key 4 before its TTL horizon (wm is 99000 here)
      input.addData(Change(4L, 100500L, 5L, "insert", "revived", 2.0))
      query.processAllAvailable()
      // advance the watermark past 100000 + 1000: wm = 103000 - 1000
      input.addData(Change(3L, 103000L, 6L, "update", "live2", 1.5))
      query.processAllAvailable()
      // one more batch so the now-expired timeouts actually fire
      input.addData(Change(3L, 103001L, 7L, "update", "live3", 1.6))
      query.processAllAvailable()
      val stateRows = query.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators.head.numRowsTotal
      assert(stateRows === 2L,
        s"dead keys 1,2 evicted; live 3 + revived 4 remain, got $stateRows")
      // the revived key survived its stale tombstone timeout intact
      val k4 = spark.table(name).as[Snapshot].collect()
        .filter(_.key == 4L).maxBy(s => (s.ts, s.id))
      assert(!k4.deleted && k4.payload === "revived")
    } finally query.stop()
  }
}
