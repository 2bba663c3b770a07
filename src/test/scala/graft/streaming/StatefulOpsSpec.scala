package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StatefulOps.KeyedEvent

class AsofStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import AsofStreaming._

  test("streaming asof matches the batch asof join on out-of-order input") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    // 10-minute out-of-orderness allowance: probes may trail the
    // reference rows (rows older than the watermark are late data and
    // dropped before any stateful op — standard watermark contract)
    val query = AsofStreaming
      .asofStreaming(withEventTime(input.toDS(), "10 minutes"))
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // reference rows first (out of order vs the probes that follow)
      input.addData(AsofEvent.right("k", 100L, "p1"),
        AsofEvent.right("k", 300L, "p2"))
      query.processAllAvailable()
      // probes: one between the rights, one after, one keyless-match
      input.addData(AsofEvent.left("k", 250L, "probe1"),
        AsofEvent.left("k", 350L, "probe2"),
        AsofEvent.left("k2", 50L, "probe3"))
      query.processAllAvailable()
      // advance the watermark past every probe, then one more batch so
      // the event-time timeouts fire and flush the pending lefts
      input.addData(AsofEvent.right("flush", 1000000L, "x"))
      query.processAllAvailable()
      input.addData(AsofEvent.right("flush", 2000000L, "x"))
      query.processAllAvailable()
      val got = spark.table("asof_out").as[AsofMatch].collect()
        .map(m => (m.key, m.ts, m.value,
          Option(m.asof_ts).map(_.longValue), Option(m.asof_value))).toSet
      assert(got === Set(
        ("k", 250L, "probe1", Some(100L), Some("p1")),
        ("k", 350L, "probe2", Some(300L), Some("p2")),
        ("k2", 50L, "probe3", None, None)))
      // the batch twin on identical data agrees row-for-row
      val leftDf = Seq(("k", 250L, "probe1"), ("k", 350L, "probe2"),
        ("k2", 50L, "probe3")).toDF("key", "ts", "value")
      val rightDf = Seq(("k", 100L, "p1"), ("k", 300L, "p2"),
        ("flush", 1000L, "x"), ("flush", 2000L, "x"))
        .toDF("key", "rts", "rvalue")
      val batch = graft.operators.Temporal
        .asofJoin(leftDf, rightDf, "key", "key", "ts", "rts",
          Seq("rts", "rvalue"))
        .select("key", "ts", "value", "_asof.rts", "_asof.rvalue")
        .as[(String, Long, String, Option[Long], Option[String])]
        .collect().toSet
      assert(batch === got)
    } finally query.stop()
  }

  test("streaming asof state compacts rights to one floor row per key") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val query = AsofStreaming.asofStreaming(withEventTime(input.toDS()))
      .writeStream.format("memory").queryName("asof_floor_out")
      .outputMode("append").start()
    try {
      // many superseded rights, then (after the watermark passes them
      // all) a probe that must still match the surviving floor row
      input.addData((1 to 20).map(i =>
        AsofEvent.right("k", i * 10L, s"v$i")): _*)
      query.processAllAvailable()
      input.addData(AsofEvent.right("flush", 5000L, "x"))
      query.processAllAvailable()
      input.addData(AsofEvent.left("k", 6000L, "probe"))
      query.processAllAvailable()
      input.addData(AsofEvent.right("flush", 9000L, "x"))
      query.processAllAvailable()
      input.addData(AsofEvent.right("flush", 9500L, "x"))
      query.processAllAvailable()
      val got = spark.table("asof_floor_out").as[AsofMatch].collect()
        .filter(_.key == "k")
        .map(m => (m.ts, m.value, m.asof_ts.longValue, m.asof_value))
      assert(got.toSeq === Seq((6000L, "probe", 200L, "v20")))
    } finally query.stop()
  }

  test("streaming asof survives a checkpoint restart without dupes or loss") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("asof_ckpt").toString
    val (ckpt, outDir) = (s"$base/ckpt", s"$base/out")
    val input = MemoryStream[AsofEvent]
    // parquet sink: the memory sink cannot recover from a checkpoint,
    // so the restart contract is exercised against a real sink
    def start() = AsofStreaming
      .asofStreaming(withEventTime(input.toDS(), "10 minutes"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      input.addData(AsofEvent.right("k", 100L, "p1"),
        AsofEvent.left("k", 150L, "probe1"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: buffered state must carry over and
    // later rights/probes must see it exactly once
    val q2 = start()
    try {
      input.addData(AsofEvent.right("k", 300L, "p2"),
        AsofEvent.left("k", 350L, "probe2"))
      q2.processAllAvailable()
      input.addData(AsofEvent.right("flush", 1000000L, "x"))
      q2.processAllAvailable()
      input.addData(AsofEvent.right("flush", 2000000L, "x"))
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).as[AsofMatch].collect()
        .filter(_.key == "k")
        .map(m => (m.ts, m.value, m.asof_ts.longValue, m.asof_value))
      assert(got.sortBy(_._1).toSeq === Seq(
        (150L, "probe1", 100L, "p1"), (350L, "probe2", 300L, "p2")))
    } finally q2.stop()
  }

  test("streaming asof dedups equal right timestamps to the max value") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[AsofEvent]
    val query = AsofStreaming.asofStreaming(withEventTime(input.toDS()))
      .writeStream.format("memory").queryName("asof_tie_out")
      .outputMode("append").start()
    try {
      input.addData(AsofEvent.right("k", 100L, "aa"),
        AsofEvent.right("k", 100L, "zz"), AsofEvent.left("k", 150L, "probe"))
      query.processAllAvailable()
      input.addData(AsofEvent.right("flush", 1000L, "x"))
      query.processAllAvailable()
      input.addData(AsofEvent.right("flush", 2000L, "x"))
      query.processAllAvailable()
      val got = spark.table("asof_tie_out").as[AsofMatch].collect()
        .filter(_.key == "k").map(m => (m.asof_ts.longValue, m.asof_value))
      assert(got.toSeq === Seq((100L, "zz")))
    } finally query.stop()
  }
}

class FrequencyStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import FrequencyStreaming._

  test("windowed heavy hitters emit a bounded sketch per closed window") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TokenEvent]
    val withWm = input.toDS().toDF()
      .withWatermark("event_time", "0 seconds").as[TokenEvent]
    // subshards = 1: single-sketch semantics, exactly a batch MG fold
    val query = FrequencyStreaming
      .windowedHeavyHitters(withWm, windowMillis = 60000L, k = 3,
        subshards = 1)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    try {
      // window 0: heavy token a (6×) + 4 distinct fillers vs k=3
      val w0 = Seq.fill(6)("a") ++ Seq("f1", "f2", "f3", "f4")
      input.addData(w0.zipWithIndex.map { case (t, i) =>
        TokenEvent.at(t, 1000L + i) }: _*)
      query.processAllAvailable()
      // window 1 advances the watermark past window 0's end
      input.addData(TokenEvent.at("b", 61000L))
      query.processAllAvailable()
      input.addData(TokenEvent.at("b", 62000L)) // fire w0's timeout
      query.processAllAvailable()
      val got = spark.table("hh_out").as[WindowedItem].collect()
        .filter(_.window_start == 0L)
      // matches the batch MG fold over the same (ts, token)-ordered data
      val mg = new graft.operators.Frequency.MisraGries(3)
      val expect = w0.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .sortBy(identity).map(_._2).foldLeft(mg.zero)(mg.reduce)
      assert(got.map(i => i.token -> i.ct).toMap === expect)
      assert(got.length <= 3) // state bound held
      assert(expect("a") >= 6L - 10L / 4L) // heavy token survives
    } finally query.stop()
  }

  test("subsharded windows union per-shard sketches without a merge") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TokenEvent]
    val withWm = input.toDS().toDF()
      .withWatermark("event_time", "0 seconds").as[TokenEvent]
    // k=2 per subshard; tokens are hash-disjoint across the 4 shards
    val query = FrequencyStreaming
      .windowedHeavyHitters(withWm, windowMillis = 60000L, k = 2,
        subshards = 4)
      .writeStream.format("memory").queryName("hh_sub_out")
      .outputMode("append").start()
    try {
      val w0 = Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq("c", "d")
      input.addData(w0.zipWithIndex.map { case (t, i) =>
        TokenEvent.at(t, 1000L + i) }: _*)
      query.processAllAvailable()
      input.addData(TokenEvent.at("x", 61000L))
      query.processAllAvailable()
      input.addData(TokenEvent.at("x", 62000L))
      query.processAllAvailable()
      val got = spark.table("hh_sub_out").as[WindowedItem].collect()
        .filter(_.window_start == 0L).map(i => i.token -> i.ct).toMap
      // expected: per-subshard MG folds, unioned (tokens disjoint)
      val mg = new graft.operators.Frequency.MisraGries(2)
      val expect = w0.zipWithIndex
        .groupBy { case (t, _) => Math.floorMod(t.hashCode, 4) }
        .values.flatMap { part =>
          part.map { case (t, i) => (1000L + i, t) }
            .sortBy(identity).map(_._2).foldLeft(mg.zero)(mg.reduce)
        }.toMap
      assert(got === expect)
      // each token's emitted count equals its own subshard's fold —
      // heavy tokens in different shards both survive with k=2
      assert(got.contains("a") && got("a") === expect("a"))
    } finally query.stop()
  }
}

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day1 = 1620000000000L // 2021-05-03
  private val day2 = day1 + 86400000L

  test("streaming UV dedup emits first event per mid per day, across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.uniqueVisitStreaming(
        StatefulOps.watermarked(input.toDS()))
      .writeStream.format("memory").queryName("uv_out")
      .outputMode("append").start()
    try {
      input.addData(
        KeyedEvent.at("m1", day1 + 10, "1", "home", null),
        KeyedEvent.at("m1", day1 + 20, "1", "detail", "home"),
        KeyedEvent.at("m2", day1 + 30, "1", "home", null))
      query.processAllAvailable()
      input.addData( // same day again + next day
        KeyedEvent.at("m1", day1 + 40, "1", "cart", "detail"),
        KeyedEvent.at("m1", day2 + 10, "1", "home", null))
      query.processAllAvailable()
      val out = spark.table("uv_out").as[KeyedEvent].collect()
      assert(out.map(e => (e.mid, e.ts)).toSet ===
        Set(("m1", day1 + 10), ("m2", day1 + 30), ("m1", day2 + 10)))
    } finally query.stop()
  }

  test("streaming is_new fix corrects later-day claims, keeps first-day") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.isNewFixStreaming(input.toDS())
      .writeStream.format("memory").queryName("isnew_out")
      .outputMode("append").start()
    try {
      input.addData(KeyedEvent.at("m1", day1 + 10, "1", "home", null))
      query.processAllAvailable()
      input.addData(KeyedEvent.at("m1", day2 + 10, "1", "home", null))
      query.processAllAvailable()
      val out = spark.table("isnew_out").as[KeyedEvent].collect()
        .map(e => (e.ts, e.is_new)).toMap
      assert(out(day1 + 10) === "1")
      assert(out(day2 + 10) === "0")
    } finally query.stop()
  }

  test("batch bounce detection: entry with no follow-up within gap") {
    val df = Seq(
      // m1: entry then quick follow-up (no bounce)
      ("m1", day1 + 1000L, null.asInstanceOf[String]),
      ("m1", day1 + 5000L, "home"),
      // m1: later entry with follow-up too late (bounce)
      ("m1", day1 + 100000L, null.asInstanceOf[String]),
      ("m1", day1 + 200000L, "home"),
      // m2: entry with nothing after (bounce)
      ("m2", day1 + 1000L, null.asInstanceOf[String])
    ).toDF("mid", "ts", "last_page_id")
    val bounces = StatefulOps.bounceBatch(df, gapMillis = 10000L)
      .select("mid", "ts").as[(String, Long)].collect().toSet
    assert(bounces === Set(("m1", day1 + 100000L), ("m2", day1 + 1000L)))
  }

  test("streaming bounce detection matches batch incl. watermark timeout flush") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.bounceStreaming(
        StatefulOps.watermarked(input.toDS()), gapMillis = 10000L)
      .writeStream.format("memory").queryName("bounce_out")
      .outputMode("append").start()
    try {
      input.addData(
        KeyedEvent.at("m1", day1 + 1000L, "1", "home", null),
        KeyedEvent.at("m1", day1 + 5000L, "1", "detail", "home"))
      query.processAllAvailable()
      input.addData(
        KeyedEvent.at("m1", day1 + 100000L, "1", "home", null),
        KeyedEvent.at("m1", day1 + 200000L, "1", "detail", "home"))
      query.processAllAvailable()
      // advance watermark far past m2's entry so the timeout fires
      input.addData(KeyedEvent.at("m2", day1 + 300000L, "1", "home", null))
      query.processAllAvailable()
      input.addData(KeyedEvent.at("m3", day1 + 900000L, "1", "detail", "x"))
      query.processAllAvailable()
      val rows = spark.table("bounce_out").as[KeyedEvent].collect()
      val out = rows.map(e => (e.mid, e.ts)).toSet
      assert(out.contains(("m1", day1 + 100000L))) // in-stream bounce
      assert(out.contains(("m2", day1 + 300000L))) // timeout-flushed bounce
      // bounce rows are the original entry rows, dimensions intact
      // (batch/streaming equivalence covers the full row, not just keys)
      rows.filter(e => e.mid == "m1" || e.mid == "m2").foreach { e =>
        assert(e.is_new == "1" && e.page_id == "home" && e.event_time != null)
      }
    } finally query.stop()
  }

  test("bounce: an out-of-order follow-up in a later batch is not a false bounce") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    // 60s delay keeps all of these events watermark-admissible
    val query = StatefulOps.bounceStreaming(
        StatefulOps.watermarked(input.toDS(), delay = "60 seconds"),
        gapMillis = 10000L)
      .writeStream.format("memory").queryName("bounce_ooo")
      .outputMode("append").start()
    try {
      // batch 1: the entry
      input.addData(KeyedEvent.at("m1", day1 + 1000L, "1", "home", null))
      query.processAllAvailable()
      // batch 2: a LATER event arrives first (arrival order != event order)
      input.addData(KeyedEvent.at("m1", day1 + 30000L, "1", "other", "x"))
      query.processAllAvailable()
      // batch 3: the on-time out-of-order follow-up WITHIN the gap
      input.addData(KeyedEvent.at("m1", day1 + 5000L, "1", "detail", "home"))
      query.processAllAvailable()
      // flush the watermark far past everything
      input.addData(KeyedEvent.at("mz", day1 + 9000000L, "1", "p", "q"))
      query.processAllAvailable()
      input.addData(KeyedEvent.at("mz", day1 + 9900000L, "1", "p", "q"))
      query.processAllAvailable()
      val out = spark.table("bounce_ooo").as[KeyedEvent].collect()
        .filter(_.mid == "m1").map(_.ts).toSet
      // arrival-order folding would have bounced the entry at batch 2;
      // watermark-sealed folding sees the 5s follow-up first
      assert(out === Set.empty[Long])
    } finally query.stop()
  }

  test("is_new fix lowers first-seen day on an out-of-order earlier event") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val query = StatefulOps.isNewFixStreaming(
        StatefulOps.watermarked(input.toDS(), delay = "10 days"))
      .writeStream.format("memory").queryName("isnew_ooo")
      .outputMode("append").start()
    try {
      val day3 = day1 + 2 * 86400000L
      // day-3 event arrives first: state = day3
      input.addData(KeyedEvent.at("m1", day3 + 1000L, "1"))
      query.processAllAvailable()
      // out-of-order day-1 event arrives later: state must LOWER
      input.addData(KeyedEvent.at("m1", day1 + 1000L, "1"))
      query.processAllAvailable()
      // subsequent day-3 claim is now corrected (batch-twin semantics)
      input.addData(KeyedEvent.at("m1", day3 + 2000L, "1"))
      query.processAllAvailable()
      val out = spark.table("isnew_ooo").as[KeyedEvent].collect()
        .map(e => e.ts -> e.is_new).toMap
      assert(out(day1 + 1000L) === "1")
      assert(out(day3 + 2000L) === "0") // would stay "1" without the fix
    } finally query.stop()
  }

  test("bounce state (entry + OOO buffer) survives a checkpoint restart") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("bounce_ckpt").toString
    // memory sinks can't recover from a checkpoint — collect via
    // foreachBatch, the compaction restart test's pattern
    val found = scala.collection.mutable.Buffer[KeyedEvent]()
    val input = MemoryStream[KeyedEvent]
    def start() = StatefulOps.bounceStreaming(
        StatefulOps.watermarked(input.toDS(), delay = "30 seconds"),
        gapMillis = 10000L)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[KeyedEvent], _: Long) =>
        found ++= b.collect(); ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      // an entry that will eventually bounce, still undecided (buffered)
      input.addData(KeyedEvent.at("m1", day1 + 1000L, "1", "home", null))
      q1.processAllAvailable()
      assert(found.isEmpty) // verdict not rendered yet
    } finally q1.stop()
    // restart from the checkpoint: the buffered entry must still be in
    // state and bounce once the watermark passes its gap
    val q2 = start()
    try {
      input.addData(KeyedEvent.at("mz", day1 + 500000L, "1", "p", "q"))
      q2.processAllAvailable()
      input.addData(KeyedEvent.at("mz", day1 + 900000L, "1", "p", "q"))
      q2.processAllAvailable()
      val out = found.filter(_.mid == "m1").map(_.ts).toSet
      assert(out === Set(day1 + 1000L)) // bounced exactly once, post-restart
    } finally q2.stop()
  }

  test("bounce heartbeats carry the derived-stream horizon (wm - gap) and leave verdicts intact") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val gap = 10000L
    val query = StatefulOps.bounceStreaming(
        StatefulOps.watermarked(
          StatefulOps.withHeartbeatMarkers(input.toDS())), gap)
      .writeStream.format("memory").queryName("bounce_hb")
      .outputMode("append").start()
    try {
      // m1 bounces (entry, follow-up beyond gap); m2 does not
      input.addData(
        KeyedEvent.at("m1", day1 + 1000L, "1", "home", null),
        KeyedEvent.at("m2", day1 + 2000L, "1", "home", null))
      query.processAllAvailable()
      input.addData(
        KeyedEvent.at("m2", day1 + 5000L, "1", "detail", "home"),
        KeyedEvent.at("m1", day1 + 50000L, "1", "detail", "home"))
      query.processAllAvailable()
      input.addData(KeyedEvent.at("m3", day1 + 200000L, "1", "p", "q"))
      query.processAllAvailable()
      val rows = spark.table("bounce_hb").as[KeyedEvent].collect()
      // verdicts unchanged by the marker plumbing
      assert(rows.filter(_.mid != StatefulOps.heartbeatMid)
        .map(e => (e.mid, e.ts)).toSet === Set(("m1", day1 + 1000L)))
      // heartbeats: sentinel dims, ts strictly at horizon = wm - gap —
      // never ahead of it (a future verdict may still carry any time
      // >= horizon), and advancing as the watermark does
      val hbs = rows.filter(_.mid == StatefulOps.heartbeatMid)
      assert(hbs.nonEmpty)
      assert(hbs.forall(h => h.vc == StatefulOps.heartbeatMid &&
        h.event_time.getTime == h.ts))
      // final watermark = max event (day1+200000) − 0s delay; the last
      // heartbeat must not exceed wm − gap and some heartbeat must
      // have advanced past the first batch's horizon
      assert(hbs.map(_.ts).max <= day1 + 200000L - gap)
      assert(hbs.map(_.ts).max >= day1 + 50000L - gap)
    } finally query.stop()
  }

  test("heartbeats keep visitor windows sealing when NO bounce ever occurs") {
    import org.apache.spark.sql.functions._
    // every entry is followed up within the gap → zero verdicts; the
    // uj topic would otherwise never advance its leg's watermark and
    // the visitor fan-in would hold every window open forever (the
    // liveness gap the heartbeat protocol closes)
    val root = java.nio.file.Files.createTempDirectory("hb_e2e").toString
    val fixedDir = s"$root/page_fixed"; val ujDir = s"$root/user_jump"
    new java.io.File(fixedDir).mkdirs(); new java.io.File(ujDir).mkdirs()
    val gap = 10000L
    val evs = Seq(
      KeyedEvent("mA", day1 + 1000L, "1", "home", null,
        new java.sql.Timestamp(day1 + 1000L), "v1", "web", "110000", 5000L),
      KeyedEvent("mA", day1 + 3000L, "1", "detail", "home",
        new java.sql.Timestamp(day1 + 3000L), "v1", "web", "110000", 5000L),
      // flush traffic far ahead, itself followed up within the gap
      KeyedEvent("mB", day1 + 60000L, "0", "home", null,
        new java.sql.Timestamp(day1 + 60000L), "v1", "web", "110000", 1000L),
      KeyedEvent("mB", day1 + 62000L, "0", "detail", "home",
        new java.sql.Timestamp(day1 + 62000L), "v1", "web", "110000", 1000L))
    val schema = evs.toDF().schema
    evs.take(2).toDF().write.mode("append").parquet(fixedDir)
    def fixedStream() = spark.readStream.schema(schema).parquet(fixedDir)
      .as[KeyedEvent]
    val bounceQ = StatefulOps.bounceStreaming(
        StatefulOps.watermarked(
          StatefulOps.withHeartbeatMarkers(fixedStream()), "2 seconds"),
        gap)
      .toDF().writeStream.format("parquet")
      .option("path", ujDir).option("checkpointLocation", s"$root/ck_uj")
      .outputMode("append").start()
    val pvLeg = fixedStream().toDF()
      .withWatermark("event_time", "2 seconds")
      .select(col("vc"), col("ch"), col("ar"), col("is_new"),
        col("event_time"), lit(1L).as("pv_ct"))
    val ujLeg = spark.readStream.schema(schema).parquet(ujDir)
      .withWatermark("event_time", "2 seconds")
      .select(col("vc"), col("ch"), col("ar"), col("is_new"),
        col("event_time"),
        when(col("mid") =!= StatefulOps.heartbeatMid, 1L).otherwise(0L)
          .as("uj_ct"))
    val visitorQ = StatsJobs.visitorStats(Seq(pvLeg, ujLeg),
        width = "10 seconds", dropHeartbeats = true)
      .writeStream.format("memory").queryName("hb_visitor")
      .option("checkpointLocation", s"$root/ck_vs")
      .outputMode("append").start()
    try {
      bounceQ.processAllAvailable(); visitorQ.processAllAvailable()
      evs.drop(2).toDF().write.mode("append").parquet(fixedDir)
      // two sweeps: the flush rows advance the bounce op, whose
      // heartbeats then advance the uj leg past the first window
      (1 to 3).foreach { _ =>
        bounceQ.processAllAvailable(); visitorQ.processAllAvailable() }
      val out = spark.table("hb_visitor")
        .select("stt", "is_new", "pv_ct", "uj_ct")
        .as[(String, String, Long, Long)].collect().toSet
      // the first window SEALED despite zero bounce verdicts — and no
      // sentinel group leaked through
      assert(out.contains(("2021-05-03 00:00:00", "1", 2L, 0L)))
      assert(!out.exists(_._2 == StatefulOps.heartbeatMid))
      assert(spark.read.parquet(ujDir)
        .where(s"mid != '${StatefulOps.heartbeatMid}'").count() === 0L)
    } finally { bounceQ.stop(); visitorQ.stop() }
  }
}
