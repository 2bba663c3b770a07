package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, expr, sum}

import graft.TestSpark

/** The whole-warehouse restart e2e the reference deploys as
  * (`app/dwd/BaseDbApp.java:30-36` checkpoint configs): ONE checkpointed
  * streaming deployment composing LogSplit → is_new fix → UV/bounce →
  * all four DWS stats (visitor/keyword/province/product) plus the CDC
  * fact/dim routing, killed mid-stream and restarted from its
  * checkpoints, asserting every sink carries pre-kill + post-kill rows
  * EXACTLY ONCE and that keyed state (first-seen day, UV day, open
  * bounce entries, window partials) survives the restart.
  */
class WarehouseRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = 1620043200000L // 2021-05-03 12:00:00 UTC
  private val day = 86400000L
  private val d2 = t0 + 2 * day // flush horizon, two days later

  private def log(mid: String, ts: Long, lastPage: String,
                  isNew: String = "1", item: String = null,
                  itemType: String = "keyword",
                  displayItem: String = null): String = {
    val last = Option(lastPage).map(p => s""""last_page_id":"$p",""").getOrElse("")
    val it = Option(item)
      .map(i => s""""item":"$i","item_type":"$itemType",""").getOrElse("")
    val disp = Option(displayItem).map(d =>
      s""","displays":[{"item":"$d","item_type":"sku_id","display_type":"promo","order":1,"pos_id":1}]""")
      .getOrElse("")
    s"""{"common":{"mid":"$mid","uid":"u_$mid","is_new":"$isNew","vc":"v1","ch":"web","ar":"110000","ba":"X","md":"M","os":"A"},"page":{"page_id":"home",$last$it"during_time":5000}$disp,"ts":$ts}"""
  }

  private def cdc(table: String, tpe: String, after: (String, String)*): String = {
    val kv = after.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"database":"gmall","tableName":"$table","before":{},"after":{$kv},"type":"$tpe"}"""
  }

  private def orderInfo(id: Long, amount: String, ct: String): String =
    cdc("order_info", "insert", "id" -> id.toString, "province_id" -> "2",
      "order_status" -> "1001", "user_id" -> "10",
      "total_amount" -> amount, "create_time" -> ct)

  private def orderDetail(id: Long, orderId: Long, sku: Long, num: Long,
                          amount: String, ct: String): String =
    cdc("order_detail", "insert", "id" -> id.toString,
      "order_id" -> orderId.toString, "sku_id" -> sku.toString,
      "sku_num" -> num.toString, "split_total_amount" -> amount,
      "create_time" -> ct)

  private val config = {
    val s = TestSpark.spark
    import s.implicits._
    Seq(
      ("order_info", "insert", "kafka", "dwd_order_info",
        "id,province_id,order_status,user_id,total_amount,create_time"),
      ("order_detail", "insert", "kafka", "dwd_order_detail",
        "id,order_id,sku_id,sku_num,split_total_amount,create_time"),
      ("base_province", "insert", "hbase", "dim_base_province",
        "id,name,area_code"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns")
  }

  // downstream file "topics" poll upstream sinks, so drain in
  // topological order; a final extra sweep lets watermark-advance
  // no-data batches seal windows
  private val topo = Seq("page", "start", "display", "dirty", "page_fixed",
    "unique_visit", "user_jump", "order_info", "order_detail", "dims",
    "visitor_stats", "sessions", "keyword_stats", "province_stats",
    "product_stats", "product_order_ct", "product_topn")

  private def drain(qs: Map[String, org.apache.spark.sql.streaming.StreamingQuery],
                    sweeps: Int = 1): Unit =
    (1 to sweeps).foreach(_ => topo.foreach(n => qs(n).processAllAvailable()))

  private var n = 0
  private def feed(dir: String, lines: Seq[String]): Unit = {
    n += 1
    Files.write(Paths.get(s"$dir/f$n.json"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  test("kill + restart: every layer exactly-once, keyed state intact") {
    val logDir = Files.createTempDirectory("wr_log").toString
    val cdcDir = Files.createTempDirectory("wr_cdc").toString
    val outRoot = Files.createTempDirectory("wr_out").toString
    val ckRoot = Files.createTempDirectory("wr_ck").toString
    def start() = Warehouse.streaming(spark, logDir, cdcDir, config,
      outRoot, ckRoot, width = "10 seconds", delay = "2 seconds",
      gapMillis = 10000L)

    // ---- phase 1 (pre-kill) ---------------------------------------------
    feed(logDir, Seq(
      log("mid_A", t0 + 1000, null, item = "spark streaming"),
      log("mid_A", t0 + 4000, "home", item = "100", itemType = "sku_id",
        displayItem = "100"),
      // entry, never followed up → bounce; its CJK search drives the
      // keyword job through the FMM segmenter (the one true UDF)
      log("mid_B", t0 + 2000, null, item = "小米手机旗舰店"),
      log("mid_C", t0 + 3000, null), // follow-up arrives AFTER the restart
      "garbage not json"))
    feed(cdcDir, Seq(
      cdc("base_province", "insert", "id" -> "2", "name" -> "Beijing",
        "area_code" -> "110000"),
      orderInfo(1, "99.50", "2021-05-03 12:00:05"),
      orderDetail(11, 1, 100, 2, "40.00", "2021-05-03 12:00:05"),
      orderDetail(12, 1, 100, 1, "59.50", "2021-05-03 12:00:06"),
      cdc("order_info", "delete", "id" -> "1"),
      cdc("unrouted_table", "insert", "id" -> "5")))
    val qs1 = start()
    drain(qs1)
    // CDC flushes advance the db-side watermark so the 12:00 province
    // window seals BEFORE the kill (pre-kill emission must not repeat
    // after the restart)
    feed(cdcDir, Seq(orderInfo(90, "20.00", "2021-05-03 12:05:00"),
      orderDetail(91, 90, 999, 1, "20.00", "2021-05-03 12:05:00")))
    drain(qs1)
    feed(cdcDir, Seq(orderInfo(92, "5.00", "2021-05-03 12:05:30"),
      orderDetail(93, 92, 999, 1, "5.00", "2021-05-03 12:05:30")))
    drain(qs1, sweeps = 2)

    qs1.foreach { case (qn, q) =>
      assert(q.exception.isEmpty, s"$qn died: ${q.exception}") }
    val uvPreKill = spark.read.parquet(s"$outRoot/unique_visit").count()
    assert(uvPreKill === 3L) // A, B, C first visits emitted pre-kill
    val provPreKill = spark.read.parquet(s"$outRoot/province_stats")
      .where("stt = '2021-05-03 12:00:00'").count()
    assert(provPreKill === 1L) // the 12:00 window sealed pre-kill

    // ---- kill -----------------------------------------------------------
    qs1.values.foreach(_.stop())

    // ---- restart + phase 2 ---------------------------------------------
    val qs2 = start()
    feed(logDir, Seq(
      // C's follow-up 5s after its entry: admissible (wm ≈ t0+2s) and
      // inside the gap — the OPEN BOUNCE ENTRY recovered from the
      // checkpoint must be rescued, and UV must NOT re-emit C's day
      log("mid_C", t0 + 8000, "home"),
      // A claims is_new=1 on day 2: the recovered first-seen-day state
      // must rewrite it to 0; UV re-emits for the new day
      log("mid_A", t0 + day + 1000, "home", isNew = "1")))
    feed(cdcDir, Seq(orderInfo(2, "50.00", "2021-05-03 12:06:00"),
      orderDetail(21, 2, 101, 4, "50.00", "2021-05-03 12:06:00")))
    drain(qs2)
    // watermark flushes: entry pages (their own bounces seal the
    // log-side horizon) with displays, plus far-future orders
    feed(logDir, Seq(log("mid_FL1", d2, null, isNew = "0", displayItem = "777")))
    feed(cdcDir, Seq(orderInfo(94, "1.00", "2021-05-03 12:10:00"),
      orderDetail(95, 94, 998, 1, "1.00", "2021-05-03 12:10:00")))
    drain(qs2)
    feed(logDir, Seq(log("mid_FL2", d2 + 30000, null, isNew = "0",
      displayItem = "777")))
    feed(cdcDir, Seq(orderInfo(96, "1.00", "2021-05-03 12:10:30"),
      orderDetail(97, 96, 998, 1, "1.00", "2021-05-03 12:10:30")))
    drain(qs2)
    // day-2 orders: a second calendar day for the drift tier (98's
    // window sealed by 99's far-future flush; 99's own stays open)
    feed(cdcDir, Seq(orderInfo(98, "30.00", "2021-05-04 12:00:00"),
      orderDetail(99, 98, 998, 1, "30.00", "2021-05-04 12:00:00")))
    drain(qs2)
    feed(cdcDir, Seq(orderInfo(100, "1.00", "2021-05-04 12:30:00"),
      orderDetail(101, 100, 998, 1, "1.00", "2021-05-04 12:30:00")))
    drain(qs2)
    feed(logDir, Seq(log("mid_FL3", d2 + 60000, null, isNew = "0",
      displayItem = "777")))
    drain(qs2, sweeps = 3)
    qs2.foreach { case (qn, q) =>
      assert(q.exception.isEmpty, s"$qn died: ${q.exception}") }
    qs2.values.foreach(_.stop())

    // ---- DWD layers: exactly-once row counts ---------------------------
    val page = spark.read.parquet(s"$outRoot/page")
    assert(page.count() === 9L) // 4 pre-kill + C follow-up + A day-2 + FL×3
    assert(page.select("common.mid", "ts").distinct().count() === 9L)
    assert(spark.read.parquet(s"$outRoot/dirty").count() === 1L)
    assert(spark.read.parquet(s"$outRoot/display").count() === 4L) // A + 3 FL

    // page_fixed: A's day-2 claim rewritten by recovered state
    val fixed = spark.read.parquet(s"$outRoot/page_fixed")
    assert(fixed.count() === 9L)
    val aDay2 = fixed.where(s"mid = 'mid_A' AND ts = ${t0 + day + 1000}")
      .select("is_new").as[String].collect()
    assert(aDay2.toSeq === Seq("0"))

    // ---- DWM: UV exactly one row per (mid, day); bounce verdicts -------
    val uv = spark.read.parquet(s"$outRoot/unique_visit")
    val uvKeys = uv.select("mid", "ts").as[(String, Long)].collect().toSet
    assert(uvKeys === Set(
      ("mid_A", t0 + 1000), ("mid_B", t0 + 2000), ("mid_C", t0 + 3000),
      ("mid_A", t0 + day + 1000), // day rollover re-emits
      ("mid_FL1", d2), ("mid_FL2", d2 + 30000), ("mid_FL3", d2 + 60000)))
    // the topic carries heartbeat control rows beside the verdicts
    // (the derived-topic watermark protocol) — a data consumer reads
    // past them by key
    val uj = spark.read.parquet(s"$outRoot/user_jump")
      .where(s"mid != '${StatefulOps.heartbeatMid}'")
      .select("mid").as[String].collect().sorted.toSeq
    // B bounced; C was rescued POST-restart; A followed up pre-kill;
    // FL1/FL2 are the sealed flush bounces (FL3's entry is still open)
    assert(uj === Seq("mid_B", "mid_FL1", "mid_FL2"))

    // ---- DWS visitor: the 12:00:00 window SPANS the kill ---------------
    val vs = spark.read.parquet(s"$outRoot/visitor_stats")
      .where("stt < '2021-05-05'")
      .select("stt", "is_new", "pv_ct", "sv_ct", "uv_ct", "uj_ct", "dur_sum")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(vs === Set(
      ("2021-05-03 12:00:00", "1", 5L, 3L, 3L, 1L, 25000L),
      ("2021-05-04 12:00:00", "0", 1L, 0L, 1L, 0L, 5000L)))

    // ---- DWS sessions: C's session SPANS the kill (entry pre-kill,
    // follow-up post-restart — one merged session proves the
    // session_window state recovered); A gets one session per day ----
    val sess = spark.read.parquet(s"$outRoot/sessions")
      .where("stt < '2021-05-05'")
      .selectExpr("mid", "date_format(stt, 'yyyy-MM-dd HH:mm:ss') AS stt",
        "ev_ct", "dur_sum")
      .as[(String, String, Long, Long)].collect().toSet
    assert(sess === Set(
      ("mid_A", "2021-05-03 12:00:01", 2L, 10000L),
      ("mid_B", "2021-05-03 12:00:02", 1L, 5000L),
      ("mid_C", "2021-05-03 12:00:03", 2L, 10000L),
      ("mid_A", "2021-05-04 12:00:01", 1L, 5000L)))

    // ---- DWS keyword ----------------------------------------------------
    val kw = spark.read.parquet(s"$outRoot/keyword_stats")
      .where("stt = '2021-05-03 12:00:00'")
      .select("keyword", "ct").as[(String, Long)].collect().toSet
    // Latin whitespace path AND the CJK FMM path, in one streaming run
    assert(kw === Set(("spark", 1L), ("streaming", 1L),
      ("小米", 1L), ("手机", 1L), ("旗舰店", 1L)))

    // ---- DWS province: pre-kill window NOT re-emitted, later windows
    // sealed post-restart, dim join applied ------------------------------
    val prov = spark.read.parquet(s"$outRoot/province_stats")
      .where("stt < '2021-05-03 12:10:00'")
      .select("stt", "province_name", "order_count", "order_amount")
      .as[(String, String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3, r._4.doubleValue)).toSet
    assert(prov === Set(
      ("2021-05-03 12:00:00", "Beijing", 1L, 99.50),
      ("2021-05-03 12:05:00", "Beijing", 1L, 20.00),
      ("2021-05-03 12:05:30", "Beijing", 1L, 5.00),
      ("2021-05-03 12:06:00", "Beijing", 1L, 50.00)))

    // ---- ADS rollup: the running per-province totals maintained by
    // the additive MERGE must equal the SUM over the windowed sink —
    // the same batches fed both through separate ledgers, so equality
    // IS the exactly-once-across-two-sinks proof
    val winTotals = spark.read.parquet(s"$outRoot/province_stats")
      .groupBy("province_id", "province_name")
      .agg(sum("order_count").as("order_count"),
        sum("order_amount").as("order_amount"))
      .as[(Long, String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3, r._4.doubleValue)).toSet
    val rollup = spark.read.parquet(s"$outRoot/province_rollup/table")
      .as[(Long, String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3, r._4.doubleValue)).toSet
    assert(rollup === winTotals)
    assert(rollup.exists(r => r._1 == 2L && r._2 == "Beijing" && r._3 >= 4L))

    // ---- ADS quantile tier: exact per-province amount percentiles
    // served from the streamed value-count table must equal the batch
    // operator over the windowed sink's rows — across the SAME kill +
    // restart, through a third independent ledger
    val servedQ = QuantileStreaming.serve(spark,
        s"$outRoot/province_amount_quantiles", "province_id",
        Seq(500, 1000))
      .as[(Long, Long, Long, Long)].collect().toSet
    val batchQ = graft.operators.Quantiles.groupQuantiles(
        spark.read.parquet(s"$outRoot/province_stats")
          .select(col("province_id"),
            (col("order_amount") * 100).cast("long").as("amt_cents")),
        "province_id", col("amt_cents"), Seq(500, 1000))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(servedQ === batchQ)
    assert(servedQ.nonEmpty)

    // ---- ADS drift tier: day-over-day province-mix TV distances
    // served from the streamed (day, province) counts must equal the
    // batch finisher over the windowed sink — a FOURTH independent
    // ledger across the same kill; the day-2 orders make day 2's
    // drift row exist (mix shifted Beijing-heavy → 998-province day)
    val servedD = graft.operators.Series.driftFromCounts(
        spark.read.parquet(s"$outRoot/province_mix_drift/table"))
      .as[(Long, Double)].collect().toSet
    val batchD = graft.operators.Series.driftFromCounts(
        spark.read.parquet(s"$outRoot/province_stats")
          .select(expr("unix_millis(to_timestamp(stt)) DIV 86400000")
            .as("day"), col("province_id").as("typ"),
            col("order_count").as("n"))
          .groupBy("day", "typ").agg(sum("n").as("n")))
      .as[(Long, Double)].collect().toSet
    assert(servedD === batchD)
    assert(servedD.nonEmpty)

    // ---- DWS product ----------------------------------------------------
    val ps = spark.read.parquet(s"$outRoot/product_stats")
      .where("stt < '2021-05-03 12:10:00'")
      .select("stt", "sku_id", "display_ct", "click_ct", "order_sku_num",
        "order_amount")
      .as[(String, Long, Long, Long, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r._5, r._6.doubleValue)).toSet
    assert(ps === Set(
      ("2021-05-03 12:00:00", 100L, 1L, 1L, 3L, 99.50),
      ("2021-05-03 12:05:00", 999L, 0L, 0L, 1L, 20.00),
      ("2021-05-03 12:05:30", 999L, 0L, 0L, 1L, 5.00),
      ("2021-05-03 12:06:00", 101L, 0L, 0L, 4L, 50.00)))

    // ---- DWS distinct-order counts: order 1's TWO detail lines for
    // sku 100 count ONCE (the dedup-then-count chain) ----------------------
    val oc = spark.read.parquet(s"$outRoot/product_order_ct")
      .where("stt < '2021-05-03 12:10:00'")
      .select("stt", "sku_id", "order_ct")
      .as[(String, Long, Long)].collect().toSet
    assert(oc === Set(
      ("2021-05-03 12:00:00", 100L, 1L),
      ("2021-05-03 12:05:00", 999L, 1L),
      ("2021-05-03 12:05:30", 999L, 1L),
      ("2021-05-03 12:06:00", 101L, 1L)))

    // ---- DWS windowed top-N (rank-on-seal, q19's streaming twin) --------
    val topn = spark.read.parquet(s"$outRoot/product_topn")
      .selectExpr("date_format(stt, 'yyyy-MM-dd HH:mm:ss') AS stt",
        "sku_id", "amount_cents", "rnk")
      .where("stt < '2021-05-03 12:10:00'")
      .as[(String, Long, Long, Int)].collect().toSet
    assert(topn === Set(
      ("2021-05-03 12:00:00", 100L, 9950L, 1),
      ("2021-05-03 12:05:00", 999L, 2000L, 1),
      ("2021-05-03 12:05:30", 999L, 500L, 1),
      ("2021-05-03 12:06:00", 101L, 5000L, 1)))
  }

  test("mid-stream topic compaction: downstream sinks stay exactly-once across compaction AND restart") {
    val logDir = Files.createTempDirectory("wc_log").toString
    val cdcDir = Files.createTempDirectory("wc_cdc").toString
    val outRoot = Files.createTempDirectory("wc_out").toString
    val ckRoot = Files.createTempDirectory("wc_ck").toString
    def start() = Warehouse.streaming(spark, logDir, cdcDir, config,
      outRoot, ckRoot, width = "10 seconds", delay = "2 seconds",
      gapMillis = 10000L)
    val compacted = Seq("page", "page_fixed", "order_info", "order_detail")

    // ---- phase 1: same shape as the restart e2e ------------------------
    feed(logDir, Seq(
      log("mid_A", t0 + 1000, null, item = "spark streaming"),
      log("mid_A", t0 + 4000, "home", item = "100", itemType = "sku_id",
        displayItem = "100"),
      log("mid_B", t0 + 2000, null, item = "小米手机旗舰店"),
      log("mid_C", t0 + 3000, null)))
    feed(cdcDir, Seq(
      cdc("base_province", "insert", "id" -> "2", "name" -> "Beijing",
        "area_code" -> "110000"),
      orderInfo(1, "99.50", "2021-05-03 12:00:05"),
      orderDetail(11, 1, 100, 2, "40.00", "2021-05-03 12:00:05"),
      orderDetail(12, 1, 100, 1, "59.50", "2021-05-03 12:00:06")))
    val qs1 = start()
    drain(qs1, sweeps = 2)
    val pagePre = Compaction.topicView(spark, s"$outRoot/page").count()
    assert(pagePre === 4L)

    // ---- compact the chained topics while EVERY query keeps running.
    // The drain barrier above plays the role of the age horizon: all
    // downstream consumers have committed past these files.
    compacted.foreach { t =>
      assert(Compaction.compactTopic(spark, s"$outRoot/$t", horizonMs = 0L) > 0,
        s"expected $t to have files to absorb")
    }
    // the view serves the absorbed rows from the segments, exactly once
    assert(Compaction.topicView(spark, s"$outRoot/page").count() === pagePre)
    qs1.foreach { case (qn, q) =>
      assert(q.exception.isEmpty, s"$qn died during compaction: ${q.exception}") }

    // ---- phase 2: NEW rows after compaction, consumed by the same
    // running queries (their seen-file tracking must splice live files
    // after the absorbed ones with no gap and no replay)
    feed(logDir, Seq(
      log("mid_C", t0 + 8000, "home"),
      log("mid_A", t0 + day + 1000, "home", isNew = "1")))
    feed(cdcDir, Seq(orderInfo(2, "50.00", "2021-05-03 12:06:00"),
      orderDetail(21, 2, 101, 4, "50.00", "2021-05-03 12:06:00")))
    drain(qs1)
    qs1.values.foreach(_.stop())

    // ---- restart AFTER compaction: sources must recover their seen
    // sets from checkpoints without touching the deleted files, and a
    // second compaction pass (now including phase-2 files) must hold
    val qs2 = start()
    compacted.foreach { t =>
      assert(Compaction.compactTopic(spark, s"$outRoot/$t", horizonMs = 0L) > 0) }
    feed(logDir, Seq(log("mid_FL1", d2, null, isNew = "0", displayItem = "777")))
    feed(cdcDir, Seq(orderInfo(94, "1.00", "2021-05-03 12:10:00"),
      orderDetail(95, 94, 998, 1, "1.00", "2021-05-03 12:10:00")))
    drain(qs2)
    feed(logDir, Seq(log("mid_FL2", d2 + 30000, null, isNew = "0")))
    feed(cdcDir, Seq(orderInfo(96, "1.00", "2021-05-03 12:10:30"),
      orderDetail(97, 96, 998, 1, "1.00", "2021-05-03 12:10:30")))
    drain(qs2, sweeps = 3)
    qs2.foreach { case (qn, q) =>
      assert(q.exception.isEmpty, s"$qn died post-restart: ${q.exception}") }
    qs2.values.foreach(_.stop())

    // ---- exactly-once across two compactions + one restart -------------
    // compacted topics are read through the VIEW (their _spark_metadata
    // references absorbed files by design — Compaction scaladoc)
    val page = Compaction.topicView(spark, s"$outRoot/page")
    assert(page.count() === 8L) // 4 + C follow-up + A day-2 + FL×2
    assert(page.select("common.mid", "ts").distinct().count() === 8L)
    val fixed = Compaction.topicView(spark, s"$outRoot/page_fixed")
    assert(fixed.count() === 8L)
    assert(fixed.where(s"mid = 'mid_A' AND ts = ${t0 + day + 1000}")
      .select("is_new").as[String].collect().toSeq === Seq("0"))
    assert(Compaction.topicView(spark, s"$outRoot/order_info")
      .select("id").as[String].collect().toSet ===
      Set("1", "2", "94", "96"))

    // downstream (uncompacted) sinks: exactly one row per key
    val uv = spark.read.parquet(s"$outRoot/unique_visit")
    assert(uv.select("mid", "ts").as[(String, Long)].collect().toSet === Set(
      ("mid_A", t0 + 1000), ("mid_B", t0 + 2000), ("mid_C", t0 + 3000),
      ("mid_A", t0 + day + 1000),
      ("mid_FL1", d2), ("mid_FL2", d2 + 30000)))
    val prov = spark.read.parquet(s"$outRoot/province_stats")
      .where("stt < '2021-05-03 12:10:00'")
      .select("stt", "province_name", "order_count", "order_amount")
      .as[(String, String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3, r._4.doubleValue)).toSet
    assert(prov === Set(
      ("2021-05-03 12:00:00", "Beijing", 1L, 99.50),
      ("2021-05-03 12:06:00", "Beijing", 1L, 50.00)))
  }
}
