package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.Sinks
import graft.sources.CdcRouter

/** The production shape: ODS topics as streams, foreachBatch fan-out
  * (the reference's side-output sinks), per-row-topic records, and
  * per-micro-batch dim upserts — driven through a real streaming query.
  */
class StreamingE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("log stream fans out to per-route sinks via foreachBatch") {
    implicit val sq = spark.sqlContext
    val outDir = Files.createTempDirectory("e2e_log").toString
    val input = MemoryStream[String]
    val query = input.toDF().withColumnRenamed("value", "value")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val routes = LogSplitJob.run(batch)
        routes.foreach { case (name, df) =>
          if (!df.isEmpty)
            df.write.mode("append").json(s"$outDir/$name")
        }
      }
      .start()
    try {
      input.addData(
        """{"common":{"mid":"m1","uid":"u1","is_new":"1","vc":"v1","ch":"web","ar":"1","ba":"X","md":"M","os":"A"},"start":{"entry":"icon","open_ad_id":1,"loading_time":1,"open_ad_ms":1,"open_ad_skip_ms":0},"ts":1620043200000}""",
        """{"common":{"mid":"m1","uid":"u1","is_new":"1","vc":"v1","ch":"web","ar":"1","ba":"X","md":"M","os":"A"},"page":{"page_id":"home","during_time":5,"item":"x","item_type":"sku_id"},"displays":[{"item":"sku_2","item_type":"sku_id","display_type":"promo","order":1,"pos_id":3}],"ts":1620043201000}""",
        "dirty {{{")
      query.processAllAvailable()
      assert(spark.read.json(s"$outDir/start").count() === 1)
      assert(spark.read.json(s"$outDir/page").count() === 1)
      val disp = spark.read.json(s"$outDir/display")
      assert(disp.select("item").as[String].collect().toSeq === Seq("sku_2"))
      assert(spark.read.json(s"$outDir/dirty").count() === 1)
    } finally query.stop()
  }

  test("stream-stream interval join: in-window pairs emit, evicted state drops late matches") {
    implicit val sq = spark.sqlContext
    val base = 1620043200000L
    val orders = MemoryStream[(Long, Long)]
    val details = MemoryStream[(Long, Long)]
    val o = orders.toDF().toDF("id", "ots")
      .withColumn("o_time", timestamp_millis(col("ots")))
      .withWatermark("o_time", "0 seconds")
    val d = details.toDF().toDF("okey", "dts")
      .withColumn("d_time", timestamp_millis(col("dts")))
      .withWatermark("d_time", "0 seconds")
    val query = WideJobs.intervalJoin(o, d, "id", "okey", "o_time", "d_time",
        "-5 seconds", "5 seconds")
      .select(col("id"), col("ots"), col("dts"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    def rows() = spark.table("ss_join")
      .as[(Long, Long, Long)].collect().toSet
    try {
      orders.addData((1L, base))
      details.addData((1L, base + 3000), (1L, base + 8000)) // in / out of window
      query.processAllAvailable()
      assert(rows() === Set((1L, base, base + 3000)))
      // advance the global watermark far past order 1's join window on
      // BOTH streams (watermark = min across inputs), twice so the new
      // watermark takes effect and state is evicted
      orders.addData((98L, base + 120000)); details.addData((99L, base + 120000))
      query.processAllAvailable()
      orders.addData((98L, base + 121000)); details.addData((99L, base + 121000))
      query.processAllAvailable()
      // this detail WOULD match order 1, but the order's state is
      // gone — the reference's interval-join state pruning (T1/T2)
      details.addData((1L, base + 1000))
      query.processAllAvailable()
      assert(rows() === Set((1L, base, base + 3000)))
    } finally query.stop()
  }

  test("point-in-time dim enrichment: each event gets the dim version in effect at its time") {
    // The reference's async dim lookup serves the dim row as of NOW —
    // a late-arriving event gets the wrong (too-new) attributes. An
    // as-of join against versioned dim history enriches each event
    // with the version in effect at the EVENT's time, per micro-batch.
    implicit val sq = spark.sqlContext
    val outDir = Files.createTempDirectory("e2e_asof").toString
    // dim history: user 10 was F until ts=1000, M from ts=1000 on
    val dimHistory = Seq((10L, 0L, "F"), (10L, 1000L, "M"))
      .toDF("user_id", "valid_from", "gender")
    val input = MemoryStream[(Long, Long)] // (event_id, ts)
    val query = input.toDF().toDF("event_id", "ts")
      .withColumn("user_id", lit(10L))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Temporal.asofJoin(batch, dimHistory,
            keyL = "user_id", keyR = "user_id",
            leftTs = "ts", rightTs = "valid_from",
            rightCarry = Seq("gender"))
          .select(col("event_id"), col("_asof.gender").as("gender"))
          .write.mode("append").json(outDir)
        ()
      }
      .start()
    try {
      input.addData((1L, 500L), (2L, 1500L))
      query.processAllAvailable()
      input.addData((3L, 999L)) // late event, BEFORE the change
      query.processAllAvailable()
      val out = spark.read.json(outDir)
        .select("event_id", "gender").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // as-of-now enrichment would claim "M" for all three
      assert(out === Map(1L -> "F", 2L -> "M", 3L -> "F"))
    } finally query.stop()
  }

  test("windowed agg drops events later than the watermark (T2 semantics)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "5 seconds")
      .groupBy(window(col("event_time"), "10 seconds"), col("k"))
      .count()
    val query = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      val base = 1620043200000L // 12:00:00
      input.addData((base + 1000, "a"), (base + 2000, "a"))
      query.processAllAvailable()
      // watermark → 11:59:57; push it far past the first window's end
      input.addData((base + 60000, "b"))
      query.processAllAvailable()
      input.addData((base + 120000, "b"))
      query.processAllAvailable()
      // this event's window [12:00:00,12:00:10) closed long ago → dropped
      input.addData((base + 3000, "a"))
      query.processAllAvailable()
      input.addData((base + 180000, "c"))
      query.processAllAvailable()
      val out = spark.table("late_out")
        .select(col("k"), col("count")).as[(String, Long)].collect().toMap
      assert(out("a") === 2L) // late third event not counted
    } finally query.stop()
  }

  test("hopping-window agg incrementalizes: streaming equals the batch twin") {
    // q27's plan (window(size, slide) = map-side Expand + aggregate)
    // under readStream: same window assignment, watermark-closed
    // emission, and the closed windows must match the batch
    // formulation over the identical rows bit-for-bit
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val agg = input.toDF().toDF("ts", "uid")
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", "0 seconds")
      .groupBy(window(col("event_time"), "20 seconds", "5 seconds").as("w"))
      .agg(count(lit(1)).as("pv"), approx_count_distinct(col("uid")).as("uv"))
      .select(col("w.start").as("stt"), col("pv"), col("uv"))
    val query = agg.writeStream.format("memory").queryName("hop_out")
      .outputMode("append").start()
    try {
      val base = 1620043200000L
      val rows = Seq((base + 1000L, 1L), (base + 6000L, 2L),
        (base + 7000L, 1L), (base + 23000L, 3L))
      input.addData(rows: _*)
      query.processAllAvailable()
      // push the watermark far past every touched window's end
      input.addData((base + 600000L, 9L))
      query.processAllAvailable()
      val got = spark.table("hop_out")
        .filter(col("stt") < timestamp_millis(lit(base + 300000L)))
        .as[(java.sql.Timestamp, Long, Long)].collect().sorted.toSeq
      val expect = rows.toDF("ts", "uid")
        .withColumn("event_time", timestamp_millis(col("ts")))
        .groupBy(window(col("event_time"), "20 seconds", "5 seconds").as("w"))
        .agg(count(lit(1)).as("pv"), approx_count_distinct(col("uid")).as("uv"))
        .select(col("w.start").as("stt"), col("pv"), col("uv"))
        .as[(java.sql.Timestamp, Long, Long)].collect().sorted.toSeq
      assert(got === expect)
      // each event must appear in size/slide = 4 windows
      assert(expect.map(_._2).sum === rows.size * 4L)
    } finally query.stop()
  }

  test("file-stream source feeds LogSplitJob through the unified value seam") {
    import graft.sources.Sources
    val inDir = Files.createTempDirectory("src_in").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/log1.json"),
      ("""{"common":{"mid":"m1","uid":"u1","is_new":"1","vc":"v1","ch":"web","ar":"1","ba":"X","md":"M","os":"A"},"start":{"entry":"icon","open_ad_id":1,"loading_time":1,"open_ad_ms":1,"open_ad_skip_ms":0},"ts":1620043200000}""" +
        "\nnot json").getBytes("UTF-8"))
    val stream = Sources.read(spark,
      Sources.FileStream(inDir, maxFilesPerTrigger = Some(1)))
    assert(stream.isStreaming)
    val outDir = Files.createTempDirectory("src_out").toString
    val query = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (clean, dirty) = LogSplitJob.parse(batch)
        clean.write.mode("append").json(s"$outDir/clean")
        dirty.write.mode("append").json(s"$outDir/dirty")
        ()
      }.start()
    try {
      query.processAllAvailable()
      assert(spark.read.json(s"$outDir/clean").count() === 1)
      assert(spark.read.json(s"$outDir/dirty").count() === 1)
      // batch path reads the same seam
      assert(Sources.read(spark, Sources.BatchDir(inDir)).count() === 2)
    } finally query.stop()
  }

  test("checkpointed query restarts exactly-once: no duplicates, no loss") {
    import java.nio.charset.StandardCharsets
    val inDir = Files.createTempDirectory("ck_in").toString
    val outDir = Files.createTempDirectory("ck_out").toString + "/data"
    val ckDir = Files.createTempDirectory("ck_meta").toString
    val schema = "event_id LONG, v STRING"
    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(s"$inDir/$name"),
        rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
    def start() = spark.readStream.schema(schema).json(inDir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .start()

    writeFile("a.json", Seq(
      """{"event_id":1,"v":"a"}""", """{"event_id":2,"v":"b"}"""))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    writeFile("b.json", Seq("""{"event_id":3,"v":"c"}"""))
    val q2 = start() // recovery from checkpoint: a.json must not replay
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(outDir)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 2L, 3L))
  }

  test("CDC stream routes per micro-batch: kafka records + dim upserts") {
    implicit val sq = spark.sqlContext
    val dimDir = Files.createTempDirectory("e2e_dim").toString
    val kafkaDir = Files.createTempDirectory("e2e_kafka").toString
    val config = Seq(
      ("order_info", "insert", "kafka", "dwd_order_info", "id,total_amount"),
      ("user_info", "insert", "hbase", "dim_user_info", "id,gender"))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns")

    val input = MemoryStream[String]
    val query = input.toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // config re-read per micro-batch = the reference's broadcast
        // config refresh point
        val env = CdcRouter.parseEnvelope(batch)
        val rows = env.filter(col("_corrupt").isNull).select(col("env.*"))
          .withColumn("type", CdcRouter.normalizeOp(col("type")))
        val routed = CdcRouter.pruneColumns(
          CdcRouter.route(CdcRouter.filterDeletes(rows), config))
        // kafka side: per-row-topic records
        // (topic, value) — exactly the Kafka sink's record shape
        routed.filter(col("sinkType") === "kafka")
          .select(col("sinkTable").as("topic"),
            to_json(col("after")).as("value"))
          .write.mode("append").json(kafkaDir)
        // hbase side: MERGE-by-pk per dim table. Only the TABLE LIST
        // (KB-scale) comes to the driver; each table's rows stay a
        // distributed frame into the upsert — never collect the data
        // persist: the distinct() and each per-table filter otherwise
        // re-parse the whole CDC batch from source (T+1 rescans)
        val dims = routed.filter(col("sinkType") === "hbase")
          .select(col("sinkTable"),
            col("after")("id").as("id"), col("after")("gender").as("gender"))
          .persist()
        val tables = dims.select("sinkTable").distinct()
          .collect().map(_.getString(0))
        tables.foreach { table =>
          Sinks.upsertDim(spark,
            dims.filter(col("sinkTable") === table).drop("sinkTable"),
            dimDir, table)
        }
        dims.unpersist()
        ()
      }
      .start()
    try {
      input.addData(
        """{"database":"g","tableName":"order_info","before":{},"after":{"id":"1","total_amount":"9.50","secret":"x"},"type":"insert"}""",
        """{"database":"g","tableName":"user_info","before":{},"after":{"id":"10","gender":"F"},"type":"insert"}""")
      query.processAllAvailable()
      input.addData( // second batch: dim update must merge, not duplicate
        """{"database":"g","tableName":"user_info","before":{},"after":{"id":"10","gender":"M"},"type":"insert"}""",
        """{"database":"g","tableName":"user_info","before":{},"after":{"id":"11","gender":"F"},"type":"insert"}""")
      query.processAllAvailable()

      val kafka = spark.read.json(kafkaDir)
      assert(kafka.count() === 1)
      val rec = kafka.select("topic", "value").collect().head
      assert(rec.getString(0) === "dwd_order_info")
      assert(!rec.getString(1).contains("secret")) // pruned by allowlist

      val dim = spark.read.parquet(s"$dimDir/dim_user_info")
        .as[(String, String)].collect().toMap
      assert(dim === Map("10" -> "M", "11" -> "F")) // upserted, not appended
    } finally query.stop()
  }
}
