package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Robots

/** Pins [[Stage0Stream]]: cross-batch canonical-URL dedup (first
  * arrival wins, later variants of the same page drop even in later
  * micro-batches), the robots gate dropping disallowed hosts, and
  * extraction output matching the batch operators on the survivors.
  */
class Stage0StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("URL variants dedup across batches; robots gate drops; text extracts") {
    implicit val sq = spark.sqlContext
    // ids 0..2 share canonical bucket 0 (host example.com — crawler-x
    // group, /docs has NO crawler-x rule -> allowed); ids 6..8 share
    // bucket 2 (cdn.example.org — Disallow / for crawler-x -> blocked);
    // ids 9..11 bucket 3 (blog.sample.net — no applicable group ->
    // allowed)
    val t0 = new Timestamp(1700000000000L)
    def rows(ids: Long*) = ids.map(i => (i, s"body text $i", t0))
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = Stage0Stream.stage0Stream(
        input.toDF().toDF("doc_id", "text", "event_time"),
        Robots.parseRobots(Robots.fixture(spark)), "crawler-x",
        (_, df) => got ++= df.select(col("doc_id"), col("text"))
          .as[(Long, String)].collect())
      .start()
    try {
      // id 1 first (id 0 is the %13 empty-body edge — a later variant)
      input.addData(rows(1L, 6L, 9L): _*); q.processAllAvailable()
      // batch 2: 0 and 2 are canonical DUPLICATES of 1 (same bucket,
      // different www/tracking variants) — the cross-batch state must
      // drop them; 10 duplicates 9; 7 is a new row on the blocked host
      input.addData(rows(0L, 2L, 7L, 10L): _*); q.processAllAvailable()
    } finally q.stop()
    val ids = got.map(_._1).toSet
    assert(ids === Set(1L, 9L), s"got $ids")
    // extracted text: entity-decoded body, tags gone (the decoded
    // "Q&A <doc>" literal is DATA, not markup — it must survive)
    val text1 = got.find(_._1 == 1L).get._2
    assert(text1.contains("body text 1"))
    assert(text1.contains("Q&A <doc>"), text1)
    assert(!text1.contains("<p>") && !text1.contains("<div"), text1)
  }

  test("crawl->train handoff: kill+restart loses nothing, duplicates nothing") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("s0src").toString
    val ck = Files.createTempDirectory("s0ck").toString
    val out = Files.createTempDirectory("s0out").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("event_time", TimestampType)))
    def feed(n: Int, ids: Seq[Long]): Unit = {
      val lines = ids.map(i =>
        s"""{"doc_id":$i,"text":"body text $i",""" +
          s""""event_time":"2023-11-14 22:13:20"}""")
      Files.write(Paths.get(s"$srcDir/f$n.json"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    def start() = Stage0Stream.stage0ToTable(
        spark.readStream.schema(schema).json(srcDir),
        Robots.parseRobots(Robots.fixture(spark)), "crawler-x", out)
      .option("checkpointLocation", ck).start()

    feed(1, Seq(1L, 6L, 9L))
    val q1 = start()
    q1.processAllAvailable(); q1.stop() // kill after the ledger commit
    // the cascade can already run over the committed handoff
    def cascadeIds() = Stage0Stream.cascadeInput(spark, out)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(cascadeIds() === Seq(1L, 9L), "6 is robots-blocked")
    // arrivals while the front-end is down: 0/2 are canonical dupes of
    // 1, 10 dupes 9, 7 is on the blocked host, 12 is genuinely new
    feed(2, Seq(0L, 2L, 7L, 10L, 12L))
    val q2 = start() // restart from the same checkpoint
    q2.processAllAvailable(); q2.stop()
    assert(cascadeIds() === Seq(1L, 9L, 12L),
      "cross-restart dedup state held; the new doc arrived exactly once")
    // a replayed already-committed batch must short-circuit at the
    // ledger: the cascade input cannot change
    graft.sinks.Sinks.idempotentAppend(
      Seq((999L, "phantom", "x")).toDF("doc_id", "canon_url", "text"),
      batchId = 0L, out)
    assert(cascadeIds() === Seq(1L, 9L, 12L),
      "replay of a committed batch is a no-op")
  }

  test("live frontier: shrinks as the committed crawl covers listed pages") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("fsrc").toString
    val ck = Files.createTempDirectory("fck").toString
    val out = Files.createTempDirectory("fout").toString
    val robots = Robots.fixture(spark)
    val sitemaps = graft.operators.Sitemaps.fixture(spark)
    def frontier() = Stage0Stream
      .liveFrontier(spark, out, robots, sitemaps, "crawler-x")
      .select(col("loc")).as[String].collect().toSet
    def art(f: Set[String]) =
      f.map(l => l.replaceAll(".*article-(\\d+).*", "$1"))

    // before any crawl: the full discovered+allowed frontier —
    // blog.sample.net unadvertised (article-3 absent), cdn advertised
    // but robots-blocked (2/40002 absent), news's own listed
    // article-5 is disallowed by its robots
    assert(art(frontier()) === Set("0", "4", "40004", "1", "40001"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("event_time", TimestampType)))
    def feed(n: Int, ids: Seq[Long]): Unit = {
      val lines = ids.map(i =>
        s"""{"doc_id":$i,"text":"body text $i",""" +
          s""""event_time":"2023-11-14 22:13:20"}""")
      Files.write(Paths.get(s"$srcDir/f$n.json"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    // crawl commits article-0 (doc 1, bucket 0) and article-1
    // (doc 3, bucket 1): both listed locs leave the frontier through
    // the canonicalization chain (the listed forms carry WWW./:443/
    // tracking dirt)
    feed(1, Seq(1L, 3L))
    val q = Stage0Stream.stage0ToTable(
        spark.readStream.schema(schema).json(srcDir),
        Robots.parseRobots(robots), "crawler-x", out)
      .option("checkpointLocation", ck).start()
    q.processAllAvailable(); q.stop()
    assert(art(frontier()) === Set("4", "40004", "40001"))
  }
}
