package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("toKafkaRecords produces per-row topic + JSON value") {
    val df = Seq((1L, "a", "t1"), (2L, "b", "t2")).toDF("id", "v", "sink")
    val recs = Sinks.toKafkaRecords(df, "sink")
      .as[(String, String)].collect().toMap
    assert(recs("t1") === """{"id":1,"v":"a"}""")
    assert(recs("t2") === """{"id":2,"v":"b"}""")
  }

  test("upsertDim merges by pk: replaces matches, keeps others, creates on first write") {
    val dir = Files.createTempDirectory("dimsink").toString
    Sinks.upsertDim(spark,
      Seq(("1", "alice"), ("2", "bob")).toDF("id", "name"), dir, "dim_user")
    Sinks.upsertDim(spark,
      Seq(("2", "robert"), ("3", "carol")).toDF("id", "name"), dir, "dim_user")
    val out = spark.read.parquet(s"$dir/dim_user")
      .as[(String, String)].collect().toMap
    assert(out === Map("1" -> "alice", "2" -> "robert", "3" -> "carol"))
  }

  test("writeOlap drops transient accumulator columns") {
    val dir = Files.createTempDirectory("olapsink").toString + "/out"
    val df = Seq((1L, 5L, Seq(1L, 2L))).toDF("sku_id", "order_ct", "orderIdSet")
    Sinks.writeOlap(df, dir, transientCols = Seq("orderIdSet"))
    val cols = spark.read.parquet(dir).columns.toSet
    assert(cols === Set("sku_id", "order_ct"))
  }

  test("upsertDim restores from an interrupted swap instead of deleting it") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("dimcrash").toString
    Sinks.upsertDim(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), base, "dim")
    // simulate a crash between the two renames: table dir staged aside,
    // replacement never published
    val dst = new java.io.File(s"$base/dim")
    val old = new java.io.File(s"$base/.old_dim")
    require(dst.renameTo(old))
    // next upsert must RESTORE the staged copy and merge with it —
    // not delete the only surviving data and rebuild from the batch
    Sinks.upsertDim(spark, Seq((2L, "b2")).toDF("id", "v"), base, "dim")
    val out = spark.read.parquet(s"$base/dim")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "b2"))
  }

  test("upsertDim drops null-pk rows instead of accumulating them") {
    val base = java.nio.file.Files.createTempDirectory("dimnull").toString
    val b1 = Seq((Some(1L), "a"), (None, "junk1")).toDF("id", "v")
    val b2 = Seq((Some(1L), "a2"), (None, "junk2")).toDF("id", "v")
    Sinks.upsertDim(spark, b1, base, "dim")
    Sinks.upsertDim(spark, b2, base, "dim")
    val out = spark.read.parquet(s"$base/dim").collect()
    assert(out.length === 1) // no null-pk rows, no per-batch growth
  }

  test("idempotentAppend: replays never duplicate, distinct batches append") {
    val base = java.nio.file.Files.createTempDirectory("idem").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.idempotentAppend(b0, 0L, base)
    // full replay of a committed batch: short-circuits on the ledger
    Sinks.idempotentAppend(b0, 0L, base)
    assert(spark.read.parquet(base).count() === 2L)
    // crash-between-write-and-ledger replay: same id, recomputed rows
    // — the subdir is OVERWRITTEN, not appended beside the orphan
    val ledger = new java.io.File(base, "_committed_batches")
    val kept = java.nio.file.Files.readAllLines(ledger.toPath)
    java.nio.file.Files.write(ledger.toPath, java.util.List.of[String]())
    Sinks.idempotentAppend(b0, 0L, base)
    assert(spark.read.parquet(base).count() === 2L)
    assert(java.nio.file.Files.readAllLines(ledger.toPath) === kept)
    // a genuinely new batch appends
    Sinks.idempotentAppend(Seq((3L, "c")).toDF("id", "v"), 1L, base)
    assert(spark.read.parquet(base).count() === 3L)
    assert(spark.read.parquet(base).select("id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("mergeAgg: additive rollup maintenance, exactly-once per batch") {
    val base = java.nio.file.Files.createTempDirectory("magg").toString + "/r"
    def table = spark.read.parquet(s"$base/table")
      .as[(String, Long, Long)].collect().toSet
    // batch 0: two provinces, pre-aggregated shape with a duplicate key
    // inside the batch (must sum here)
    Sinks.mergeAgg(spark,
      Seq(("bj", 2L, 100L), ("sh", 1L, 50L), ("bj", 1L, 10L))
        .toDF("prov", "ct", "amt"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct", "amt"), batchId = 0L)
    assert(table === Set(("bj", 3L, 110L), ("sh", 1L, 50L)))
    // replay of batch 0: the additive merge MUST NOT double-count
    Sinks.mergeAgg(spark,
      Seq(("bj", 2L, 100L), ("sh", 1L, 50L), ("bj", 1L, 10L))
        .toDF("prov", "ct", "amt"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct", "amt"), batchId = 0L)
    assert(table === Set(("bj", 3L, 110L), ("sh", 1L, 50L)))
    // batch 1: existing key adds, new key inserts
    Sinks.mergeAgg(spark,
      Seq(("bj", 1L, 5L), ("gz", 4L, 40L)).toDF("prov", "ct", "amt"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct", "amt"), batchId = 1L)
    assert(table === Set(("bj", 4L, 115L), ("sh", 1L, 50L), ("gz", 4L, 40L)))
    // interrupted-swap recovery: table staged aside, dest missing —
    // the next merge must restore history first, not rebuild from its
    // own batch
    assert(new java.io.File(s"$base/table")
      .renameTo(new java.io.File(s"$base/.old_table")))
    Sinks.mergeAgg(spark, Seq(("sh", 1L, 1L)).toDF("prov", "ct", "amt"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct", "amt"), batchId = 2L)
    assert(table === Set(("bj", 4L, 115L), ("sh", 2L, 51L), ("gz", 4L, 40L)))
  }

  test("mergeAgg: death between table swap and ledger publish does not double-count on replay") {
    val base = java.nio.file.Files.createTempDirectory("maggcrash")
      .toString + "/r"
    def table = spark.read.parquet(s"$base/table")
      .as[(String, Long)].collect().toSet
    Sinks.mergeAgg(spark, Seq(("bj", 10L)).toDF("prov", "ct"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct"), batchId = 0L)
    Sinks.mergeAgg(spark, Seq(("bj", 5L)).toDF("prov", "ct"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct"), batchId = 1L)
    assert(table === Set(("bj", 15L)))
    // simulate the crash AFTER batch 1's swap completed (table merged,
    // .old_table already cleaned) but BEFORE the ledger publish: roll
    // the ledger back to batch 0's state
    val ledger = new java.io.File(base, "_committed_batches")
    java.nio.file.Files.write(ledger.toPath, "0".getBytes("UTF-8"))
    // the replay of batch 1 must NOT re-add — the _last_batch stamp
    // inside the table dir says the swap already published it
    Sinks.mergeAgg(spark, Seq(("bj", 5L)).toDF("prov", "ct"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct"), batchId = 1L)
    assert(table === Set(("bj", 15L)))
    // and the ledger is healed, so batch 2 proceeds normally
    assert(new String(java.nio.file.Files.readAllBytes(ledger.toPath),
      "UTF-8").trim === "1")
    Sinks.mergeAgg(spark, Seq(("bj", 1L)).toDF("prov", "ct"),
      base, keyCols = Seq("prov"), sumCols = Seq("ct"), batchId = 2L)
    assert(table === Set(("bj", 16L)))
  }

  test("committedView hides a partially-written (unledgered) batch dir") {
    val base = java.nio.file.Files.createTempDirectory("rcview")
      .toString + "/t"
    Sinks.idempotentAppend(Seq((1L, "a")).toDF("id", "v"), 0L, base)
    // a crash mid-write of batch 1 leaves an orphan subdir with data
    // but no ledger entry — plain reads see it, committedView must not
    Seq((2L, "partial")).toDF("id", "v")
      .write.parquet(s"$base/batch=1")
    assert(spark.read.parquet(base).count() === 2L) // read-uncommitted
    assert(Sinks.committedView(spark, base).select("id").as[Long]
      .collect().toSeq === Seq(1L))
    // replay commits batch 1 → becomes visible
    Sinks.idempotentAppend(Seq((2L, "b")).toDF("id", "v"), 1L, base)
    assert(Sinks.committedView(spark, base).count() === 2L)
  }

  test("readDimSnapshot survives the upsertDim swap window") {
    val base = java.nio.file.Files.createTempDirectory("dimsnap").toString
    assert(Sinks.readDimSnapshot(spark, base, "dim").isEmpty)
    Sinks.upsertDim(spark, Seq((1L, "a")).toDF("id", "v"), base, "dim")
    // mid-swap state: table staged aside as .old_dim, dst not yet
    // published — a concurrent reader must still get the rows
    require(new java.io.File(s"$base/dim")
      .renameTo(new java.io.File(s"$base/.old_dim")))
    val snap = Sinks.readDimSnapshot(spark, base, "dim")
    assert(snap.map(_.as[(Long, String)].collect().toSet) ===
      Some(Set((1L, "a"))))
  }
}
