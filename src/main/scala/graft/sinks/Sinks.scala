package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink shapes (SURVEY.md §2.8).
  *
  *  - Kafka fixed/dynamic topic: Spark's Kafka sink natively supports a
  *    per-row `topic` column, so the reference's dynamic-topic producer
  *    (`utils/MyKafkaUtil.java:25-34`) is just a projection.
  *  - Dim upsert (Phoenix `upsert into` per row +
  *    auto-DDL, `app/func/DimSinkFunction.java:31-70`): an idempotent
  *    MERGE-by-pk into a per-table parquet dir, applied per micro-batch
  *    via foreachBatch. Auto-creates the table dir on first sight.
  *  - OLAP batch sink (ClickHouse JDBC, `utils/ClickHouseUtil.java:21-68`):
  *    drops `@TransientSink`-style columns then appends.
  */
object Sinks {

  /** Kafka record shape: value = JSON of all columns, plus a per-row
    * topic column for dynamic routing (K1/K2).
    */
  def toKafkaRecords(df: DataFrame, topicCol: String): DataFrame =
    df.select(col(topicCol).as("topic"),
      to_json(struct(df.columns.toIndexedSeq.filterNot(_ == topicCol).map(col): _*))
        .as("value"))

  /** Idempotent MERGE-by-pk upsert of `batch` into `baseDir/table`:
    * existing rows with a matching pk are replaced, others kept.
    * Semantically the Phoenix upsert; auto-DDL = first write creates
    * the dir with the batch's schema. At scale this becomes a Delta/
    * Iceberg MERGE — the call-site contract is identical.
    *
    * LOCAL-FS implementation by design (java.io rename swap): atomic
    * renames don't exist on object stores, so the cluster deployment
    * swaps this body for the table format's MERGE rather than porting
    * the rename dance to Hadoop FS.
    */
  /** @param orderCol when the batch can carry several changes for one
    *   pk, names the column whose max picks the winner (last-write-wins,
    *   like applying the CDC rows in order); without it an arbitrary
    *   row per pk survives.
    */
  def upsertDim(spark: SparkSession, batch: DataFrame, baseDir: String,
                table: String, pk: String = "id",
                orderCol: Option[String] = None): Unit = {
    val path = s"$baseDir/$table"
    // crash recovery BEFORE anything reads `path`: a death between the
    // two renames below leaves the only full copy in .old_<table> with
    // the table dir gone — that copy must be RESTORED, not deleted
    // (deleting it and "merging" with nothing would silently rebuild
    // the dim from the latest batch alone). If both exist, the swap
    // completed and .old_ is a stale backup, safe to clear.
    locally {
      val dst0 = new java.io.File(path)
      val old0 = new java.io.File(s"$baseDir/.old_$table")
      if (old0.exists() && !dst0.exists())
        require(old0.renameTo(dst0),
          s"upsertDim: could not restore $path from interrupted swap")
    }
    val dedupedBatch0 = orderCol match {
      case Some(oc) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(pk)).orderBy(col(oc).desc)
        batch.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      case None => batch.dropDuplicates(pk)
    }
    // a null pk can never match the anti-join (null = null is null),
    // so it would APPEND a fresh copy every batch instead of upserting
    // — junk without an identity is dropped, per the MERGE-by-pk
    // contract
    val dedupedBatch = dedupedBatch0.filter(col(pk).isNotNull)
    val merged =
      if (new java.io.File(path).exists()) {
        val existing = spark.read.parquet(path)
        existing.join(dedupedBatch.select(col(pk)), Seq(pk), "left_anti")
          .unionByName(dedupedBatch, allowMissingColumns = true)
      } else dedupedBatch
    // write via temp + swap so a failed write can't corrupt the table;
    // every rename is checked — a silently failed swap would report
    // success while dropping the batch's upserts
    val tmp = new java.io.File(s"$baseDir/.tmp_$table")
    val old = new java.io.File(s"$baseDir/.old_$table")
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    val dst = new java.io.File(path)
    if (dst.exists()) {
      require(dst.renameTo(old), s"upsertDim: could not stage $path aside")
      require(tmp.renameTo(dst), s"upsertDim: could not publish $path")
      org.apache.commons.io.FileUtils.deleteDirectory(old)
    } else require(tmp.renameTo(dst), s"upsertDim: could not publish $path")
  }

  /** OLAP sink: drop accumulator/transient columns then append
    * (the reference's `@TransientSink` reflection filter,
    * `utils/ClickHouseUtil.java:42-47`, becomes an explicit drop list).
    */
  def writeOlap(df: DataFrame, path: String,
                transientCols: Seq[String] = Nil): Unit =
    df.drop(transientCols: _*).write.mode(SaveMode.Append).parquet(path)

  /** Exactly-once `foreachBatch` append: a plain `mode("append")`
    * inside foreachBatch is at-least-once — a crash AFTER the write
    * but BEFORE the checkpoint commit replays the batch and duplicates
    * its rows. This closes the window with the classic batch-id
    * ledger: each batch writes to its OWN overwrite-mode subdir
    * (`batch=<id>` — a replay rewrites the same files, idempotent),
    * and the batch id is recorded in a ledger file via write-temp +
    * atomic rename. Crash matrix: before write → replay
    * rewrites; between write and ledger → replay OVERWRITES the same
    * subdir, no duplicates; after ledger → replay short-circuits here.
    *
    * READ CONSISTENCY: a plain `spark.read.parquet(path)` sees every
    * `batch=<id>` subdir, INCLUDING a partially-written one left by a
    * crash mid-write (read-uncommitted) — between the crash and the
    * replay's overwrite, external readers can observe partial rows.
    * Readers that need read-committed must go through
    * [[committedView]], which filters to ledgered batch ids.
    *
    * LOCAL-FS rename semantics by design, like [[upsertDim]]: on a
    * cluster this contract is a Delta/Iceberg idempotent write
    * (`txnAppId`/`txnVersion`), same call site.
    */
  def idempotentAppend(batch: DataFrame, batchId: Long, path: String): Unit =
    withBatchLedger(path, batchId) {
      batch.write.mode(SaveMode.Overwrite).parquet(s"$path/batch=$batchId")
    }

  /** Read-committed view over an [[idempotentAppend]] table: only rows
    * whose `batch` partition id is at or below the ledger's high-water
    * mark are visible, so a partially-written subdir from a crashed
    * batch is excluded until its replay commits. The filter is on the
    * partition column — Catalyst prunes the uncommitted subdirs at the
    * scan, no data files of theirs are read.
    */
  def committedView(spark: SparkSession, path: String): DataFrame = {
    val hw = ledgerHighWater(path)
    val df = spark.read.parquet(path)
    hw match {
      case Some(max) => df.filter(col("batch") <= max)
      case None      => df.filter(lit(false))
    }
  }

  /** Max committed batch id at `path`, if any. Batch ids from
    * Structured Streaming's foreachBatch are strictly increasing and a
    * failed batch is always retried before any later batch runs, so
    * "committed" is exactly `id <= highWater` — the same contract as
    * Delta's `txnVersion`. The ledger file stores just this high-water
    * mark (one line), keeping per-batch ledger I/O O(1) instead of
    * rereading/rewriting an ever-growing id list. Old-format ledgers
    * (one id per line) parse fine: the max is the high-water mark.
    */
  private[sinks] def ledgerHighWater(path: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val ledger = new java.io.File(path, "_committed_batches")
    if (!ledger.exists()) None
    else {
      val ids = java.nio.file.Files.readAllLines(ledger.toPath).asScala
        .flatMap(l => l.trim.toLongOption)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** The batch-id ledger shared by the exactly-once sinks: runs
    * `write` only if `batchId` is not yet committed at `path`, then
    * publishes the id via temp-write + atomic swap. `write` itself
    * must be REDOABLE for the same batch id (overwrite a batch-keyed
    * location, or rebuild a full-table swap) — the ledger converts
    * redoable into exactly-once.
    */
  private def withBatchLedger(path: String, batchId: Long)
                             (write: => Unit): Unit = {
    new java.io.File(path).mkdirs()
    if (ledgerHighWater(path).exists(_ >= batchId))
      return // replay of a fully-committed batch: nothing to do
    write
    val ledger = new java.io.File(path, "_committed_batches")
    val tmp = new java.io.File(path, s"._ledger_tmp_$batchId")
    java.nio.file.Files.write(tmp.toPath,
      batchId.toString.getBytes("UTF-8"))
    require(tmp.renameTo(ledger) || {
      // rename-over-existing is not atomic-replace on every FS; fall
      // back to REPLACE_EXISTING move, still a single visible swap
      java.nio.file.Files.move(tmp.toPath, ledger.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      true
    }, s"batch ledger: could not publish batch $batchId at $path")
  }

  /** Batch-id stamp INSIDE a swapped table dir: written into the
    * staging dir before the rename, so the swap publishes table and
    * batch id in one atomic step. Underscore-prefixed → invisible to
    * Spark's parquet reader.
    */
  private def readTableStamp(tableDir: String): Option[Long] = {
    val f = new java.io.File(tableDir, "_last_batch")
    if (!f.exists()) None
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      .trim.toLongOption
  }

  private def writeTableStamp(tableDir: String, batchId: Long): Unit =
    java.nio.file.Files.write(
      new java.io.File(tableDir, "_last_batch").toPath,
      batchId.toString.getBytes("UTF-8"))

  /** Incrementally-maintained ADDITIVE rollup — the K-family
    * materialized-view shape: each micro-batch's pre-aggregated rows
    * MERGE into the table by key, summing `sumCols` (matching keys
    * add, new keys insert). Additive merges are NOT naturally
    * idempotent (a replayed batch would double-count), so the write
    * sits behind the same batch-id ledger as [[idempotentAppend]];
    * the table rebuild itself is the [[upsertDim]] temp + swap, so a
    * crash mid-rebuild leaves the prior table intact and the replay
    * redoes the rebuild from it.
    *
    * At 100 TB the call site becomes a Delta/Iceberg MERGE with
    * `txnVersion` — the contract (additive MERGE, exactly-once per
    * batch id) is identical. Batches should arrive pre-aggregated by
    * `keyCols` (the windowed-aggregate output shape); duplicate keys
    * WITHIN one batch are summed here anyway.
    *
    * Crash matrix (additive = NOT redo-idempotent, so every window
    * must be closed, not just narrowed): before the rebuild → redo
    * rebuilds; mid-rebuild → prior table intact, redo rebuilds;
    * between the two swap renames → table dir missing, `.old_table`
    * restored below, redo rebuilds; AFTER the swap but BEFORE the
    * ledger publish → the `_last_batch` stamp written INSIDE the
    * staging dir pre-swap travels with the table, so the redo sees
    * `stamp >= batchId`, skips the rebuild, and only (re)publishes
    * the ledger — no double-count. Committed = max(table stamp,
    * ledger high-water).
    */
  def mergeAgg(spark: SparkSession, batch: DataFrame, path: String,
               keyCols: Seq[String], sumCols: Seq[String],
               batchId: Long): Unit =
    mergeAgg(spark, batch, path, keyCols, sumCols, Nil, Nil, batchId)

  /** [[mergeAgg]] generalized to the mergeable-monoid columns an
    * incremental report needs beyond sums: `minCols`/`maxCols` merge
    * by MIN/MAX (commutative AND idempotent — e.g. a first-seen
    * change id, a latest-seen timestamp). Same ledger, same swap, one
    * merge expression per column class.
    */
  def mergeAgg(spark: SparkSession, batch: DataFrame, path: String,
               keyCols: Seq[String], sumCols: Seq[String],
               minCols: Seq[String], maxCols: Seq[String],
               batchId: Long): Unit =
    withBatchLedger(path, batchId) {
      val tablePath = s"$path/table"
      // crash recovery BEFORE reading: a death between the two renames
      // below leaves the only full table in .old_table — restore it,
      // or the redo would rebuild from this batch alone and silently
      // drop all history (the upsertDim recovery contract)
      locally {
        val dst0 = new java.io.File(tablePath)
        val old0 = new java.io.File(path, ".old_table")
        if (old0.exists() && !dst0.exists())
          require(old0.renameTo(dst0),
            s"mergeAgg: could not restore $tablePath from interrupted swap")
      }
      // swap-published-but-unledgered replay: the table already
      // contains this batch (its stamp says so) — rebuilding would
      // double-count; fall through so withBatchLedger records the id
      if (!readTableStamp(tablePath).exists(_ >= batchId)) {
        require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
          "mergeAgg needs at least one merge column")
        def aggOf(df: DataFrame) = {
          val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
            minCols.map(c => min(col(c)).as(c)) ++
            maxCols.map(c => max(col(c)).as(c))
          df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        }
        val agged = aggOf(batch)
        val merged =
          if (new java.io.File(tablePath).exists()) {
            val existing = spark.read.parquet(tablePath)
            aggOf(existing.unionByName(agged))
          } else agged
        val tmp = new java.io.File(path, ".tmp_table")
        val old = new java.io.File(path, ".old_table")
        if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
        merged.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
        writeTableStamp(tmp.getPath, batchId) // rides the swap: atomic
        val dst = new java.io.File(tablePath)
        if (dst.exists()) {
          require(dst.renameTo(old), s"mergeAgg: could not stage $tablePath")
          require(tmp.renameTo(dst), s"mergeAgg: could not publish $tablePath")
          org.apache.commons.io.FileUtils.deleteDirectory(old)
        } else require(tmp.renameTo(dst),
          s"mergeAgg: could not publish $tablePath")
      }
    }

  /** Race-safe snapshot of an [[upsertDim]] table for a CONCURRENT
    * reader (e.g. a sibling streaming query's foreachBatch doing a
    * per-batch dim join while the dims query swap-publishes the same
    * dir). The swap window can surface a missing dir or vanished
    * files mid-scan; this retries, falls back to the `.old_<table>`
    * staging copy, and EAGERLY materializes the rows
    * (`localCheckpoint`) so the returned frame is immune to any
    * later swap. Dims are broadcast-sized by contract, so pinning
    * the snapshot in block storage is cheap. Returns None when the
    * table has never been created.
    */
  def readDimSnapshot(spark: SparkSession, baseDir: String, table: String,
                      retries: Int = 5): Option[DataFrame] = {
    var attempt = 0
    while (true) {
      val dst = new java.io.File(s"$baseDir/$table")
      val old = new java.io.File(s"$baseDir/.old_$table")
      try {
        return if (dst.exists())
          Some(spark.read.parquet(dst.getPath).localCheckpoint(true))
        else if (old.exists()) // mid-swap: staged copy is the table
          Some(spark.read.parquet(old.getPath).localCheckpoint(true))
        else None
      } catch {
        case _: Exception if attempt < retries =>
          Thread.sleep(50L << attempt); attempt += 1
      }
    }
    None // unreachable
  }

  /** Bucketed catalog table: the co-located-join strategy for fact/dim
    * tables that are joined on the same key repeatedly. Two tables
    * bucketed (and sorted) on the join key with the same bucket count
    * join WITHOUT any Exchange — the scan's hash-partitioning already
    * satisfies the join's distribution requirement — so at 100 TB the
    * fact table's shuffle is paid ONCE at write time instead of per
    * query (`BucketedJoinSpec` pins the exchange-free plan). Sorting
    * within buckets additionally drops the per-query Sort for
    * sort-merge joins.
    *
    * Bucket count is a layout contract: both sides must match, and it
    * bounds write-side parallelism per partition — size it to target
    * file sizes (≈ table bytes ÷ 128–512 MB), not executor count.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }
}
