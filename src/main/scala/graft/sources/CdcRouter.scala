package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC-envelope handling + data-driven dynamic routing.
  *
  * The reference consumes a Debezium-style envelope
  * `{database, tableName, before, after, type}` (shape produced at
  * reference `gmall-realtime/src/main/java/com/atguigu/app/func/MyDeserialization.java:28-79`),
  * drops deletes (`app/dwd/BaseDbApp.java:45-50`), normalizes
  * `create|bootstrap-insert → insert`, and routes each row by a
  * broadcast `table_process` config keyed on
  * `sourceTable-operateType` (`app/func/TableProcessFunction.java:135-163`),
  * pruning columns to the config's `sinkColumns` allowlist
  * (`:165-184`).
  *
  * Spark-first re-expression: the envelope is a `from_json` projection;
  * routing is a broadcast equi-join against the config DataFrame (rows
  * without a matching route are dropped, as in the reference); pruning
  * is a dynamic `select`. In streaming the config is re-read per
  * micro-batch inside `foreachBatch`, giving batch-granularity config
  * updates (documented semantic difference vs Flink's
  * record-interleaved broadcast state).
  */
object CdcRouter {

  /** Envelope schema: `before`/`after` kept as maps because CDC payload
    * schemas vary by source table (schema is data-driven here).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("tableName", StringType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("type", StringType)))

  /** Routing-config row (mirror of the reference's TableProcess bean,
    * `gmall-realtime/src/main/java/com/atguigu/bean/TableProcess.java:6-24`).
    */
  case class TableProcess(
      sourceTable: String, operateType: String, sinkType: String,
      sinkTable: String, sinkColumns: String,
      sinkPk: String = "id", sinkExtend: String = "")

  /** Parse raw JSON lines into envelope rows; unparseable lines keep a
    * `_corrupt` payload instead of being dropped (dead-letter split,
    * reference `BaseLogApp.java:35-52`).
    */
  def parseEnvelope(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.withColumn("env", from_json(col(jsonCol), envelopeSchema))
      // malformed input yields an all-null struct (permissive mode), so
      // probe required fields rather than the struct itself
      .withColumn("_corrupt",
        when(col("env.tableName").isNull && col("env.type").isNull,
          col(jsonCol)).otherwise(lit(null)))

  /** `create` / `bootstrap-insert` → `insert` (reference
    * `MyDeserialization.java:66-70`).
    */
  def normalizeOp(op: Column): Column =
    when(op.isin("create", "bootstrap-insert"), "insert").otherwise(op)

  /** Drop CDC deletes (reference `BaseDbApp.java:45-50`). Null-safe:
    * only rows explicitly equal to "delete" are removed — a null op
    * must not silently vanish.
    */
  def filterDeletes(df: DataFrame, opCol: String = "type"): DataFrame =
    df.filter(!(col(opCol) <=> "delete"))

  /** Route rows by (sourceTable, operateType) against a small config
    * table. Broadcast join; unmatched rows are dropped (the reference
    * logs "不存在" and discards).
    */
  def route(rows: DataFrame, config: DataFrame,
            tableCol: String = "tableName", opCol: String = "type"): DataFrame =
    rows.join(broadcast(config),
      col(tableCol) === col("sourceTable") && col(opCol) === col("operateType"),
      "inner")

  /** Config-driven column pruning: keep only `sinkColumns` keys of the
    * `after` map (reference `TableProcessFunction.java:165-184`), as a
    * single codegen'd `map_filter` — no per-row driver logic.
    */
  def pruneColumns(df: DataFrame, afterCol: String = "after",
                   sinkColumnsCol: String = "sinkColumns"): DataFrame =
    df.withColumn(afterCol,
      map_filter(col(afterCol),
        (k, _) => array_contains(split(col(sinkColumnsCol), ","), k)))

  /** CDC latest-state compaction: fold a change feed down to the
    * current snapshot — one row per key carrying the payload of that
    * key's LAST change in `(orderCols)` order, with keys whose last
    * change is a delete dropped entirely (the materialized-view
    * semantics of replaying a changelog; reference: the dim-upsert
    * sink overwrites by key, `DimUtil`/HBase puts, and a delete
    * tombstones the row).
    *
    * Scale shape: a single `max(struct(order…, payload…))` aggregate —
    * partial-aggregatable (map-side combine keeps one candidate row
    * per key per partition before the exchange), so the shuffle
    * carries ≤ |keys| rows, not the feed. The alternative
    * (`row_number` over a per-key window) shuffles and sorts every
    * change row; at a 100 TB changelog the agg wins outright.
    * Order rows with null order columns are excluded up front
    * (a change without a position cannot be sequenced).
    *
    * @param orderCols change-sequence columns, compared left-to-right
    *                  (e.g. ts, then a unique change id as tiebreak —
    *                  make the tuple unique or "last" is undefined)
    */
  def latestState(rows: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String], opCol: String = "op",
                  deleteOp: String = "delete"): DataFrame = {
    val payload = rows.columns.toSeq
      .filterNot(keyCols.contains).filterNot(orderCols.contains)
    // max(struct(…)) requires ORDERABLE field types; a map-typed
    // payload column (e.g. this file's own `after`/`before` envelopes)
    // would fail analysis with an opaque error deep in the agg — fail
    // here with the remedy instead
    payload.foreach { c =>
      require(!rows.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.MapType],
        s"latestState payload column '$c' is map-typed (not orderable " +
          "inside max(struct)): serialize it first (to_json) or drop it " +
          "from the frame")
    }
    val ordered = struct(
      (orderCols.map(col) ++ (opCol +: payload.filterNot(_ == opCol))
        .map(col)): _*)
    rows
      .filter(orderCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("_last"))
      // null-safe: only an explicit delete tombstones — a null op must
      // not silently vanish a key (same discipline as filterDeletes)
      .filter(!(col(s"_last.$opCol") <=> deleteOp))
      .select(keyCols.map(col) ++
        (orderCols ++ Seq(opCol) ++ payload.filterNot(_ == opCol))
          .map(c => col(s"_last.$c").as(c)): _*)
  }

  /** Point-in-time state ("AS OF" read): [[latestState]] over only the
    * changes at or before `cutoff` on the primary order column — the
    * time-travel read a CDC-fed warehouse serves (what did this table
    * look like last Tuesday?). A key deleted before the cutoff is
    * absent; a key first created after it does not exist yet. The
    * cutoff is a pushable scan predicate, so at a partitioned 100 TB
    * changelog the read prunes to the ≤cutoff partitions before the
    * same keys-sized max-struct aggregate as the latest read.
    */
  def stateAsOf(rows: DataFrame, keyCols: Seq[String],
                orderCols: Seq[String], cutoff: Column,
                opCol: String = "op", deleteOp: String = "delete")
      : DataFrame =
    latestState(rows.filter(col(orderCols.head) <= cutoff),
      keyCols, orderCols, opCol, deleteOp)

  /** Changelog COMPACTION: one row per (key, bucket) — the key's last
    * change within that bucket (same max-struct read as
    * [[latestState]], keyed by (key, bucket)), with deletes KEPT as
    * tombstone rows rather than filtered: a compacted partition must
    * still tell its consumer "this key ended the day deleted", which
    * the latest-state read (serving, not storage) rightly drops. This
    * is the nightly partition-rewrite a CDC-fed lake runs so replaying
    * a day costs |keys touched that day|, not |changes|.
    *
    * Scale shape: one partial-aggregatable max-struct groupBy on
    * (key…, bucket) — the shuffle carries ≤ one row per key per
    * bucket; at a date-partitioned 100 TB changelog each partition
    * compacts independently (the bucket is in the grouping key, so
    * partition-local input never crosses partitions).
    *
    * @param bucket the compaction granularity expression (e.g. the
    *               epoch day of the change timestamp)
    */
  def compactChangelog(rows: DataFrame, keyCols: Seq[String],
                       orderCols: Seq[String], bucket: Column,
                       bucketName: String = "bucket",
                       opCol: String = "op"): DataFrame = {
    val payload = rows.columns.toSeq
      .filterNot(keyCols.contains).filterNot(orderCols.contains)
    val ordered = struct(
      (orderCols.map(col) ++ (opCol +: payload.filterNot(_ == opCol))
        .map(col)): _*)
    rows
      .filter(orderCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy((keyCols.map(col) :+ bucket.as(bucketName)): _*)
      .agg(max(ordered).as("_last"))
      .select(keyCols.map(col) ++ Seq(col(bucketName)) ++
        (orderCols ++ Seq(opCol) ++ payload.filterNot(_ == opCol))
          .map(c => col(s"_last.$c").as(c)): _*)
  }

  /** Schema-drift observation — what a CDC consumer runs BEFORE the
    * upstream's ALTER TABLE breaks it: per (source table, payload
    * column), how many change rows carried the column, the first
    * change id that did, and whether the routing config declares it.
    * Undeclared columns (`is_declared = false`) are the drift report:
    * a new upstream column starts appearing in `after` maps long
    * before anyone updates `sinkColumns`, and this is the feed for an
    * auto-DDL extension (add nullable column + extend the allowlist)
    * or an alert. The reference's config-driven pruning
    * (`TableProcessFunction.java:165-184`) silently DROPS such
    * columns — this makes the drop observable.
    *
    * Scale shape: `map_keys` + explode is a map-side projection
    * (~payload-width rows per change row, strings of column NAMES
    * only — payload values never leave the row), the per-(table,
    * column) aggregate partial-aggregates to a schema-sized frame,
    * and the config joins broadcast. No payload bytes shuffle.
    */
  /** Streaming maintenance of the [[schemaDrift]] report: per
    * micro-batch the batch's (table, column) observations MERGE into
    * a compacted table behind the batch-id ledger — `ct` is additive,
    * `first_seen` merges by MIN (both mergeable monoids, so the
    * served report is bit-identical to the batch operator over the
    * same rows at any batch slicing or crash-replay — the
    * QuantileStreaming pattern on a second report shape). Call from
    * `foreachBatch`; read back with [[schemaDriftServe]].
    */
  def schemaDriftMergeBatch(spark: org.apache.spark.sql.SparkSession,
                            batch: DataFrame, path: String, batchId: Long,
                            tableCol: String = "tableName",
                            afterCol: String = "after",
                            idCol: String = "id"): Unit =
    graft.sinks.Sinks.mergeAgg(spark,
      batch.select(col(tableCol).as("source_table"),
          col(idCol).as("_id"),
          explode(map_keys(col(afterCol))).as("column_name"))
        .groupBy(col("source_table"), col("column_name"))
        .agg(count(lit(1)).as("ct"), min(col("_id")).as("first_seen")),
      path, keyCols = Seq("source_table", "column_name"),
      sumCols = Seq("ct"), minCols = Seq("first_seen"), maxCols = Nil,
      batchId = batchId)

  /** Current drift report from the maintained table (+ declaredness
    * against the routing config, as in [[schemaDrift]]).
    */
  def schemaDriftServe(spark: org.apache.spark.sql.SparkSession,
                       path: String, config: DataFrame): DataFrame = {
    val declared = config.select(col("sourceTable").as("source_table"),
      explode(split(col("sinkColumns"), ",")).as("column_name"))
      .distinct()
      .withColumn("_decl", lit(true))
    spark.read.parquet(s"$path/table")
      .join(broadcast(declared), Seq("source_table", "column_name"), "left")
      .withColumn("is_declared", coalesce(col("_decl"), lit(false)))
      .drop("_decl")
  }

  def schemaDrift(rows: DataFrame, config: DataFrame,
                  tableCol: String = "tableName",
                  afterCol: String = "after",
                  idCol: String = "id"): DataFrame = {
    val keys = rows.select(col(tableCol).as("source_table"),
      col(idCol).as("_id"),
      explode(map_keys(col(afterCol))).as("column_name"))
    val declared = config.select(col("sourceTable").as("source_table"),
      explode(split(col("sinkColumns"), ",")).as("column_name"))
      .distinct()
      .withColumn("_decl", lit(true))
    keys.groupBy(col("source_table"), col("column_name"))
      .agg(count(lit(1)).as("ct"), min(col("_id")).as("first_seen"))
      .join(broadcast(declared), Seq("source_table", "column_name"), "left")
      .withColumn("is_declared", coalesce(col("_decl"), lit(false)))
      .drop("_decl")
  }
}
