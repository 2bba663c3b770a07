package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.sources.CdcRouter

/** CDC + dynamic-routing operators (S3, P2, P4, P6, J3 in SURVEY.md §2)
  * exercised over the harness's `events` table, which plays the role of
  * the CDC stream: `event_type` ↔ sourceTable, a derived op ↔
  * insert/update/delete.
  */
object RoutingOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** Deterministic CDC op derived from the payload — the event's k
    * value mod 10 → delete (2), create (3), else insert/update split —
    * as a branchless lookup: a when-chain re-evaluates the JSON parse
    * per branch (conditional branches defeat subexpression
    * elimination); element_at over a literal array parses once per row.
    */
  private val opTable = Array("update", "update", "delete", "create",
    "insert", "insert", "insert", "insert", "insert", "insert")

  private[graft] def opCol: org.apache.spark.sql.Column = {
    // try_cast: a non-numeric k nulls out (→ 'insert') instead of
    // aborting under ANSI mode, mirroring the oracle's TRY_CAST
    val k = expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    // k % 10 is a C-style remainder on both engines, so negative k gives
    // a negative remainder; the oracle's `< 2` branch maps every
    // negative remainder to 'update'. Guard the index the same way —
    // two `when`s (not otherwise) so a null k stays null and falls to
    // the coalesce's 'insert', exactly the oracle's ELSE
    val idx = when(k >= 0, (k % 10 + 1).cast("int"))
      .when(k < 0, lit(1))
    coalesce(element_at(lit(opTable), idx), lit("insert"))
  }

  private val sqlOp =
    """CASE WHEN TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 = 2 THEN 'delete'
      |     WHEN TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 = 3 THEN 'create'
      |     WHEN TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 < 2 THEN 'update'
      |     ELSE 'insert' END""".stripMargin

  /** The routing config: sourceTable=event_type, operateType, sink. */
  private[graft] val configRows = Seq(
    ("view", "insert", "kafka", "dwd_page_view", "event_id,user_id,value"),
    ("view", "update", "kafka", "dwd_page_view", "event_id,user_id,value"),
    ("click", "insert", "kafka", "dwd_click", "event_id,user_id"),
    ("purchase", "insert", "hbase", "dim_purchase", "event_id,user_id,value"),
    ("purchase", "update", "hbase", "dim_purchase", "event_id,user_id,value"),
    ("signup", "insert", "hbase", "dim_user", "event_id,user_id"))

  // r2/r3 rely on the inner route join to drop deletes (see their
  // comments); that only holds while no route carries a delete op —
  // assert the invariant here so a config edit fails loudly instead of
  // silently diverging from the oracle's explicit WHERE op <> 'delete'
  require(configRows.forall(_._2 != "delete"),
    "routing config must not contain delete routes: r2/r3 use the route " +
      "join as the delete filter")

  private[graft] def configDf(s: SparkSession): DataFrame = {
    import s.implicits._
    configRows.toDF("sourceTable", "operateType", "sinkType", "sinkTable",
      "sinkColumns")
  }

  private val sqlConfig = configRows
    .map { case (st, op, sk, tbl, cols) => s"('$st','$op','$sk','$tbl','$cols')" }
    .mkString(
      "(VALUES ",
      ", ",
      ") c(sourceTable, operateType, sinkType, sinkTable, sinkColumns)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S3 + P2: envelope op normalization + delete filter --------------
    // The delete filter runs AFTER the aggregation (on ≤4 grouped
    // rows): a pre-filter would make the filter operator and the
    // groupBy keys each evaluate the JSON-parsing op expression —
    // whole-stage codegen eliminates common subexpressions within one
    // operator, not across filter→project. The predicate references
    // `ct` (always ≥ 0) in a single non-splittable CaseWhen, or
    // PushPredicateThroughAggregate would push the op conjunct back
    // below the agg and re-parse props per row. Same rows as the
    // oracle's WHERE … GROUP BY (delete never normalizes away).
    "r1_cdc_normalize" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(CdcRouter.normalizeOp(opCol).as("op"))
        .agg(count(lit(1)).as("ct"), countDistinct(col("user_id")).as("users"))
        .filter(when(col("op") <=> "delete", lit(false))
          .otherwise(col("ct") >= 0))
    },

    // ---- J3 + P6: broadcast-config dynamic routing -----------------------
    // No explicit delete pre-filter: the config carries no delete
    // routes, so the inner route join IS the delete filter — one JSON
    // evaluation per row at the join key instead of filter + join each
    // re-parsing props.
    "r2_dynamic_route" -> { (s, dir) =>
      val rows = ev(s, dir).withColumn("op", CdcRouter.normalizeOp(opCol))
      CdcRouter.route(rows, configDf(s), tableCol = "event_type", opCol = "op")
        .groupBy(col("sinkType"), col("sinkTable"))
        .agg(count(lit(1)).as("ct"))
    },

    // ---- CDC latest-state compaction -------------------------------------
    // changelog → current snapshot: one row per user carrying the last
    // change's payload (order (ts, event_id) — unique, so "last" is
    // well-defined), users whose final change is a delete tombstoned
    // away. One partial-aggregatable max(struct) — never a per-key
    // window sort over the feed (see CdcRouter.latestState).
    "r5_latest_state" -> { (s, dir) =>
      val rows = ev(s, dir)
        .withColumn("op", CdcRouter.normalizeOp(opCol))
        .select(col("user_id"), col("ts"), col("event_id"), col("op"),
          col("event_type"), col("value"))
      CdcRouter.latestState(rows, keyCols = Seq("user_id"),
        orderCols = Seq("ts", "event_id"))
    },

    // ---- point-in-time "AS OF" read --------------------------------------
    // table state at 2024-01-15T00:00Z: keys whose last change at the
    // cutoff is a delete are absent, keys first created after it
    // don't exist yet — r5's latest read with the cutoff pushed into
    // the scan
    "r7_time_travel" -> { (s, dir) =>
      val rows = ev(s, dir)
        .withColumn("op", CdcRouter.normalizeOp(opCol))
        .select(col("user_id"), col("ts"), col("event_id"), col("op"),
          col("event_type"), col("value"))
      CdcRouter.stateAsOf(rows, keyCols = Seq("user_id"),
        orderCols = Seq("ts", "event_id"),
        cutoff = lit("2024-01-15 00:00:00").cast("timestamp"))
    },

    // ---- changelog compaction (nightly partition rewrite) -----------------
    // one row per (user, epoch day): the day's LAST change, deletes
    // kept as tombstones — replaying a day then costs |keys touched|,
    // not |changes| (r5 is the serving read and drops deletes; a
    // compacted PARTITION must keep them)
    "r8_compaction" -> { (s, dir) =>
      val rows = ev(s, dir)
        .withColumn("op", CdcRouter.normalizeOp(opCol))
        .select(col("user_id"), col("ts"), col("event_id"), col("op"),
          col("event_type"), col("value"))
      CdcRouter.compactChangelog(rows, keyCols = Seq("user_id"),
        orderCols = Seq("ts", "event_id"),
        bucket = graft.core.Graft.floorDivExpr("unix_millis(ts)", 86400000L),
        bucketName = "day")
    },

    // ---- SCD2 dimension versioning ---------------------------------------
    // change rows → type-2 validity intervals: each row's valid_to is
    // the key's next change (null = current version), the layout q22's
    // as-of join reconstructs point-in-time against. One lead window
    // per key, (ts, event_id) tie-broken so intervals are
    // deterministic under replay
    "r4_scd2_intervals" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
    },

    // ---- CDC schema-drift observation ------------------------------------
    // the upstream "ALTER TABLE ADD COLUMN" mid-stream: a `discount`
    // key starts appearing in purchase/view payloads (simulated by the
    // deterministic user_id % 3 rule) that no route's sinkColumns
    // declares — the config-driven pruning would silently drop it;
    // this report makes the drift observable per (table, column) with
    // first-seen change id and declaredness
    "r6_schema_drift" -> { (s, dir) =>
      val rows = ev(s, dir)
        .withColumn("after", map_concat(
          map(lit("event_id"), col("event_id").cast(StringType)),
          map(lit("user_id"), col("user_id").cast(StringType)),
          when(col("user_id") % 3 === 0,
            map(lit("discount"), (col("user_id") % 7).cast(StringType)))
            .otherwise(expr("map()").cast(MapType(StringType, StringType)))))
      CdcRouter.schemaDrift(rows, configDf(s), tableCol = "event_type",
        afterCol = "after", idCol = "event_id")
    },

    // ---- P4: config-driven column pruning --------------------------------
    // (delete rows drop out at the route join, as in r2)
    "r3_column_prune" -> { (s, dir) =>
      val rows = ev(s, dir)
        .withColumn("op", CdcRouter.normalizeOp(opCol))
        .withColumn("after", map_from_arrays(
          array(lit("event_id"), lit("user_id"), lit("value")),
          array(col("event_id").cast(StringType),
            col("user_id").cast(StringType),
            // double→string formatting diverges across engines;
            // DECIMAL(18,2)→string is canonical on both (finite-guarded
            // so a junk NaN row nulls out instead of aborting the cast)
            graft.core.Graft.finite(col("value"))
              .cast(DecimalType(18, 2)).cast(StringType))))
      val routed = CdcRouter.route(rows, configDf(s),
        tableCol = "event_type", opCol = "op")
      CdcRouter.pruneColumns(routed)
        .select(col("sinkTable"),
          col("after")("event_id").as("event_id"),
          col("after")("user_id").as("user_id"),
          col("after")("value").as("value"))
    })

  def oracle: Map[String, String] = Map(
    "r1_cdc_normalize" ->
      s"""WITH x AS (SELECT user_id, $sqlOp AS op FROM events)
         |SELECT CASE WHEN op IN ('create','bootstrap-insert') THEN 'insert' ELSE op END AS op,
         |  COUNT(*) AS ct, COUNT(DISTINCT user_id) AS users
         |FROM x WHERE op <> 'delete'
         |GROUP BY 1""".stripMargin,

    "r2_dynamic_route" ->
      s"""WITH x AS (
         |  SELECT event_type,
         |    CASE WHEN op IN ('create','bootstrap-insert') THEN 'insert' ELSE op END AS op
         |  FROM (SELECT event_type, $sqlOp AS op FROM events)
         |  WHERE op <> 'delete')
         |SELECT sinkType, sinkTable, COUNT(*) AS ct
         |FROM x JOIN $sqlConfig
         |  ON x.event_type = c.sourceTable AND x.op = c.operateType
         |GROUP BY sinkType, sinkTable""".stripMargin,

    "r5_latest_state" ->
      s"""WITH feed AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN op IN ('create','bootstrap-insert') THEN 'insert' ELSE op END AS op,
         |    event_type, value
         |  FROM (SELECT *, $sqlOp AS op FROM events)
         |  WHERE ts IS NOT NULL AND event_id IS NOT NULL),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM feed)
         |SELECT user_id, ts, event_id, op, event_type, value
         |FROM ranked WHERE rn = 1 AND op <> 'delete'""".stripMargin,

    "r8_compaction" ->
      s"""WITH feed AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN op IN ('create','bootstrap-insert') THEN 'insert' ELSE op END AS op,
         |    event_type, value,
         |    epoch_ms(ts) // 86400000 AS day
         |  FROM (SELECT *, $sqlOp AS op FROM events)
         |  WHERE ts IS NOT NULL AND event_id IS NOT NULL),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM feed)
         |SELECT user_id, day, ts, event_id, op, event_type, value
         |FROM ranked WHERE rn = 1""".stripMargin,

    "r7_time_travel" ->
      s"""WITH feed AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN op IN ('create','bootstrap-insert') THEN 'insert' ELSE op END AS op,
         |    event_type, value
         |  FROM (SELECT *, $sqlOp AS op FROM events)
         |  WHERE ts IS NOT NULL AND event_id IS NOT NULL
         |    AND ts <= TIMESTAMP '2024-01-15 00:00:00'),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM feed)
         |SELECT user_id, ts, event_id, op, event_type, value
         |FROM ranked WHERE rn = 1 AND op <> 'delete'""".stripMargin,

    "r4_scd2_intervals" ->
      """SELECT user_id, event_id, ts, value,
        |  LEAD(ts) OVER w AS valid_to,
        |  LEAD(ts) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    // per-key UNION ALL replays the conditional map construction; the
    // declared set replays sinkColumns splitting
    "r6_schema_drift" ->
      s"""WITH k AS (
         |  SELECT event_type, event_id, 'event_id' AS column_name FROM events
         |  UNION ALL
         |  SELECT event_type, event_id, 'user_id' FROM events
         |  UNION ALL
         |  SELECT event_type, event_id, 'discount' FROM events
         |  WHERE user_id % 3 = 0),
         |agg AS (
         |  SELECT event_type AS source_table, column_name,
         |    CAST(COUNT(*) AS BIGINT) AS ct,
         |    CAST(MIN(event_id) AS BIGINT) AS first_seen
         |  FROM k GROUP BY 1, 2),
         |decl AS (
         |  SELECT DISTINCT source_table, column_name FROM (
         |    SELECT sourceTable AS source_table,
         |      unnest(string_split(sinkColumns, ',')) AS column_name
         |    FROM $sqlConfig))
         |SELECT a.source_table, a.column_name, a.ct, a.first_seen,
         |  (d.column_name IS NOT NULL) AS is_declared
         |FROM agg a
         |LEFT JOIN decl d ON d.source_table = a.source_table
         |  AND d.column_name = a.column_name""".stripMargin,

    "r3_column_prune" ->
      s"""WITH x AS (
         |  SELECT event_id, user_id, value, event_type,
         |    CASE WHEN op IN ('create','bootstrap-insert') THEN 'insert' ELSE op END AS op
         |  FROM (SELECT *, $sqlOp AS op FROM events)
         |  WHERE op <> 'delete')
         |SELECT sinkTable,
         |  CASE WHEN list_contains(string_split(sinkColumns, ','), 'event_id')
         |    THEN CAST(event_id AS VARCHAR) END AS event_id,
         |  CASE WHEN list_contains(string_split(sinkColumns, ','), 'user_id')
         |    THEN CAST(user_id AS VARCHAR) END AS user_id,
         |  CASE WHEN list_contains(string_split(sinkColumns, ','), 'value')
         |    THEN CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END AS value
         |FROM x JOIN $sqlConfig
         |  ON x.event_type = c.sourceTable AND x.op = c.operateType""".stripMargin
  )
}
