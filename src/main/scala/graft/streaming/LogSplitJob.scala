package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DWD log ETL — the reference's BaseLogApp
  * (`gmall-realtime/src/main/java/com/atguigu/app/dwd/BaseLogApp.java`)
  * re-expressed as pure DataFrame transforms. [[parse]] and [[split]]
  * run identically under Structured Streaming (Kafka source) and in
  * batch; [[run]] composes the BATCH is_new fix (a non-time window,
  * which streaming rejects) — a streaming caller swaps in
  * [[StatefulOps.isNewFixStreaming]] between the same parse and split
  * stages (StreamingE2ESpec wires exactly that).
  *
  * Stages (reference lines cited):
  *  1. parse with dead-letter split        — BaseLogApp.java:35-52
  *  2. is_new correction (first-seen day)  — BaseLogApp.java:62-95
  *  3. 3-way split start/page/display with
  *     `displays` explode stamping parent
  *     ts + page_id                        — BaseLogApp.java:100-143
  */
object LogSplitJob {

  /** App-log event schema (FIXTURES.md §1). */
  val logSchema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("mid", StringType), StructField("uid", StringType),
      StructField("is_new", StringType), StructField("vc", StringType),
      StructField("ch", StringType), StructField("ar", StringType),
      StructField("ba", StringType), StructField("md", StringType),
      StructField("os", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("during_time", LongType),
      StructField("item", StringType),
      StructField("item_type", StringType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("item", StringType), StructField("item_type", StringType),
      StructField("display_type", StringType),
      StructField("order", IntegerType),
      StructField("pos_id", IntegerType))))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType),
      StructField("open_ad_id", LongType),
      StructField("loading_time", LongType),
      StructField("open_ad_ms", LongType),
      StructField("open_ad_skip_ms", LongType)))),
    StructField("ts", LongType)))

  /** Parse raw JSON lines. Returns (clean, dirty): unparseable lines go
    * to the dead-letter frame instead of failing the job.
    */
  def parse(raw: DataFrame, jsonCol: String = "value"): (DataFrame, DataFrame) = {
    val parsed = raw.withColumn("log", from_json(col(jsonCol), logSchema))
    // from_json yields a fully-null struct on garbage; a real event
    // always carries ts.
    val clean = parsed.filter(col("log.ts").isNotNull).select(col("log.*"))
    val dirty = parsed.filter(col("log.ts").isNull)
      .select(col(jsonCol).as("dirty"))
    (clean, dirty)
  }

  /** Batch is_new fix: a mid claiming is_new=1 on a later day than its
    * first-seen day is corrected to 0 (reference keeps last-visit-date
    * ValueState; the batch equivalent is a min-ts window per mid).
    * Streaming path: [[StatefulOps.isNewFixStreaming]].
    */
  def isNewFixBatch(clean: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dt = to_date(timestamp_millis(col("ts")))
    val firstDt = min(dt).over(Window.partitionBy(col("common.mid")))
    clean.withColumn("common",
      col("common").withField("is_new",
        when(col("common.is_new") === "1" && dt > firstDt, "0")
          .otherwise(col("common.is_new"))))
  }

  /** 3-way split. Display rows are exploded from `displays`, each
    * stamped with the parent event's ts and page_id.
    */
  def split(clean: DataFrame): Map[String, DataFrame] = {
    val start = clean.filter(col("start").isNotNull)
      .select(col("common"), col("start"), col("ts"))
    val page = clean.filter(col("start").isNull)
      .select(col("common"), col("page"), col("ts"))
    val display = clean
      .filter(col("start").isNull && col("displays").isNotNull)
      .select(col("common"), col("ts"), col("page.page_id").as("page_id"),
        explode(col("displays")).as("display"))
      .select(col("common"), col("ts"), col("page_id"), col("display.*"))
    Map("start" -> start, "page" -> page, "display" -> display)
  }

  /** Full pipeline: parse → is_new fix → split (+ dirty channel). */
  def run(raw: DataFrame, jsonCol: String = "value"): Map[String, DataFrame] = {
    val (clean, dirty) = parse(raw, jsonCol)
    split(isNewFixBatch(clean)) + ("dirty" -> dirty)
  }
}
