package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Html, Robots, Urls}

/** The crawl front-end, streamed — what runs between the fetcher and
  * the curation cascade (t11d's stage 0) when pages arrive
  * continuously instead of as a batch corpus:
  *
  *  1. cross-batch URL dedup on the CANONICAL form
  *     (`dropDuplicatesWithinWatermark` keyed on canon_url): the
  *     frontier sees the same page under tracking/www/fragment
  *     variants across hours — first arrival wins, and the dedup
  *     state is bounded by the watermark horizon (the deployment's
  *     recrawl-dedup window), not unbounded like a batch `distinct`;
  *  2. per micro-batch, the stateless gates: robots.txt
  *     ([[Robots.applyRobots]] — per-row once the broadcast rules are
  *     resolved) and HTML main-text extraction ([[Html]] — a
  *     projection), both inside foreachBatch where their
  *     aggregate/join plans run with batch semantics.
  *
  * The downstream cascade (near-dup, quality gates) stays batch —
  * cross-document state doesn't micro-batch; this stage's contract
  * is to hand it clean, unique, fetch-allowed documents.
  */
object Stage0Stream {

  /** @param onBatch receives (batchId, rows: idCol, canon_url, text —
    * the extracted main text) for each micro-batch after dedup +
    * gating. `dedupHorizon` is the watermark delay bounding the
    * URL-dedup state. A real crawl stream carries its fetch URL in
    * `urlCol` and that column is used as-is; only when the column is
    * ABSENT does the operator synthesize the deterministic
    * [[Urls.withUrlPayload]] fixture (the spec/harness path) — the
    * fixture is a fallback, not part of the operator's contract.
    */
  def stage0Stream(stream: DataFrame, rules: DataFrame, agent: String,
                   onBatch: (Long, DataFrame) => Unit,
                   dedupHorizon: String = "10 seconds",
                   idCol: String = "doc_id", textCol: String = "text",
                   eventTimeCol: String = "event_time",
                   urlCol: String = "url")
      : DataStreamWriter[Row] = {
    val withUrl =
      if (stream.columns.contains(urlCol)) stream
      else Urls.withUrlPayload(stream, idCol)
        .withColumnRenamed("url", urlCol)
    val deduped = withUrl
      .withColumn("canon_url", Urls.canonicalUrl(col(urlCol)))
      .withWatermark(eventTimeCol, dedupHorizon)
      .dropDuplicatesWithinWatermark("canon_url")
    deduped.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val allowed = Robots.applyRobots(
          batch.select(col(idCol), col(urlCol)), rules, agent, idCol,
          urlCol)
        .filter(col("allowed")).select(col(idCol))
      val docs = batch.join(allowed, Seq(idCol))
      onBatch(batchId, Html.withHtmlPayload(docs, idCol, textCol)
        .select(col(idCol), col("canon_url"),
          Html.extractMainText(col("html")).as("text")))
      ()
    }
  }

  /** [[stage0Stream]] with the crawl→train HANDOFF made exactly-once:
    * each micro-batch's clean documents land in `outPath` through the
    * same batch-id ledger the warehouse sinks use
    * ([[graft.sinks.Sinks.idempotentAppend]] — a crash between the
    * parquet write and the checkpoint commit replays into the same
    * `batch=N` subdir, and a crash after the ledger commit
    * short-circuits), and the downstream cascade consumes
    * [[cascadeInput]] (the read-committed view), so a death anywhere
    * between the stage-0 ledger commit and the cascade's own write
    * loses nothing and duplicates nothing: the cascade is a
    * re-runnable batch job over a table that only ever grows by whole
    * committed batches (spec-pinned across kill+restart).
    */
  def stage0ToTable(stream: DataFrame, rules: DataFrame, agent: String,
                    outPath: String,
                    dedupHorizon: String = "10 seconds",
                    idCol: String = "doc_id", textCol: String = "text",
                    eventTimeCol: String = "event_time",
                    urlCol: String = "url")
      : DataStreamWriter[Row] =
    stage0Stream(stream, rules, agent,
      (batchId, docs) =>
        graft.sinks.Sinks.idempotentAppend(docs, batchId, outPath),
      dedupHorizon, idCol, textCol, eventTimeCol, urlCol)

  /** The cascade's input: read-committed rows of a [[stage0ToTable]]
    * handoff table (partially-written crash leftovers excluded until
    * their replay commits), batch bookkeeping dropped.
    */
  def cascadeInput(spark: org.apache.spark.sql.SparkSession,
                   outPath: String): DataFrame =
    graft.sinks.Sinks.committedView(spark, outPath).drop("batch")

  /** The LIVE fetch frontier over a [[stage0ToTable]] handoff table —
    * the feedback edge that closes the crawl loop: what the
    * discovery layer says to fetch NEXT, given what the crawl has
    * already committed. Pure function of the read-committed view
    * (an empty/uncreated table means an untouched frontier), so it is
    * restart-consistent by construction: a crash between a parquet
    * write and its ledger commit can only leave the frontier
    * momentarily LARGER (the page re-offers, and the stage-0 dedup +
    * ledger make the re-fetch harmless), never wrong.
    */
  def liveFrontier(spark: org.apache.spark.sql.SparkSession,
                   outPath: String, robots: DataFrame,
                   sitemapFiles: DataFrame, agent: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val crawled =
      if (new java.io.File(outPath, "_committed_batches").exists())
        cascadeInput(spark, outPath).select(col("canon_url"))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("canon_url", StringType))))
    graft.operators.Sitemaps.discoveryFrontier(
      robots, sitemapFiles, crawled, agent)
  }
}
