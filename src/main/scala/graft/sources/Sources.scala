package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unified ODS source seam. Every ingest produces a single-column
  * `value: string` frame of JSON lines, so the downstream jobs
  * (LogSplitJob, CdcRouter, Warehouse) are source-agnostic:
  *
  *  - [[KafkaTopic]] — production: the reference's Kafka consumers
  *    (`utils/MyKafkaUtil.java:36-43`). `startingOffsets=earliest`
  *    corresponds to the CDC `StartupOptions.initial()` snapshot+stream
  *    mode, `latest` to stream-only
  *    (`app/ods/Flink_CDCWithCustomerSchema.java:21-29`).
  *  - [[FileStream]] — replayable dev/test stream of JSON-lines files;
  *    `maxFilesPerTrigger` gives the rate-limited CDC-replay shape.
  *  - [[BatchDir]] — the finite-input correctness harness.
  *
  * (The Kafka path is exercised only in deployments with a broker; its
  * plan construction is config, not logic.)
  */
object Sources {

  sealed trait SourceSpec
  final case class KafkaTopic(bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest") extends SourceSpec
  final case class FileStream(dir: String,
      maxFilesPerTrigger: Option[Int] = None) extends SourceSpec
  final case class BatchDir(dir: String) extends SourceSpec

  /** The exact option map the Kafka reader is configured with —
    * exposed as a pure function so the wiring is unit-testable in
    * environments without the Kafka connector on the classpath (the
    * CI harness here has neither `spark-sql-kafka` jars nor network
    * access to fetch them; an embedded-broker integration test needs
    * both and lives with deployments that have them — see SURVEY.md
    * §2 S1).
    */
  def kafkaOptions(spec: KafkaTopic): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> spec.bootstrapServers,
    "subscribe" -> spec.topic,
    "startingOffsets" -> spec.startingOffsets)

  /** Kafka SINK seam (K1 fixed topic / K2 per-row dynamic topic —
    * `utils/MyKafkaUtil.java:25-34`). With `defaultTopic` set the
    * writer publishes every row there (K1); without it the frame must
    * carry a `topic` column ([[graft.sinks.Sinks.toKafkaRecords]]) and
    * each row routes itself (K2) — Spark's Kafka sink reads the
    * column natively, so the reference's custom
    * `KafkaSerializationSchema` collapses into a projection. Pure
    * config, unit-tested like [[kafkaOptions]]; see [[kafkaWriterFor]]
    * for the column contract check.
    */
  final case class KafkaSinkSpec(bootstrapServers: String,
      defaultTopic: Option[String] = None)

  def kafkaSinkOptions(spec: KafkaSinkSpec): Map[String, String] =
    Map("kafka.bootstrap.servers" -> spec.bootstrapServers) ++
      spec.defaultTopic.map("topic" -> _)

  /** Validates the frame ↔ spec contract and returns the exact
    * (format, options) the writeStream would be configured with:
    * K2 (no default topic) requires a `topic` column; both shapes
    * require `value`. Fails fast at plan-build time, not at the
    * broker.
    */
  def kafkaWriterFor(df: DataFrame, spec: KafkaSinkSpec)
      : (String, Map[String, String]) = {
    require(df.columns.contains("value"),
      "kafka sink: frame must carry a `value` column (Sinks.toKafkaRecords)")
    if (spec.defaultTopic.isEmpty)
      require(df.columns.contains("topic"),
        "kafka sink: per-row routing (no defaultTopic) needs a `topic` column")
    ("kafka", kafkaSinkOptions(spec))
  }

  /** Trigger seam: the named trigger modes a deployment picks from,
    * mapped to Spark's `Trigger` objects — `default` (micro-batch as
    * fast as possible), `interval:<duration>` (ProcessingTime), and
    * `availableNow` (catch-up-then-stop backfill, the batch-replay
    * mode). One place so runbooks and specs name the same strings.
    */
  def triggerFor(mode: String): org.apache.spark.sql.streaming.Trigger = {
    import org.apache.spark.sql.streaming.Trigger
    mode match {
      case "default"      => Trigger.ProcessingTime(0L)
      case "availableNow" => Trigger.AvailableNow()
      case m if m.startsWith("interval:") =>
        Trigger.ProcessingTime(m.stripPrefix("interval:"))
      case other => throw new IllegalArgumentException(
        s"unknown trigger mode '$other' " +
          "(default | availableNow | interval:<duration>)")
    }
  }

  /** JSON-lines stream/batch as `value: string`. */
  def read(spark: SparkSession, spec: SourceSpec): DataFrame = spec match {
    case k: KafkaTopic =>
      spark.readStream.format("kafka")
        .options(kafkaOptions(k))
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    case FileStream(dir, maxFiles) =>
      val r = spark.readStream.format("text")
      maxFiles.foreach(m => r.option("maxFilesPerTrigger", m))
      r.load(dir)
    case BatchDir(dir) =>
      spark.read.format("text").load(dir)
  }
}
