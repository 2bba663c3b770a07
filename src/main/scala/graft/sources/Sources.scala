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
