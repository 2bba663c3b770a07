package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the Kafka source seam as far as this harness can reach: the
  * option map the connector would be configured with, and the
  * documented fact that the connector itself is absent here (no
  * `spark-sql-kafka` artifact on the classpath and no network to
  * fetch one), which is why S1/K1/K2 integration runs against a real
  * broker live with deployments instead — see SURVEY.md §2 S1.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kafkaOptions wires spec fields to the connector's option names") {
    val spec = Sources.KafkaTopic("broker1:9092,broker2:9092", "ods_base_log")
    assert(Sources.kafkaOptions(spec) === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "ods_base_log",
      "startingOffsets" -> "earliest"))
    // CDC stream-only mode maps to latest (StartupOptions.latest())
    val latest = spec.copy(startingOffsets = "latest")
    assert(Sources.kafkaOptions(latest)("startingOffsets") === "latest")
  }

  test("the harness classpath genuinely lacks the Kafka connector") {
    // executable documentation: read(KafkaTopic) must fail fast with
    // the missing-data-source error, not silently degrade — and if the
    // connector ever appears in this environment, this test failing is
    // the signal to add the embedded-broker integration suite
    val e = intercept[Exception] {
      Sources.read(spark, Sources.KafkaTopic("localhost:9092", "t"))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("deployment option matrix: startingOffsets x trigger x sink routing, golden maps") {
    import org.apache.spark.sql.streaming.Trigger
    val brokers = "b1:9092,b2:9092"
    // source side: every offsets mode the reference's consumers use —
    // earliest = CDC StartupOptions.initial() (snapshot+stream),
    // latest = stream-only, explicit JSON = resume-from-position
    val offsetModes = Seq("earliest", "latest",
      """{"ods_base_log":{"0":42}}""")
    for (off <- offsetModes) {
      assert(Sources.kafkaOptions(
        Sources.KafkaTopic(brokers, "ods_base_log", off)) === Map(
        "kafka.bootstrap.servers" -> brokers,
        "subscribe" -> "ods_base_log",
        "startingOffsets" -> off))
    }
    // trigger side: the three modes a deployment picks from
    assert(Sources.triggerFor("default") === Trigger.ProcessingTime(0L))
    assert(Sources.triggerFor("interval:10 seconds") ===
      Trigger.ProcessingTime("10 seconds"))
    assert(Sources.triggerFor("availableNow") === Trigger.AvailableNow())
    intercept[IllegalArgumentException](Sources.triggerFor("nope"))
    // sink side: K1 fixed topic vs K2 per-row routing
    val spark2 = spark
    import spark2.implicits._
    val routed = graft.sinks.Sinks.toKafkaRecords(
      Seq((1L, "a", "dwd_page"), (2L, "b", "dwd_start"))
        .toDF("id", "v", "sink"), "sink")
    val (fmt1, k1) = Sources.kafkaWriterFor(routed,
      Sources.KafkaSinkSpec(brokers, defaultTopic = Some("dwd_page_log")))
    assert(fmt1 === "kafka")
    assert(k1 === Map("kafka.bootstrap.servers" -> brokers,
      "topic" -> "dwd_page_log"))
    val (_, k2) = Sources.kafkaWriterFor(routed,
      Sources.KafkaSinkSpec(brokers)) // per-row: the topic column routes
    assert(k2 === Map("kafka.bootstrap.servers" -> brokers))
    // contract violations fail at plan-build time, not at the broker
    intercept[IllegalArgumentException] {
      Sources.kafkaWriterFor(Seq(1L).toDF("id"),
        Sources.KafkaSinkSpec(brokers))
    }
    intercept[IllegalArgumentException] {
      Sources.kafkaWriterFor(Seq("x").toDF("value"),
        Sources.KafkaSinkSpec(brokers)) // no topic col, no default
    }
  }
}
