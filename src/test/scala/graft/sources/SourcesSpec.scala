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
}
