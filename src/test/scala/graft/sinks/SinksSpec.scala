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
}
