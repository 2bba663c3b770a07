package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CjkSegmenterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("forward maximum matching prefers the longest dictionary word") {
    assert(CjkSegmenter.segment("尚硅谷大数据项目") ===
      Seq("尚硅谷", "大数据", "项目"))
  }

  test("max-word mode emits all overlapping dictionary matches (ik smart=false)") {
    // FMM partitions; max-word also surfaces the nested 数据
    assert(CjkSegmenter.segmentFull("大数据仓库") ===
      Seq("大数据", "数据", "仓库"))
    // chars inside no match fall back to singles; non-CJK passes through
    assert(CjkSegmenter.segmentFull("他buy手机") === Seq("他", "buy", "手机"))
    assert(CjkSegmenter.segmentFull("") === Seq.empty)
    // the column form drives the same kernel under explode
    val toks = Seq("大数据仓库").toDF("t")
      .select(explode(CjkSegmenter.tokenizeCjkFull(col("t"))).as("w"))
      .as[String].collect().toSeq
    assert(toks === Seq("大数据", "数据", "仓库"))
  }

  test("unknown CJK characters fall back to single-character tokens") {
    assert(CjkSegmenter.segment("犇数据") === Seq("犇", "数据"))
  }

  test("mixed CJK and Latin text splits both ways") {
    assert(CjkSegmenter.segment("apple 手机 大数据 sale") ===
      Seq("apple", "手机", "大数据", "sale"))
  }

  test("works as a column UDF under explode") {
    val out = Seq("小米手机旗舰店").toDF("item")
      .select(explode(CjkSegmenter.tokenizeCjk(col("item"))).as("kw"))
      .as[String].collect().toSeq
    assert(out === Seq("小米", "手机", "旗舰店"))
  }
}

class NamesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snake↔camel round-trips the reference bean field names") {
    assert(Names.snakeToCamel("split_total_amount") === "splitTotalAmount")
    assert(Names.camelToSnake("splitTotalAmount") === "split_total_amount")
    assert(Names.snakeToCamel("id") === "id")
  }

  test("camelized renames every column") {
    val df = Seq((1L, "x")).toDF("order_id", "sku_name")
    assert(Names.camelized(df).columns.toSeq === Seq("orderId", "skuName"))
    assert(Names.snaked(Names.camelized(df)).columns.toSeq ===
      Seq("order_id", "sku_name"))
  }

  test("metadata columns with leading underscores round-trip unmangled") {
    assert(Names.snakeToCamel("_corrupt") === "_corrupt")
    assert(Names.snakeToCamel("__rn") === "__rn")
    assert(Names.snakeToCamel("_split_total") === "_splitTotal")
    assert(Names.camelToSnake(Names.snakeToCamel("_split_total"))
      === "_split_total")
    assert(Names.snakeToCamel("_") === "_")   // must not throw
    assert(Names.snakeToCamel("___") === "___")
  }
}
