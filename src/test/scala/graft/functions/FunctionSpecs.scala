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

  // ---- IK-analyzer parity evidence ----------------------------------------
  // The reference's KeywordUtil instantiates `new IKSegmenter(reader,
  // false)` (ik_max_word). Pinned against the two canonical public
  // ik_max_word examples from the Elasticsearch/IK documentation, with
  // the dictionary words those examples rest on supplied explicitly
  // (our segmenter is dictionary-parameterized; IK ships a bundled
  // main dict).
  //
  // Parity table (matches / divergences):
  //   ik_max_word "中华人民共和国国歌" → full 10-token output: MATCH,
  //     token-for-token including emission order.
  //   ik_max_word "我是中国人"        → [我, 是, 中国人, 中国, 国人]: MATCH.
  //   ik_smart    "中华人民共和国国歌" → [中华人民共和国, 国歌]: our FMM
  //     MATCHES on this input.
  //   DIVERGENCE CLASS (documented, acceptable — the reference runs
  //   smart=false): IK's smart mode arbitrates overlapping paths with
  //   a disambiguator, while our `segment` is plain forward maximum
  //   match. On crossing-ambiguity inputs like 研究生命起源 FMM
  //   greedily takes 研究生 and emits [研究生, 命, 起源]; an
  //   arbitration that prefers balanced paths can yield
  //   [研究, 生命, 起源]. The max-word path — the one the reference
  //   uses — has no such arbitration and stays in lockstep.
  test("ik_max_word parity on the public documentation examples") {
    val anthem = "中华人民共和国国歌"
    val dictA = Set("中华人民共和国", "中华人民", "中华", "华人",
      "人民共和国", "人民", "共和国", "共和", "国国", "国歌")
    assert(CjkSegmenter.segmentFull(anthem, dictA, maxLen = 7) ===
      Seq("中华人民共和国", "中华人民", "中华", "华人",
        "人民共和国", "人民", "共和国", "共和", "国国", "国歌"))
    // smart-mode twin on the same input
    assert(CjkSegmenter.segment(anthem, dictA, maxLen = 7) ===
      Seq("中华人民共和国", "国歌"))

    val dictB = Set("中国人", "中国", "国人")
    assert(CjkSegmenter.segmentFull("我是中国人", dictB) ===
      Seq("我", "是", "中国人", "中国", "国人"))
  }

  test("the documented FMM-vs-smart divergence is exactly as stated") {
    val dict = Set("研究生", "研究", "生命", "起源")
    // plain FMM: greedy 研究生 wins, stranding 命
    assert(CjkSegmenter.segment("研究生命起源", dict) ===
      Seq("研究生", "命", "起源"))
    // max-word (the reference's mode): all overlaps surface, nothing
    // is stranded or arbitrated away
    assert(CjkSegmenter.segmentFull("研究生命起源", dict) ===
      Seq("研究生", "研究", "生命", "起源"))
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

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encode follows the greedy leftmost-lowest-rank merge order") {
    // "stream": s t r e a m → st (rank 4) → st r e a m; "e r"? no
    // adjacent e,r ("e","a") — remaining pairs unranked → terminal
    assert(Bpe.encode("stream") === Vector("st", "r", "e", "a", "m"))
    // "merge": m e r g e → er (rank 0, leftmost) → m er g e →
    // "m er" (rank 5) → mer g e → "g e" (rank 38) → mer ge
    assert(Bpe.encode("merge") === Vector("mer", "ge"))
    // full collapse: every trained frequent word reaches 1 token
    for (w <- Seq("join", "hash", "batch", "scan", "column", "customer",
        "filter", "row", "small", "a"))
      assert(Bpe.encode(w).length === 1, s"$w -> ${Bpe.encode(w)}")
    // untrained word: stays at code points
    assert(Bpe.encode("zzz") === Vector("z", "z", "z"))
  }

  test("encode matches an order-free reference replica on the vocab") {
    // reference: repeatedly scan for the global min-rank pair and
    // merge its leftmost occurrence — same rule, independent code
    val rank = Bpe.merges.zipWithIndex.toMap
    def ref(w: String): Int = {
      var t = w.map(_.toString).toList
      var go = true
      while (go) {
        val ranked = t.zip(t.drop(1)).zipWithIndex
          .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
        if (ranked.isEmpty) go = false
        else {
          val (_, i) = ranked.min
          t = t.take(i) ::: (t(i) + t(i + 1)) :: t.drop(i + 2)
        }
      }
      t.length
    }
    for (w <- Seq("stream", "table", "vector", "window", "query", "group",
        "order", "spark", "value", "merge", "slow", "low", "lowercase",
        "partition", "hashing", "rows", "xyzzy", "sts"))
      assert(Bpe.countTokens(w) === ref(w), w)
  }

  test("docTokenCounts = multiplicity-weighted vocab lengths; empty = 0") {
    val df = Seq(
      (1L, "stream stream merge"), // 5 + 5 + 2
      (2L, "a"),                   // 1
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Bpe.docTokenCounts(df).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 12L), (2L, 1L, 1L), (3L, 0L, 0L)))
  }
}
