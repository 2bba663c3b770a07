package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Dictionary-based CJK word segmentation — the reference's one true
  * UDF surface (IK analyzer at reference
  * `gmall-realtime/src/main/java/com/atguigu/utils/KeywordUtil.java:13-35`).
  * Two modes, both from scratch:
  *  - [[segment]] — forward maximum matching (one partition of the
  *    input; the classic FMM algorithm): at each position take the
  *    longest dictionary word (up to `maxLen`), else the single char.
  *  - [[segmentFull]] — max-word mode mirroring the reference's
  *    `smart=false` instantiation: ALL overlapping dictionary matches.
  * Non-CJK runs fall back to whitespace splitting in both, so mixed
  * text tokenizes sensibly.
  *
  * This is deliberately a Scala UDF, not a Catalyst expression: it is
  * the one operator in the system with irreducibly imperative logic
  * and per-executor state (the dictionary), and it sits behind an
  * `explode`, off the hot aggregate path. A production deployment
  * swaps `defaultDict` for a broadcast dictionary file.
  */
object CjkSegmenter {

  /** Small built-in dictionary for the e-commerce/search domain the
    * reference operates in; production passes its own.
    */
  val defaultDict: Set[String] = Set(
    "尚硅谷", "大数据", "数据", "仓库", "数仓", "实时", "项目", "电商",
    "用户", "订单", "支付", "商品", "关键词", "关键", "搜索", "点击",
    "购物车", "购物", "下单", "收藏", "评价", "退款", "分词器", "分词",
    "手机", "苹果", "小米", "华为", "旗舰店", "旗舰", "官方", "北京",
    "上海", "广州", "平台", "日志", "分析", "统计", "流量", "访问")

  def isCjk(c: Char): Boolean = {
    val b = Character.UnicodeBlock.of(c)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
      b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
      b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS
  }

  /** Forward maximum matching. Deterministic; O(len × maxLen). */
  def segment(text: String, dict: Set[String] = defaultDict,
              maxLen: Int = 4): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = text.length
    var i = 0
    while (i < n) {
      if (!isCjk(text.charAt(i))) {
        val start = i
        while (i < n && !isCjk(text.charAt(i))) i += 1
        text.substring(start, i).split("\\s+")
          .iterator.filter(_.nonEmpty).foreach(out += _)
      } else {
        var l = math.min(maxLen, n - i)
        var matched = false
        while (l >= 2 && !matched) {
          val cand = text.substring(i, i + l)
          if (dict.contains(cand)) { out += cand; i += l; matched = true }
          l -= 1
        }
        if (!matched) { out += text.substring(i, i + 1); i += 1 }
      }
    }
    out.toSeq
  }

  /** Max-word segmentation — the reference analyzer's `smart=false`
    * mode (`utils/KeywordUtil.java:16`, `new IKSegmenter(reader,
    * false)` emits ALL overlapping dictionary matches, not one
    * partition): every dictionary word at every position, in position
    * order (longest first at a tie), plus singles for CJK chars inside
    * no match and whitespace-split non-CJK runs. "大数据仓库" →
    * [大数据, 数据, 仓库], not FMM's [大数据, 仓库].
    */
  def segmentFull(text: String, dict: Set[String] = defaultDict,
                  maxLen: Int = 4): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = text.length
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (!isCjk(text.charAt(i))) {
        val start = i
        while (i < n && !isCjk(text.charAt(i))) i += 1
        text.substring(start, i).split("\\s+")
          .iterator.filter(_.nonEmpty).foreach(out += _)
      } else {
        var l = math.min(maxLen, n - i)
        while (l >= 2) {
          if (dict.contains(text.substring(i, i + l))) {
            out += text.substring(i, i + l)
            (i until i + l).foreach(covered(_) = true)
          }
          l -= 1
        }
        if (!covered(i)) out += text.substring(i, i + 1)
        i += 1
      }
    }
    out.toSeq
  }

  /** Column form: text → array of words (use under `explode`). */
  val tokenizeCjk: Column => Column = {
    val u = udf((s: String) => segment(s))
    (c: Column) => u(c)
  }

  /** Column form of [[segmentFull]] (ik_max_word shape). */
  val tokenizeCjkFull: Column => Column = {
    val u = udf((s: String) => segmentFull(s))
    (c: Column) => u(c)
  }
}
