package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Html]]'s 6-rule extraction on hand-written payloads: script/
  * style/comment bodies must vanish (including `<`/`>` inside code),
  * nested tags strip cleanly, entities decode in the conventional
  * order (&amp; last), whitespace collapses, and the empty-document
  * edge yields '' with a 0.0 ratio — never null.
  */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .as[String].head()

  test("script/style/comment bodies are dropped, not stripped into text") {
    assert(extract("<body><script>var a = 1 < 2 && 3 > 2;</script>" +
      "Hello</body>") === "Hello")
    assert(extract("<style>p { color: red; }</style>World") === "World")
    assert(extract("A<!-- hidden 42 -->B") === "A B")
    // multi-line block with attributes — the (?s) dotall contract
    assert(extract("<script type=\"x\">\nline1\nline2\n</script>ok")
      === "ok")
  }

  test("nested tags strip cleanly and spacing prevents word-welding") {
    assert(extract("<div><div class=\"inner\"><p>deep</p></div></div>")
      === "deep")
    assert(extract("<p>one</p><p>two</p>") === "one two")
  }

  test("entities decode after the strip, &amp; last") {
    assert(extract("<p>Q&amp;A &lt;doc&gt; &quot;x&#39;s&quot;</p>")
      === "Q&A <doc> \"x's\"")
  }

  test("empty document edge: empty text, 0.0 ratio, never null") {
    val report = Html.extractionReport(
      Seq((1L, "<html><body></body></html>")).toDF("doc_id", "html"))
    val row = report.select("extracted", "n_tags", "text_len",
        "markup_ratio")
      .as[(String, Long, Long, Double)].head()
    assert(row === (("", 4L, 0L, 0.0)))
  }

  test("the synthesized payload exercises every edge family") {
    val docs = Seq(
      (0L, "zero mod three five thirteen"), // %3, %5, %13: all variants
      (1L, "plain"),
      (3L, "nested"),
      (5L, "script two"),
      (13L, "empty body")).toDF("doc_id", "text")
    val rep = Html.extractionReport(Html.withHtmlPayload(docs))
      .select("doc_id", "extracted")
      .as[(Long, String)].collect().toMap
    // body text present with entities decoded; title + nav boilerplate
    // ride every row (title IS text under the 6-rule strip — that's
    // what a markup-ratio gate exists to penalize)
    assert(rep(1L) === "Doc 1 Home & About Q&A <doc> plain")
    assert(rep(3L) === "Doc 3 Home & About Q&A <doc> nested")
    // the second script's `a < b && b > c` must NOT leak
    assert(rep(5L) === "Doc 5 Home & About Q&A <doc> script two")
    // empty body: only the boilerplate survives
    assert(rep(13L) === "Doc 13 Home & About")
    // id 0 is %3 AND %5 AND %13 at once: empty nested body + 2 scripts
    assert(rep(0L) === "Doc 0 Home & About")
  }

  test("the report is one map-side projection — no shuffle in the plan") {
    val plan = Html.extractionReport(
        Html.withHtmlPayload(Seq((1L, "t")).toDF("doc_id", "text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("extractLinks pulls every href in document order, nothing else") {
    val html = """<a href="https://a.com/x">one</a> text
      |<a class="z" href="bad">skipped: href not first attr form</a>
      |<a href="https://b.com/y?q=1#f">two</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(Html.extractLinks(col("h")).as("l"))
      .as[Seq[String]].head()
    assert(got === Seq("https://a.com/x", "https://b.com/y?q=1#f"))
  }

  test("linked payload: 2 hrefs per doc; link and target canonicalize to one node") {
    val docs = (0L until 12L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val links = Html.withLinkedHtmlPayload(docs)
      .select(col("doc_id"), explode(Html.extractLinks(col("html"))).as("href"))
    assert(links.count() === 24)
    // doc 0's first href targets bucket (0*7+1)%97 = 1: the canonical
    // form must equal the canonical of a page whose OWN bucket is 1
    // (ids 3..5 have bucket 1 in withUrlPayload's id/3 scheme)
    val linkCanon = links.filter(col("doc_id") === 0)
      .select(Urls.canonicalUrl(col("href")).as("c"))
      .as[String].collect().head
    val ownCanon = Urls.withUrlPayload(Seq((3L, "x")).toDF("doc_id", "text"))
      .select(Urls.canonicalUrl(col("url")).as("c")).as[String].head()
    assert(linkCanon === ownCanon)
    // the www + tracking variant really was dirty before canonicalizing
    val rawHref = links.filter(col("doc_id") === 0).as[(Long, String)]
      .collect().head._2
    assert(rawHref.contains("www.") && rawHref.contains("utm_source=link"))
    assert(rawHref !== linkCanon)
  }

  test("extractAnchors pairs each href with its tag-stripped anchor text") {
    val html = """<a href="https://a.com/x">one <b>bold</b></a> mid
      |<a href="https://b.com/y" class="z">two
      |lines</a><a href="https://c.com">three</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .as[(String, String)].collect().toSeq
    assert(got === Seq(
      ("https://a.com/x", "one bold"),   // inner tags strip to spaces
      ("https://b.com/y", "two lines"),  // newlines collapse
      ("https://c.com", "three")))       // adjacent anchors don't merge
  }

  test("linked payload anchors: construction math = extraction, bucket-varied text") {
    val docs = (0L until 12L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val anchors = Html.withLinkedHtmlPayload(docs)
      .select(col("doc_id"),
        explode(Html.extractAnchors(col("html"))).as("a"))
      .select(col("doc_id"), col("a.href"), col("a.anchor"))
      .as[(Long, String, String)].collect().toSeq
    assert(anchors.size === 24, "two anchors per doc")
    // doc 0: b1 = 1 -> host news.example.com, b1 % 7 = 1;
    //        b2 = 5 -> host news.example.com, b2 % 5 = 0
    val d0 = anchors.filter(_._1 == 0L).map(_._3)
    assert(d0 === Seq("see news.example.com page 1", "ref item 0"))
    // text varies across buckets (the t61 grouping has real variety)
    assert(anchors.map(_._3).distinct.size > 4)
  }
}
