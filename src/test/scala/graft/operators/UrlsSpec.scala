package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Urls.canonicalUrl]]'s 6 rules on hand-written URLs, the
  * registrable-domain heuristic, and the dedup keeper rule.
  */
class UrlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalUrl(col("u")).as("c"))
      .as[String].head()

  test("case, www, default port, fragment, tracking params all normalize") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/B?utm_source=x&id=3#frag")
      === "https://example.com/A/B?id=3")
    // path case is PRESERVED (paths are case-sensitive; hosts aren't)
    assert(canon("https://news.example.com:8080/Path")
      === "https://news.example.com:8080/Path")
    assert(canon("http://example.com:80/") === "http://example.com/")
    // :443 is only default for https — http keeps it
    assert(canon("http://example.com:443/x")
      === "http://example.com:443/x")
  }

  test("query handling: order kept, all-tracking query drops the '?'") {
    assert(canon("https://a.com/p?b=2&a=1") === "https://a.com/p?b=2&a=1")
    assert(canon("https://a.com/p?utm_medium=m&gclid=g&fbclid=f")
      === "https://a.com/p")
    // utm_ prefix matches any utm param; non-utm 'utmost' survives
    assert(canon("https://a.com/p?utmost=1") === "https://a.com/p?utmost=1")
  }

  test("empty path becomes '/'") {
    assert(canon("https://a.com") === "https://a.com/")
    assert(canon("https://a.com?x=1") === "https://a.com/?x=1")
  }

  test("registrable domain is the last two host labels") {
    def dom(u: String) = Seq(u).toDF("u")
      .select(Urls.registrableDomain(col("u")).as("d")).as[String].head()
    assert(dom("https://www.news.example.com:8080/x") === "example.com")
    assert(dom("https://a.com/x") === "a.com")
  }

  test("dedup keeper: smallest id per canonical group, variants collapse") {
    val rows = Seq(
      (1L, "https://WWW.A.com:443/p?utm_source=x"),
      (2L, "https://a.com/p"), // same canonical as 1
      (3L, "https://a.com/q")) // different
      .toDF("doc_id", "url")
    val byId = Urls.urlDedupReport(rows)
      .select("doc_id", "canon_url", "keeper")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 === byId(2L)._1)
    assert(byId(1L)._2 === true)
    assert(byId(2L)._2 === false)
    assert(byId(3L)._2 === true)
  }

  test("synthesized payload: each 3-id bucket collapses to one keeper, buckets never merge") {
    val docs = (0L until 24L).map(i => Tuple1(i)).toDF("doc_id")
    val rep = Urls.urlDedupReport(Urls.withUrlPayload(docs))
      .select("doc_id", "canon_url", "keeper")
      .as[(Long, String, Boolean)].collect()
    // raw URLs differ within a bucket (casing/www/tracking/fragment)…
    val raw = Urls.withUrlPayload(docs).select("url")
      .as[String].collect()
    assert(raw.distinct.length === raw.length)
    // …but the canonical form is one per bucket
    val byBucket = rep.groupBy(_._1 / 3)
    byBucket.foreach { case (b, rows) =>
      assert(rows.map(_._2).distinct.length === 1, s"bucket $b")
      assert(rows.filter(_._3).map(_._1).toSeq === Seq(rows.map(_._1).min),
        s"bucket $b keeper")
    }
    assert(rep.map(_._2).distinct.length === byBucket.size,
      "distinct buckets never merge")
  }

  private def pslOf(urls: (Long, String)*): Map[Long, (String, Option[String])] =
    Urls.registrableDomainPsl(urls.toDF("doc_id", "url"),
        Urls.pslRules(spark))
      .select("doc_id", "public_suffix", "registrable")
      .as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("PSL: plain rules — longest match wins over the shorter TLD") {
    val m = pslOf(
      1L -> "https://shop.example.co.uk/x", // co.uk beats uk
      2L -> "https://example.com/x",
      3L -> "https://media.github.io/x") // private registry beats io
    assert(m(1L) === ("co.uk", Some("example.co.uk")))
    assert(m(2L) === ("com", Some("example.com")))
    assert(m(3L) === ("github.io", Some("media.github.io")))
  }

  test("PSL: wildcard rule matches one label at any depth") {
    val m = pslOf(
      1L -> "https://a.b.example.kobe.jp/x", // *.kobe.jp
      2L -> "https://example.kobe.jp/x") // host IS the public suffix
    assert(m(1L) === ("example.kobe.jp", Some("b.example.kobe.jp")))
    assert(m(2L) === ("example.kobe.jp", None))
  }

  test("PSL: exception rules beat wildcard and longest-match") {
    val m = pslOf(
      1L -> "https://city.kobe.jp/x", // !city.kobe.jp
      2L -> "https://x.www.ck/x") // !www.ck vs *.ck
    assert(m(1L) === ("kobe.jp", Some("city.kobe.jp")))
    assert(m(2L) === ("ck", Some("www.ck")))
  }

  test("PSL: unknown TLD falls back to the implicit * rule; bare suffix has no registrable") {
    val m = pslOf(
      1L -> "https://weird.unknowntld/x",
      2L -> "https://uk/x",
      3L -> "https://unknowntld/x") // single unknown label
    assert(m(1L) === ("unknowntld", Some("weird.unknowntld")))
    assert(m(2L) === ("uk", None))
    assert(m(3L) === ("unknowntld", None))
  }

  test("PSL: host casing and ports normalize before matching") {
    val m = pslOf(1L -> "https://Shop.Example.CO.UK:8443/x")
    assert(m(1L) === ("co.uk", Some("example.co.uk")))
  }
}
