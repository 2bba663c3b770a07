package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Robots]] — RFC 9309 group formation, two-tier agent
  * resolution, longest-match/Allow-wins prevailing, and the
  * no-rule/no-match defaults — on the shared fixture and hand-built
  * files.
  */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rules = Robots.parseRobots(Robots.fixture(spark))

  private def gate(urls: (Long, String)*): Map[Long, (Option[String], Boolean)] =
    Robots.applyRobots(urls.toDF("doc_id", "url"), rules, "crawler-x")
      .select(col("doc_id"), col("matched_path"), col("allowed"))
      .as[(Long, Option[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("parse: groups form per RFC; comments and unknown keys drop") {
    val got = rules.as[(String, String, String, String)].collect().toSet
    // example.com: crawler-x group has 2 rules; * group has 1
    assert(got.filter(r => r._1 == "example.com" && r._2 == "crawler-x")
      .map(r => (r._3, r._4)) ===
      Set(("disallow", "/docs/article-1"), ("allow", "/docs/article-12")))
    assert(got.filter(r => r._1 == "example.com" && r._2 == "*")
      .map(r => (r._3, r._4)) === Set(("disallow", "/docs")))
    // cdn: BOTH consecutive agent lines share the one rule
    assert(got.filter(_._1 == "cdn.example.org").map(_._2) ===
      Set("legacybot", "crawler-x"))
  }

  test("longest prefix wins; Allow rescues the more specific path") {
    val m = gate(
      1L -> "https://example.com/docs/article-1?page=0", // disallow /docs/article-1
      2L -> "https://example.com/docs/article-12?page=5", // allow (longer)
      3L -> "https://example.com/docs/article-17?page=3", // prefix of -1 rule
      4L -> "https://example.com/other") // no match -> allowed
    assert(m(1L) === ((Some("/docs/article-1"), false)))
    assert(m(2L) === ((Some("/docs/article-12"), true)))
    assert(m(3L) === ((Some("/docs/article-1"), false)))
    assert(m(4L) === ((None, true)))
  }

  test("exact-agent group beats *, which applies only where no exact group exists") {
    val m = gate(
      // example.com HAS a crawler-x group: the * Disallow /docs must
      // NOT apply — /docs/article-7 has no crawler-x match -> allowed
      1L -> "https://example.com/docs/article-7?x=1",
      // news has only *: its rules apply to crawler-x
      2L -> "https://news.example.com/docs/article-33?p=2", // allow wins (longest)
      3L -> "https://news.example.com/docs/article-35?p=2") // /docs/article-3 prefix
    assert(m(1L) === ((None, true)))
    assert(m(2L) === ((Some("/docs/article-33"), true)))
    assert(m(3L) === ((Some("/docs/article-3"), false)))
  }

  test("consecutive agent lines share rules; absent group means allowed") {
    val m = gate(
      1L -> "https://cdn.example.org/docs/article-2", // Disallow / via shared group
      2L -> "https://blog.sample.net/anything") // only otherbot group -> allowed
    assert(m(1L) === ((Some("/"), false)))
    assert(m(2L) === ((None, true)))
  }

  test("Sitemap records: group-independent, case-insensitive, multiple per file") {
    // fixture: 3 of 4 hosts advertise; cdn's record sits INSIDE the
    // agent run and must not have split it (asserted above)
    val fx = Robots.sitemapDirectives(Robots.fixture(spark))
      .as[(String, String)].collect().toSet
    assert(fx === Set(
      ("example.com", "https://example.com/sitemap.xml"),
      ("news.example.com", "https://news.example.com/sitemap.xml"),
      ("cdn.example.org", "https://cdn.example.org/sitemap.xml")))
    // hand-built: case-insensitive key, several records, value-less
    // record drops, directive URL's colon survives the key split
    val own = Robots.sitemapDirectives(Seq(
      ("x.com", "SITEMAP: https://x.com/a.xml\nUser-agent: *\n" +
        "Disallow: /\nsitemap: https://cdn.x.com/b.xml\nSitemap:"))
      .toDF("host", "robots_txt"))
      .as[(String, String)].collect().toSet
    assert(own === Set(
      ("x.com", "https://x.com/a.xml"),
      ("x.com", "https://cdn.x.com/b.xml")))
  }

  test("crawlDelays: exact beats *, max of a group, numeric-only, wrong-agent host absent") {
    val d = Robots.crawlDelays(Robots.delayFixture(spark), "crawler-x")
      .as[(String, Double)].collect().toMap
    // exact-agent group (1, 2 -> max 2) wins over the * group's 10
    assert(d("example.com") === 2.0)
    // only a * group; fractional value parses
    assert(d("news.example.com") === 1.5)
    // shared agent run (legacybot + crawler-x): the delay applies to
    // both; the non-numeric 'fast' drops; the Disallow line is
    // invisible to this extractor (and the run doesn't split on it)
    assert(d("cdn.example.org") === 3.0)
    // only another agent's group and no * fallback -> no row at all
    assert(!d.contains("blog.sample.net"))
    assert(d.size === 3)
    // host-case normalization + a crawl-delay BEFORE any agent line
    // belongs to no group and drops
    val own = Robots.crawlDelays(Seq(
      ("X.com", "Crawl-delay: 7\nUser-agent: crawler-x\nCRAWL-DELAY: 4"))
      .toDF("host", "robots_txt"), "crawler-x")
      .as[(String, Double)].collect().toMap
    assert(own === Map("x.com" -> 4.0))
  }

  test("empty-path Disallow matches nothing; host normalization strips case/port") {
    val own = Robots.parseRobots(Seq(
      ("x.com", "User-agent: *\nDisallow:\nDisallow: /a"))
      .toDF("host", "robots_txt"))
    val m = Robots.applyRobots(
        Seq((1L, "https://X.com:8080/b"), (2L, "https://x.com/a/b"))
          .toDF("doc_id", "url"), own, "anybot")
      .select(col("doc_id"), col("allowed"))
      .as[(Long, Boolean)].collect().toMap
    assert(m(1L) === true)
    assert(m(2L) === false)
  }
}
