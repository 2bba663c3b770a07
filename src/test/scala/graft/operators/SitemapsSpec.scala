package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Sitemaps]] — `<url>` block parsing (loc required, optional
  * fields null, entity decode), the coverage audit's crawled flag via
  * the canonicalization chain, and the per-host fetch-priority order
  * (uncrawled first, then freshest lastmod, then loc).
  */
class SitemapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parsed = Sitemaps.parseSitemap(Sitemaps.fixture(spark))

  test("parse: one row per url block; loc-less blocks drop; optional fields null") {
    val got = parsed
      .as[(String, String, Option[String], Option[String])].collect()
    // example.com fixture has 4 blocks but one has no <loc>
    assert(got.count(_._1 == "example.com") === 3)
    assert(got.length === 10)
    // &amp; in loc decodes
    val a0 = got.find(_._2.contains("article-0")).get
    assert(a0._2.contains("page=0&utm_source=sm"))
    assert(a0._3 === Some("2024-01-05"))
    assert(a0._4 === Some("daily"))
    // missing optional fields are null, not empty
    val a4 = got.find(_._2.contains("article-4?")).get
    assert(a4._3 === Some("2024-02-11") && a4._4 === None)
    val a3 = got.find(_._2.contains("article-3")).get
    assert(a3._3 === None && a3._4 === Some("weekly"))
  }

  test("audit: crawled flag via canonicalization; dirt (WWW., :443, utm) matches") {
    val crawled = Seq(
      "https://example.com/docs/article-0?page=0",
      "https://example.com:8080/docs/article-4?page=4")
      .toDF("canon_url")
    val m = Sitemaps.coverageAudit(parsed, crawled)
      .filter(col("host") === "example.com")
      .select(col("loc"), col("crawled"))
      .as[(String, Boolean)].collect().toMap
    // WWW. + :443 + utm_source dirt all canonicalize onto the hit
    assert(m.keys.count(_.contains("article-0")) === 1)
    assert(m.find(_._1.contains("article-0")).get._2 === true)
    assert(m.find(_._1.contains("article-4?")).get._2 === true)
    assert(m.find(_._1.contains("article-40004")).get._2 === false)
  }

  test("fetch rank: uncrawled first, then freshest lastmod, then loc; per host") {
    val crawled = Seq(
      "https://news.example.com:8080/docs/article-1?page=1",
      "https://news.example.com/docs/article-5?page=5")
      .toDF("canon_url")
    val ranks = Sitemaps.coverageAudit(parsed, crawled)
      .filter(col("host") === "news.example.com")
      .select(col("loc"), col("fetch_rank"))
      .as[(String, Int)].collect().toMap
    // uncrawled article-40001 schedules first; then the two crawled
    // by lastmod desc (2024-03-09 before 2023-12-30)
    assert(ranks.find(_._1.contains("article-40001")).get._2 === 1)
    assert(ranks.find(_._1.contains("article-1?")).get._2 === 2)
    assert(ranks.find(_._1.contains("article-5?")).get._2 === 3)
  }

  test("refetch schedule: never never dues; unknown lastmod is maximally stale; day math") {
    val crawled = Seq(
      "https://blog.sample.net:8080/docs/article-3?page=3",
      "https://blog.sample.net:8080/docs/article-19?page=5",
      "https://example.com/docs/article-0?page=0",
      "https://example.com:8080/docs/article-4?page=4")
      .toDF("canon_url")
    val audit = Sitemaps.coverageAudit(parsed, crawled)
    val got = Sitemaps.refetchSchedule(audit, asOf = "2024-02-20")
      .select(col("loc"), col("eff_freq"), col("next_due_s"),
        col("due"), col("refetch_rank"))
      .as[(String, String, Option[Long], Boolean, Int)].collect()
      .map(r => r._1.replaceAll(".*article-(\\d+).*", "$1") ->
        ((r._2, r._3, r._4, r._5))).toMap
    // uncrawled listed pages are not scheduled
    assert(!got.contains("40004"))
    // never: no due date, never due, ranks after the weekly-no-lastmod
    assert(got("19") === (("never", None, false, 2)))
    // weekly with no lastmod: due, unknown staleness ranks first
    assert(got("3") === (("weekly", None, true, 1)))
    // daily from 2024-01-05: epoch day 19727 * 86400 + 86400
    assert(got("0") === (("daily", Some(19727L * 86400 + 86400), true, 1)))
    // missing changefreq defaults to monthly; 2024-02-11 + 30d is
    // past the as-of date -> not due
    assert(got("4")._1 === "monthly" && !got("4")._3)
  }

  test("refetch: an unrecognized changefreq string falls back to the default") {
    val audit = Sitemaps.coverageAudit(
      Sitemaps.parseSitemap(Seq(("x.com",
        "<urlset><url><loc>https://x.com/a</loc>" +
          "<lastmod>2024-01-01</lastmod>" +
          "<changefreq>fortnightly</changefreq></url></urlset>"))
        .toDF("host", "sitemap_xml")),
      Seq("https://x.com/a").toDF("canon_url"))
    val r = Sitemaps.refetchSchedule(audit, asOf = "2024-02-20")
      .select(col("eff_freq"), col("due")).as[(String, Boolean)]
      .collect().head
    // monthly from 2024-01-01 -> due; crucially `due` is a real
    // boolean, not NULL (null ordering diverges across engines)
    assert(r === (("monthly", true)))
  }

  test("audit plan: corpus side never shuffles — semi-join + final join both broadcast") {
    val crawled = Seq("https://example.com/docs/article-0?page=0")
      .toDF("canon_url")
    val plan = Sitemaps.coverageAudit(parsed, crawled)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
    // the only sort-merge allowed is none: the corpus leg must not
    // exchange on canon_loc
    assert(!plan.contains("SortMergeJoin"))
  }

  test("politenessSchedule: per-host queues, (rank-1)*delay offsets, default for missing hosts") {
    val ranked = Seq(
      ("a.com", "https://a.com/1", 1), ("a.com", "https://a.com/2", 2),
      ("a.com", "https://a.com/3", 3),
      ("b.net", "https://b.net/1", 1), ("b.net", "https://b.net/2", 2))
      .toDF("host", "loc", "fetch_rank")
    val delays = Seq(("a.com", 2.5)).toDF("host", "delay_s")
    val out = Sitemaps.politenessSchedule(ranked, delays,
        defaultDelayS = 4.0)
      .select(col("host"), col("loc"), col("delay_s"), col("offset_s"))
      .as[(String, String, Double, Double)].collect().toSet
    assert(out === Set(
      ("a.com", "https://a.com/1", 2.5, 0.0),
      ("a.com", "https://a.com/2", 2.5, 2.5),
      ("a.com", "https://a.com/3", 2.5, 5.0),
      ("b.net", "https://b.net/1", 4.0, 0.0),
      ("b.net", "https://b.net/2", 4.0, 4.0)))
    // scale shape: the delay table broadcasts; the ranked frame (the
    // corpus-scale side in a real frontier) must not exchange
    val plan = Sitemaps.politenessSchedule(ranked, delays, 4.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("gatedListed: a loc listed twice gates once per LISTING, never n²") {
    // the robots gate must evaluate each DISTINCT loc once — an
    // allowed side keyed per parsed row would join a loc listed n
    // times against n allowed rows, multiplying listings to n² output
    val robots = Seq(("a.com", Seq(
      "Sitemap: https://a.com/s1.xml",
      "Sitemap: https://a.com/s2.xml",
      "User-agent: *",
      "Disallow: /private").mkString("\n"))).toDF("host", "robots_txt")
    // /dup listed TWICE in s1 and again in s2 (3 listings total);
    // /private listed once — disallowed but still a gated row
    val files = Seq(
      ("a.com", Seq("<urlset>",
        "<url><loc>https://a.com/dup</loc></url>",
        "<url><loc>https://a.com/dup</loc></url>",
        "<url><loc>https://a.com/private</loc></url>",
        "</urlset>").mkString("\n")),
      ("a.com", Seq("<urlset>",
        "<url><loc>https://a.com/dup</loc></url>",
        "</urlset>").mkString("\n"))).toDF("host", "sitemap_xml")
    val out = Sitemaps.gatedListed(robots, files, "bot")
      .select(col("loc"), col("allowed"))
      .as[(String, Boolean)].collect().toSeq
    assert(out.count(_ == ("https://a.com/dup", true)) === 3)
    assert(out.count(_ == ("https://a.com/private", false)) === 1)
    assert(out.size === 4)
  }
}
