package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sitemap.xml parsing and crawl-coverage auditing — the OTHER
  * crawl-control file (sitemaps.org protocol; [[Robots]] covers RFC
  * 9309): a site publishes the URLs it WANTS crawled with optional
  * `lastmod`/`changefreq` hints, and a crawl pipeline audits its
  * frontier against them — which listed pages are already in the
  * corpus, which are missing, and in what order to (re)fetch the
  * rest. Like robots files, sitemaps are a tiny per-authority corpus
  * (broadcast side); the crawl's canonical-URL set is the
  * corpus-scale side, so the audit is one broadcast join against the
  * URL-dedup keepers.
  *
  * Supported subset, documented: `<url>` blocks with `<loc>`
  * (required; entries without one are dropped per the protocol) and
  * optional `<lastmod>`/`<changefreq>`; `<sitemapindex>` nesting is a
  * fetch-layer concern (the harness feeds leaf sitemaps, the way it
  * feeds robots bodies). Parsing is the [[Html.extractAnchors]]
  * shape: one regexp pass pulls whole blocks, per-block projections
  * split the fields — map-side, no shuffle.
  */
object Sitemaps {

  /** Deterministic per-host sitemap fixture over the t56 URL space —
    * shared VERBATIM with the SQL oracle (the rows ARE the fixture;
    * both engines parse the same bytes). Listed locs canonicalize
    * onto real page buckets (crawled); the first three hosts also
    * carry one far-bucket loc no corpus reaches (uncrawled — the
    * fetch-frontier case); deliberate canonicalization dirt (WWW.,
    * :443, tracking params) and one edge per family: a missing
    * lastmod, a missing changefreq, a `never` changefreq, and a
    * loc-less block that must drop.
    */
  val fixtureRows: Seq[(String, String)] = Seq(
    "example.com" -> Seq(
      "<urlset>",
      "<url><loc>https://WWW.Example.COM:443/docs/article-0?page=0" +
        "&amp;utm_source=sm</loc>" +
        "<lastmod>2024-01-05</lastmod>" +
        "<changefreq>daily</changefreq></url>",
      "<url><loc>https://Example.COM:8080/docs/article-4?page=4</loc>" +
        "<lastmod>2024-02-11</lastmod></url>",
      "<url><loc>https://example.com:8080/docs/article-40004?page=3" +
        "</loc><changefreq>yearly</changefreq></url>",
      "<url><lastmod>2024-03-01</lastmod></url>",
      "</urlset>").mkString("\n"),
    "news.example.com" -> Seq(
      "<urlset>",
      "<url><loc>https://news.example.com:8080/docs/article-1?page=1" +
        "</loc><lastmod>2024-03-09</lastmod>" +
        "<changefreq>hourly</changefreq></url>",
      "<url><loc>https://news.example.com:443/docs/article-5?page=5" +
        "</loc><lastmod>2023-12-30</lastmod></url>",
      "<url><loc>https://news.example.com:8080/docs/article-40001" +
        "?page=4</loc></url>",
      "</urlset>").mkString("\n"),
    "cdn.example.org" -> Seq(
      "<urlset>",
      "<url><loc>https://cdn.example.org:8080/docs/article-2?page=2" +
        "</loc><lastmod>2024-01-20</lastmod></url>",
      "<url><loc>https://cdn.example.org:8080/docs/article-40002" +
        "?page=5</loc><lastmod>2024-04-02</lastmod></url>",
      "</urlset>").mkString("\n"),
    "blog.sample.net" -> Seq(
      "<urlset>",
      "<url><loc>https://blog.sample.net:8080/docs/article-3?page=3" +
        "</loc><changefreq>weekly</changefreq></url>",
      "<url><loc>https://blog.sample.net:8080/docs/article-19?page=5" +
        "</loc><lastmod>2024-01-02</lastmod>" +
        "<changefreq>never</changefreq></url>",
      "</urlset>").mkString("\n"))

  def fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtureRows.toDF("host", "sitemap_xml")
  }

  /** sitemap files → one row per listed URL: (host, loc, lastmod,
    * changefreq). The `&amp;` entity in `loc` decodes — the protocol
    * XML-escapes locs, and `&` is the only escaped character a VALID
    * URL can carry literally (`<`/`>`/quotes are percent-encoded in
    * URLs, so their entities never appear in a well-formed loc);
    * blocks without a `<loc>` drop; missing optional fields are null.
    * One regexp pass per file + per-block projections, all map-side.
    */
  def parseSitemap(sitemaps: DataFrame, hostCol: String = "host",
                   xmlCol: String = "sitemap_xml"): DataFrame = {
    def field(el: Column, tag: String): Column = {
      val v = regexp_extract(el, s"(?s)<$tag>(.*?)</$tag>", 1)
      when(length(v) > 0, v).otherwise(lit(null).cast("string"))
    }
    sitemaps.select(col(hostCol).as("host"),
        explode(regexp_extract_all(col(xmlCol),
          lit("(?s)<url>.*?</url>"), lit(0))).as("el"))
      .select(col("host"),
        replace(field(col("el"), "loc"), lit("&amp;"), lit("&"))
          .as("loc"),
        field(col("el"), "lastmod").as("lastmod"),
        field(col("el"), "changefreq").as("changefreq"))
      .filter(col("loc").isNotNull)
  }

  /** The crawl-coverage audit: every sitemap-listed URL against the
    * crawl's canonical-URL set — `crawled` per listed loc, plus the
    * per-host fetch-priority rank (uncrawled first, then freshest
    * lastmod, then loc — the order a frontier would schedule). The
    * parsed sitemap side is per-authority tiny (broadcast); the crawl
    * side is the corpus-scale canonical set, already deduped —
    * at 100 TB this is one broadcast hash join against the URL-dedup
    * keepers table, no shuffle of the corpus.
    */
  def coverageAudit(parsed: DataFrame, crawledCanon: DataFrame,
                    canonCol: String = "canon_url"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val listed = parsed.withColumn("canon_loc",
      Urls.canonicalUrl(col("loc")))
    // Two broadcast passes so the corpus side never shuffles: a
    // map-side LEFT SEMI against the broadcast listed keys cuts the
    // corpus down to the (tiny) hit set, then the hit set broadcasts
    // back onto the listed rows. (A plain left join with `listed` on
    // the preserved side could not broadcast the small side — left
    // outer only broadcasts the right — and would sort-merge the
    // corpus instead.)
    val keys = listed.select(col("canon_loc")).distinct()
    val hits = crawledCanon.select(col(canonCol).as("canon_loc"))
      .join(broadcast(keys), Seq("canon_loc"), "leftsemi")
      .distinct()
      .withColumn("_hit", lit(true))
    val joined = listed
      .join(broadcast(hits), Seq("canon_loc"), "left")
      .select(col("host"), col("loc"), col("canon_loc"),
        col("lastmod"), col("changefreq"),
        coalesce(col("_hit"), lit(false)).as("crawled"))
    val w = Window.partitionBy(col("host")).orderBy(
      col("crawled").asc,
      coalesce(col("lastmod"), lit("0000-00-00")).desc,
      col("loc").asc)
    joined.withColumn("fetch_rank", row_number().over(w))
  }

  /** sitemaps.org `changefreq` hints as refetch intervals, in
    * seconds; `never` maps to no interval (never redue).
    */
  val FreqSeconds: Map[String, Long] = Map(
    "always" -> 0L, "hourly" -> 3600L, "daily" -> 86400L,
    "weekly" -> 604800L, "monthly" -> 2592000L, "yearly" -> 31536000L)

  /** Re-fetch scheduling over the CRAWLED half of a [[coverageAudit]]
    * (the uncrawled half is [[discoveryFrontier]]'s business): per
    * listed crawled page, `next_due_s = lastmod + changefreq` as
    * EPOCH SECONDS via pure date-day arithmetic (no timezone in the
    * chain — `lastmod` is a date, the epoch is day-count × 86400), a
    * `due` flag against the `asOf` date, and the per-host refetch
    * order (due first, most-stale first, unknown-lastmod pages ahead
    * of dated ones — no lastmod means assume maximally stale). A
    * missing OR unrecognized `changefreq` falls back to `defaultFreq`
    * (the hint is optional and free-text in the wild — an unknown
    * string must not poison the due flag into SQL NULL, whose
    * ordering differs across engines); `never` pages are never due.
    * Map-side per row + one file-sized rank window, like everything
    * on this side of the audit.
    */
  def refetchSchedule(audit: DataFrame, asOf: String,
                      defaultFreq: String = "monthly"): DataFrame = {
    require(FreqSeconds.contains(defaultFreq),
      s"defaultFreq must be one of ${FreqSeconds.keys}, got $defaultFreq")
    import org.apache.spark.sql.expressions.Window
    val asOfS = java.time.LocalDate.parse(asOf).toEpochDay * 86400L
    val known = (FreqSeconds.keys.toSeq :+ "never").sorted
    val eff = when(col("changefreq").isin(known: _*), col("changefreq"))
      .otherwise(lit(defaultFreq))
    val secs = FreqSeconds.foldLeft(lit(null).cast("long")) {
      case (acc, (k, v)) => when(eff === k, lit(v)).otherwise(acc)
    }
    val lastmodS = datediff(to_date(col("lastmod")),
      to_date(lit("1970-01-01"))).cast("long") * 86400L
    val nextDue = when(col("lastmod").isNotNull && secs.isNotNull,
      lastmodS + secs)
    val due = when(eff === "never", lit(false))
      .when(col("lastmod").isNull, lit(true))
      .otherwise(nextDue <= lit(asOfS))
    audit.filter(col("crawled"))
      .select(col("host"), col("loc"), col("canon_loc"),
        col("lastmod"), eff.as("eff_freq"),
        nextDue.as("next_due_s"), due.as("due"))
      .withColumn("refetch_rank", row_number().over(
        Window.partitionBy(col("host")).orderBy(
          col("due").desc,
          coalesce(col("next_due_s"), lit(Long.MinValue)).asc,
          col("loc").asc)))
  }

  /** Politeness scheduling — the fetch-EXECUTION edge of the crawl
    * loop: turn a per-host fetch rank ([[coverageAudit]]'s
    * `fetch_rank` / [[frontierFromGated]]'s `fetch_order`) into
    * per-URL start offsets under each host's Crawl-delay
    * ([[Robots.crawlDelays]]), one queue per host — the i-th fetch of
    * a host starts at `(rank − 1) · delay` seconds, hosts in
    * parallel. Hosts with no effective delay record take
    * `defaultDelayS`. A broadcast of the file-sized delay table + a
    * pure projection: the ranked frame (corpus-scale in a real
    * frontier) never shuffles.
    */
  def politenessSchedule(ranked: DataFrame, delays: DataFrame,
                         defaultDelayS: Double,
                         rankCol: String = "fetch_rank"): DataFrame =
    ranked.join(broadcast(delays), Seq("host"), "left")
      .withColumn("delay_s",
        coalesce(col("delay_s"), lit(defaultDelayS)))
      .withColumn("offset_s",
        (col(rankCol) - 1).cast("double") * col("delay_s"))

  /** The corpus-INDEPENDENT half of the discovery loop: robots.txt
    * advertises sitemaps ([[Robots.sitemapDirectives]] — only
    * advertised files are considered), the advertised sitemaps list
    * URLs, and the robots GATE marks each listed loc fetchable or not
    * (gating the LISTED side is equivalent to gating the frontier —
    * allowedness doesn't depend on crawledness — and keeps the
    * corpus-scale audit subtree out of the gate entirely). Everything
    * here is file-sized; in a deployment this frame is an
    * [[graft.core.Artifacts]] table built once per robots/sitemap
    * release, so the per-query cost of the loop is the audit's one
    * corpus semi-join (the t59 staging discipline — t64 serves it
    * staged).
    */
  def gatedListed(robots: DataFrame, sitemapFiles: DataFrame,
                  agent: String): DataFrame = {
    val discovered = Robots.sitemapDirectives(robots)
      .select(lower(regexp_extract(col("sitemap_url"),
        "^[A-Za-z]+://([^/?#:]*)", 1)).as("host")).distinct()
    val parsed = parseSitemap(
      sitemapFiles.join(broadcast(discovered), Seq("host"), "leftsemi"))
    // gate DISTINCT locs: a loc listed in several advertised sitemap
    // files (or twice in one) must contribute ONE row to the allowed
    // side, else the loc-keyed join below multiplies listings n²
    val allowed = Robots.applyRobots(
        parsed.select(col("loc")).distinct()
          .select(col("loc").as("u_id"), col("loc")),
        Robots.parseRobots(robots), agent,
        idCol = "u_id", urlCol = "loc")
      .select(col("u_id"), col("allowed"))
    parsed.join(broadcast(allowed), parsed("loc") === allowed("u_id"))
      .select(col("host"), col("loc"), col("lastmod"),
        col("changefreq"), col("allowed"))
  }

  /** The corpus-scale half: audit the gated listed locs against the
    * crawled canonical set, keep the allowed uncrawled ones, rank per
    * host by freshness — one broadcast semi-join over the corpus plus
    * file-sized windows.
    */
  def frontierFromGated(gated: DataFrame, crawledCanon: DataFrame,
                        canonCol: String = "canon_url"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    coverageAudit(gated.filter(col("allowed"))
        .select(col("host"), col("loc"), col("lastmod"),
          col("changefreq")),
        crawledCanon, canonCol)
      .filter(!col("crawled"))
      .select(col("host"), col("loc"), col("canon_loc"), col("lastmod"))
      .withColumn("fetch_order", row_number().over(
        Window.partitionBy(col("host")).orderBy(
          coalesce(col("lastmod"), lit("0000-00-00")).desc,
          col("loc").asc)))
  }

  /** The crawl-control DISCOVERY loop, composed end to end:
    * [[gatedListed]] (discovery + gate, file-sized) into
    * [[frontierFromGated]] (the corpus audit). A listed URL may be
    * disallowed — discovered ≠ fetchable.
    */
  def discoveryFrontier(robots: DataFrame, sitemapFiles: DataFrame,
                        crawledCanon: DataFrame, agent: String,
                        canonCol: String = "canon_url"): DataFrame =
    frontierFromGated(gatedListed(robots, sitemapFiles, agent),
      crawledCanon, canonCol)
}
