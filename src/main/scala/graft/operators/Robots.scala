package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL gating — the Robots Exclusion Protocol
  * (RFC 9309), the stage before every crawl's stage 0: a fetch
  * frontier must drop disallowed URLs BEFORE fetching, so the gate
  * runs over the URL stream at corpus scale while the rule corpus
  * (one small file per authority) broadcasts.
  *
  * Supported subset, documented: exact agent-token match plus the `*`
  * group (RFC's most-specific-match reduced to two tiers — prefix
  * agent matching is a de-facto extension), path rules as literal
  * prefixes (RFC core; `*`/`$` wildcards are the Google extension),
  * longest-match-wins with Allow beating Disallow on equal length
  * (RFC §2.2.2), unmatched URLs allowed. Group formation follows RFC
  * §2.1: consecutive `User-agent` lines share the rule block that
  * follows; a `User-agent` line after rules starts a new group.
  * `Sitemap:` records (the sitemaps.org discovery extension) are
  * group-independent and surfaced by [[sitemapDirectives]].
  *
  * Everything is relational: line classification is a projection over
  * the exploded file, group formation one per-file running-sum
  * window (files are tiny), the gate a broadcast join + one
  * max-struct per URL — the t57 plan shape.
  */
object Robots {

  /** Deterministic per-host robots.txt fixture over the t56 URL
    * space — shared VERBATIM with the SQL oracle (the rows are the
    * fixture; both engines parse the same bytes). Edge coverage:
    * exact-agent group overriding `*` (example.com), longest-match
    * with Allow rescue (news), consecutive shared agent lines +
    * full-site disallow (cdn), no applicable group at all (blog).
    */
  val fixtureRows: Seq[(String, String)] = Seq(
    "example.com" -> Seq(
      "User-agent: crawler-x",
      "Disallow: /docs/article-1",
      "Allow: /docs/article-12",
      "# comment line",
      "User-agent: *",
      "Disallow: /docs",
      "Sitemap: https://example.com/sitemap.xml").mkString("\n"),
    "news.example.com" -> Seq(
      "Sitemap: https://news.example.com/sitemap.xml",
      "User-agent: *",
      "Disallow: /docs/article-3",
      "Disallow: /docs/article-5",
      "Allow: /docs/article-33").mkString("\n"),
    "cdn.example.org" -> Seq(
      "User-agent: legacybot",
      // a group-independent record INSIDE an agent run — must not
      // split the run (both agents still share the Disallow)
      "Sitemap: https://cdn.example.org/sitemap.xml",
      "User-agent: crawler-x",
      "Disallow: /").mkString("\n"),
    "blog.sample.net" -> Seq(
      "User-agent: otherbot",
      "Disallow: /").mkString("\n"))

  def fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtureRows.toDF("host", "robots_txt")
  }

  /** robots.txt files → one rule row per (host, agent, type, path):
    * lines classify by key (user-agent / allow / disallow, case-
    * insensitive, comments and unknown keys dropped), groups form by
    * the running count of agent-run starts, and each group's agent
    * lines cross its rule lines. Empty-path rules (`Disallow:`) are
    * dropped — they match nothing (RFC §2.2.2).
    */
  def parseRobots(robots: DataFrame, hostCol: String = "host",
                  txtCol: String = "robots_txt"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("ln", "line")))
      .select(col("host"), col("ln"),
        lower(regexp_extract(col("line"), "^\\s*([A-Za-z-]+)\\s*:", 1))
          .as("kind"),
        trim(regexp_extract(col("line"), "^[^:]*:(.*)$", 1)).as("value"))
      .filter(col("kind").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("_prev", lag(col("kind"), 1).over(w))
      .withColumn("_start",
        when(col("kind") === "user-agent" &&
          (col("_prev").isNull || col("_prev") =!= "user-agent"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("kind") === "user-agent")
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped
      .filter(col("kind") =!= "user-agent" && length(col("value")) > 0)
      .select(col("host"), col("grp"), col("kind").as("rule_type"),
        col("value").as("path"))
    agents.join(rules, Seq("host", "grp"))
      .select(col("host"), col("agent"), col("rule_type"), col("path"))
  }

  /** `Sitemap:` records → (host, sitemap_url) — the discovery half of
    * the crawl-control pair: robots.txt ADVERTISES the sitemaps
    * ([[Sitemaps]] parses and audits them). Per the sitemaps.org
    * protocol the record is independent of any user-agent group (it
    * may appear anywhere in the file, even inside an agent run —
    * group formation ignores it), and a file may carry several.
    */
  def sitemapDirectives(robots: DataFrame, hostCol: String = "host",
                        txtCol: String = "robots_txt"): DataFrame =
    robots.select(col(hostCol).as("host"),
        explode(split(col(txtCol), "\n")).as("line"))
      .select(col("host"),
        lower(regexp_extract(col("line"), "^\\s*([A-Za-z-]+)\\s*:", 1))
          .as("kind"),
        trim(regexp_extract(col("line"), "^[^:]*:(.*)$", 1))
          .as("sitemap_url"))
      .filter(col("kind") === "sitemap" && length(col("sitemap_url")) > 0)
      .select(col("host"), col("sitemap_url"))

  /** Deterministic per-host Crawl-delay fixture over the same host
    * space — shared VERBATIM with the SQL oracle (the [[fixtureRows]]
    * discipline). Edge coverage: exact-agent group overriding a
    * larger `*` delay plus two numeric delays in one group (max wins)
    * (example.com), a fractional delay (news), a shared agent run
    * with a non-numeric value dropped and a rule line ignored by the
    * extractor (cdn), and a host whose only group names another agent
    * with no `*` fallback (blog — schedules at the caller default).
    */
  val delayFixtureRows: Seq[(String, String)] = Seq(
    "example.com" -> Seq(
      "User-agent: crawler-x",
      "Crawl-delay: 1",
      "Crawl-delay: 2",
      "User-agent: *",
      "Crawl-delay: 10").mkString("\n"),
    "news.example.com" -> Seq(
      "User-agent: *",
      "Crawl-delay: 1.5").mkString("\n"),
    "cdn.example.org" -> Seq(
      "User-agent: legacybot",
      "User-agent: crawler-x",
      "Crawl-delay: fast",
      "Crawl-delay: 3",
      "Disallow: /nothing").mkString("\n"),
    "blog.sample.net" -> Seq(
      "User-agent: otherbot",
      "Crawl-delay: 9").mkString("\n"))

  def delayFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    delayFixtureRows.toDF("host", "robots_txt")
  }

  /** `Crawl-delay:` records → one (host, delay_s) row per host, for
    * `agent` — the de-facto politeness extension most crawlers honor
    * (not in RFC 9309, which is why this is a SEPARATE extractor:
    * per §2.2.4 unknown records must not interfere with rule-group
    * parsing, so [[parseRobots]] stays delay-blind and group
    * formation here considers only user-agent adjacency among the
    * (user-agent, crawl-delay) line sequence). Semantics: each
    * group's agent lines cross its numeric delay lines (non-numeric
    * values drop); the exact-agent groups win over `*` per host (the
    * [[applyRobots]] precedence); several effective delays take the
    * MAX — the conservative politeness read. Everything here is
    * file-sized; the corpus never appears.
    */
  def crawlDelays(robots: DataFrame, agent: String,
                  hostCol: String = "host",
                  txtCol: String = "robots_txt"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("ln", "line")))
      .select(col("host"), col("ln"),
        lower(regexp_extract(col("line"), "^\\s*([A-Za-z-]+)\\s*:", 1))
          .as("kind"),
        trim(regexp_extract(col("line"), "^[^:]*:(.*)$", 1)).as("value"))
      .filter(col("kind").isin("user-agent", "crawl-delay"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("_prev", lag(col("kind"), 1).over(w))
      .withColumn("_start",
        when(col("kind") === "user-agent" &&
          (col("_prev").isNull || col("_prev") =!= "user-agent"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("kind") === "user-agent")
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val delays = grouped.filter(col("kind") === "crawl-delay" &&
        col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("host"), col("grp"),
        col("value").cast("double").as("delay_s"))
    val rows = agents.join(delays, Seq("host", "grp"))
      .select(lower(col("host")).as("host"), col("agent"),
        col("delay_s"))
    val exact = rows.filter(col("agent") === agent.toLowerCase)
    val star = rows.filter(col("agent") === "*")
      .join(exact.select(col("host")).distinct(), Seq("host"),
        "left_anti")
    exact.unionByName(star)
      .groupBy(col("host")).agg(max(col("delay_s")).as("delay_s"))
  }

  /** Gate a URL frame for `agent`: per URL, the prevailing rule among
    * the effective group's prefix matches — the exact-agent group if
    * that host has one, else the `*` group; longest path wins, Allow
    * beats Disallow on ties (then the lexicographically larger path,
    * for determinism); no match → allowed. One broadcast rule join +
    * one max-struct per URL. The rule side's host is lowercased here
    * to mirror the URL side's lowercasing (DNS names are
    * case-insensitive) — a robots frame keyed `Example.COM` gates the
    * same pages as one keyed `example.com`.
    */
  def applyRobots(urls: DataFrame, rules: DataFrame, agent: String,
                  idCol: String = "doc_id",
                  urlCol: String = "url"): DataFrame = {
    val id = col(idCol)
    val host = lower(regexp_extract(col(urlCol), "^[A-Za-z]+://([^/?#:]*)", 1))
    val path0 = regexp_extract(col(urlCol), "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val u = urls.select(id, col(urlCol), host.as("host"),
      when(length(path0) === 0, lit("/")).otherwise(path0).as("_path"))
    val norm = rules.withColumn("host", lower(col("host")))
    val exact = norm.filter(col("agent") === agent.toLowerCase)
    val star = norm.filter(col("agent") === "*")
      .join(exact.select(col("host")).distinct(), Seq("host"),
        "left_anti")
    val eff = broadcast(exact.unionByName(star)
      .select(col("host"), col("rule_type"), col("path")))
    val prevail = u.join(eff, Seq("host"))
      .filter(col("_path").startsWith(col("path")))
      .groupBy(id).agg(max(struct(
        length(col("path")).as("l"),
        (col("rule_type") === "allow").cast("int").as("a"),
        col("path").as("p"),
        col("rule_type").as("t"))).as("m"))
      .select(id, col("m.p").as("matched_path"),
        col("m.t").as("matched_type"), (col("m.a") === 1).as("_allow"))
    u.join(prevail, Seq(idCol), "left")
      .select(id, col(urlCol), col("host"),
        col("matched_path"), col("matched_type"),
        coalesce(col("_allow"), lit(true)).as("allowed"))
  }
}
