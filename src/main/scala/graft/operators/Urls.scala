package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization + URL-level dedup — the sibling of [[Html]] in
  * every web corpus's stage 0: C4/CCNet/RefinedWeb all dedup by
  * canonical URL before any content pass, because a crawl sees the
  * same page under tracking-param, fragment, casing, `www.`, and
  * default-port variants. Pure built-in expressions (regexp pieces +
  * one array HOF over the query params), so normalization is a
  * map-side projection; the dedup itself is one hash shuffle on the
  * canonical string — the standard URL-dedup exchange, trivially
  * partitionable at 100 TB.
  *
  * Normalization rules (small, deterministic, oracle-replayed in RE2):
  *   1. scheme and host lowercase;
  *   2. leading `www.` dropped from the host;
  *   3. default port stripped (`:443` for https, `:80` for http);
  *   4. fragment dropped;
  *   5. tracking params dropped (`utm_*`, `fbclid`, `gclid`) and the
  *      `?` with them when nothing survives — param ORDER is kept
  *      (full RFC 3986 canonicalization would sort; order-keeping is
  *      what C4 does and keeps the rule list replayable);
  *   6. empty path → `/`.
  * Registrable domains come in two tiers: [[registrableDomain]] is
  * the cheap last-two-labels heuristic (fine for fixture hosts), and
  * [[registrableDomainPsl]] below implements the FULL publicsuffix.org
  * algorithm — plain, wildcard, and exception rules as broadcast data
  * (`co.uk`, `*.kobe.jp`, `!city.kobe.jp` all handled).
  */
object Urls {

  /** Deterministic URL synthesized from the id — construction math
    * both engines replay (the t55/m8 discipline). The PAGE identity
    * (host, port, path, real query param) is a pure function of the
    * bucket `id / 3`, while the CRAWL-VARIANT noise (host casing,
    * `www.`/`WWW.` prefixes, tracking params, fragments) varies per
    * id — so each 3-id bucket is the same page seen three ways and
    * canonicalization must collapse it to one keeper (the dedup
    * genuinely fires on ~2/3 of rows), while distinct buckets never
    * accidentally collide (host/path/port all carry the bucket).
    */
  /** The bucket-keyed PAGE IDENTITY pieces (host, port, path + real
    * query param) — shared by [[withUrlPayload]] (a page's own URL)
    * and [[Html.withLinkedHtmlPayload]] (hrefs pointing AT pages), so
    * a link and its target canonicalize to the same node string and
    * the synthesized link graph actually connects.
    */
  private[operators] def hostOf(b: Column): Column =
    when(b % 4 === 0, lit("Example.COM"))
      .when(b % 4 === 1, lit("news.example.com"))
      .when(b % 4 === 2, lit("cdn.example.org"))
      .otherwise(lit("blog.sample.net"))

  private[operators] def portOf(b: Column): Column =
    when(b % 5 === 0, lit(":443")).otherwise(lit(":8080"))

  private[operators] def pathQOf(b: Column): Column =
    concat(lit("/docs/article-"), b.cast("string"),
      lit("?page="), (b % 7).cast("string"))

  def withUrlPayload(docs: DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    val id = col(idCol)
    val b = (id / 3).cast("long")
    val www = when(id % 4 === 0, lit("WWW."))
      .when(id % 4 === 1, lit("www.")).otherwise(lit(""))
    val track = when(id % 2 === 0, lit("&utm_source=feed&gclid=x"))
      .otherwise(lit(""))
    val frag = when(id % 3 === 0, lit("#section-2")).otherwise(lit(""))
    docs.withColumn("url", concat(
      lit("https://"), www, hostOf(b), portOf(b), pathQOf(b),
      track, frag))
  }

  /** Rules 1–6 over a url column → the canonical form. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val stripped = when(scheme === "https" &&
        noWww.rlike(":443$"), regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http" &&
        noWww.rlike(":80$"), regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val path0 = regexp_extract(url, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val path = when(length(path0) === 0, lit("/")).otherwise(path0)
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(rawQ, "&"), p =>
        length(p) > 0 && !p.rlike("^(utm_[^=]*|fbclid|gclid)=")),
      "&")
    concat(scheme, lit("://"), stripped, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Registrable domain (last two host labels; PSL caveat above). */
  def registrableDomain(url: Column): Column = {
    val host = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#:]*)", 1))
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** The URL-dedup report: per row the canonical URL, the registrable
    * domain, and `keeper` — true iff this row has the smallest id in
    * its canonical group (the deterministic representative rule every
    * dedup op in this repo uses). One hash exchange on the canonical
    * string; everything else is map-side.
    */
  def urlDedupReport(docsWithUrl: DataFrame, idCol: String = "doc_id",
                     urlCol: String = "url"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = docsWithUrl.select(col(idCol), col(urlCol),
      canonicalUrl(col(urlCol)).as("canon_url"),
      registrableDomain(col(urlCol)).as("domain"))
    canon.withColumn("keeper",
      col(idCol) === min(col(idCol))
        .over(Window.partitionBy(col("canon_url"))))
  }

  // -------------------------------------------------------------------
  // Public Suffix List registrable domains — the real algorithm behind
  // the last-two-labels caveat above
  // -------------------------------------------------------------------

  /** Miniature Public Suffix List fixture covering all three rule
    * kinds of the publicsuffix.org algorithm — plain rules, wildcard
    * rules (`*.kobe.jp` / `*.ck`), and exception rules (`!city.kobe.jp`
    * / `!www.ck`, stored here with `is_exception = true` and no `!`).
    * A deployment swaps in the full list (~10k rows — still broadcast
    * change-of-data, not change-of-plan). The rules deliberately ride
    * a DataFrame, never codegen literals: 10k unrolled string
    * comparisons would blow the 8 KB JIT method ceiling SCALING.md
    * documents — model constants enter plans as DATA.
    */
  def pslRules(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("com", false), ("org", false), ("net", false), ("io", false),
      ("jp", false), ("uk", false), ("co.uk", false), ("gov.uk", false),
      ("github.io", false), ("*.kobe.jp", false),
      ("city.kobe.jp", true), ("*.ck", false), ("www.ck", true)
    ).toDF("rule", "is_exception")
  }

  /** Deterministic multi-label-TLD URL payload — the t56 discipline
    * pointed at the PSL edge cases: per `id % 8` the host exercises a
    * multi-label suffix (`co.uk`), a plain TLD, a wildcard match at
    * depth (`a.b.example.kobe.jp`), both exception rules, a private
    * registry (`github.io`), an unknown TLD (the `*` default rule),
    * and a host that IS a public suffix (registrable = null).
    */
  def withIntlUrlPayload(docs: DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    val id = col(idCol)
    val host = when(id % 8 === 0, lit("shop.Example.CO.UK"))
      .when(id % 8 === 1, lit("example.com"))
      .when(id % 8 === 2, lit("a.b.example.kobe.jp"))
      .when(id % 8 === 3, lit("city.kobe.jp"))
      .when(id % 8 === 4, lit("media.github.io"))
      .when(id % 8 === 5, lit("weird.unknowntld"))
      .when(id % 8 === 6, lit("uk"))
      .otherwise(lit("x.www.ck"))
    docs.withColumn("url", concat(lit("https://"), host,
      lit("/p/"), (id % 5).cast("string")))
  }

  /** Per-registrable-domain crawl governance table — the planning
    * input for crawl budgeting and domain demotion in every web-scale
    * corpus (C4's per-domain caps, RefinedWeb's dup-heavy-host
    * demotion): pages, unique pages (the [[urlDedupReport]] keeper
    * rule), the dup rate, and a caller-supplied per-page weight
    * (token count, bytes) summed and averaged. One groupBy on the
    * domain after the URL window — all sums partial-aggregate, so a
    * mega-domain is map-side-combined, never a hot reducer key.
    */
  def domainStats(docsWithUrl: DataFrame, psl: DataFrame, weight: Column,
                  idCol: String = "doc_id",
                  urlCol: String = "url"): DataFrame = {
    val rep = urlDedupReport(docsWithUrl, idCol, urlCol)
      .select(col(idCol), col("keeper"))
    val reg = registrableDomainPsl(docsWithUrl, psl, idCol, urlCol)
      .select(col(idCol), col("registrable"))
    docsWithUrl.select(col(idCol), weight.as("_w"))
      .join(rep, Seq(idCol)).join(reg, Seq(idCol))
      .groupBy(col("registrable").as("domain"))
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("keeper"), 1L).otherwise(0L)).as("n_unique"),
        sum(col("_w")).as("total_weight"))
      .select(col("domain"), col("n_pages"), col("n_unique"),
        (lit(1.0) - col("n_unique").cast("double") /
          col("n_pages").cast("double")).as("dup_rate"),
        col("total_weight"),
        (col("total_weight").cast("double") /
          col("n_pages").cast("double")).as("avg_weight"))
  }

  /** Registrable domain via the full publicsuffix.org algorithm:
    * generate the host's trailing-label suffixes (plain, and the
    * `*.`-for-the-leftmost-label wildcard form) map-side — at most
    * `2 × maxLabels − 1` candidate rows per host — broadcast-join them
    * against the rule table, and let one max-struct per host pick the
    * prevailing rule (exception beats everything, then most labels;
    * no match → the implicit `*` rule, public suffix = last label).
    * Public suffix = the prevailing rule's label count (minus one for
    * an exception rule); registrable domain = public suffix plus one
    * label, or null when the host IS a public suffix.
    *
    * Plan shape: one broadcast hash join on the candidate string, one
    * partial-aggregatable max-struct on the id, one id-keyed join back
    * to the host row — per-URL metadata enrichment that scales with
    * the crawl scan. `maxLabels` bounds the explode at the PSL's own
    * depth — the default 5 covers the real list's deepest rule
    * (5 labels), so swapping in the full list needs no plan change;
    * the t57/t58 oracles mirror it with `range(1,6)`/`range(2,6)`.
    */
  def registrableDomainPsl(docsWithUrl: DataFrame, psl: DataFrame,
                           idCol: String = "doc_id",
                           urlCol: String = "url",
                           maxLabels: Int = 5): DataFrame = {
    val id = col(idCol)
    val host = lower(regexp_extract(col(urlCol), "^[A-Za-z]+://([^/?#:]*)", 1))
    val base = docsWithUrl.select(id, col(urlCol), host.as("host"),
      split(host, "\\.").as("labels"))
    val n = size(col("labels"))
    def lastJoin(k: Column): Column =
      array_join(slice(col("labels"), -k, k), ".")
    val is = sequence(lit(1), least(n, lit(maxLabels)))
    // plain candidate at i = the host's last i labels; wildcard
    // candidate at i (i >= 2) = '*.' + the last i-1 labels — a
    // wildcard rule with i labels matches iff this string equals it
    val plains = transform(is, i => struct(lastJoin(i).as("cand"), i.as("nl")))
    val wilds = transform(filter(is, i => i >= 2), i =>
      struct(concat(lit("*."), lastJoin(i - 1)).as("cand"), i.as("nl")))
    val cands = base.select(id, explode(concat(plains, wilds)).as("c"))
      .select(id, col("c.cand").as("cand"), col("c.nl").as("nl"))
    val matched = cands
      .join(broadcast(psl), col("cand") === col("rule"))
      .groupBy(id).agg(max(struct(
        col("is_exception").cast("int").as("exc"),
        col("nl").as("nl"))).as("prevail"))
      .select(id,
        when(col("prevail.exc") === 1, col("prevail.nl") - 1)
          .otherwise(col("prevail.nl")).as("ps_nl"))
    base.join(matched, Seq(idCol), "left")
      .withColumn("_ps", coalesce(col("ps_nl"), lit(1)))
      .select(id, col(urlCol), col("host"),
        array_join(slice(col("labels"), -col("_ps"), col("_ps")), ".")
          .as("public_suffix"),
        when(n > col("_ps"),
          array_join(slice(col("labels"), -(col("_ps") + 1),
            col("_ps") + 1), "."))
          .otherwise(lit(null).cast("string")).as("registrable"))
  }
}
