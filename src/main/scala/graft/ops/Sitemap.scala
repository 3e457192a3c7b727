package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap XML parsing — the OTHER half of the crawl discovery protocol
  * (extension beyond the reference surface, SURVEY §2.11's URL/crawl
  * family): robots.txt `Sitemap:` lines point at sitemap.xml documents
  * ([[Robots.sitemaps]] surfaces them), and those documents enumerate the
  * URLs a site WANTS crawled — the frontier's seed stream alongside
  * extracted page links.
  *
  * Parsing is deliberately regex-based over the `<loc>` elements (the
  * [[Url]] convention — the same RE2-compatible pattern runs identically
  * in any engine, so the DuckDB oracle replays it byte-for-byte) rather
  * than a full XML parse: sitemaps.org fixes `<loc>` as a simple
  * text-content element, and real-world sitemap files are routinely
  * malformed enough that lenient extraction out-recalls a strict parser.
  * Both document kinds emit the same way — a `<sitemapindex>`'s `<loc>`s
  * are child SITEMAP urls (the caller re-fetches and re-extracts; one
  * level per pass, matching the fetch round-trip a crawler makes anyway),
  * a `<urlset>`'s `<loc>`s are page urls.
  */
object Sitemap {

  /** The `<loc>` text-content pattern — RE2-compatible, shared verbatim
    * with the oracle SQL. Content stops at the next `<`, whitespace
    * around the URL (ubiquitous pretty-printing) is trimmed AFTER
    * extraction (regex-level trimming diverges between engines under
    * greedy/backtracking differences). */
  val LocPattern = "(?s)<loc>([^<]*)</loc>"

  /** Undo the XML character escaping sitemaps.org requires for URLs in
    * `<loc>` (`&amp;` etc.) — the five predefined entities, `&amp;`
    * LAST so `&amp;lt;` round-trips to the literal `&lt;` the author
    * escaped, not a `<`. */
  private[ops] def xmlUnescape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  /** Explode the `<loc>` URLs of the sitemap XML in `xmlCol` into one
    * row per URL, appended as `outCol` (pass-through columns kept).
    * Rows whose XML contains no `<loc>` produce NO output rows —
    * explode semantics, the natural shape for a frontier union (an
    * empty sitemap contributes nothing). NULL xml likewise.
    *
    * Scale shape: one narrow projection per row (regexp_extract_all +
    * explode — the [[LinkGraph.extractLinks]] shape); no shuffle, no
    * aggregation. A sitemap file caps at 50k URLs by spec, so the
    * per-row fan-out is bounded. */
  def sitemapUrls(
      df: DataFrame,
      xmlCol: String,
      outCol: String = "sitemap_url"): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(xmlCol))
    graft.core.Validators.requireColumnsAbsent(df, Seq(outCol), "sitemapUrls")
    df.withColumn(outCol,
      explode(regexp_extract_all(col(xmlCol), lit(LocPattern), lit(1))))
      .withColumn(outCol,
        xmlUnescape(regexp_replace(col(outCol), "^\\s+|\\s+$", "")))
      .filter(col(outCol) =!= "")
  }

  /** The `<url>` BLOCK pattern of [[sitemapEntries]] — non-greedy so
    * adjacent blocks never fuse; RE2-compatible, shared with the oracle. */
  val UrlBlockPattern = "(?s)<url>(.*?)</url>"

  /** Explode full sitemap `<url>` ENTRIES — the recrawl-scheduling
    * surface ([[sitemapUrls]] keeps only the locations): one row per
    * `<url>` block carrying
    *   sitemap_loc        the page URL (blocks without one are dropped),
    *   sitemap_lastmod    `<lastmod>` verbatim (W3C datetime string —
    *                      kept as TEXT: real sitemaps mix date-only and
    *                      full-datetime forms, the consumer casts),
    *   sitemap_changefreq `<changefreq>` verbatim,
    *   sitemap_priority   `<priority>` as DOUBLE (unparseable → NULL).
    * Absent elements are NULL. Same scale shape as [[sitemapUrls]]: one
    * regexp_extract_all + explode + narrow per-block extractions; no
    * shuffle. */
  def sitemapEntries(df: DataFrame, xmlCol: String): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(xmlCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("sitemap_loc", "sitemap_lastmod", "sitemap_changefreq",
        "sitemap_priority", "__g_block"), "sitemapEntries")
    def elem(tag: String): Column = {
      val v = xmlUnescape(regexp_replace(
        regexp_extract(col("__g_block"), s"(?s)<$tag>([^<]*)</$tag>", 1),
        "^\\s+|\\s+$", ""))
      when(v === "", lit(null)).otherwise(v)
    }
    df.withColumn("__g_block",
      explode(regexp_extract_all(col(xmlCol), lit(UrlBlockPattern), lit(1))))
      .withColumn("sitemap_loc", elem("loc"))
      .filter(col("sitemap_loc").isNotNull)
      .withColumn("sitemap_lastmod", elem("lastmod"))
      .withColumn("sitemap_changefreq", elem("changefreq"))
      // try_cast, not cast: a malformed <priority> in one entry must
      // yield NULL, not fail the task under ANSI mode
      .withColumn("sitemap_priority",
        elem("priority").try_cast(org.apache.spark.sql.types.DoubleType))
      .drop("__g_block")
  }

  /** The sitemaps-protocol `<changefreq>` vocabulary as a refetch
    * interval in seconds — the recrawl scheduler's arithmetic unit:
    * always→0 (refetch every visit), hourly/daily/weekly, monthly→30 d,
    * yearly→365 d; `never` and anything unrecognized → NULL (no
    * time-driven refetch — the protocol says the value is a HINT, so an
    * unknown token must not schedule anything). Case-insensitive per
    * the spec's lowercase convention with real-world tolerance. Pure
    * narrow expression. */
  def changefreqSeconds(changefreq: Column): Column = {
    val c = lower(trim(changefreq))
    when(c === "always", 0L)
      .when(c === "hourly", 3600L)
      .when(c === "daily", 86400L)
      .when(c === "weekly", 604800L)
      .when(c === "monthly", 2592000L)
      .when(c === "yearly", 31536000L)
      .otherwise(lit(null).cast("long"))
  }
}
