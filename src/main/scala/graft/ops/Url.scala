package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation operators (extension beyond the reference surface,
  * SURVEY §2.11) — the CCNet/RefinedWeb-style provenance filtering stage:
  * extract host / registered domain / path shape from a document's source
  * URL, then drop documents from blocklisted domains.
  *
  * Parsing is deliberately regex-based (NOT java.net.URI / Spark's
  * `parse_url`): the same RE2-compatible patterns run identically in any
  * engine (the [[TextOps.redactPii]] convention), so the DuckDB oracle
  * replays every feature byte-for-byte. The registered domain uses a
  * public-suffix rule over a configurable multi-part-suffix set (the
  * "co.uk problem") — the default covers the common two-label suffixes; at
  * production scale swap in the full public-suffix list (it is a few
  * thousand entries — still a driver-side Set, the same shape).
  *
  * Scale shape: [[urlFeatures]] is a per-row narrow projection (no
  * shuffle); [[domainFilter]] is one broadcast LEFT ANTI hash join against
  * the dictionary-sized blocklist (PlanSpec pins the broadcast) — the scan
  * side streams, nothing wide ever shuffles.
  */
object Url {

  /** Default multi-part public suffixes for registered-domain extraction
    * (the common ccTLD second-level registries) — the FALLBACK path:
    * [[registeredDomainPsl]] with the [[Psl.snapshot]] rules is the
    * production extraction (three-label registries, wildcard TLDs, and
    * exception rules this two-label set cannot express). Kept for the
    * zero-dependency Column form ([[registeredDomain]] stays a pure
    * narrow expression; the PSL path needs rule-table joins). */
  val DefaultMultiSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.in", "co.nz", "com.br", "com.cn",
    "com.mx", "com.ar", "com.tr", "co.za", "co.kr", "com.sg", "com.hk")

  /** Authority/host/path extraction patterns — RE2-compatible, shared
    * verbatim with the oracle SQL:
    *   host: after `scheme://`, skip optional `userinfo@`, then EITHER a
    *         bracketed IPv6 literal (brackets kept — the same host notion
    *         as [[canonicalizeUrl]]; the plain rule would shear the
    *         address at its first ':') OR chars up to the first of `:/?#`
    *         (so ports never leak into the host);
    *   path: after the authority, chars up to the first of `?#`. */
  val HostPattern =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]/?#]*\\]|[^/?#:]*)"
  val PathPattern = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased host of `url` (empty string when `url` has no
    * `scheme://authority` prefix). */
  def host(url: Column): Column = lower(regexp_extract(url, HostPattern, 1))

  /** URL path (leading `/…`, before any query/fragment; empty when absent). */
  def path(url: Column): Column = regexp_extract(url, PathPattern, 1)

  /** Number of non-empty `/`-separated path segments. */
  def pathDepth(url: Column): Column =
    size(filter(split(path(url), "/"), s => s =!= ""))

  /** Registered (pay-level) domain of a host: the last two labels, or the
    * last three when the trailing two form a multi-part public suffix
    * (`blog.bbc.co.uk` → `bbc.co.uk`). Hosts with fewer labels pass
    * through unchanged. */
  def registeredDomain(
      hostCol: Column,
      multiSuffixes: Set[String] = DefaultMultiSuffixes): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n >= 3 && last2.isin(multiSuffixes.toSeq: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** Registered domain under full public-suffix-list semantics — exact,
    * WILDCARD (`*.ck`), and EXCEPTION (`!www.ck`) rules plus the implicit
    * default rule `*` — appended as `outCol` from the lowercased host in
    * `hostCol`. The prevailing rule follows publicsuffix.org: an exception
    * match wins (its public suffix is the rule minus its leftmost label),
    * else the LONGEST matching rule, else the default (the bare TLD); the
    * registered domain is the public suffix plus one label. A host that IS
    * a public suffix (or empty/NULL) passes through unchanged — the
    * [[registeredDomain]] compatibility rule. The host is LOWERCASED
    * before matching and in the output (hostnames are case-insensitive;
    * rules are lowercase), so mixed-case crawl hosts can't silently miss
    * every rule.
    *
    * Scale shape: label suffixes are pure narrow string expressions; each
    * (rule kind, label count) bucket of the dictionary-sized rule set is
    * one BROADCAST left join keyed on the matching suffix — no explode, no
    * aggregation, no shuffle anywhere (PlanSpec pins zero Exchanges). The
    * join count is the number of distinct rule shapes in the list (≈7 for
    * the shipped snapshot), independent of corpus size. */
  def registeredDomainPsl(
      df: DataFrame,
      hostCol: String,
      outCol: String = "url_domain",
      rules: Psl.Rules = Psl.snapshot): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(hostCol))
    graft.core.Validators.requireColumnsAbsent(df, Seq(outCol), "registeredDomainPsl")
    require(!rules.isEmpty, "registeredDomainPsl: empty rule set")
    val spark = df.sparkSession
    def nLabels(r: String): Int = r.count(_ == '.') + 1
    val h = lower(col(hostCol))
    val labels = split(h, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column =
      when(n >= k, array_join(slice(labels, -k, k), "."))
    import org.apache.spark.sql.types.StringType
    def ruleTable(rs: Set[String], colName: String, k: Int): Option[DataFrame] = {
      val subset = rs.filter(nLabels(_) == k)
      if (subset.isEmpty) None
      else Some(Sampling.broadcastFrame(spark, Seq(colName -> StringType),
        subset.toSeq.sorted.map(org.apache.spark.sql.Row(_))))
    }
    val maxEx = (rules.exact ++ rules.exceptions).map(nLabels).maxOption.getOrElse(0)
    val maxW = rules.wildcardBases.map(nLabels).maxOption.getOrElse(0)
    var out = df
    var joined = List.empty[String]
    def addJoin(rs: Set[String], prefix: String, k: Int): Unit =
      ruleTable(rs, s"$prefix$k", k).foreach { t =>
        out = out.join(t, lastK(k) === col(s"$prefix$k"), "left")
        joined ::= s"$prefix$k"
      }
    (1 to maxEx).foreach { k =>
      addJoin(rules.exact, "__graft_pe", k)
      addJoin(rules.exceptions, "__graft_px", k)
    }
    (1 to maxW).foreach(k => addJoin(rules.wildcardBases, "__graft_pw", k))
    def has(c: String): Boolean = joined.contains(c)
    // exception match at k labels → public suffix is k−1 labels; largest k
    // prevails (coalesce descending)
    val excCols = (maxEx to 1 by -1).collect {
      case k if has(s"__graft_px$k") =>
        when(col(s"__graft_px$k").isNotNull, lit(k - 1))
    }
    val lvlCols =
      (1 to maxEx).collect { case k if has(s"__graft_pe$k") =>
        when(col(s"__graft_pe$k").isNotNull, lit(k)).otherwise(lit(1)) } ++
        (1 to maxW).collect { case k if has(s"__graft_pw$k") =>
          when(col(s"__graft_pw$k").isNotNull, lit(k + 1)).otherwise(lit(1)) }
    val best =
      if (lvlCols.isEmpty) lit(1)
      else greatest((lit(1) +: lvlCols): _*)
    val ps = coalesce((excCols :+ best): _*)
    out
      .withColumn(outCol,
        when(n > ps, array_join(slice(labels, -(ps + lit(1)), ps + lit(1)), "."))
          .otherwise(h))
      .drop(joined: _*)
  }

  /** [[urlFeatures]] with the registered domain under full PSL semantics
    * ([[registeredDomainPsl]]); host/path/depth are the same narrow
    * extractions. */
  def urlFeaturesPsl(
      df: DataFrame,
      urlCol: String,
      rules: Psl.Rules = Psl.snapshot): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(urlCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("url_host", "url_domain", "url_path", "url_depth"), "urlFeaturesPsl")
    registeredDomainPsl(
      df.withColumn("url_host", host(col(urlCol))), "url_host", "url_domain", rules)
      .withColumn("url_path", path(col(urlCol)))
      .withColumn("url_depth", pathDepth(col(urlCol)))
  }

  /** [[domainFilter]] under full PSL semantics: drops rows whose
    * PSL registered domain appears in `blocklist` — the rule joins plus
    * ONE broadcast LEFT ANTI join; pass-through schema. */
  def domainFilterPsl(
      df: DataFrame,
      urlCol: String,
      blocklist: DataFrame,
      rules: Psl.Rules = Psl.snapshot): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(urlCol))
    require(blocklist.columns.length == 1,
      "domainFilterPsl: blocklist must be a single-column DataFrame of domains")
    val bl = blocklist.toDF("__graft_blocked")
    registeredDomainPsl(
      df.withColumn("__graft_psl_host", host(col(urlCol))),
      "__graft_psl_host", "__graft_psl_dom", rules)
      .join(broadcast(bl),
        col("__graft_psl_dom") === col("__graft_blocked"), "left_anti")
      .drop("__graft_psl_host", "__graft_psl_dom")
  }

  /** Appends `url_host`, `url_domain` (registered domain), `url_path`,
    * `url_depth` extracted from `urlCol`. NULL urls yield NULL features
    * (regexp_extract propagates null). One narrow projection. */
  def urlFeatures(
      df: DataFrame,
      urlCol: String,
      multiSuffixes: Set[String] = DefaultMultiSuffixes): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(urlCol))
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("url_host", "url_domain", "url_path", "url_depth"), "urlFeatures")
    val h = host(col(urlCol))
    df.withColumn("url_host", h)
      .withColumn("url_domain", registeredDomain(col("url_host"), multiSuffixes))
      .withColumn("url_path", path(col(urlCol)))
      .withColumn("url_depth", pathDepth(col(urlCol)))
  }

  /** Drops rows whose registered domain appears in `blocklist` (a
    * one-column DataFrame of lowercase domains) — one broadcast LEFT ANTI
    * join; rows whose url yields no host are KEPT (no domain evidence to
    * block on; add an explicit empty-host filter upstream if unsourced
    * documents should not pass). Pass-through schema. */
  def domainFilter(
      df: DataFrame,
      urlCol: String,
      blocklist: DataFrame,
      multiSuffixes: Set[String] = DefaultMultiSuffixes): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(urlCol))
    require(blocklist.columns.length == 1,
      "domainFilter: blocklist must be a single-column DataFrame of domains")
    val bl = blocklist.toDF("__graft_blocked")
    df.join(
      broadcast(bl),
      registeredDomain(host(col(urlCol)), multiSuffixes) === col("__graft_blocked"),
      "left_anti")
  }

  /** Per-registered-domain corpus statistics — the provenance-ranking
    * table behind CCNet/RefinedWeb-style domain curation: rank domains by
    * volume (and, via `tokenCol`, by token mass), then feed the tail or
    * the spam head into [[domainFilter]]'s blocklist. Output per domain:
    *   url_domain   the registered domain ("" when the url has no
    *                `scheme://host` prefix; NULL urls group under NULL);
    *   n_docs       BIGINT document count;
    *   n_hosts      BIGINT distinct full hosts under the domain (a
    *                1-doc-per-host long tail under one domain is a spam
    *                farm signature);
    *   n_tokens     BIGINT Σ `tokenCol` (only when `tokenCol` is set).
    * One narrow feature projection + one hash aggregation on the domain —
    * the result is dictionary-sized (domains, not documents), safe to
    * collect or broadcast back as a filter. */
  def domainStats(
      df: DataFrame,
      urlCol: String,
      tokenCol: Option[String] = None,
      multiSuffixes: Set[String] = DefaultMultiSuffixes): DataFrame = {
    graft.core.Validators.requireColumns(df, tokenCol.toSeq)
    graft.core.Validators.requireColumnsAbsent(df,
      Seq("n_docs", "n_hosts") ++ tokenCol.map(_ => "n_tokens"), "domainStats")
    // one extraction implementation (and one url_host/url_domain-absent
    // guard) for the whole file: the unused path/depth projections are
    // pruned by Catalyst before the scan
    val base = urlFeatures(df, urlCol, multiSuffixes)
    val aggs =
      Seq(count(lit(1)).as("n_docs"),
        count_distinct(col("url_host")).as("n_hosts")) ++
        tokenCol.map(t => sum(col(t)).cast("long").as("n_tokens")).toSeq
    base.groupBy(col("url_domain")).agg(aggs.head, aggs.tail: _*)
  }

  /** [[domainFilter]] over an in-memory blocklist. */
  def domainFilter(df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame = {
    import df.sparkSession.implicits._
    domainFilter(df, urlCol, blocked.toDF("domain"))
  }

  /** Canonical form of a URL — the crawl-frontier dedup key: the same
    * page fetched as `HTTP://WWW.Ex.COM:80/a?b=2&a=1#x` and
    * `http://www.ex.com/a?a=1&b=2` must collide in a seen-key probe
    * ([[graft.ops.Dedup.keyIndexApply]] is the standing consumer), or the
    * crawler refetches — and the corpus double-ingests — every
    * cosmetically-distinct alias.
    *
    * Rules (RFC-3986-lite, each one a pure narrow expression — shared
    * verbatim with the oracle SQL):
    *  - scheme and host LOWERCASE (both case-insensitive by spec);
    *  - userinfo stripped (crawl identity lives in the host, and
    *    credentials must never become corpus keys);
    *  - default ports dropped (`:80` for http, `:443` for https; other
    *    ports kept);
    *  - empty path → `/` (`http://h` ≡ `http://h/`);
    *  - query parameters SORTED bytewise and an empty query (`?` alone)
    *    dropped; the `?` is kept only when parameters exist;
    *  - fragment dropped entirely (never sent to the server).
    * Deliberately NOT done (documented, the conservative side of every
    * trade): percent-decoding (decoding can change meaning;
    * case-normalizing %XX alone is not worth divergence risk),
    * dot-segment collapse, `www.` stripping, tracking-parameter removal
    * — all of those can merge genuinely different pages.
    * A value with no `scheme://` prefix passes through unchanged (it is
    * not a fetchable URL; leave its identity alone). NULL stays NULL. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth0 = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val auth = regexp_replace(auth0, "^[^/?#@]*@", "") // strip userinfo
    // a bracketed IPv6 authority keeps its brackets as the host; the
    // plain split-at-colon rule would otherwise shear the address apart
    val bracketed = auth.startsWith("[")
    val host =
      when(bracketed, lower(regexp_extract(auth, "^(\\[[^\\]]*\\])", 1)))
        .otherwise(lower(regexp_extract(auth, "^([^:]*)", 1)))
    val port =
      when(bracketed, regexp_extract(auth, "^\\[[^\\]]*\\]:([0-9]+)$", 1))
        .otherwise(regexp_extract(auth, "^[^:]*:([0-9]+)$", 1))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_extract(url, PathPattern, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // strip the fragment BEFORE query extraction: a '?' inside the
    // fragment (SPA routes: /app#/route?tab=1) is not a query and must
    // not resurrect as one
    val noFrag = regexp_replace(url, "#.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val sortedQuery = array_join(array_sort(split(query, "&")), "&")
    when(url.isNull, lit(null))
      .when(scheme === "", url) // not scheme://… — pass through
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(sortedQuery =!= "", concat(lit("?"), sortedQuery)).otherwise(lit(""))))
  }

  /** The SURT key (Sort-friendly URI Reordering Transform) of a URL —
    * the `urlkey` convention of web-archive CDX indexes (OpenWayback /
    * Common Crawl cc-index): host labels REVERSED and comma-joined so
    * one domain's captures sort contiguously, then `)` + path + sorted
    * query. `com,example)/page?a=1` — a prefix scan over the sorted key
    * space is a domain lookup.
    *
    * Built ON [[canonicalizeUrl]] (case folding, userinfo strip,
    * default-port drop, fragment drop, query sort), then the wayback
    * canonicalizer's aggressive additions: a leading `www.` label is
    * stripped, a kept non-default port lands between host and `)`
    * (`com,example:8080)/p`), and the WHOLE key is lowercased (paths
    * differing only by case collide — the archive-dedup trade, not a
    * URL-semantics claim). A bracketed IPv6 host is kept verbatim
    * (label reversal is a DNS-name notion). NULL for NULL input and for
    * anything that is not `scheme://…` (no host, no key).
    *
    * Pure narrow expressions (split + reverse + array_join — no UDF, no
    * shuffle); the DuckDB oracle replays it with list functions. */
  def surtKey(url: Column): Column = {
    val c = canonicalizeUrl(url)
    val auth = regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    val bracketed = auth.startsWith("[")
    val host =
      when(bracketed, regexp_extract(auth, "^(\\[[^\\]]*\\])", 1))
        .otherwise(regexp_extract(auth, "^([^:]*)", 1))
    val port =
      when(bracketed, regexp_extract(auth, "^\\[[^\\]]*\\]:([0-9]+)$", 1))
        .otherwise(regexp_extract(auth, "^[^:]*:([0-9]+)$", 1))
    val hostKey = regexp_replace(host, "^www\\.", "")
    val revHost = when(bracketed, hostKey)
      .otherwise(array_join(reverse(split(hostKey, "\\.")), ","))
    // everything after the authority: path (always non-empty after
    // canonicalization) + the sorted query
    val rest = regexp_replace(c, "^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    when(url.isNull, lit(null).cast("string"))
      .when(regexp_extract(c, "^([a-z][a-z0-9+.-]*)://", 1) === "",
        lit(null).cast("string"))
      .otherwise(lower(concat(
        revHost,
        when(port =!= "", concat(lit(":"), port)).otherwise(lit("")),
        lit(")"), rest)))
  }

  /** Query parameters that advertising/analytics attach to inbound links
    * without changing the page: the default strip set of
    * [[stripTrackingParams]] (utm_* by prefix; the rest exact). */
  val DefaultTrackingParams: Set[String] = Set(
    "gclid", "fbclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref_src", "cmpid", "s_kwcid")

  /** Drops tracking query parameters from an already-CANONICAL URL (run
    * [[canonicalizeUrl]] first — this op assumes the canonical shape:
    * lowercase scheme/host, sorted `k=v&k=v` query, no fragment): any
    * `utm_*` key plus the [[DefaultTrackingParams]] exact keys. The
    * aggressive half of frontier dedup the base canonicalizer leaves
    * out (stripping is a POLICY — some sites route on these — so it is
    * a separate opt-in step, not part of canonicalizeUrl). A URL whose
    * query empties loses its `?` entirely. Pure narrow expressions
    * (split → filter → rejoin), oracle-replayable with list functions. */
  def stripTrackingParams(
      canonicalUrl: Column,
      exactKeys: Set[String] = DefaultTrackingParams): Column = {
    val query = regexp_extract(canonicalUrl, "\\?(.*)$", 1)
    val keysLit = array(exactKeys.toSeq.sorted.map(lit): _*)
    val kept = filter(split(query, "&"), p => {
      val k = regexp_extract(p, "^([^=]*)", 1)
      !k.startsWith("utm_") && !array_contains(keysLit, k)
    })
    val newQuery = array_join(kept, "&")
    val base = regexp_replace(canonicalUrl, "\\?.*$", "")
    when(canonicalUrl.isNull, lit(null).cast("string"))
      .when(query === "", canonicalUrl)
      .when(newQuery === "", base)
      .otherwise(concat(base, lit("?"), newQuery))
  }

  /** Appends `outCol` = [[canonicalizeUrl]] of `urlCol` — the DataFrame
    * form feeding seen-key fits/probes. Pure narrow projection. */
  def canonicalizeUrls(
      df: DataFrame, urlCol: String, outCol: String = "url_canonical"): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(urlCol))
    graft.core.Validators.requireColumnsAbsent(df, Seq(outCol), "canonicalizeUrls")
    df.withColumn(outCol, canonicalizeUrl(col(urlCol)))
  }
}
