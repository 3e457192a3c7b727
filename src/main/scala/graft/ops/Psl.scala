package graft.ops

/** Public-suffix list rules (publicsuffix.org format) for
  * [[Url.registeredDomainPsl]] — the full-fidelity successor of
  * [[Url.DefaultMultiSuffixes]]'s two-label set: exact rules
  * (`co.uk`, `kawasaki.jp`-prefecture entries), WILDCARD rules
  * (`*.ck` — every second level under ck is a public suffix), and
  * EXCEPTION rules (`!www.ck` — registrable despite the wildcard), plus
  * the implicit default rule `*` (any unlisted TLD is a public suffix).
  *
  * The classpath resource
  * (src/main/resources/graft/public_suffix_snapshot.dat) ships a ~1200-rule
  * snapshot in the upstream layout — ICANN section (the multi-label
  * registries of every major ccTLD, every wildcard/exception TLD, the
  * `*.sch.uk` multi-label wildcard base, US state k12/cc/lib locality
  * registries, Unicode IDN rules) and PRIVATE section (operator suffixes:
  * github.io, blogspot.com, …, plus MULTI-LEVEL rules like the regional
  * S3 endpoints and WILDCARD rules like `*.compute.amazonaws.com`),
  * separated by the upstream `===BEGIN/END=== ` markers. [[snapshot]]
  * keeps the ICANN section only; [[snapshotWithPrivate]] keeps both. The
  * parser accepts the upstream publicsuffix.org file verbatim (section
  * markers, inline whitespace rule), so production deployments drop the
  * full current list in via [[parse]]/[[fromFile]] without code changes;
  * a TLD outside the snapshot falls back to the default rule `*`.
  */
object Psl {

  /** Parsed rule set. `exact` and `exceptions` hold full rules;
    * `wildcardBases` holds the base after `*.` (for `*.ck`: "ck" — the
    * matched public suffix is base + one label). Labels are lowercase;
    * lookups expect lowercased hosts ([[Url.host]] lowercases). */
  final case class Rules(
      exact: Set[String],
      wildcardBases: Set[String],
      exceptions: Set[String]) {
    def isEmpty: Boolean =
      exact.isEmpty && wildcardBases.isEmpty && exceptions.isEmpty
  }

  /** Parse publicsuffix.org-format lines: `//` comments and blanks
    * skipped, `*.base` → wildcard, `!rule` → exception, anything else
    * exact. Spec fidelity (upstream file accepted verbatim):
    *  - each line is read only UP TO THE FIRST WHITESPACE (the spec's
    *    rule), so trailing inline annotations can't produce
    *    never-matching rules;
    *  - the `===BEGIN/END PRIVATE DOMAINS===` section markers are
    *    honored: `includePrivate = false` keeps only the ICANN section
    *    (registry-level suffixes), `true` also keeps the private section
    *    (github.io-style operator suffixes). Lines outside any marker
    *    count as ICANN (covers snapshots without markers);
    *  - rules are lowercased AND PUNYCODE-NORMALIZED: the upstream list
    *    writes IDN rules in Unicode while crawl hosts arrive as ASCII
    *    `xn--` labels — every rule is converted to its ASCII form at
    *    parse time (dictionary-sized, driver-side; hosts are never
    *    touched), so the full upstream file matches real crawl hosts
    *    verbatim. */
  def parse(lines: Iterator[String], includePrivate: Boolean = true): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    var inPrivate = false
    lines.map(_.trim).foreach { raw =>
      if (raw.contains("===BEGIN PRIVATE DOMAINS===")) inPrivate = true
      else if (raw.contains("===END PRIVATE DOMAINS===")) inPrivate = false
      else if (raw.nonEmpty && !raw.startsWith("//") &&
          (includePrivate || !inPrivate)) {
        // spec: "each line is only read up to the first whitespace"
        val l = raw.takeWhile(!_.isWhitespace).toLowerCase
        if (l.startsWith("*.")) wild += toAscii(l.stripPrefix("*."))
        else if (l.startsWith("!")) exc += toAscii(l.stripPrefix("!"))
        else if (l.nonEmpty) exact += toAscii(l)
      }
    }
    Rules(exact.result(), wild.result(), exc.result())
  }

  /** Punycode form of a (lowercased) rule. All-ASCII rules pass through
    * untouched (the common case — no IDN round-trip risk); a rule
    * java.net.IDN rejects is kept verbatim (an unmatchable rule beats a
    * failed parse of the whole list). */
  private def toAscii(rule: String): String =
    if (rule.forall(_ < 0x80)) rule
    else
      try java.net.IDN.toASCII(rule, java.net.IDN.ALLOW_UNASSIGNED).toLowerCase
      catch { case _: IllegalArgumentException => rule }

  /** Load a rules file from disk (e.g. a freshly downloaded full list). */
  def fromFile(path: String, includePrivate: Boolean = true): Rules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines(), includePrivate) finally src.close()
  }

  private def parseSnapshot(includePrivate: Boolean): Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "graft public-suffix snapshot resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines(), includePrivate) finally src.close()
  }

  /** The shipped snapshot's ICANN section — registry-level suffixes only,
    * the right default for registered-domain STATS (a company's
    * `github.io` pages all group under github.io with the private section
    * on, which is usually not what per-owner domain stats want... and
    * exactly what abuse/blocklist grouping DOES want — that's
    * [[snapshotWithPrivate]]). Parsed once per JVM. */
  lazy val snapshot: Rules = parseSnapshot(includePrivate = false)

  /** The shipped snapshot with the PRIVATE section included: operator
    * suffixes (`github.io`, `blogspot.com`, …) become public suffixes, so
    * each user site is its own registered domain — the grouping crawl
    * blocklists and per-site dedup want. */
  lazy val snapshotWithPrivate: Rules = parseSnapshot(includePrivate = true)
}
