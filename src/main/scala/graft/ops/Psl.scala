package graft.ops

/** Public-suffix list rules (publicsuffix.org format) for
  * [[Url.registeredDomainPsl]] — the full-fidelity successor of
  * [[Url.DefaultMultiSuffixes]]'s two-label set: exact rules
  * (`co.uk`, `kawasaki.jp`-prefecture entries), WILDCARD rules
  * (`*.ck` — every second level under ck is a public suffix), and
  * EXCEPTION rules (`!www.ck` — registrable despite the wildcard), plus
  * the implicit default rule `*` (any unlisted TLD is a public suffix).
  *
  * [[snapshot]] ships an ICANN-section SUBSET as a classpath resource
  * (src/main/resources/graft/public_suffix_snapshot.dat) covering the
  * common multi-label registries and every wildcard/exception TLD — the
  * parser accepts the upstream publicsuffix.org file verbatim, so
  * production deployments drop the full list (or its private section) in
  * via [[parse]]/[[fromFile]] without code changes.
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

  /** Parse publicsuffix.org-format lines: `//` comments and blanks skipped,
    * `*.base` → wildcard, `!rule` → exception, anything else exact. The
    * upstream file's section markers are comments, so the full list (ICANN
    * + private sections) parses as-is. */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.map(_.trim.toLowerCase).foreach {
      case l if l.isEmpty || l.startsWith("//") => ()
      case l if l.startsWith("*.") => wild += l.stripPrefix("*.")
      case l if l.startsWith("!") => exc += l.stripPrefix("!")
      case l => exact += l
    }
    Rules(exact.result(), wild.result(), exc.result())
  }

  /** Load a rules file from disk (e.g. a freshly downloaded full list). */
  def fromFile(path: String): Rules = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** The shipped ICANN-section snapshot (see the resource header for the
    * regeneration pointer). Parsed once per JVM. */
  lazy val snapshot: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "graft public-suffix snapshot resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
