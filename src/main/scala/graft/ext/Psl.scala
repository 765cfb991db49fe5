package graft.ext

/** [EXT] Compiled Public Suffix List (publicsuffix.org/list rule
  * semantics) — the data a crawl deployment ships so
  * [[UrlOps.registeredDomainOf]] resolves long-tail ccTLD hosts
  * correctly (per-domain caps and mixing key on the registered domain;
  * a wrong suffix merges unrelated sites into one cap bucket).
  *
  * Full rule semantics, all from the published algorithm:
  *  - a NORMAL rule (`co.uk`) makes its labels a public suffix;
  *  - a WILDCARD rule (`*.ck`) makes every direct child of its tail a
  *    public suffix (`anything.ck`);
  *  - an EXCEPTION rule (`!www.ck`) punches a hole in a wildcard: the
  *    named domain is NOT a public suffix (so `www.ck` is itself a
  *    registrable domain);
  *  - exception rules prevail over everything; otherwise the matching
  *    rule with the most labels wins; no match falls back to the
  *    implicit `*` rule (a 1-label suffix).
  *
  * The compiled form is three hash sets keyed by the rule's label tail —
  * matching a host costs one set probe per label, no tries, no regex.
  * Instances are immutable and `Serializable`: pass one into
  * [[UrlOps.urlParts]]'s psl overload and it rides the task closure (a
  * full PSL compiles to a few hundred KB — broadcast-friendly; the
  * closure copy is fine at that size). [[Psl.builtin]] is the offline
  * default: the high-traffic multi-label subset [[UrlOps]] has always
  * shipped, so default-path behavior is byte-identical with or without
  * a loaded list.
  */
final class Psl private (exact: Set[String], wildcard: Set[String],
                         exception: Set[String]) extends Serializable {

  /** Label count of the public suffix of `labels` (a lowercased host,
    * split on '.'); >= 1 (the implicit `*` default rule). Exceptions
    * prevail, then longest match.
    */
  private[ext] def publicSuffixLabels(labels: Array[String]): Int = {
    var best = 1 // the implicit default rule '*'
    var i = 0
    while (i < labels.length) {
      val suffix = labels.iterator.drop(i).mkString(".")
      // an exception names a registrable domain: its public suffix is
      // the rule minus its leftmost label — and it beats any length
      if (exception.contains(suffix)) return labels.length - i - 1
      if (exact.contains(suffix) && labels.length - i > best)
        best = labels.length - i
      // '*.tail': one extra label left of the tail is part of the suffix
      if (i > 0 && wildcard.contains(suffix) && labels.length - i + 1 > best)
        best = labels.length - i + 1
      i += 1
    }
    best
  }

  /** Rule count (diagnostics). */
  def size: Int = exact.size + wildcard.size + exception.size
}

object Psl {

  /** Compile PSL rule lines: blank lines and `//` comments skip, `!`
    * marks an exception, a leading `*.` marks a wildcard; entries fold
    * to lowercase (ship the ASCII/punycode form for IDN tails — host
    * matching is on the canonicalized host, which [[UrlOps]] keeps in
    * its as-fetched ASCII form).
    */
  def parse(lines: IterableOnce[String]): Psl = {
    val exact = Set.newBuilder[String]
    val wildcard = Set.newBuilder[String]
    val exception = Set.newBuilder[String]
    lines.iterator.foreach { raw =>
      // the published file marks sections with '//' comments; a rule is
      // the first whitespace-delimited token of a non-comment line
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        // locale-independent fold — the same asciiLower the host side
        // uses (String.toLowerCase under a Turkish locale would dot
        // the I and the rule would never match a folded host label)
        val rule = UrlOps.asciiLower(line.takeWhile(c => c > ' '))
        if (rule.startsWith("!")) exception += rule.substring(1)
        else if (rule.startsWith("*.")) wildcard += rule.substring(2)
        else if (rule.nonEmpty && rule != "*") exact += rule
      }
    }
    new Psl(exact.result(), wildcard.result(), exception.result())
  }

  /** [[parse]] over a whole file's text. */
  def fromText(text: String): Psl =
    parse(text.linesIterator)

  /** The offline default: the high-traffic multi-label tails
    * [[UrlOps]] has always shipped as exact rules, nothing else —
    * behavior without a loaded list is unchanged from r18.
    */
  val builtin: Psl =
    new Psl(UrlOps.MultiLabelSuffixes, Set.empty, Set.empty)
}
