package graft.etl

import graft.model.{Entities, MiscEntity}

/** E4/A2 — named-entity recognition + label bucketing (reference
  * pdf_parser.py:66-71,86-109: spaCy en_core_web_sm spans grouped into
  * persons / organizations / dates / locations / misc{text,label}).
  *
  * Statistical parity with spaCy is impossible and not required (SURVEY
  * §7.5); the contract is the 5-bucket output shape, the label dispatch
  * (PERSON/ORG/GPE/LOC/DATE -> named buckets, everything else ->
  * misc[{text,label}] — pdf_parser.py:97-107), and determinism. The
  * extractor is a rule system: date regexes, title-prefixed person names,
  * corporate-suffix organizations, a small location gazetteer, and
  * capitalized-sequence candidates falling through to misc.
  */
object Ner {

  private val MonthName =
    "(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|" +
      "Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)"

  private val datePatterns = Seq(
    """\b\d{4}-\d{2}-\d{2}\b""".r,
    s"""\\b$MonthName\\s+\\d{1,2},?\\s+\\d{4}\\b""".r,
    """\b\d{1,2}/\d{1,2}/\d{4}\b""".r,
    """\bQ[1-4]\s+\d{4}\b""".r)

  private val orgSuffixes =
    Set("Inc", "Inc.", "Corp", "Corp.", "Ltd", "Ltd.", "LLC", "GmbH", "Co", "Co.", "Group", "Holdings")

  private val personTitles = Set("Mr.", "Mrs.", "Ms.", "Dr.", "Prof.")

  private val locationGazetteer = Set(
    "New York", "Silicon Valley", "London", "Jakarta", "Singapore", "Tokyo",
    "Paris", "Berlin", "California", "Europe", "Asia", "America")

  // spans join on spaces/tabs only — a line break separates a heading from
  // the following sentence, they must not merge into one entity span
  private val capSeq = """(?:[A-Z][A-Za-z0-9&'.-]*)(?:[ \t]+[A-Z][A-Za-z0-9&'.-]*)*""".r

  /** Deterministic entity extraction over one text. */
  def extract(text: String): Entities = {
    if (text == null || text.isEmpty)
      return Entities(Nil, Nil, Nil, Nil, Nil)

    val dates = datePatterns.flatMap(_.findAllIn(text)).distinct

    val persons = Seq.newBuilder[String]
    val orgs = Seq.newBuilder[String]
    val locs = Seq.newBuilder[String]
    val misc = Seq.newBuilder[MiscEntity]

    capSeq.findAllMatchIn(text).foreach { m =>
      val span = m.matched
      val words = span.split("\\s+")
      // a title ("Dr.", "Ms.", ...) is part of the capitalized span itself
      val titled = personTitles.contains(words.head)
      val coreRaw = if (titled) words.tail else words
      // strip sentence-final punctuation from the last word — but keep the
      // dot of corporate suffixes ("Inc.") and titles
      val core =
        if (coreRaw.nonEmpty && coreRaw.last.endsWith(".") &&
          !orgSuffixes.contains(coreRaw.last) && !personTitles.contains(coreRaw.last))
          coreRaw.init :+ coreRaw.last.stripSuffix(".")
        else coreRaw
      val coreSpan = core.mkString(" ")
      if (dates.exists(_.contains(span)) || words.length > 6 || core.isEmpty) {
        // skip spans inside dates, over-long runs (headline noise), bare titles
      } else if (locationGazetteer.contains(coreSpan)) locs += coreSpan
      else if (orgSuffixes.contains(core.last)) orgs += coreSpan
      else if (titled || (core.length == 2 && coreSpan.forall(c => c.isLetter || c.isWhitespace)))
        persons += coreSpan
      else if (core.length >= 2) orgs += coreSpan
      else misc += MiscEntity(coreSpan, "MISC")
    }

    Entities(
      persons = persons.result().distinct,
      organizations = orgs.result().distinct,
      dates = dates,
      locations = locs.result().distinct,
      misc = misc.result().distinct)
  }
}
