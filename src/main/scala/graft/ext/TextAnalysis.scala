package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text-analysis operators for large-scale training-data pipelines
  * (SURVEY §2 north-star additions; no counterpart in the reference, which
  * delegates all text ML to spaCy — pdf_parser.py:86-109).
  *
  * Everything here is a pure Catalyst Column expression built from
  * `org.apache.spark.sql.functions` higher-order functions: codegen-friendly,
  * no UDFs, no shuffles — per-row cost only, which is what survives a 100 TB
  * corpus (the expressions pipeline inside WholeStageCodegen and scale
  * linearly with executor count).
  */
object TextAnalysis {

  /** Canonical text normalization for dedup keys: lowercase, strip
    * non-alphanumerics, collapse whitespace. Normalized-exact dedup
    * catches the trivial near-dups (case/punct variants) before any
    * probabilistic machinery runs.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Whitespace tokenizer (reference token semantics: pdf_parser.py:197). */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count, as BIGINT for engine-portable comparisons. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap, deterministic
    * stand-in for a real BPE vocabulary with similar scaling behavior.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Mean token length derived purely from char/token counts so that SQL
    * oracles can reproduce it bit-for-bit: (chars - separators) / tokens.
    */
  def meanTokenLength(text: Column): Column = {
    val n = size(tokens(text))
    (length(text) - (n - 1)).cast("double") / n.cast("double")
  }

  /** Language marker profiles: high-frequency function words per language.
    * Deliberately tiny — the operator contract is the scoring mechanism,
    * not lexicon quality.
    */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "es", "y"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une")
  )

  /** Stopword removal over the combined marker lexicon — the standard
    * text-cleaning transform before shingling/embedding.
    */
  def removeStopwords(text: Column): Column =
    concat_ws(" ", filter(tokens(text),
      t => !t.isInCollection(profiles.values.flatten.toSeq.distinct)))

  /** Count of tokens belonging to a marker set. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers))).cast("long")

  /** CJK character count (for the zh charset heuristic). */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")).cast("long")

  /** N-gram/marker heuristic language ID. Deterministic argmax: zh by
    * charset ratio; otherwise a language wins only with a STRICTLY
    * greater marker count than every later-checked language, so equal
    * counts resolve toward the END of the chain (es over de, fr over
    * es/de, en over all) — exactly the decision table the SQL oracle and
    * the native expression reproduce.
    */
  def langId(text: Column): Column = {
    val cEn = markerCount(text, profiles("en"))
    val cDe = markerCount(text, profiles("de"))
    val cEs = markerCount(text, profiles("es"))
    val cFr = markerCount(text, profiles("fr"))
    when(cjkCount(text) * 10 >= length(text) * 3, "zh")
      .when(cDe > cEn && cDe > cEs && cDe > cFr, "de")
      .when(cEs > cEn && cEs > cFr, "es")
      .when(cFr > cEn, "fr")
      .otherwise("en")
  }

  /** Codegen'd native language ID (graft.functions.LangIdExpr) — the fast
    * path for corpus-wide language partitioning: one fused scan instead of
    * the when-chain's four interpreted array filters plus a regexp pass.
    * Identical integer decision table; requires a GraftSession (or
    * spark.sql.extensions=GraftExtensions). NULL text yields NULL here vs
    * the when-chain's 'en' fallthrough.
    */
  def langIdNative(text: Column): Column =
    call_function("graft_langid", text)

  /** Stopword ratio over the combined marker lexicon. */
  def stopwordRatio(text: Column): Column =
    markerCount(text, profiles.values.flatten.toSeq.distinct).cast("double") /
      size(tokens(text)).cast("double")

  /** Punctuation/symbol character ratio; empty text is 0.0 (a bare
    * division would give 0.0/0.0 = NaN, and NaN poisons qualityScore's
    * documented [0,1] range — every threshold comparison goes false).
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") /
        length(text).cast("double"))

  /** Composite quality score in [0,1]: stopword presence, low punctuation
    * noise, and reasonable mean token length. The exact weights are not the
    * contract — determinism and SQL-expressibility are. Unrounded; callers
    * round for presentation (at >= 9 decimals to dodge representational
    * rounding ties across engines).
    */
  def qualityScore(text: Column): Column =
    least(lit(1.0), stopwordRatio(text) * 2.0) * 0.5 +
      (lit(1.0) - punctRatio(text)) * 0.3 +
      least(lit(1.0), meanTokenLength(text) / 8.0) * 0.2

  /** Weights for the portable positional fingerprint: 131^k mod p. */
  val FpMod: Long = 1000000007L
  val fpWeights: Array[Long] = Array.iterate(1L, 8)(w => w * 131 % FpMod)

  /** Order-sensitive document fingerprint that a SQL oracle can reproduce:
    * sum_i (len(tok_i)+1) * 131^(i mod 8) mod p. Positional weighting with
    * period 8 makes it sensitive to local reordering while keeping every
    * term in exact integer range on both engines.
    */
  def fingerprint(text: Column): Column = {
    val w = array(fpWeights.map(lit(_)): _*)
    aggregate(
      transform(tokens(text), (t, i) =>
        (length(t) + 1).cast("long") * element_at(w, pmod(i, lit(8)).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x
    ) % FpMod
  }

  /** Karp-Rabin rolling fingerprint: base-131 polynomial over md5-derived
    * 60-bit token hashes (Dedup.md5Hash60Col), reduced mod a 30-bit prime
    * at every step so the arithmetic stays in long range under ANSI mode.
    * The md5 hash makes the fingerprint reproducible OUTSIDE the engine
    * (DuckDB: `list_reduce(list_prepend(0, list_transform(toks, t ->
    * CAST('0x'||substr(md5(t),1,15) AS BIGINT) % p)), (a,b) ->
    * (a*131+b) % p)`), so stored lineage signatures can be audited by any
    * SQL system.
    */
  val KrMod: Long = 1073741789L

  /** Scalar one-pass form of the recurrence — the hot-path choice, for
    * the same reason as [[Dedup.simhash60Scalar]]: the Column form is an
    * INTERPRETED higher-order expression whose per-token step pays an
    * md5-to-hex render plus a string base-16 `conv` parse; this fold
    * reuses the thread-local digest and stays in long arithmetic.
    * Arithmetic stays exact: acc < 2^30, so acc*131 + h%p < 2^38.
    */
  private[ext] def rollingFingerprintScalar(tokens: Array[String]): Long = {
    var acc = 0L
    var i = 0
    while (i < tokens.length) {
      acc = (acc * 131L + Dedup.md5Hash60(tokens(i)) % KrMod) % KrMod
      i += 1
    }
    acc
  }

  private lazy val rollingFingerprintUdf =
    udf((text: String) =>
      if (text == null) null
      else java.lang.Long.valueOf(rollingFingerprintScalar(text.split(" ", -1))))

  /** Per-row JVM fold (one black-box call per DOCUMENT, not an
    * interpreted expression per token). `ExtSpec` pins bit-equality
    * against [[rollingFingerprintSql]] so the stored signatures stay
    * auditable outside the engine.
    */
  def rollingFingerprint(text: Column): Column = rollingFingerprintUdf(text)

  /** Codegen'd-builtins form for SQL-level composition (and the parity
    * oracle of the scalar path). Prefer [[rollingFingerprint]] in data
    * paths — interpreted higher-order expressions are the slow tier.
    */
  def rollingFingerprintSql(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 131 + pmod(Dedup.md5Hash60Col(t), lit(KrMod)), lit(KrMod)))

  // -------------------------------------------------------------------
  // PII redaction (training-data hygiene): RE2-compatible patterns (no
  // backtracking constructs), replaced globally in one codegen'd
  // regexp_replace chain. SSN runs before the phone pattern so the two
  // never race on the same span.
  // -------------------------------------------------------------------
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Replace emails / SSNs / phone numbers with typed placeholder tags. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        SsnRe, "[SSN]"),
      PhoneRe, "[PHONE]")
}
