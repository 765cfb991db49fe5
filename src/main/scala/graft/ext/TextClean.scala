package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** [EXT] Unicode text cleanup for crawl corpora — the normalization
  * pass every curation stack runs before dedup and quality scoring:
  * the same prose arriving as composed vs decomposed code points (or
  * as double-encoded mojibake) would otherwise shingle, hash, and
  * count differently, silently splitting one document's duplicates
  * across keys.
  *
  * Three operators, all deterministic JDK-only scalars:
  *  - [[nfc]]/[[nfkc]]: Unicode normalization (java.text.Normalizer) —
  *    NFC composes combining sequences (e + U+0301 -> é), the
  *    canonical dedup-key form; NFKC additionally folds compatibility
  *    forms (ﬁ -> fi, fullwidth -> ASCII), the aggressive
  *    tokenizer-input form;
  *  - [[stripControls]]: CRLF/CR fold to LF, then C0 controls (except
  *    tab/LF), DEL, and the C1 range strip — the bytes crawl payloads
  *    carry from broken encodings and binary junk;
  *  - [[repairMojibake]]: inverts the classic double-encoding — UTF-8
  *    bytes read back through windows-1252 ("â€™" for a right quote,
  *    "Ã©" for é). A string repairs only when it round-trips EXACTLY:
  *    every char encodes to cp1252 AND those bytes strict-decode as
  *    well-formed UTF-8 with at least one multi-byte sequence —
  *    anything else returns unchanged, so legitimate Western text
  *    (whose stray accented chars do not form valid UTF-8 sequences)
  *    never false-repairs. Iterates to a fixpoint (bounded) for
  *    double-mojibake.
  *
  * Scale story: per-row scalar pass, zero shuffle — same contract as
  * [[TextAnalysis]]; compose upstream of any dedup/quality operator.
  */
object TextClean {

  /** Canonical composition (NFC) — the dedup-key normal form. */
  def nfcScalar(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Compatibility composition (NFKC) — ligatures/fullwidth fold. */
  def nfkcScalar(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)

  /** Fold CRLF/CR to LF; strip other C0 controls (keeping tab + LF),
    * DEL, and the C1 range (U+0080-U+009F).
    */
  def stripControlsScalar(s: String): String = {
    if (s == null) return null
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = (c < 0x20 && c != '\n' && c != '\t') ||
        (c >= 0x7F && c <= 0x9F)
      i += 1
    }
    if (!needs) return s
    val b = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r') {
        b.append('\n')
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1 // CRLF
      } else if ((c >= 0x20 || c == '\n' || c == '\t') &&
          !(c >= 0x7F && c <= 0x9F)) {
        b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** The byte a mojibake char stood for, under EITHER of the two
    * decoders broken pipelines actually use: windows-1252 (the 0x80-9F
    * block decodes to quotes/dashes — `â€™`) or latin-1 (the same
    * block decodes to C1 controls). Java's own cp1252 decoder maps the
    * five UNDEFINED cp1252 bytes (81 8D 8F 90 9D) to U+FFFD — which is
    * ambiguous and therefore rejected — but their latin-1-decoded C1
    * control forms round-trip fine. -1 = not a mojibake-reachable char.
    */
  private def mojiByte(c: Char): Int =
    if (c <= 0x7F) c
    else if (c >= 0xA0 && c <= 0xFF) c // latin-1 range, same in cp1252
    else c match { // cp1252's 0x80-0x9F mappings
      case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
      case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
      case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
      case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
      case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
      case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
      case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
      case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
      case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
      // latin-1-decoded leftovers: a C1 control stands for its own byte
      case c1 if c1 >= 0x80 && c1 <= 0x9F => c1
      case _ => -1
    }

  /** One repair step: inverse-map every char to its mojibake byte +
    * strict UTF-8 decode, or null when the string is not mojibake
    * (see module doc for the exact round-trip conditions).
    */
  private def repairOnce(s: String): String = {
    // mojibake must contain a char that WAS a UTF-8 lead byte
    // (>= 0xC2 in both source encodings) — quick reject for the
    // overwhelmingly common clean case before any allocation
    var candidate = false
    var i = 0
    while (i < s.length && !candidate) {
      val c = s.charAt(i)
      candidate = c >= 0xC2 && c <= 0xFF
      i += 1
    }
    if (!candidate) return null
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) {
      val b = mojiByte(s.charAt(i))
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      // a real repair collapses >= 1 multi-byte sequence, so it always
      // SHRINKS; equal length means pure ASCII round-trip (not mojibake)
      if (out.length < s.length) out else null
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }
  }

  /** Repair UTF-8-as-cp1252 mojibake to a fixpoint (bounded at 3
    * layers — beyond double-encoding does not occur in practice);
    * non-mojibake input returns unchanged, identical instance.
    */
  def repairMojibakeScalar(s: String): String = {
    if (s == null || s.isEmpty) return s
    var cur = s
    var rounds = 0
    while (rounds < 3) {
      val next = repairOnce(cur)
      if (next == null) return cur
      cur = next
      rounds += 1
    }
    cur
  }

  private val nfcUdf = udf { s: String => nfcScalar(s) }
  private val nfkcUdf = udf { s: String => nfkcScalar(s) }
  private val stripUdf = udf { s: String => stripControlsScalar(s) }
  private val repairUdf = udf { s: String => repairMojibakeScalar(s) }

  /** Column form of [[nfcScalar]]. */
  def nfc(text: Column): Column = nfcUdf(text)

  /** Column form of [[nfkcScalar]]. */
  def nfkc(text: Column): Column = nfkcUdf(text)

  /** Column form of [[stripControlsScalar]]. */
  def stripControls(text: Column): Column = stripUdf(text)

  /** Column form of [[repairMojibakeScalar]]. */
  def repairMojibake(text: Column): Column = repairUdf(text)

  /** The composed cleanup a crawl corpus runs before dedup: mojibake
    * repair, then NFC, then control strip — in that order (repair must
    * see the raw chars; normalization must see repaired ones).
    */
  def cleanText(text: Column): Column =
    stripControls(nfc(repairMojibake(text)))
}
