package graft.etl

import java.nio.charset.StandardCharsets

import graft.model.{DocElement, ParsedDoc}

/** [EXT] Minimal NATIVE reader for simple PDFs — the jar-free real-format
  * path. PDF is a public text-plus-streams format (ISO 32000); a useful
  * subset parses with nothing beyond the JDK:
  *
  *  - body objects `N 0 obj … endobj` scanned in file order (no xref
  *    needed — the spec's own recommended reconstruction strategy for
  *    damaged files, ISO 32000-1 §7.5.8 note);
  *  - pages = objects whose dict carries `/Type /Page`, in file order;
  *  - each page's `/Contents` (single ref or array) resolved to its
  *    stream object; stream bytes taken between `stream`/`endstream`,
  *    inflated when `/FlateDecode` is declared (JDK zlib — Inflater);
  *  - text reconstructed from the show operators (`Tj`, `TJ`, `'`, `"`)
  *    with literal-string escapes, octal codes, and hex strings; the
  *    positioning operators `Td`/`TD`/`T*`/`ET` become line breaks;
  *  - image XObjects counted per page by resolving the page's refs (one
  *    indirection deep, for an indirect `/Resources`) and matching
  *    `/Subtype /Image` — each becomes a captionless `picture` element
  *    with no rendered bytes (rasterizing needs a font/graphics engine;
  *    that stays [[Parse.PdfBoxDocParser]]'s job).
  *
  * OUT of scope — anything needing more than headers-and-streams:
  * encryption, cross-reference/object streams (PDF 1.5 compressed
  * objects), CID/Type0 composite-font text (bytes would decode to
  * garbage without the CMap). All of those return None and the caller
  * falls back: [[Parse.TextDocParser]] keeps its deterministic text
  * view, and a classpath with PDFBox uses the full adapter. Extracted
  * page text flows through [[Parse.layoutElements]], so a mini-parsed
  * document yields the same element shapes as every other parser.
  */
object MiniPdf {

  def isPdf(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
      b(3) == 'F' && b(4) == '-'

  /** Structured parse, or None when the document uses features outside
    * the subset (caller falls back — never a half-right result: a PDF
    * with pages but undecodable content is refused, not emptied).
    */
  def parse(path: String, content: Array[Byte]): Option[ParsedDoc] =
    try parseUnsafe(path, content)
    catch { case scala.util.control.NonFatal(_) => None }

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj\b(.*?)endobj""".r
  private val PageTypeRe = """/Type\s*/Page\b""".r
  private val RefRe = """(\d+)\s+\d+\s+R\b""".r
  /** The `stream` KEYWORD as a standalone token followed by its
    * spec-mandated EOL (ISO 32000-1 §7.3.8.1: CRLF or LF; a bare CR is
    * tolerated for robustness). A raw `indexOf("stream")` also matched
    * the substring inside names or literal strings (`/MyStreamKind`,
    * `(a stream)`), mis-slicing dict vs payload into garbage page text
    * instead of the intended refuse-and-fallback.
    */
  private val StreamKwRe = """(?<![A-Za-z0-9])stream(\r\n|\n|\r)""".r

  /** Index of the stream keyword in `body` (dict ends there) and of the
    * first payload byte (just past the keyword's EOL); None when no
    * well-formed stream keyword exists.
    */
  private def streamKeywordAt(body: String): Option[(Int, Int)] =
    StreamKwRe.findFirstMatchIn(body).map(m => (m.start, m.end))

  private def parseUnsafe(path: String, content: Array[Byte]): Option[ParsedDoc] = {
    if (!isPdf(content)) return None
    // latin-1 is byte-preserving both ways: dict text parses as chars,
    // stream bytes recover exactly via getBytes(ISO_8859_1)
    val raw = new String(content, StandardCharsets.ISO_8859_1)
    if (raw.contains("/Encrypt")) return None
    val objs = ObjRe.findAllMatchIn(raw).map(m =>
      (m.group(1).toInt, m.group(2))).toSeq
    val byNum = objs.toMap
    // object streams hide page objects where this scanner cannot see
    // them — a page count from the visible subset would be silently
    // wrong, so refuse instead
    if (raw.contains("/ObjStm")) return None
    val pages = objs.filter { case (_, body) =>
      PageTypeRe.findFirstIn(dictOf(body)).isDefined
    }
    if (pages.isEmpty) return None
    val elements = Seq.newBuilder[DocElement]
    for (((_, body), idx) <- pages.zipWithIndex) {
      val page = idx + 1
      val text = contentRefs(body).flatMap(byNum.get)
        .flatMap(streamData(_)).map(showText).mkString("\n")
      elements ++= Parse.layoutElements(text, page)
      var img = imageCount(body, byNum)
      while (img > 0) {
        elements += DocElement("picture", 0, null, null, page)
        img -= 1
      }
    }
    Some(ParsedDoc(
      path = path,
      filename = path.split('/').last,
      pageCount = pages.length,
      fileSize = content.length.toLong,
      contentSha = Parse.sha256Hex(content),
      elements = elements.result()))
  }

  /** The object's dictionary text — everything before its stream keyword
    * (stream bytes may contain anything, including `/Type /Page`).
    */
  private def dictOf(body: String): String =
    streamKeywordAt(body).fold(body) { case (s, _) => body.substring(0, s) }

  /** Refs listed under /Contents: `/Contents 4 0 R` or
    * `/Contents [4 0 R 6 0 R]`.
    */
  private def contentRefs(pageBody: String): Seq[Int] = {
    val at = pageBody.indexOf("/Contents")
    if (at < 0) return Nil
    val rest = pageBody.substring(at + "/Contents".length)
    val trimmed = rest.dropWhile(_.isWhitespace)
    if (trimmed.startsWith("[")) {
      val end = trimmed.indexOf(']')
      if (end < 0) Nil
      else RefRe.findAllMatchIn(trimmed.substring(1, end))
        .map(_.group(1).toInt).toSeq
    } else RefRe.findFirstMatchIn(trimmed).map(_.group(1).toInt).toSeq
  }

  /** Decoded stream payload of a stream object, applying FlateDecode
    * when declared. None for filter chains outside the subset.
    */
  private def streamData(body: String): Option[String] = {
    val (s, lo) = streamKeywordAt(body).getOrElse(return None)
    val dict = body.substring(0, s)
    val hi = body.lastIndexOf("endstream")
    if (hi < lo) return None
    var data = body.substring(lo, hi)
    // the spec requires an EOL before endstream; tolerate its absence
    if (data.endsWith("\n")) data = data.dropRight(1)
    if (data.endsWith("\r")) data = data.dropRight(1)
    if (dict.contains("/Filter")) {
      if (!dict.contains("/FlateDecode") ||
          RefRe.findFirstIn(dict.substring(dict.indexOf("/Filter"))).isDefined)
        return None // unsupported or indirect filter spec
      val inflater = new java.util.zip.Inflater()
      try {
        inflater.setInput(data.getBytes(StandardCharsets.ISO_8859_1))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inflater.finished()) {
          val n = inflater.inflate(buf)
          if (n == 0 && inflater.needsInput()) return None // truncated
          out.write(buf, 0, n)
        }
        Some(new String(out.toByteArray, StandardCharsets.ISO_8859_1))
      } finally inflater.end()
    } else Some(data)
  }

  /** Image XObjects reachable from the page: every ref in the page dict,
    * plus (one level deep) refs inside any referenced dict that declares
    * an /XObject entry — covers both inline and indirect /Resources.
    */
  private def imageCount(pageBody: String, byNum: Map[Int, String]): Int = {
    val direct = RefRe.findAllMatchIn(dictOf(pageBody)).map(_.group(1).toInt).toSeq
    val indirect = direct.flatMap(byNum.get).filter(_.contains("/XObject"))
      .flatMap(b => RefRe.findAllMatchIn(dictOf(b)).map(_.group(1).toInt))
    (direct ++ indirect).distinct
      .flatMap(byNum.get)
      .count(b => dictOf(b).contains("/Subtype") &&
        """/Subtype\s*/Image\b""".r.findFirstIn(dictOf(b)).isDefined)
  }

  /** Text shown by a content stream, in operator order. Strings
    * accumulate (literal escapes + octal, hex strings) and flush on the
    * show operators; `Td`/`TD`/`T*`/`ET` break lines — enough to
    * reconstruct reading order for the line-oriented layouts this subset
    * targets.
    */
  private[etl] def showText(cs: String): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    def newline(): Unit =
      if (out.nonEmpty && out.charAt(out.length - 1) != '\n') out.append('\n')
    val n = cs.length
    var i = 0
    def isDelim(c: Char): Boolean =
      c.isWhitespace || c == '(' || c == ')' || c == '<' || c == '>' ||
        c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '(') {
        i += 1
        var depth = 1
        while (i < n && depth > 0) {
          val ch = cs.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            cs.charAt(i + 1) match {
              case 'n' => pending.append('\n'); i += 2
              case 'r' => pending.append('\r'); i += 2
              case 't' => pending.append('\t'); i += 2
              case d if d >= '0' && d <= '7' =>
                var j = i + 1
                var v = 0
                while (j < n && j < i + 4 && cs.charAt(j) >= '0' && cs.charAt(j) <= '7') {
                  v = v * 8 + (cs.charAt(j) - '0'); j += 1
                }
                pending.append(v.toChar); i = j
              case e => pending.append(e); i += 2
            }
          } else if (ch == '(') { depth += 1; pending.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) pending.append(ch); i += 1 }
          else { pending.append(ch); i += 1 }
        }
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        val end = cs.indexOf('>', i + 1)
        if (end < 0) i = n
        else {
          val hex = cs.substring(i + 1, end).filterNot(_.isWhitespace)
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          var k = 0
          while (k + 2 <= padded.length) {
            pending.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar)
            k += 2
          }
          i = end + 1
        }
      } else if (c == '<') i += 2 // dict open «<<» — skip both
      else if (!isDelim(c)) {
        var j = i
        while (j < n && !isDelim(cs.charAt(j))) j += 1
        cs.substring(i, j) match {
          case "Tj" | "TJ" => out.append(pending); pending.clear()
          case "'" | "\"" => newline(); out.append(pending); pending.clear()
          case "Td" | "TD" | "T*" => newline()
          case "ET" => newline(); pending.clear()
          case _ => ()
        }
        i = j
      } else i += 1
    }
    out.toString
  }
}
