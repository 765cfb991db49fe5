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
  *    that stays [[Parse.PdfBoxDocParser]]'s job);
  *  - OBJECT STREAMS (`/Type /ObjStm`, ISO 32000-1 §7.5.7 — r18): the
  *    PDF 1.5+ container most modern writers put page/catalog dicts in.
  *    The payload inflates with the same JDK zlib path; its `/N`
  *    integer-pair header locates each contained object, which then
  *    joins the object map like a top-level one. An object stream that
  *    fails to decode refuses the WHOLE document (its hidden objects
  *    could include pages — a "visible subset" answer would be silently
  *    wrong);
  *  - CROSS-REFERENCE STREAMS (`/Type /XRef`, §7.5.8 — r18): the
  *    file-order scanner never needs offsets, so the xref stream serves
  *    as an INTEGRITY check instead: its typed entry rows (after
  *    FlateDecode and the PNG row predictors writers wrap them in,
  *    §7.4.4.4) list every live object — an in-use entry whose object
  *    the scanner could not produce means a truncated or damaged file,
  *    which refuses rather than half-parses. Files with incremental
  *    updates (`/Prev`) skip the check (supersession makes absence
  *    legitimate) but still parse.
  *
  * OUT of scope — anything needing more than headers-and-streams:
  * encryption, CID/Type0 composite-font text (bytes would decode to
  * garbage without the CMap). Those return None and the caller falls
  * back: [[Parse.TextDocParser]] keeps its deterministic text view, and
  * a classpath with PDFBox uses the full adapter. Extracted page text
  * flows through [[Parse.layoutElements]], so a mini-parsed document
  * yields the same element shapes as every other parser.
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
    val top = ObjRe.findAllMatchIn(raw).map(m =>
      (m.group(1).toInt, m.group(2))).toSeq
    // expand object streams in place: each /ObjStm's contained objects
    // join the scan at the container's position (file order preserved).
    // A container that fails to decode hides an unknown object set —
    // possibly pages — so the whole document refuses (never half-right).
    val expanded = Seq.newBuilder[(Int, String)]
    for ((num, body) <- top) {
      expanded += (num -> body) // containers stay: type-2 xref entries
      if (isType(dictOf(body), "ObjStm")) // name their object stream
        expanded ++= extractObjStm(body).getOrElse(return None)
    }
    val objs = expanded.result()
    val byNum = objs.toMap
    // xref-stream integrity check (see object doc): every in-use entry
    // must have produced an object
    val xrefs = top.filter { case (_, b) => isType(dictOf(b), "XRef") }
    if (xrefs.size == 1 && !dictOf(xrefs.head._2).contains("/Prev") &&
        !xrefCovered(xrefs.head._2, byNum.keySet)) return None
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

  private def isType(dict: String, t: String): Boolean =
    ("/Type\\s*/" + t + "\\b").r.findFirstIn(dict).isDefined

  /** First `/Key <int>` entry of a dict (direct integers only — an
    * indirect ref here is outside the subset and reads as absent). The
    * `\b` after the digits is load-bearing: without it the regex engine
    * BACKTRACKS on an indirect ref (`/N 25 0 R` would "match" a
    * truncated 2 instead of reading as absent — a silently wrong count).
    */
  private def intEntry(dict: String, key: String): Option[Int] =
    ("/" + key + "\\s+(\\d+)\\b(?!\\s+0\\s+R\\b)").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Contained objects of an object stream (ISO 32000-1 §7.5.7): the
    * decoded payload opens with `/N` integer pairs `objnum offset`,
    * offsets relative to `/First`; bodies are bare dict/value text
    * (contained objects carry no streams by spec). None when the
    * container itself is outside the subset.
    */
  private def extractObjStm(body: String): Option[Seq[(Int, String)]] = {
    val dict = dictOf(body)
    val n = intEntry(dict, "N").getOrElse(return None)
    val first = intEntry(dict, "First").getOrElse(return None)
    val data = streamData(body).getOrElse(return None)
    if (n < 0 || first > data.length) return None
    val pairs = """\d+""".r.findAllIn(data.substring(0, first))
      .map(_.toLong).take(2 * n).toSeq
    if (pairs.length < 2 * n) return None
    val out = Seq.newBuilder[(Int, String)]
    for (i <- 0 until n) {
      val num = pairs(2 * i)
      val start = first + pairs(2 * i + 1)
      val end = if (i + 1 < n) first + pairs(2 * i + 3) else data.length.toLong
      if (num > Int.MaxValue || start < first || end < start ||
          end > data.length) return None
      out += (num.toInt -> data.substring(start.toInt, end.toInt))
    }
    Some(out.result())
  }

  /** True when every in-use entry of the xref STREAM (§7.5.8) resolved
    * to a scanned object: type-1 entries name the object directly,
    * type-2 entries name both the object and its containing object
    * stream. Free (type-0) and spec-reserved future types are skipped
    * (the spec reads unknown types as references to null). False =
    * the file promises objects the bytes no longer contain.
    */
  private def xrefCovered(body: String, known: Set[Int]): Boolean = {
    val dict = dictOf(body)
    val w = """/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]""".r
      .findFirstMatchIn(dict).getOrElse(return false)
    val (w1, w2, w3) = (w.group(1).toInt, w.group(2).toInt, w.group(3).toInt)
    val rowLen = w1 + w2 + w3
    if (rowLen == 0 || rowLen > 32) return false
    val size = intEntry(dict, "Size").getOrElse(return false)
    val index: Seq[(Int, Int)] =
      """/Index\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict) match {
        case Some(m) =>
          val nums = """\d+""".r.findAllIn(m.group(1)).map(_.toInt).toSeq
          if (nums.length % 2 != 0) return false
          nums.grouped(2).map(p => (p(0), p(1))).toSeq
        case None => Seq((0, size))
      }
    val raw = streamData(body).getOrElse(return false)
      .getBytes(StandardCharsets.ISO_8859_1)
    val rows = unpredict(raw, dict, rowLen).getOrElse(return false)
    val total = index.map(_._2.toLong).sum
    if (rows.length < total * rowLen) return false
    def be(off: Int, len: Int): Long = {
      var v = 0L
      for (j <- 0 until len) v = (v << 8) | (rows(off + j) & 0xFFL)
      v
    }
    var row = 0
    for ((start, count) <- index; i <- 0 until count) {
      val off = row * rowLen
      row += 1
      val typ = if (w1 == 0) 1L else be(off, w1)
      val f2 = be(off + w1, w2)
      val objNum = start + i
      typ match {
        case 1L =>
          if (objNum != 0 && !known(objNum)) return false
        case 2L =>
          if (f2 > Int.MaxValue || !known(f2.toInt) || !known(objNum))
            return false
        case _ => () // type 0 free; future types read as null refs
      }
    }
    true
  }

  /** Undo the PNG row predictors xref streams are conventionally
    * filtered with (`/DecodeParms << /Predictor >= 10 /Columns w >>`,
    * §7.4.4.4; one byte per component): each row is a filter byte plus
    * `rowLen` data bytes. Predictor < 10 (none declared, or the spec's
    * "no prediction" values 1-2 we don't need) returns the bytes
    * unchanged when absent, None when declared-but-unsupported.
    */
  private def unpredict(data: Array[Byte], dict: String,
                        rowLen: Int): Option[Array[Byte]] = {
    val parms = """/DecodeParms\s*<<([^>]*)>>""".r
      .findFirstMatchIn(dict).map(_.group(1))
    val predictor = parms.flatMap(intEntry(_, "Predictor")).getOrElse(1)
    if (predictor == 1) return Some(data)
    if (predictor < 10) return None // TIFF predictor: outside the subset
    val cols = parms.flatMap(intEntry(_, "Columns")).getOrElse(1)
    if (cols != rowLen) return None // xref rows are 1 byte/component
    if (data.length % (rowLen + 1) != 0) return None
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    val prev = new Array[Byte](rowLen)
    for (r <- 0 until rows) {
      val ft = data(r * (rowLen + 1)) & 0xFF
      val row = java.util.Arrays.copyOfRange(
        data, r * (rowLen + 1) + 1, (r + 1) * (rowLen + 1))
      ft match {
        case 0 => ()
        case 1 =>
          for (i <- 1 until rowLen) row(i) = (row(i) + row(i - 1)).toByte
        case 2 =>
          for (i <- 0 until rowLen) row(i) = (row(i) + prev(i)).toByte
        case 3 =>
          for (i <- 0 until rowLen) {
            val left = if (i > 0) row(i - 1) & 0xFF else 0
            row(i) = (row(i) + (left + (prev(i) & 0xFF)) / 2).toByte
          }
        case 4 =>
          for (i <- 0 until rowLen) {
            val a = if (i > 0) row(i - 1) & 0xFF else 0
            val b = prev(i) & 0xFF
            val c = if (i > 0) prev(i - 1) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            row(i) = (row(i) + pred).toByte
          }
        case _ => return None
      }
      System.arraycopy(row, 0, out, r * rowLen, rowLen)
      System.arraycopy(row, 0, prev, 0, rowLen)
    }
    Some(out)
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
