package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** The jar-free REAL-format path (round 12): a hand-authored, fully valid
  * PDF parses STRUCTURALLY through the default parser — no pdfbox jar —
  * with pages, layout elements, and image XObjects intact; documents
  * outside the [[MiniPdf]] subset fall back to the deterministic text
  * view instead of failing or half-parsing.
  */
class MiniPdfSpec extends AnyFunSuite {

  private val parser = new Parse.TextDocParser

  test("two-page fixture parses structurally through the default path") {
    val bytes = PdfFixtures.twoPageWithImage()
    val doc = parser.parse("/inbox/report.pdf", bytes)
    assert(doc.pageCount == 2)
    assert(doc.filename == "report.pdf")
    assert(doc.fileSize == bytes.length.toLong)
    assert(doc.contentSha == Parse.sha256Hex(bytes))
    val p1 = doc.elements.filter(_.page == 1)
    assert(p1.exists(e => e.elemType == "heading" && e.text == "Quarterly Overview"))
    assert(p1.exists(e => e.elemType == "text" &&
      e.text.contains("Revenue grew strongly")))
    assert(p1.exists(e => e.elemType == "table" && e.caption == "totals by region"))
    val p2 = doc.elements.filter(_.page == 2)
    assert(p2.exists(e => e.elemType == "heading" && e.text == "Appendix notes"))
    assert(p2.count(_.elemType == "picture") == 1,
      "the page-2 image XObject must surface as one picture element")
    assert(p2.filter(_.elemType == "picture").forall(_.imagePng == null),
      "the native reader does not rasterize — that is PDFBox's job")
    assert(p1.forall(_.elemType != "picture"),
      "the image must attach to ITS page, not page 1")
  }

  test("FlateDecode content streams inflate via JDK zlib, same elements") {
    val plain = parser.parse("/x/a.pdf", PdfFixtures.twoPageWithImage())
    val flate = parser.parse("/x/a.pdf", PdfFixtures.twoPageWithImage(flate = true))
    assert(flate.pageCount == 2)
    def shape(d: graft.model.ParsedDoc) =
      d.elements.map(e => (e.elemType, e.level, e.caption, e.text, e.page))
    assert(shape(flate) == shape(plain),
      "compression must not change the parsed structure")
  }

  test("TJ arrays, hex strings, and the quote operator reconstruct text") {
    val doc = parser.parse("/x/ops.pdf", PdfFixtures.operatorVariants())
    assert(doc.pageCount == 1)
    assert(doc.elements.exists(e => e.elemType == "heading" &&
      e.text == "Mixed operators"), "TJ kerning array must join its strings")
    val text = doc.elements.filter(_.elemType == "text").map(_.text).mkString(" ")
    assert(text.contains("Hex side"), "hex string must decode")
    assert(text.contains("and a quoted line."), "' operator must show its string")
  }

  test("PDF 1.5 xref-stream + object-stream plumbing parses identically (r18)") {
    // same document, modern wiring: page/catalog/font dicts packed in a
    // FlateDecode ObjStm, cross-reference as a /Type /XRef stream — with
    // and without the PNG Up row predictor writers conventionally apply
    val classic = parser.parse("/x/a.pdf", PdfFixtures.twoPageWithImage())
    def shape(d: graft.model.ParsedDoc) =
      d.elements.map(e => (e.elemType, e.level, e.caption, e.text, e.page))
    for (pred <- Seq(true, false)) {
      val modern = parser.parse("/x/a.pdf",
        PdfFixtures.twoPageXref15(predictor12 = pred))
      assert(modern.pageCount == 2, s"predictor12=$pred")
      assert(shape(modern) == shape(classic),
        s"modern wiring must not change parsed structure (predictor12=$pred)")
    }
  }

  test("xref-stream integrity: an in-use entry with no object refuses (r18)") {
    // the xref stream promises object 42 at a byte offset; the bytes do
    // not contain it — a truncated/damaged file, never half-parsed
    val bad = PdfFixtures.twoPageXref15(extraEntries = Seq(42))
    assert(MiniPdf.parse("/x/bad.pdf", bad).isEmpty,
      "a file promising objects it does not contain must refuse")
    // the intact twin parses — the refusal is the integrity check, not
    // an allergy to xref streams
    assert(MiniPdf.parse("/x/ok.pdf", PdfFixtures.twoPageXref15()).isDefined)
    // an INDIRECT /N in the ObjStm dict is outside the subset and must
    // read as ABSENT (whole-doc refusal) — never as a backtracked,
    // truncated integer that silently drops contained pages
    val raw = new String(PdfFixtures.twoPageXref15(),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val indirect = raw.replace("/N 5 /First", "/N 25 0 R /First")
    assert(indirect != raw, "fixture must contain the ObjStm /N entry")
    assert(MiniPdf.parse("/x/indirect.pdf",
      indirect.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)).isEmpty,
      "an indirect ObjStm /N must refuse, not truncate to a wrong count")
  }

  test("single-byte corruption of the modern fixtures is total and sane (r18)") {
    // every byte position x {0x00, 0xFF, bit-flip}: parse() must stay
    // TOTAL (None or a sane document — never a throw, never a page
    // count the bytes do not support)
    for (fixture <- Seq(PdfFixtures.twoPageXref15(predictor12 = true),
                        PdfFixtures.twoPageXref15(predictor12 = false));
         pos <- fixture.indices;
         v <- Seq(0x00.toByte, 0xFF.toByte, (fixture(pos) ^ 0x40).toByte)) {
      val b = fixture.clone(); b(pos) = v
      MiniPdf.parse("/x/corrupt.pdf", b) match {
        case None => ()
        case Some(d) =>
          assert(d.pageCount >= 1 && d.pageCount <= 2 &&
            d.fileSize == b.length.toLong,
            s"insane parse at pos=$pos v=$v: pages=${d.pageCount}")
      }
    }
  }

  test("outside-subset documents fall back to the text view, never throw") {
    // %PDF- magic with no parsable objects: the SwapRecoverySpec corpus
    // shape — must keep its historical text-view parse
    val soup = "%PDF-1.4 hello swap recovery".getBytes("UTF-8")
    val doc = parser.parse("/x/soup.pdf", soup)
    assert(doc.pageCount == 1)
    assert(doc.elements.exists(e => e.elemType == "text" &&
      e.text.contains("hello swap recovery")))
    // encrypted marker → refused → text view
    val enc = ("%PDF-1.4\n1 0 obj << /Type /Page >> endobj\n" +
      "trailer << /Encrypt 9 0 R >>").getBytes("UTF-8")
    assert(parser.parse("/x/enc.pdf", enc).elements.nonEmpty)
    // object-stream marker → refused (hidden pages) → text view
    val objstm = ("%PDF-1.5\n1 0 obj << /Type /ObjStm >> endobj").getBytes("UTF-8")
    parser.parse("/x/objstm.pdf", objstm)
    // and plain text without the magic is untouched by the sniff
    val txt = parser.parse("/x/memo.pdf", "Title:\nBody line.".getBytes("UTF-8"))
    assert(txt.elements.exists(e => e.elemType == "heading" && e.text == "Title"))
  }

  test("a 'stream' substring inside dict tokens does not mis-slice the payload") {
    // /Kind /streamy puts the substring "stream" INSIDE a dict name,
    // BEFORE the real keyword: a raw indexOf match sliced the dict there
    // and rendered the tail of the dict as page text (round-12 bug). The
    // keyword must match only as a standalone token followed by EOL.
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Page /Contents 2 0 R >> endobj\n" +
      "2 0 obj << /Length 41 /Kind /streamy >>\n" +
      "stream\n" +
      "BT (Decoy dict parsed right.) Tj ET\n" +
      "endstream\nendobj\n").getBytes("UTF-8")
    val doc = parser.parse("/x/decoy.pdf", pdf)
    assert(doc.pageCount == 1)
    val texts = doc.elements.map(_.text).filter(_ != null)
    assert(texts.exists(_.contains("Decoy dict parsed right.")),
      s"payload must slice at the keyword, got: $texts")
    assert(!texts.exists(_.contains(">>")),
      "no dict fragment may leak into the page text")
  }

  test("truncated or corrupt streams refuse rather than half-parse") {
    val good = PdfFixtures.twoPageWithImage(flate = true)
    // chop the file mid-body: whatever MiniPdf cannot prove complete
    // must not yield a silently partial structured parse that LOOKS
    // healthy — either a conservative parse of intact objects or the
    // text-view fallback, but never an exception
    for (cut <- Seq(good.length / 4, good.length / 2, good.length - 20)) {
      val doc = parser.parse("/x/cut.pdf", good.take(cut))
      assert(doc != null && doc.pageCount >= 1)
    }
  }
}
