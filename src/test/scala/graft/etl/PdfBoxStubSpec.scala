package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.Parse.PdfBoxDocParser

/** Executes the reflective PDFBox adapter's PLUMBING against the
  * test-classpath stubs ([[graft.testpdf]] = 2.x surface,
  * [[graft.testpdf3]] = 3.x surface) — version dispatch, the shared
  * layout convention on stripped text, the image-XObject resource walk,
  * renderer presence/absence, close discipline on every exit path, and
  * per-document error isolation. For 13 rounds this code had never run:
  * no sandbox ships a pdfbox jar, so the two jar-present cases in
  * `PdfBoxParserSpec` auto-cancel (they remain, and still run the real
  * jar wherever one exists). The stubs mirror only the public API
  * SHAPE; everything the adapter does on top is what these cases pin.
  */
class PdfBoxStubSpec extends AnyFunSuite with SharedSpark {

  private val PngMagic =
    Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)

  test("2.x surface: dispatch falls back to PDDocument.load; pages, layout, and rendered pictures flow") {
    graft.testpdf.pdmodel.PDDocument.resetCounters()
    val content =
      "Heading One:\nBody text here.\n[IMG]\n\fSecond page text.".getBytes("UTF-8")
    val doc = new PdfBoxDocParser("graft.testpdf").parse("/x/stub.pdf", content)
    assert(doc.pageCount == 2)
    assert(doc.filename == "stub.pdf")
    assert(doc.fileSize == content.length.toLong)
    assert(doc.contentSha == Parse.sha256Hex(content))
    // stripped text runs through the SAME layout convention as the
    // stand-in parser (shared layoutElements)
    assert(doc.elements.exists(e =>
      e.elemType == "heading" && e.level == 1 && e.text == "Heading One"))
    assert(doc.elements.exists(e => e.elemType == "text" && e.page == 2))
    // the [IMG] XObject surfaced via the resource walk, and the picture
    // carries a REAL ImageIO PNG of the renderer's page raster
    val pics = doc.elements.filter(_.elemType == "picture")
    assert(pics.size == 1 && pics.head.page == 1 && pics.head.caption == null)
    val png = pics.head.imagePng
    assert(png != null && png.take(8).toSeq == PngMagic, "real PNG bytes")
    val dims = graft.ext.Multimodal.decodeHeader(png)
    assert(dims.width == 20, s"docling 2x scale must reach the renderer (10·2 px), got $dims")
    assert(graft.testpdf.pdmodel.PDDocument.loads.get == 1)
    assert(graft.testpdf.pdmodel.PDDocument.closes.get == 1,
      "close discipline: exactly one close per parsed document")
    assert(graft.testpdf.pdmodel.PDDocument.doubleCloses.get == 0)
  }

  test("close discipline holds when a page fails mid-parse") {
    graft.testpdf.pdmodel.PDDocument.resetCounters()
    intercept[Exception] {
      new PdfBoxDocParser("graft.testpdf")
        .parse("/x/fail.pdf", "fine first page\fFAILPAGE here".getBytes("UTF-8"))
    }
    assert(graft.testpdf.pdmodel.PDDocument.loads.get == 1)
    assert(graft.testpdf.pdmodel.PDDocument.closes.get == 1,
      "the document must close on the failure path too (finally)")
    assert(graft.testpdf.pdmodel.PDDocument.doubleCloses.get == 0)
  }

  test("per-document error isolation through parseDocuments") {
    import spark.implicits._
    graft.testpdf.pdmodel.PDDocument.resetCounters()
    val bin = Seq(
      ("/x/good.pdf", "survives".getBytes("UTF-8")),
      ("/x/bad.pdf", "BOOM payload".getBytes("UTF-8")),
      ("/x/also_good.pdf", "also survives".getBytes("UTF-8")))
      .toDF("path", "content")
    val docs = Parse.parseDocuments(bin,
      () => new PdfBoxDocParser("graft.testpdf")).collect()
    assert(docs.map(_.filename).toSet == Set("good.pdf", "also_good.pdf"),
      "one refusing document must not sink its partition (main.py:117-118)")
  }

  test("3.x surface: Loader.loadPDF is preferred; a renderer-less build emits bytes-less pictures") {
    val before = graft.testpdf3.Loader.loadPdfCalls.get
    val doc = new PdfBoxDocParser("graft.testpdf3")
      .parse("/x/three.pdf", "some text\n[IMG]".getBytes("UTF-8"))
    assert(graft.testpdf3.Loader.loadPdfCalls.get > before,
      "the 3.x Loader entry must be used when it resolves")
    assert(graft.testpdf3.pdmodel.PDDocument.legacyLoads.get == 0,
      "the 2.x static load must not be touched while Loader is present")
    assert(doc.pageCount == 1)
    val pics = doc.elements.filter(_.elemType == "picture")
    assert(pics.size == 1 && pics.head.imagePng == null,
      "no rendering package → the picture element still flows, bytes-less")
  }

  test("an unavailable prefix fails loud, never a silent empty result") {
    val e = intercept[IllegalStateException] {
      new PdfBoxDocParser("graft.nosuchpdf").parse("/x/a.pdf", "x".getBytes)
    }
    assert(e.getMessage.contains("PDFBox"))
  }
}
