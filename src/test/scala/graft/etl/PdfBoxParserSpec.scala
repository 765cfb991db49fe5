package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.Parse.{PdfBoxDocParser, TextDocParser}

/** The reflective PDFBox adapter's activation contract: no hard
  * dependency, loud failure when used without the jar, graceful fallback
  * selection — and, when a pdfbox jar IS present (not in this sandbox),
  * a real fixture round-trip.
  */
class PdfBoxParserSpec extends AnyFunSuite with SharedSpark {

  test("fallback selection matches jar availability") {
    val chosen = PdfBoxDocParser.orFallback()
    if (PdfBoxDocParser.available)
      assert(chosen.isInstanceOf[PdfBoxDocParser])
    else
      assert(chosen.isInstanceOf[TextDocParser])
  }

  test("without the jar, parse fails loud — never a silent empty result") {
    assume(!PdfBoxDocParser.available, "pdfbox jar present: N/A")
    val e = intercept[IllegalStateException] {
      new PdfBoxDocParser().parse("/x/a.pdf", "not a pdf".getBytes)
    }
    assert(e.getMessage.contains("PDFBox"))
  }

  test("the adapter stays out of parseDocuments' default path") {
    import spark.implicits._
    // the deterministic stand-in remains the default mkParser — the
    // pipeline's golden hashes must not depend on which jars happen to
    // be on the classpath
    val bin = Seq(("/x/a.txt", "Title:\nBody.".getBytes)).toDF("path", "content")
    val docs = Parse.parseDocuments(bin).collect()
    assert(docs.length == 1 && docs.head.elements.exists(_.elemType == "heading"))
  }

  test("with the jar, a minimal fixture PDF round-trips") {
    assume(PdfBoxDocParser.available, "no pdfbox jar in this sandbox")
    // a minimal one-page PDF with a single text operator, built by hand
    // so the fixture needs no binary checked in
    val content =
      """%PDF-1.4
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
        |3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
        |  /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj
        |4 0 obj << /Length 44 >>
        |stream
        |BT /F1 12 Tf 72 720 Td (Hello graft) Tj ET
        |endstream
        |endobj
        |5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
        |trailer << /Root 1 0 R >>
        |%%EOF""".stripMargin.getBytes("ISO-8859-1")
    val doc = new PdfBoxDocParser().parse("/x/hello.pdf", content)
    assert(doc.pageCount == 1)
    assert(doc.elements.exists(e =>
      e.elemType == "text" && e.text != null && e.text.contains("Hello graft")))
    assert(doc.contentSha == Parse.sha256Hex(content))
  }

  test("with the jar, pictures carry real rendered PNGs into the object store") {
    assume(PdfBoxDocParser.available, "no pdfbox jar in this sandbox")
    // one page holding a 1x1 image XObject: the resource walk must count
    // it as a picture, and the element must carry a REAL rasterization of
    // the page (PDFRenderer at docling's 2x — pdf_parser.py:30,76), not
    // the deterministic placeholder
    val content =
      """%PDF-1.4
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
        |3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100]
        |  /Contents 4 0 R /Resources << /XObject << /Im1 5 0 R >> >> >> endobj
        |4 0 obj << /Length 30 >>
        |stream
        |q 50 0 0 50 25 25 cm /Im1 Do Q
        |endstream
        |endobj
        |5 0 obj << /Type /XObject /Subtype /Image /Width 1 /Height 1
        |  /ColorSpace /DeviceRGB /BitsPerComponent 8 /Length 3 >>
        |stream
        |""".stripMargin.getBytes("ISO-8859-1") ++ Array[Byte](40, 80, 120) ++
      """
        |endstream
        |endobj
        |trailer << /Root 1 0 R >>
        |%%EOF""".stripMargin.getBytes("ISO-8859-1")
    val doc = new PdfBoxDocParser().parse("/x/fig.pdf", content)
    val pics = doc.elements.filter(_.elemType == "picture")
    assert(pics.nonEmpty, "the image XObject must surface as a picture element")
    val png = pics.head.imagePng
    assert(png != null && png.length > 8, "picture must carry rendered bytes")
    val magic = Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    assert(png.take(8).toSeq == magic.map(_.toByte), "PNG magic")
    // the page is 100x100 pt; a 2x raster is ~200px wide — proves the
    // docling scale reached the renderer
    val dims = graft.ext.Multimodal.decodeHeader(png)
    assert(dims.kind == "image" && dims.width == 200, s"2x raster, got $dims")
    // E5 -> S11: the REAL bytes (not the placeholder) flow to the store
    val charts = Images.extractCharts(doc)
    assert(charts.nonEmpty && charts.head.png.sameElements(png))
    val os = new graft.store.ObjectStore(spark, tmpDir("pdf-bucket"))
    val key = os.chartKey(1L, 1L)
    os.put(key, charts.head.png)
    assert(os.get(key).exists(_._1.sameElements(png)))
  }
}
