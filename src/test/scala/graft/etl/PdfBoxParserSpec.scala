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
}
