package graft.etl

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Robustness properties for the native mini-PDF reader: an ingest inbox
  * feeds it ARBITRARY bytes — corrupt downloads, truncated uploads,
  * junk behind a valid `%PDF-` magic. Its contract is total: None (the
  * caller falls back to the text view) or a well-formed ParsedDoc —
  * never an exception, never nonsense counts.
  */
object MiniPdfProps extends Properties("MiniPdf") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val magic = "%PDF-1.4\n".getBytes("ISO-8859-1")

  private def sane(d: graft.model.ParsedDoc): Boolean =
    d.pageCount >= 1 && d.fileSize >= 0 && d.contentSha.length == 64 &&
      d.elements.forall(e =>
        Set("heading", "text", "table", "picture").contains(e.elemType) &&
          e.page >= 1 && e.page <= d.pageCount)

  property("arbitrary bytes behind the magic: total, any Some is sane") =
    forAll(Gen.choose(0, 2048), Gen.long) { (n, seed) =>
      val r = new scala.util.Random(seed)
      val junk = new Array[Byte](n); r.nextBytes(junk)
      MiniPdf.parse("/x/f.pdf", magic ++ junk).forall(sane)
    }

  property("mutations of a valid fixture: total, any Some is sane") =
    forAll(Gen.choose(0, 63), Gen.long) { (mutations, seed) =>
      val r = new scala.util.Random(seed)
      val b = PdfFixtures.twoPageWithImage(flate = r.nextBoolean()).clone()
      for (_ <- 0 until mutations)
        b(r.nextInt(b.length)) = r.nextInt(256).toByte
      MiniPdf.parse("/x/m.pdf", b).forall(sane)
    }

  property("truncations of a valid fixture: total, any Some is sane") =
    forAll(Gen.choose(0, 100), Gen.oneOf(true, false)) { (pct, flate) =>
      val full = PdfFixtures.twoPageWithImage(flate)
      val cut = full.take(math.max(0, full.length * pct / 100))
      MiniPdf.parse("/x/t.pdf", cut).forall(sane)
    }

  property("the default parser is total on the same inputs (fallback path)") =
    forAll(Gen.choose(0, 512), Gen.long) { (n, seed) =>
      val r = new scala.util.Random(seed)
      val junk = new Array[Byte](n); r.nextBytes(junk)
      val parser = new Parse.TextDocParser
      val doc = parser.parse("/x/f.pdf", magic ++ junk)
      doc.pageCount >= 1 && doc.contentSha == Parse.sha256Hex(magic ++ junk)
    }
}
