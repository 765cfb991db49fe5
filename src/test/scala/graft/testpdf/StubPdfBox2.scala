package graft.testpdf

/** TEST-ONLY stub of the exact reflective surface
  * [[graft.etl.Parse.PdfBoxDocParser]] binds on a PDFBox **2.x** jar
  * (`PDDocument.load(byte[])` static entry, `text.PDFTextStripper` with
  * page-bounded `getText`, `rendering.PDFRenderer.renderImage(int,
  * float)`, and the `getResources`/`getXObjectNames`/`isImageXObject`
  * image walk against `cos.COSName`). No real pdfbox jar has ever been
  * present in a build sandbox, which left the adapter's plumbing —
  * version dispatch, close discipline, per-document error isolation —
  * permanently unexecuted; parsing here is a trivial deterministic fake
  * (UTF-8 text, pages split on form-feed, one image per `[IMG]` line)
  * because the PLUMBING is what the stub exists to execute, not PDF
  * decoding. Class and method SIGNATURES mirror the public PDFBox 2.x
  * API shape; bodies are original fakes.
  *
  * Failure hooks: a payload starting with `BOOM` refuses in `load`; a
  * page containing `FAILPAGE` refuses in `getText` — so specs can pin
  * that the adapter closes the document on EVERY exit path.
  */
package cos {
  final class COSName private[testpdf] (val name: String)
  object COSName {
    def of(n: String): COSName = new COSName(n)
  }
}

package pdmodel {
  import graft.testpdf.cos.COSName

  final class PDResources private[testpdf] (images: Int) {
    def getXObjectNames: java.lang.Iterable[Object] = {
      val l = new java.util.ArrayList[Object]()
      (0 until images).foreach(i => l.add(COSName.of(s"Im$i")))
      l
    }
    def isImageXObject(nm: COSName): Boolean = nm.name.startsWith("Im")
  }

  final class PDPage private[testpdf] (images: Int) {
    def getResources: PDResources = new PDResources(images)
  }

  final class PDDocument private[testpdf] (val pages: Array[String]) {
    private var closeCount = 0
    def getNumberOfPages: Int = pages.length
    def getPage(i: Int): PDPage =
      new PDPage(pages(i).linesIterator.count(_.trim == "[IMG]"))
    def close(): Unit = {
      closeCount += 1
      PDDocument.closes.incrementAndGet()
      if (closeCount > 1) PDDocument.doubleCloses.incrementAndGet()
      ()
    }
  }

  object PDDocument {
    val loads = new java.util.concurrent.atomic.AtomicInteger
    val closes = new java.util.concurrent.atomic.AtomicInteger
    val doubleCloses = new java.util.concurrent.atomic.AtomicInteger
    def resetCounters(): Unit = {
      loads.set(0); closes.set(0); doubleCloses.set(0)
    }
    /** The 2.x static entry the adapter binds when no `Loader` exists. */
    def load(bytes: Array[Byte]): PDDocument = {
      loads.incrementAndGet()
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      if (text.startsWith("BOOM"))
        throw new java.io.IOException("stub load refused: BOOM payload")
      new PDDocument(text.split('\f'))
    }
  }
}

package text {
  import graft.testpdf.pdmodel.PDDocument

  final class PDFTextStripper {
    private var start = 1
    private var end = 1
    def setStartPage(p: Int): Unit = start = p
    def setEndPage(p: Int): Unit = end = p
    def getText(doc: PDDocument): String = {
      val t = doc.pages(start - 1)
      if (t.contains("FAILPAGE"))
        throw new IllegalStateException("stub stripper refused: FAILPAGE")
      t
    }
  }
}

package rendering {
  import graft.testpdf.pdmodel.PDDocument

  final class PDFRenderer(doc: PDDocument) {
    /** Same `(pageIndex, scale)` signature the adapter binds; the fake
      * raster's width encodes the scale (10·scale px) so a spec can see
      * the docling 2x reached the renderer.
      */
    def renderImage(pageIndex: Int, scale: Float): java.awt.image.BufferedImage = {
      val w = math.max(1, (10 * scale).toInt)
      new java.awt.image.BufferedImage(
        w, w, java.awt.image.BufferedImage.TYPE_INT_RGB)
    }
  }
}
