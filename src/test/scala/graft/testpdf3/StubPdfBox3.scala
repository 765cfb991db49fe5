package graft.testpdf3

/** TEST-ONLY stub of the PDFBox **3.x** reflective surface (see
  * [[graft.testpdf]] for the 2.x twin and the rationale): the 3.x line
  * loads via `Loader.loadPDF(byte[])`, and this stub's 2.x-shaped
  * `PDDocument.load` THROWS — so a spec proves the adapter's version
  * dispatch prefers the 3.x entry whenever `Loader` resolves. The
  * `rendering` package is deliberately ABSENT: a renderer-less build
  * must still parse text and emit bytes-less picture elements.
  */
object Loader {
  val loadPdfCalls = new java.util.concurrent.atomic.AtomicInteger
  def loadPDF(bytes: Array[Byte]): pdmodel.PDDocument = {
    loadPdfCalls.incrementAndGet()
    new pdmodel.PDDocument(
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8).split('\f'))
  }
}

package cos {
  final class COSName private[testpdf3] (val name: String)
  object COSName {
    def of(n: String): COSName = new COSName(n)
  }
}

package pdmodel {
  import graft.testpdf3.cos.COSName

  final class PDResources private[testpdf3] (images: Int) {
    def getXObjectNames: java.lang.Iterable[Object] = {
      val l = new java.util.ArrayList[Object]()
      (0 until images).foreach(i => l.add(COSName.of(s"Im$i")))
      l
    }
    def isImageXObject(nm: COSName): Boolean = nm.name.startsWith("Im")
  }

  final class PDPage private[testpdf3] (images: Int) {
    def getResources: PDResources = new PDResources(images)
  }

  final class PDDocument private[testpdf3] (val pages: Array[String]) {
    def getNumberOfPages: Int = pages.length
    def getPage(i: Int): PDPage =
      new PDPage(pages(i).linesIterator.count(_.trim == "[IMG]"))
    def close(): Unit = { PDDocument.closes.incrementAndGet(); () }
  }

  object PDDocument {
    val closes = new java.util.concurrent.atomic.AtomicInteger
    val legacyLoads = new java.util.concurrent.atomic.AtomicInteger
    /** 2.x-shaped entry that must never be chosen while `Loader` is on
      * the classpath — throwing here is the dispatch assertion.
      */
    def load(bytes: Array[Byte]): PDDocument = {
      legacyLoads.incrementAndGet()
      throw new IllegalStateException(
        "3.x stub: the 2.x load path must not be used when Loader is present")
    }
  }
}

package text {
  import graft.testpdf3.pdmodel.PDDocument

  final class PDFTextStripper {
    private var start = 1
    private var end = 1
    def setStartPage(p: Int): Unit = start = p
    def setEndPage(p: Int): Unit = end = p
    def getText(doc: PDDocument): String = doc.pages(start - 1)
  }
}
