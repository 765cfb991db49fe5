package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{DocElement, ParsedDoc}

/** E1 — document parsing (reference pdf_parser.py:73-84,219: docling
  * `DocumentConverter.convert`).
  *
  * The docling ML layout model is not reproducible on the JVM and no PDF
  * library ships in this environment, so the decode step is a clearly
  * marked replaceable boundary: `DocParser` is the plug point
  * ([[Parse.PdfBoxDocParser]] parses real PDFs when a pdfbox jar is on
  * the classpath — reflective, no hard dependency), and
  * `TextDocParser` is the deterministic stand-in that reproduces the
  * *shape* of the conversion — pages, reading-order elements, headings
  * with levels, tables and pictures with optional captions (SURVEY §7.5
  * declared divergence).
  *
  * The Spark plumbing is the real contract and is production-shaped:
  * binaryFile rows in, `mapPartitions` with one parser instance per
  * partition (amortizing model init exactly like the reference's
  * init-once constructor, pdf_parser.py:63-71), one ParsedDoc row out per
  * input file, errors isolated per document (main.py:117-118) by
  * returning no row and logging.
  */
object Parse {

  /** The replaceable decode boundary. Implementations must be
    * deterministic given (path, content).
    */
  trait DocParser extends Serializable {
    def parse(path: String, content: Array[Byte]): ParsedDoc
  }

  /** Deterministic stand-in parser: interprets the binary payload as UTF-8
    * "document text" with a tiny layout convention —
    *   - pages separated by form-feed (\f);
    *   - a line ending in ':' with <= 8 words is a heading (level = count
    *     of leading '#' + 1, mirroring outline levels);
    *   - a line starting with "TABLE:" is a table element whose caption is
    *     the remainder (absent caption -> null, the hasattr guard at
    *     pdf_parser.py:158);
    *   - a line starting with "FIGURE:" is a picture element likewise;
    *   - consecutive other non-blank lines form one text block.
    *
    * REAL PDF bytes (`%PDF-` magic) first try the native [[MiniPdf]]
    * subset reader, so the default jar-free pipeline parses simple
    * actual PDFs structurally instead of as UTF-8 soup; a document
    * outside the subset (encrypted, object streams, CID fonts — or the
    * text-labeled-as-pdf payloads the test corpus uses, which carry no
    * magic) falls back to the text view unchanged. Deterministic either
    * way — both branches are pure functions of (path, content).
    */
  final class TextDocParser extends DocParser {
    override def parse(path: String, content: Array[Byte]): ParsedDoc = {
      if (MiniPdf.isPdf(content)) {
        MiniPdf.parse(path, content) match {
          case Some(doc) => return doc
          case None      => () // outside the subset — text view below
        }
      }
      if (graft.ext.HtmlText.isHtml(content)) {
        // web payloads (r18): markup strips through the HtmlText state
        // machine, then the extracted prose rides the SAME layout
        // convention — one page, each HTML block a paragraph (blank-line
        // separated: layoutElements merges adjacent non-blank lines).
        // Bytes decode under the SAME HTML5 charset precedence as the
        // WARC path (r19): BOM > meta-declared charset > UTF-8 — a
        // windows-1252 page declaring itself via <meta charset=...>
        // must not mojibake at the E1 boundary (there is no transport
        // hint here, so the hint slot stays null)
        val extracted = graft.ext.HtmlText.blocks(
          graft.ext.HtmlText.decodeBytes(content))
          .map(_.text).mkString("\n\n")
        return ParsedDoc(
          path = path,
          filename = path.split('/').last,
          pageCount = 1,
          fileSize = content.length.toLong,
          contentSha = sha256Hex(content),
          elements = layoutElements(extracted, 1))
      }
      val text = new String(content, java.nio.charset.StandardCharsets.UTF_8)
      val pages = text.split('\f')
      val elements = Seq.newBuilder[DocElement]
      var page = 0
      while (page < pages.length) {
        elements ++= layoutElements(pages(page), page + 1)
        page += 1
      }
      ParsedDoc(
        path = path,
        filename = path.split('/').last, // basename (main.py:98)
        pageCount = pages.length,
        fileSize = content.length.toLong,
        contentSha = sha256Hex(content),
        elements = elements.result())
    }
  }

  private[etl] def sha256Hex(content: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(content).map("%02x".format(_)).mkString

  /** One page of plain text → reading-order elements, the shared layout
    * convention of [[TextDocParser]]'s scaladoc (headings, TABLE:/FIGURE:
    * markers, paragraph grouping). [[PdfBoxDocParser]] reuses it on the
    * text PDFBox extracts, so both parsers emit the same element shapes.
    */
  private[etl] def layoutElements(pageText: String, page: Int): Seq[DocElement] = {
    val elements = Seq.newBuilder[DocElement]
    val para = new StringBuilder
    def flushPara(): Unit = if (para.nonEmpty) {
      elements += DocElement("text", 0, null, para.toString.trim, page)
      para.clear()
    }
    pageText.split('\n').foreach { raw =>
      val line = raw.trim
      if (line.isEmpty) flushPara()
      else if (line.startsWith("TABLE:")) {
        flushPara()
        val cap = line.stripPrefix("TABLE:").trim
        elements += DocElement("table", 0,
          if (cap.isEmpty) null else cap, null, page)
      } else if (line.startsWith("FIGURE:")) {
        flushPara()
        val cap = line.stripPrefix("FIGURE:").trim
        elements += DocElement("picture", 0,
          if (cap.isEmpty) null else cap, null, page)
      } else if (line.endsWith(":") && line.split("\\s+").length <= 8) {
        flushPara()
        val hashes = line.takeWhile(_ == '#').length
        elements += DocElement("heading", hashes + 1, null,
          line.dropWhile(c => c == '#' || c == ' ').stripSuffix(":"), page)
      } else {
        if (para.nonEmpty) para.append(' ')
        para.append(line)
      }
    }
    flushPara()
    elements.result()
  }

  /** Real-PDF decode adapter over Apache PDFBox (2.x or 3.x), loaded
    * REFLECTIVELY: graft keeps zero hard dependency beyond Spark, and the
    * adapter activates only when a pdfbox jar is already on the
    * classpath (drop `pdfbox-app.jar` next to the Spark jars). This
    * sandbox ships no PDF jar, so here [[PdfBoxDocParser.available]] is
    * false and [[TextDocParser]] remains the stand-in — the activation
    * and the unavailable-fails-loud path are what `PdfBoxParserSpec`
    * pins. Reference contract being adapted: docling's converter walk
    * (pdf_parser.py:73-84) and its element mapping (pdf_parser.py:130-186)
    * — per-page text through the shared [[layoutElements]] convention,
    * plus one captionless `picture` element per image XObject on a page,
    * each carrying a real 2x page rasterization (PDFRenderer,
    * pdf_parser.py:30,76) when the loaded build can render.
    *
    * Per-partition lifecycle matches [[parseDocuments]]'s contract: the
    * reflective method lookups happen once per instance (init-once,
    * pdf_parser.py:63-71), not per document.
    */
  final class PdfBoxDocParser(prefix: String) extends DocParser {
    def this() = this(PdfBoxDocParser.DefaultPrefix)

    @transient private lazy val api = PdfBoxDocParser.apiFor(prefix)

    override def parse(path: String, content: Array[Byte]): ParsedDoc = {
      val a = api.getOrElse(throw new IllegalStateException(
        "PdfBoxDocParser requires Apache PDFBox on the classpath " +
          s"($prefix.text.PDFTextStripper not found); " +
          "use TextDocParser or add the pdfbox jar"))
      val doc = a.load(content)
      try {
        val pageCount = a.pageCount(doc)
        val elements = Seq.newBuilder[DocElement]
        var p = 1
        while (p <= pageCount) {
          elements ++= layoutElements(a.pageText(doc, p), p)
          var img = a.imageCount(doc, p)
          if (img > 0) {
            // one rasterization of the page at docling's 2x scale
            // (pdf_parser.py:30,76) serves every picture element on it;
            // null on render failure — the element still flows and the
            // chart extractor's placeholder stands in (the per-element
            // isolation of pdf_parser.py:181-184)
            val png = a.renderPagePng(doc, p, 2.0f)
            while (img > 0) { // captionless pictures (pdf_parser.py:158 guard)
              elements += DocElement("picture", 0, null, null, p, png)
              img -= 1
            }
          }
          p += 1
        }
        ParsedDoc(
          path = path,
          filename = path.split('/').last,
          pageCount = pageCount,
          fileSize = content.length.toLong,
          contentSha = sha256Hex(content),
          elements = elements.result())
      } finally a.close(doc)
    }
  }

  object PdfBoxDocParser {
    /** The package prefix a REAL PDFBox jar puts its classes under. The
      * constructor's `prefix` parameter exists so the adapter's
      * reflective plumbing (version dispatch, error isolation, close
      * discipline, the resource walk) is executable against a
      * test-classpath STUB exposing the identical surface — the real
      * jar has never been present in any build sandbox, and untestable
      * plumbing is unfinished plumbing. Production callers never pass a
      * prefix.
      */
    private[etl] val DefaultPrefix = "org.apache.pdfbox"

    /** The reflective lookup, resolved once per (JVM, prefix) —
      * `available`, `orFallback` and every parser instance share it
      * (the classpath does not change under a running executor).
      */
    private val apiCache =
      new java.util.concurrent.ConcurrentHashMap[String, Option[Api]]()

    private def apiFor(prefix: String): Option[Api] =
      apiCache.computeIfAbsent(prefix, p => Api.load(p))

    /** True when a PDFBox 2.x/3.x jar is on the classpath. */
    def available: Boolean = apiFor(DefaultPrefix).isDefined

    /** The best parser this classpath supports: real PDFBox decode when
      * the jar is present, the deterministic text stand-in otherwise.
      */
    def orFallback(): DocParser =
      if (available) new PdfBoxDocParser else new TextDocParser

    /** Reflective surface of PDFBox, resolved once. Supports both major
      * lines: 3.x loads via `org.apache.pdfbox.Loader.loadPDF(byte[])`,
      * 2.x via `PDDocument.load(byte[])`.
      */
    private final class Api(
        prefix: String,
        loadFn: Array[Byte] => AnyRef,
        getNumberOfPages: java.lang.reflect.Method,
        stripperCls: Class[_],
        setStartPage: java.lang.reflect.Method,
        setEndPage: java.lang.reflect.Method,
        getText: java.lang.reflect.Method,
        getPage: java.lang.reflect.Method,
        closeM: java.lang.reflect.Method,
        renderer: Option[(java.lang.reflect.Constructor[_],
                          java.lang.reflect.Method)]) {
      def load(bytes: Array[Byte]): AnyRef = loadFn(bytes)
      def pageCount(doc: AnyRef): Int =
        getNumberOfPages.invoke(doc).asInstanceOf[Int]
      def pageText(doc: AnyRef, page: Int): String = {
        val s = stripperCls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
        setStartPage.invoke(s, Int.box(page))
        setEndPage.invoke(s, Int.box(page))
        getText.invoke(s, doc).asInstanceOf[String]
      }
      /** Image XObjects on a page; 0 when the resource walk is not
        * supported by the loaded PDFBox version (text still parses).
        */
      def imageCount(doc: AnyRef, page: Int): Int = try {
        val pd = getPage.invoke(doc, Int.box(page - 1))
        val res = pd.getClass.getMethod("getResources").invoke(pd)
        if (res == null) return 0
        val cosName = Class.forName(s"$prefix.cos.COSName")
        val names = res.getClass.getMethod("getXObjectNames").invoke(res)
          .asInstanceOf[java.lang.Iterable[AnyRef]]
        val isImage = res.getClass.getMethod("isImageXObject", cosName)
        var n = 0
        names.forEach(nm =>
          if (isImage.invoke(res, nm).asInstanceOf[Boolean]) n += 1)
        n
      } catch { case scala.util.control.NonFatal(_) => 0 }
      /** Rasterize one page to PNG bytes via
        * `org.apache.pdfbox.rendering.PDFRenderer.renderImage(page, scale)`
        * (same signature on the 2.x and 3.x lines); null when the loaded
        * build can't render or the page itself fails — the caller's
        * picture element still flows, bytes-less.
        */
      def renderPagePng(doc: AnyRef, page: Int, scale: Float): Array[Byte] =
        renderer match {
          case None => null
          case Some((ctor, renderImage)) => try {
            val img = renderImage
              .invoke(ctor.newInstance(doc.asInstanceOf[Object]),
                Int.box(page - 1), Float.box(scale))
              .asInstanceOf[java.awt.image.BufferedImage]
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", out)
            out.toByteArray
          } catch { case scala.util.control.NonFatal(_) => null }
        }
      def close(doc: AnyRef): Unit = closeM.invoke(doc)
    }

    private object Api {
      def load(prefix: String): Option[Api] = try {
        val pdDoc = Class.forName(s"$prefix.pdmodel.PDDocument")
        val loadFn: Array[Byte] => AnyRef =
          try { // 3.x
            val m = Class.forName(s"$prefix.Loader")
              .getMethod("loadPDF", classOf[Array[Byte]])
            bytes => m.invoke(null, bytes)
          } catch {
            case _: ClassNotFoundException | _: NoSuchMethodException => // 2.x
              val m = pdDoc.getMethod("load", classOf[Array[Byte]])
              bytes => m.invoke(null, bytes)
          }
        val stripper = Class.forName(s"$prefix.text.PDFTextStripper")
        // the renderer is optional WITHIN an available build: a pdfbox
        // jar stripped of the rendering package still parses text
        val renderer = try {
          val rc = Class.forName(s"$prefix.rendering.PDFRenderer")
          Some((rc.getConstructor(pdDoc),
            rc.getMethod("renderImage", classOf[Int], classOf[Float])))
        } catch { case scala.util.control.NonFatal(_) => None }
        Some(new Api(
          prefix,
          loadFn,
          pdDoc.getMethod("getNumberOfPages"),
          stripper,
          stripper.getMethod("setStartPage", classOf[Int]),
          stripper.getMethod("setEndPage", classOf[Int]),
          stripper.getMethod("getText", pdDoc),
          pdDoc.getMethod("getPage", classOf[Int]),
          pdDoc.getMethod("close"),
          renderer))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Parse a binaryFile DataFrame (`path`, `content` columns) into
    * ParsedDocs. One parser per partition; per-document error isolation.
    */
  def parseDocuments(bin: DataFrame,
                     mkParser: () => DocParser = () => new TextDocParser)
  : Dataset[ParsedDoc] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { it =>
        val parser = mkParser() // init-once per partition (pdf_parser.py:63-71)
        it.flatMap { case (path, content) =>
          try Iterator.single(parser.parse(path, content))
          catch {
            case e: Exception => // per-doc isolation (main.py:117-118)
              System.err.println(s"[parse] skipping $path: ${e.getMessage}")
              Iterator.empty
          }
        }
      }
  }
}
