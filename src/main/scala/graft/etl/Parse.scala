package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{DocElement, ParsedDoc}

/** E1 — document parsing (reference pdf_parser.py:73-84,219: docling
  * `DocumentConverter.convert`).
  *
  * The docling ML layout model is not reproducible on the JVM and no PDF
  * library ships in this environment, so the decode step is a clearly
  * marked replaceable boundary: `DocParser` is the plug point (a
  * PDFBox-backed implementation would parse real PDFs), and
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
    */
  final class TextDocParser extends DocParser {
    override def parse(path: String, content: Array[Byte]): ParsedDoc = {
      val text = new String(content, java.nio.charset.StandardCharsets.UTF_8)
      val pages = text.split('\f')
      val elements = Seq.newBuilder[DocElement]
      var page = 0
      while (page < pages.length) {
        val lines = pages(page).split('\n')
        val para = new StringBuilder
        def flushPara(): Unit = if (para.nonEmpty) {
          elements += DocElement("text", 0, null, para.toString.trim, page + 1)
          para.clear()
        }
        lines.foreach { raw =>
          val line = raw.trim
          if (line.isEmpty) flushPara()
          else if (line.startsWith("TABLE:")) {
            flushPara()
            val cap = line.stripPrefix("TABLE:").trim
            elements += DocElement("table", 0,
              if (cap.isEmpty) null else cap, null, page + 1)
          } else if (line.startsWith("FIGURE:")) {
            flushPara()
            val cap = line.stripPrefix("FIGURE:").trim
            elements += DocElement("picture", 0,
              if (cap.isEmpty) null else cap, null, page + 1)
          } else if (line.endsWith(":") && line.split("\\s+").length <= 8) {
            flushPara()
            val hashes = line.takeWhile(_ == '#').length
            elements += DocElement("heading", hashes + 1, null,
              line.dropWhile(c => c == '#' || c == ' ').stripSuffix(":"), page + 1)
          } else {
            if (para.nonEmpty) para.append(' ')
            para.append(line)
          }
        }
        flushPara()
        page += 1
      }
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(content).map("%02x".format(_)).mkString
      ParsedDoc(
        path = path,
        filename = path.split('/').last, // basename (main.py:98)
        pageCount = pages.length,
        fileSize = content.length.toLong,
        contentSha = sha,
        elements = elements.result())
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
