package graft.etl

import java.awt.image.BufferedImage
import java.awt.{Color, Font}
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.model.{ChartPayload, DocElement, ParsedDoc}

/** E5/E6 — element iteration + image extraction (reference
  * pdf_parser.py:130-186) and PNG encoding (pdf_parser.py:111-128).
  *
  * Walks a parsed document's elements in reading order keeping per-type
  * counters (`table_counter`/`figure_counter`, pdf_parser.py:137-138 —
  * the W2 window semantics computed inside the per-document iteration, so
  * no shuffle is ever needed), renders a PNG per table/picture element,
  * and isolates per-element failures (try/continue,
  * pdf_parser.py:181-184).
  *
  * Rendering: docling rasterizes the real page region at 2.0x scale
  * (pdf_parser.py:30,76). Without a PDF rasterizer we render a
  * deterministic placeholder image of the reference's fixture size
  * (400x300, repository.py:198-210) scaled by `scale`, colored by a hash
  * of the element identity and labeled with its caption — real PNG bytes
  * through the JDK's ImageIO, so the object-store path carries genuine
  * image payloads end to end.
  */
object Images {

  /** Deterministic PNG render of one chart element. */
  def renderPng(elemType: String, typeIndex: Int, caption: String,
                scale: Double = 2.0): Array[Byte] = {
    val w = math.max(1, (400 * scale).toInt)
    val h = math.max(1, (300 * scale).toInt)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      val seed = (elemType.hashCode * 31 + typeIndex) * 31 +
        (if (caption == null) 0 else caption.hashCode)
      g.setColor(new Color(seed & 0xFF, (seed >> 8) & 0xFF, (seed >> 16) & 0xFF))
      g.fillRect(0, 0, w, h)
      g.setColor(Color.WHITE)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, math.max(10, (12 * scale).toInt)))
      g.drawString(s"$elemType #$typeIndex" +
        (if (caption != null) s": $caption" else ""), w / 10, h / 2)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Extract chart payloads from one parsed document: per-type 1-based
    * counters in reading order (pdf_parser.py:142-143,162-163), per-element
    * error isolation (pdf_parser.py:181-184).
    */
  def extractCharts(doc: ParsedDoc, scale: Double = 2.0): Seq[ChartPayload] = {
    var tableCounter = 0
    var figureCounter = 0
    val out = Seq.newBuilder[ChartPayload]
    doc.elements.foreach {
      case el @ DocElement(t @ ("table" | "picture"), level, caption, _, _, _) =>
        try {
          val (chartType, idx) =
            if (t == "table") { tableCounter += 1; ("table", tableCounter) }
            else { figureCounter += 1; ("figure", figureCounter) }
          // a parser that rasterized the real page (PDFBox) wins; the
          // deterministic placeholder only stands in where it couldn't
          val png = if (el.imagePng != null) el.imagePng
                    else renderPng(chartType, idx, caption, scale)
          out += ChartPayload(doc.path, chartType, idx, level, caption, png)
        } catch {
          case e: Exception =>
            System.err.println(s"[images] skipping element in ${doc.path}: ${e.getMessage}")
        }
      case _ =>
    }
    out.result()
  }
}
