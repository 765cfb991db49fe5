package graft.etl

import java.nio.charset.StandardCharsets

/** Hand-authored, fully valid PDF fixtures (header, body, xref with real
  * byte offsets, trailer) — PDF is a public text format, so a 2-page
  * document with one image XObject needs no library to write. Shared by
  * the jar-free [[MiniPdf]] specs and (when a pdfbox jar is present) the
  * real-adapter round-trip.
  */
object PdfFixtures {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Assemble numbered objects into a valid PDF: header, objects in
    * order, xref with byte offsets, trailer pointing at object 1.
    */
  private def assemble(objects: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    out.write(ascii("%PDF-1.4\n"))
    for ((num, body) <- objects) {
      offsets(num) = out.size()
      out.write(ascii(s"$num 0 obj\n"))
      out.write(body)
      out.write(ascii("\nendobj\n"))
    }
    val xrefAt = out.size()
    val maxNum = objects.map(_._1).max
    out.write(ascii(s"xref\n0 ${maxNum + 1}\n0000000000 65535 f \n"))
    for (n <- 1 to maxNum)
      out.write(ascii(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n"))
    out.write(ascii(
      s"trailer << /Size ${maxNum + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  private def streamObj(dictExtra: String, data: Array[Byte]): Array[Byte] =
    ascii(s"<< /Length ${data.length}$dictExtra >>\nstream\n") ++ data ++
      ascii("\nendstream")

  private val Page1Content =
    "BT /F1 12 Tf 72 720 Td (Quarterly Overview:) Tj " +
      "0 -16 Td (Revenue grew strongly across all units this year.) Tj " +
      "0 -16 Td (TABLE: totals by region) Tj ET"

  private val Page2Content =
    "BT /F1 12 Tf 72 720 Td (Appendix notes:) Tj " +
      "0 -16 Td (Figures attached below for reference.) Tj ET"

  /** Two pages; page 1 is headed text plus a TABLE marker, page 2 adds a
    * 2x2 grayscale image XObject. `flate = true` compresses both content
    * streams with FlateDecode (JDK zlib), exercising the filter path.
    */
  def twoPageWithImage(flate: Boolean = false): Array[Byte] = {
    def content(s: String): Array[Byte] = {
      val raw = ascii(s)
      if (flate) streamObj(" /Filter /FlateDecode", deflate(raw))
      else streamObj("", raw)
    }
    val imageData = Array[Byte](0, 85, (170 & 0xFF).toByte, (255 & 0xFF).toByte)
    assemble(Seq(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 7 0 R >> >> >>"),
      4 -> content(Page1Content),
      5 -> ascii("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> " +
        "/XObject << /Im0 8 0 R >> >> >>"),
      6 -> content(Page2Content),
      7 -> ascii("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      8 -> streamObj(" /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
        "/ColorSpace /DeviceGray /BitsPerComponent 8", imageData)))
  }

  /** Single page whose text arrives via a TJ kerning array, a hex
    * string, and the `'` next-line operator — the operator variants
    * beyond plain Tj.
    */
  def operatorVariants(): Array[Byte] = {
    val content =
      "BT /F1 12 Tf 72 720 Td [(Mixed ) -120 (operators:)] TJ " +
        "0 -16 Td <4865782073696465> Tj (and a quoted line.) ' ET"
    assemble(Seq(
      1 -> ascii("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> ascii("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> ascii("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
      4 -> streamObj("", ascii(content)),
      5 -> ascii("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")))
  }
}
