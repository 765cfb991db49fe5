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

  /** Assemble a PDF 1.5 file whose cross-reference is a /Type /XRef
    * STREAM (ISO 32000-1 §7.5.8) instead of a classic table: header,
    * top-level objects, then the xref stream object carrying the
    * trailer entries, `startxref` at its offset, no `trailer` keyword.
    * `compressed` maps object numbers that live inside an object stream
    * to (container, index) — they get type-2 entries. W = [1 4 2];
    * `predictor12` wraps the rows in the PNG Up filter writers
    * conventionally apply (§7.4.4.4). `extraEntries` appends in-use
    * type-1 claims for objects that do NOT exist — the corruption shape
    * the integrity check must refuse.
    */
  def assembleXref15(objects: Seq[(Int, Array[Byte])],
                     compressed: Map[Int, (Int, Int)] = Map.empty,
                     predictor12: Boolean = true,
                     extraEntries: Seq[Int] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    out.write(ascii("%PDF-1.5\n"))
    for ((num, body) <- objects) {
      offsets(num) = out.size()
      out.write(ascii(s"$num 0 obj\n"))
      out.write(body)
      out.write(ascii("\nendobj\n"))
    }
    val xrefNum = (objects.map(_._1) ++ compressed.keys).max + 1
    val xrefAt = out.size()
    offsets(xrefNum) = xrefAt
    val size = ((xrefNum +: extraEntries).max) + 1
    // one row per object number 0..size-1: type byte, 4-byte field2,
    // 2-byte field3
    val rowLen = 7
    val rows = (0 until size).map { n =>
      val r = new Array[Byte](rowLen)
      def put(off: Int, len: Int, v: Long): Unit =
        for (j <- 0 until len)
          r(off + j) = ((v >> (8 * (len - 1 - j))) & 0xFF).toByte
      if (compressed.contains(n)) {
        val (container, idx) = compressed(n)
        r(0) = 2; put(1, 4, container.toLong); put(5, 2, idx.toLong)
      } else if (offsets.contains(n) || extraEntries.contains(n)) {
        r(0) = 1; put(1, 4, offsets.get(n).map(_.toLong).getOrElse(1L))
      } else {
        r(0) = 0; put(1, 4, 0L); put(5, 2, 65535L)
      }
      r
    }
    val payload =
      if (!predictor12) rows.flatten.toArray
      else {
        // PNG Up filter (type 2): row minus previous row, filter byte 2
        val enc = new java.io.ByteArrayOutputStream()
        var prev = new Array[Byte](rowLen)
        for (r <- rows) {
          enc.write(2)
          for (i <- 0 until rowLen) enc.write((r(i) - prev(i)) & 0xFF)
          prev = r
        }
        enc.toByteArray
      }
    val deflated = deflate(payload)
    val parms = if (predictor12)
      s" /DecodeParms << /Predictor 12 /Columns $rowLen >>" else ""
    out.write(ascii(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size " +
      s"/W [1 4 2] /Root 1 0 R /Filter /FlateDecode$parms " +
      s"/Length ${deflated.length} >>\nstream\n"))
    out.write(deflated)
    out.write(ascii("\nendstream\nendobj\nstartxref\n" + xrefAt + "\n%%EOF\n"))
    out.toByteArray
  }

  /** The [[twoPageWithImage]] document re-plumbed the modern way: xref
    * STREAM instead of a table, page/catalog/font dicts packed into a
    * FlateDecode object stream (type-2 entries), content and image
    * streams top-level (streams cannot nest in an ObjStm). Same pages,
    * same text, same image — the golden expectations carry over.
    */
  def twoPageXref15(predictor12: Boolean = true,
                    extraEntries: Seq[Int] = Nil): Array[Byte] = {
    val contained = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 7 0 R >> >> >>"),
      5 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> " +
        "/XObject << /Im0 8 0 R >> >> >>"),
      7 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodies = contained.map(_._2)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = contained.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = ascii(header + bodies.mkString("\n") + "\n")
    val deflated = deflate(payload)
    val imageData = Array[Byte](0, 85, (170 & 0xFF).toByte, (255 & 0xFF).toByte)
    val objStm = ascii(s"<< /Type /ObjStm /N ${contained.length} " +
      s"/First ${header.length} /Filter /FlateDecode " +
      s"/Length ${deflated.length} >>\nstream\n") ++ deflated ++
      ascii("\nendstream")
    assembleXref15(
      objects = Seq(
        4 -> streamObj("", ascii(Page1Content)),
        6 -> streamObj("", ascii(Page2Content)),
        8 -> streamObj(" /Type /XObject /Subtype /Image /Width 2 /Height 2 " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8", imageData),
        9 -> objStm),
      compressed = contained.map(_._1).zipWithIndex
        .map { case (n, i) => n -> (9, i) }.toMap,
      predictor12 = predictor12,
      extraEntries = extraEntries)
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
