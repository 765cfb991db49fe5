package graft.serve

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the hand-written multipart/form-data parser: an
  * encoder generator assembles RFC 2046 §5.1.1 bodies (random binary
  * payloads, transport padding, preamble/epilogue, decoy lines that
  * merely BEGIN with the delimiter) and the parser must recover the file
  * part's exact byte range — the same freedom a real HTTP client has on
  * the wire. Payload bytes are unconstrained except for the one rule
  * multipart itself imposes: the client's boundary must not occur inside
  * a payload (RFC 2046 places that burden on the sender), which the
  * generators enforce by construction.
  */
object MultipartProps extends Properties("Multipart") {

  private val CRLF = "\r\n"

  private def bytes(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  /** RFC bchars subset that also can't collide with our header grammar. */
  private val boundaryGen: Gen[String] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))

  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val filenameGen: Gen[String] = nameGen.map(_ + ".pdf")

  /** Transport padding after a delimiter line (SP / HT, RFC 2046). */
  private val paddingGen: Gen[String] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.stringOfN(n, Gen.oneOf(' ', '\t')))

  /** Preamble/epilogue text that cannot contain a delimiter. */
  private val commentGen: Gen[String] =
    Gen.chooseNum(0, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  /** Arbitrary binary payload (full byte range), re-rolled in the rare
    * case it contains the chosen boundary's delimiter bytes.
    */
  private def payloadGen(boundary: String): Gen[Array[Byte]] = {
    val delim = "--" + boundary
    Gen.chooseNum(0, 512)
      .flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .retryUntil(p => !new String(p, ISO_8859_1).contains(delim), 100)
  }

  private final case class Encoded(body: Array[Byte], from: Int, until: Int)

  /** Assemble a body: optional preamble, `pre` non-file parts, THE file
    * part, `post` trailing parts, close delimiter, epilogue — recording
    * where the file part's payload landed.
    */
  private def encode(boundary: String, preamble: String, pad: String,
                     name: String, filename: String, payload: Array[Byte],
                     decoys: Seq[Array[Byte]], epilogue: String): Encoded = {
    val out = new ByteArrayOutputStream()
    if (preamble.nonEmpty) out.write(bytes(preamble + CRLF))
    decoys.foreach { fieldBytes =>
      out.write(bytes("--" + boundary + pad + CRLF +
        "Content-Disposition: form-data; name=\"field\"" + CRLF + CRLF))
      out.write(fieldBytes)
      out.write(bytes(CRLF))
    }
    out.write(bytes("--" + boundary + pad + CRLF +
      s"""Content-Disposition: form-data; name="$name"; filename="$filename"""" +
      CRLF + "Content-Type: application/octet-stream" + CRLF + CRLF))
    val from = out.size()
    out.write(payload)
    val until = out.size()
    out.write(bytes(CRLF + "--" + boundary + "--" + epilogue))
    Encoded(out.toByteArray, from, until)
  }

  private def parse(body: Array[Byte], boundary: String) =
    Multipart.firstFilePartRange(new Multipart.ArrayBytes(body), boundary)

  private def slice(body: Array[Byte], r: Multipart.PartRange): Array[Byte] =
    java.util.Arrays.copyOfRange(body, r.from, r.until)

  property("file part round-trips byte-exactly through any framing") =
    forAll(boundaryGen, commentGen, paddingGen, nameGen, filenameGen,
           commentGen) { (boundary, preamble, pad, name, filename, epilogue) =>
      forAll(payloadGen(boundary)) { payload =>
        val enc = encode(boundary, preamble, pad, name, filename, payload,
          decoys = Nil, epilogue = epilogue)
        parse(enc.body, boundary) match {
          case Some(r) =>
            Prop(r.from == enc.from && r.until == enc.until &&
              r.filename == filename && r.name == name) :|
              s"range (${r.from},${r.until}) != (${enc.from},${enc.until})"
          case None => Prop.falsified :| "file part not found"
        }
      }
    }

  property("non-file form fields before the file part are skipped") =
    forAll(boundaryGen, nameGen, filenameGen) { (boundary, name, filename) =>
      forAll(payloadGen(boundary), Gen.chooseNum(1, 3)
          .flatMap(n => Gen.listOfN(n, payloadGen(boundary)))) {
        (payload, fields) =>
          val enc = encode(boundary, "", "", name, filename, payload,
            decoys = fields, epilogue = "")
          parse(enc.body, boundary) match {
            case Some(r) =>
              Prop(slice(enc.body, r).sameElements(payload)) :| "payload mangled"
            case None => Prop.falsified :| "file part not found"
          }
      }
    }

  property("a payload line that merely BEGINS with the delimiter is data") =
    forAll(boundaryGen, nameGen, filenameGen, Gen.alphaNumChar) {
      (boundary, name, filename, extra) =>
        // "\r\n--boundaryX" at line start is NOT a delimiter line (no
        // padding+CRLF, no "--"); a parser keying on the prefix alone
        // would truncate the part here
        val payload = bytes("head" + CRLF + "--" + boundary + extra + CRLF + "tail")
        val enc = encode(boundary, "", "", name, filename, payload, Nil, "")
        parse(enc.body, boundary) match {
          case Some(r) => Prop(slice(enc.body, r).sameElements(payload)) :|
            s"decoy delimiter truncated the part: ${new String(slice(enc.body, r), ISO_8859_1)}"
          case None => Prop.falsified :| "file part not found"
        }
    }

  property("BufferBytes view parses identically to the array view") =
    forAll(boundaryGen, nameGen, filenameGen) { (boundary, name, filename) =>
      forAll(payloadGen(boundary)) { payload =>
        val enc = encode(boundary, "", "", name, filename, payload, Nil, "")
        val viaBuffer = Multipart.firstFilePartRange(
          new Multipart.BufferBytes(java.nio.ByteBuffer.wrap(enc.body)), boundary)
        Prop(viaBuffer == parse(enc.body, boundary)) :| s"views disagree: $viaBuffer"
      }
    }

  property("a body with only non-file parts yields None") =
    forAll(boundaryGen, Gen.chooseNum(1, 3)) { (boundary, n) =>
      forAll(Gen.listOfN(n, payloadGen(boundary))) { fields =>
        val out = new ByteArrayOutputStream()
        fields.foreach { f =>
          out.write(bytes("--" + boundary + CRLF +
            "Content-Disposition: form-data; name=\"field\"" + CRLF + CRLF))
          out.write(f)
          out.write(bytes(CRLF))
        }
        out.write(bytes("--" + boundary + "--"))
        Prop(parse(out.toByteArray, boundary).isEmpty)
      }
    }

  property("escaped quotes and backslashes in filename round-trip") =
    forAll(boundaryGen, nameGen) { (boundary, name) =>
      val filename = "we\\\"ird\\\\name.pdf" // on-wire escaped form
      val expected = "we\"ird\\name.pdf"     // decoded form
      val payload = bytes("x")
      val enc = encode(boundary, "", "", name, filename, payload, Nil, "")
      parse(enc.body, boundary) match {
        case Some(r) => Prop(r.filename == expected) :| s"got '${r.filename}'"
        case None    => Prop.falsified :| "file part not found"
      }
    }

  property("arbitrary junk bytes never throw and never fabricate a part") =
    forAll(boundaryGen, Gen.chooseNum(0, 256).flatMap(n =>
        Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))) {
      (boundary, junk) =>
        val r = parse(junk, boundary) // must not throw
        // a fabricated range would let the server write bytes the client
        // never framed as a file; whatever is returned must be in-bounds
        Prop(r.forall(p => p.from >= 0 && p.from <= p.until &&
          p.until <= junk.length))
    }

  property("a truncated body (no closing delimiter after the part) is None") =
    forAll(boundaryGen, nameGen, filenameGen) { (boundary, name, filename) =>
      forAll(payloadGen(boundary)) { payload =>
        val enc = encode(boundary, "", "", name, filename, payload, Nil, "")
        // cut inside the payload: the part's end can no longer be proven
        val cut = java.util.Arrays.copyOfRange(enc.body, 0,
          enc.from + payload.length / 2)
        Prop(parse(cut, boundary).isEmpty)
      }
    }
}
