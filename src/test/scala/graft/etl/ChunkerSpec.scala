package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{DocElement, ParsedDoc}

class ChunkerSpec extends AnyFunSuite {

  private def doc(elements: DocElement*): ParsedDoc =
    ParsedDoc("/in/a.pdf", "a.pdf", 1, 100L, "sha", elements)

  private def words(n: Int, tag: String = "w"): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("ordinals are dense and 0-based in parse order (repository.py:28)") {
    val d = doc(
      DocElement("heading", 1, null, "Intro", 1),
      DocElement("text", 0, null, words(150), 1),
      DocElement("heading", 1, null, "Body", 1),
      DocElement("text", 0, null, words(150), 1),
      DocElement("heading", 1, null, "End", 2),
      DocElement("text", 0, null, words(150), 2))
    val chunks = Chunker.chunk(d)
    assert(chunks.map(_.chunkIndex) == chunks.indices.toSeq)
    assert(chunks.size == 3)
  }

  test("maxTokens closes a chunk; minTokens prevents premature close") {
    val cfg = ChunkerConfig(minTokens = 10, maxTokens = 50)
    val d = doc(
      DocElement("text", 0, null, words(40, "a"), 1),
      DocElement("text", 0, null, words(40, "b"), 1),
      DocElement("text", 0, null, words(5, "c"), 1))
    val chunks = Chunker.chunk(d, cfg)
    assert(chunks.size == 2)
    assert(chunks.head.text.contains("a40") && !chunks.head.text.contains("b1 "))
    // a tiny trailing block stays attached to the open chunk
    assert(chunks(1).text.contains("c5"))
  }

  test("small documents yield one chunk even below minTokens") {
    val chunks = Chunker.chunk(doc(DocElement("text", 0, null, words(3), 1)))
    assert(chunks.size == 1)
    assert(chunks.head.tokenCount == 3)
  }

  test("serialize prepends the active heading path (pdf_parser.py:190)") {
    val cfg = ChunkerConfig(minTokens = 1, maxTokens = 10)
    val d = doc(
      DocElement("heading", 1, null, "Report", 1),
      DocElement("heading", 2, null, "Financials", 1),
      DocElement("text", 0, null, words(5), 1))
    val c = Chunker.chunk(d, cfg).head
    assert(c.serialized.startsWith("Report\nFinancials\n"))
    // token_count counts the RAW chunk text (pdf_parser.py:196-198), not
    // the heading-enriched serialization
    assert(c.tokenCount == 5)
  }

  test("heading of same-or-higher level replaces the path entry") {
    val cfg = ChunkerConfig(minTokens = 1, maxTokens = 10)
    val d = doc(
      DocElement("heading", 1, null, "A", 1),
      DocElement("text", 0, null, "x", 1),
      DocElement("heading", 1, null, "B", 1),
      DocElement("text", 0, null, "y", 1))
    val chunks = Chunker.chunk(d, cfg)
    assert(chunks.size == 2)
    assert(chunks(0).serialized == "A\nx")
    assert(chunks(1).serialized == "B\ny")
  }

  test("property: chunk texts partition the input blocks in order (100 seeds)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val blocks = Seq.fill(1 + rnd.nextInt(8))(words(1 + rnd.nextInt(30)))
      val minT = 5 + rnd.nextInt(35)
      val maxT = minT + 10 + rnd.nextInt(150)
      val d = doc(blocks.map(b => DocElement("text", 0, null, b, 1)): _*)
      val chunks = Chunker.chunk(d, ChunkerConfig(minT, maxT))
      val reassembled = chunks.map(_.text).mkString("\n")
        .split("\\s+").filter(_.nonEmpty).toSeq
      val original = blocks.mkString(" ").split("\\s+").filter(_.nonEmpty).toSeq
      assert(reassembled == original)
      assert(chunks.map(_.chunkIndex) == chunks.indices.toSeq)
    }
  }
}
