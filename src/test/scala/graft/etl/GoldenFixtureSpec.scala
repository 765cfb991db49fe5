package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.model.DocElement

/** Golden-output tests (FIXTURES.md §A.4): fixed document fixtures with
  * fully pinned parse/chunk/NER outputs. These freeze the deterministic
  * stand-in semantics across rounds — any change to the parser, chunker
  * boundary rules, or NER bucketing shows up here first.
  */
class GoldenFixtureSpec extends AnyFunSuite {

  private val parser = new Parse.TextDocParser

  // Fixture 1 — text-only, 2 pages, 3 headings (A.4 fixture 1)
  private val fixture1 =
    """Executive Summary:
      |This report analyzes performance across the recent quarter.
      |
      |## Market Analysis:
      |The market in Silicon Valley expanded on 2024-02-13.
      |Financial Results:
      |Revenue of TechCorp Inc grew strongly, said Dr. Ada Byron.
      |""".stripMargin // the "|<FF>Financial" line embeds a literal form-feed page break

  // Fixture 2 — one table + one figure with captions (A.4 fixture 2)
  private val fixture2 =
    """Overview:
      |Context paragraph.
      |TABLE: Quarterly revenue
      |More text follows here.
      |FIGURE:
      |""".stripMargin

  test("fixture 1 golden parse: pages, heading levels, reading order") {
    val d = parser.parse("/in/fixture1.pdf", fixture1.getBytes("UTF-8"))
    assert(d.pageCount == 2)
    assert(d.filename == "fixture1.pdf")
    assert(d.elements == Seq(
      DocElement("heading", 1, null, "Executive Summary", 1),
      DocElement("text", 0, null, "This report analyzes performance across the recent quarter.", 1),
      DocElement("heading", 3, null, "Market Analysis", 1),
      DocElement("text", 0, null, "The market in Silicon Valley expanded on 2024-02-13.", 1),
      DocElement("heading", 1, null, "Financial Results", 2),
      DocElement("text", 0, null, "Revenue of TechCorp Inc grew strongly, said Dr. Ada Byron.", 2)))
  }

  test("fixture 1 golden chunks: one chunk per section at minTokens=5") {
    val d = parser.parse("/in/fixture1.pdf", fixture1.getBytes("UTF-8"))
    val chunks = Chunker.chunk(d, ChunkerConfig(minTokens = 5, maxTokens = 2000))
    assert(chunks.map(_.chunkIndex) == Seq(0, 1, 2))
    assert(chunks(0).serialized ==
      "Executive Summary\nThis report analyzes performance across the recent quarter.")
    assert(chunks(1).serialized ==
      "Executive Summary\nMarket Analysis\nThe market in Silicon Valley expanded on 2024-02-13.")
    assert(chunks(2).serialized ==
      "Financial Results\nRevenue of TechCorp Inc grew strongly, said Dr. Ada Byron.")
    // raw-text token counts (pdf_parser.py:196-198) — headings serialize
    // into `serialized` above but do NOT count
    assert(chunks.map(_.tokenCount) == Seq(8, 8, 10))
  }

  test("fixture 1 golden entities: full 5-bucket NER output") {
    val d = parser.parse("/in/fixture1.pdf", fixture1.getBytes("UTF-8"))
    val e = Ner.extract(
      Chunker.chunk(d, ChunkerConfig(5, 2000)).map(_.serialized).mkString("\n"))
    assert(e.dates == Seq("2024-02-13"))
    assert(e.locations == Seq("Silicon Valley"))
    assert(e.organizations.contains("TechCorp Inc"))
    assert(e.persons.contains("Ada Byron"))
  }

  test("fixture 2 golden charts: per-type counters and caption nullability") {
    val d = parser.parse("/in/fixture2.pdf", fixture2.getBytes("UTF-8"))
    val charts = Images.extractCharts(d, scale = 1.0)
    assert(charts.map(c => (c.chartType, c.typeIndex, c.caption)) == Seq(
      ("table", 1, "Quarterly revenue"),
      ("figure", 1, null))) // absent caption -> null (pdf_parser.py:158)
    assert(charts.forall(_.png.take(4).sameElements(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))))
  }
}
