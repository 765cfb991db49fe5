package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class NerSpec extends AnyFunSuite {

  test("ISO and verbose dates land in the dates bucket") {
    val e = Ner.extract("The review on 2024-02-13 and again March 1, 2024 in Q4 2023.")
    assert(e.dates.contains("2024-02-13"))
    assert(e.dates.contains("March 1, 2024"))
    assert(e.dates.contains("Q4 2023"))
  }

  test("corporate suffixes route to organizations (pdf_parser.py:101)") {
    val e = Ner.extract("TechCorp Inc and Innovate Ltd signed the deal.")
    assert(e.organizations.exists(_.contains("TechCorp")))
    assert(e.organizations.exists(_.contains("Innovate")))
  }

  test("gazetteer locations route to locations (pdf_parser.py:103)") {
    val e = Ner.extract("Offices in Silicon Valley and New York expanded.")
    assert(e.locations.contains("Silicon Valley"))
    assert(e.locations.contains("New York"))
  }

  test("titled names route to persons (pdf_parser.py:99)") {
    val e = Ner.extract("Growth continues, said Dr. Jane Smith yesterday.")
    assert(e.persons.exists(_.contains("Jane Smith")))
  }

  test("empty text yields the empty 5-bucket shape") {
    val e = Ner.extract("")
    assert(e.persons.isEmpty && e.organizations.isEmpty && e.dates.isEmpty &&
      e.locations.isEmpty && e.misc.isEmpty)
  }

  test("extraction is deterministic") {
    val t = "Alpha Corp met Dr. Bob Lee in London on 2024-01-01."
    assert(Ner.extract(t) == Ner.extract(t))
  }
}
