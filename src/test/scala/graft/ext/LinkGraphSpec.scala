package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** Link graph (r20): outlink harvesting, edge canonicalization, degree
  * and PageRank signals — incl. the bit-determinism contract (ordered
  * folds) and the documented dangling-mass variant.
  */
class LinkGraphSpec extends AnyFunSuite with SharedSpark {

  test("outlinks: order, entities, rawtext skip, no-href anchors") {
    val html = "<html><body>" +
      "<a href=\"/a?x=1&amp;y=2\">one</a>" +
      "<script>var s = '<a href=\"/not-a-link\">';</script>" +
      "<a class=x>no href</a>" +
      "<a href=\"\">empty drops</a>" +
      "<A HREF='/b'>case-insensitive</A>" +
      "<a href=\"/a?x=1&amp;y=2\">duplicate kept</a>" +
      "</body></html>"
    assert(HtmlText.outlinks(html) ==
      Vector("/a?x=1&y=2", "/b", "/a?x=1&y=2"))
    assert(HtmlText.outlinks(null).isEmpty)
    assert(HtmlText.outlinks("plain text, no markup").isEmpty)
  }

  test("extractEdges: base resolution, scheme filter, self-drop, dedup") {
    import spark.implicits._
    val html = "<html><head><base href=\"/b/\"></head><body>" +
      "<a href=\"rel\">base-resolved</a>" +
      "<a href=\"https://Ext.example.com/p?b=2&amp;a=1\">canonicalized</a>" +
      "<a href=\"#frag\">self via fragment</a>" +
      "<a href=\"mailto:x@y.example\">non-http drops</a>" +
      "<a href=\"rel\">duplicate collapses</a>" +
      "</body></html>"
    val pages = Seq(("https://src.example.com/page", html))
      .toDF("url", "html")
    val edges = LinkGraph.extractEdges(pages, "url", "html")
      .as[(String, String)].collect().toSet
    assert(edges == Set(
      ("https://src.example.com/page", "https://src.example.com/b/rel"),
      ("https://src.example.com/page", "https://ext.example.com/p?a=1&b=2")))
  }

  test("degrees: out/in counts with zero-coalesced outer join") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val d = LinkGraph.degrees(edges)
      .as[(String, Long, Long)].collect()
      .map { case (n, o, i) => n -> ((o, i)) }.toMap
    assert(d == Map("a" -> ((2L, 0L)), "b" -> ((1L, 1L)), "c" -> ((0L, 2L))))
  }

  test("pagerank: closed-form values, dangling mass lost, deterministic") {
    import spark.implicits._
    // 2-cycle: the stationary ranks are 0.5 each at any iteration count
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val cr = LinkGraph.pagerank(cyc, iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(cr == Map(1L -> 0.5, 2L -> 0.5))
    // dangling: a -> b only; replay the recurrence exactly (mass leaves
    // through b, the documented variant)
    val dang = Seq((1L, 2L)).toDF("src", "dst")
    val n = 2
    val t = (1.0 - 0.85) / n
    var ra = 1.0 / n; var rb = 1.0 / n
    for (_ <- 1 to 3) { val nb = t + 0.85 * (ra / 1); ra = t; rb = nb }
    val dr = LinkGraph.pagerank(dang, iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(dr == Map(1L -> ra, 2L -> rb)) // bit-exact, not approximate
    assert(dr.values.sum < 1.0) // dangling mass left the system
    // determinism: two runs over a wider graph agree bit-for-bit
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i + 1) % 200), (i, (i * 7 + 3) % 200)))
      .filter { case (s, d2) => s != d2 }
      .toDF("src", "dst").distinct()
    val r1 = LinkGraph.pagerank(edges, iterations = 4)
      .as[(Long, Double)].collect().sortBy(_._1)
    val r2 = LinkGraph.pagerank(edges, iterations = 4)
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(r1.sameElements(r2), "ordered folds must make ranks bit-stable")
    assert(math.abs(r1.map(_._2).sum - 1.0) < 1e-9) // no dangling here
  }
}
