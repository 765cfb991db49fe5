package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** HTML extraction (r18): the tokenizer rules case by case — entities,
  * raw-text containers, quoted attributes, block boundaries, link
  * density — plus malformed-input totality and the E1 parse routing.
  */
class HtmlTextSpec extends AnyFunSuite {
  import HtmlText.{blocks, extract, extractContent, isHtml}

  test("block boundaries, inline tags, whitespace collapse") {
    assert(extract("<p>Hello   world</p><p>Second</p>") == "Hello world\nSecond")
    assert(extract("<div>a<span>b</span>c</div>") == "abc")
    assert(extract("<b>bold</b> and <i>italic</i>") == "bold and italic")
    assert(extract("line<br>break<hr>rule") == "line\nbreak\nrule")
    assert(extract("  \n\t<p>  padded  </p>  ") == "padded")
    assert(extract("<ul><li>one</li><li>two</li></ul>") == "one\ntwo")
    assert(extract("<table><tr><td>a</td><td>b</td></tr></table>") == "a\nb")
    // uppercase tags fold
    assert(extract("<P>x</P><DIV>y</DIV>") == "x\ny")
  }

  test("script/style/noscript/template/head subtrees are dropped whole") {
    assert(extract("<head><title>T</title><meta x=y></head><p>body</p>") ==
      "body")
    assert(extract("<script>if (a < b) { x('<p>no</p>') }</script>yes") ==
      "yes")
    assert(extract("<style>p > a { color: red }</style>text") == "text")
    assert(extract("<noscript><p>enable js</p></noscript>ok") == "ok")
    assert(extract("<template><div>tpl</div></template>ok") == "ok")
    // unterminated raw container swallows to EOF (totality, no throw)
    assert(extract("before<script>var x = 1;") == "before")
    // rawtext close needs a name BOUNDARY: </scriptfoo> does not close
    assert(extract("<script>a</scriptfoo>b</script>c") == "c")
    assert(extract("<style>x</style >y") == "y") // space before '>' closes
  }

  test("head auto-closes at the first non-metadata tag (omissible </head>)") {
    // HTML5 allows omitting </head>: the body must NOT vanish
    assert(extract("<html><head><meta charset=utf-8><body><p>Hello") ==
      "Hello")
    assert(extract("<head><title>T</title><p>kept") == "kept")
    // metadata content inside the head still drops whole, including
    // rawtext containers whose CONTENT mentions body
    assert(extract("<head><script>var b='<body>no';</script>" +
      "<style>p{}</style><link rel=x href=y><body><p>yes") == "yes")
    // an explicit </head> still works exactly as before
    assert(extract("<head><title>T</title><meta x=y></head><p>body</p>") ==
      "body")
    // </html> (a close tag) also auto-closes an unterminated head
    assert(extract("<head><meta a=b></html>tail") == "tail")
    // unterminated head with ONLY metadata swallows to EOF (no body)
    assert(extract("<head><meta charset=utf-8><title>only head") == "")
  }

  test("entities: named, numeric, hex, nbsp/shy, unknown stays literal") {
    assert(extract("<p>a &amp; b &lt;c&gt; &quot;d&quot;</p>") ==
      "a & b <c> \"d\"")
    assert(extract("<p>&#65;&#x42;c</p>") == "ABc")
    assert(extract("<p>a&nbsp;&nbsp;b</p>") == "a b") // nbsp collapses
    assert(extract("<p>hy&shy;phen</p>") == "hyphen")
    assert(extract("<p>tom &jerry; &notanentity12; x</p>") ==
      "tom &jerry; &notanentity12; x")
    assert(extract("<p>50&#37; &euro;9</p>") == "50% €9")
    // bare ampersand at EOF
    assert(extract("<p>a &</p>") == "a &")
    // invalid numeric reference stays literal
    assert(extract("<p>&#x110000; &#abc;</p>") == "&#x110000; &#abc;")
  }

  test("tokenizer edges: bare '<', quoted '>', comments, doctype, PI") {
    assert(extract("<p>a < b and c > d</p>") == "a < b and c > d")
    // a tag opens only on an ASCII LETTER: '<' + digit is literal prose
    // (HTML5 rule; digits continue names like h1 but never start one)
    assert(extract("<p>x<5 and y>2</p>") == "x<5 and y>2")
    assert(extract("<p>I <3 Spark</p>") == "I <3 Spark")
    assert(extract("<h1>t</h1>") == "t") // digits still CONTINUE a name
    assert(extract("<a href=\"x>y\" title='p>q'>link</a>") == "link")
    assert(extract("<!-- a <p>comment</p> -->after") == "after")
    assert(extract("<!DOCTYPE html><p>x</p>") == "x")
    assert(extract("<?xml version=\"1.0\"?><p>x</p>") == "x")
    assert(extract("<p>self<img src=x/>closing</p>") == "selfclosing")
    // unterminated tag consumes the rest (totality)
    assert(extract("ok<p attr=\"unclosed") == "ok")
    assert(extract("</>stray") == "stray")
    assert(extract("") == "")
    assert(extract(null) == "")
    // a BOM survives the byte->string decode; it is whitespace, never a
    // phantom one-char first paragraph
    assert(extract("﻿<html><body><p>Hi</p></body></html>") == "Hi")
    // NUL / surrogate numeric references become U+FFFD (HTML5), keeping
    // the output a well-formed string
    assert(extract("<p>a&#xD800;b&#0;c</p>") == "a�b�c")
  }

  test("link density: blocks carry counts; extractContent drops chrome") {
    val html = "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<p>Real prose with <a href=\"x\">one link</a> in the middle of a " +
      "sentence that is mostly text.</p>" +
      "<footer><a>Terms</a><a>Privacy</a></footer>"
    val bs = blocks(html)
    assert(bs.length == 3)
    assert(bs(0).text == "Home About" && bs(0).linkChars == bs(0).chars)
    assert(bs(1).linkChars.toDouble / bs(1).chars < 0.2)
    assert(bs(2).linkChars == bs(2).chars)
    assert(extractContent(html) == bs(1).text)
    // full extraction keeps everything
    assert(extract(html).split('\n').length == 3)
    // threshold is inclusive-keep at <=
    assert(extractContent("<p><a>half</a>half</p>", maxLinkDensity = 0.5) ==
      "halfhalf")
  }

  test("single-char corruption sweep: extraction is total on mangled markup") {
    val base = "<html><head><title>x</title></head><body><p>a &amp; b &#65;" +
      "</p><script>var s='<p>';</script><a href=\"y\">l</a><div>t</div>" +
      "</body></html>"
    for (pos <- base.indices; c <- 0 until 128) {
      val s = base.updated(pos, c.toChar)
      val full = extract(s)
      val content = extractContent(s)
      assert(full != null && content != null &&
        full.length <= base.length && content.length <= full.length,
        s"pos=$pos c=$c")
    }
  }

  test("pageMeta: declared canonical + robots directives, tokenizer-safe") {
    import HtmlText.{pageMeta, PageMeta}
    val h = "<html><head>" +
      "<link rel=\"canonical\" href=\"https://ex.com/a?x=1&amp;y=2\">" +
      "<meta name=\"ROBOTS\" content=\"NOINDEX, nofollow\">" +
      "</head><body><p>t</p></body></html>"
    val m = pageMeta(h)
    assert(m.canonicalHref.contains("https://ex.com/a?x=1&y=2")) // entity decode
    assert(m.robots == Set("noindex", "nofollow"))
    // first canonical wins; rel is a token LIST; unquoted attrs work
    assert(pageMeta("<link rel='alternate canonical' href=/x>" +
      "<link rel=canonical href=/y>").canonicalHref.contains("/x"))
    // empty href does not claim the slot
    assert(pageMeta("<link rel=canonical href=''>" +
      "<link rel=canonical href=/z>").canonicalHref.contains("/z"))
    // meta without name=robots contributes nothing
    assert(pageMeta("<meta content=\"noindex\">" +
      "<meta name=viewport content=\"noindex\">").robots.isEmpty)
    // markup inside script strings is NOT a signal
    assert(pageMeta("<script>var s='<link rel=canonical href=/no>';" +
      "</script>").canonicalHref.isEmpty)
    // rel=canonical on a non-link tag is ignored; totality edges
    assert(pageMeta("<a rel=canonical href=/no>x</a>").canonicalHref.isEmpty)
    // an ORPHAN close tag must not open a rawtext skip (template
    // double-close): signals after it still count
    val orphan = pageMeta("<head></script><link rel=canonical href=/a>" +
      "<meta name=robots content=noindex></head>")
    assert(orphan.canonicalHref.contains("/a") && orphan.robots == Set("noindex"))
    assert(pageMeta("<p>no meta</p>") == PageMeta(None, Set.empty))
    assert(pageMeta(null) == PageMeta(None, Set.empty))
    assert(pageMeta("<link rel=canonical href=\"/unterminated") ==
      PageMeta(None, Set.empty))
    // quoted '>' inside an attribute does not end the tag
    assert(pageMeta("<link rel=canonical href=\"/a>b\"><meta name=robots " +
      "content=\"noindex\">").canonicalHref.contains("/a>b"))
  }

  test("pageMeta: <base href> is captured (first wins, entity-decoded)") {
    import HtmlText.pageMeta
    val m = pageMeta("<head><base href=\"https://ex.com/dir/?a=1&amp;b=2\">" +
      "<link rel=canonical href=\"sub/page\"></head>")
    assert(m.baseHref.contains("https://ex.com/dir/?a=1&b=2"))
    assert(m.canonicalHref.contains("sub/page"))
    // first base wins; empty href does not claim the slot
    assert(pageMeta("<base href=''><base href=/one><base href=/two>")
      .baseHref.contains("/one"))
    assert(pageMeta("<p>none</p>").baseHref.isEmpty)
    // base inside a script string is not a signal
    assert(pageMeta("<script>var s='<base href=/no>';</script>")
      .baseHref.isEmpty)
  }

  test("isHtml sniff: doctype/html magics, BOM, whitespace, case; not text") {
    def b(s: String): Array[Byte] = s.getBytes("UTF-8")
    assert(isHtml(b("<!DOCTYPE html><html></html>")))
    assert(isHtml(b("  \n<html lang=en>")))
    assert(isHtml(b("<HTML>")))
    assert(isHtml(("﻿<!doctype html>").getBytes("UTF-8")))
    assert(!isHtml(b("plain text with <html> later")))
    assert(!isHtml(b("<div>fragment</div>")))
    assert(!isHtml(Array.empty[Byte]))
  }

  test("E1 routing: TextDocParser extracts HTML payloads through HtmlText") {
    val parser = new graft.etl.Parse.TextDocParser
    val html = "<html><head><title>T</title></head><body>" +
      "<p>First paragraph here</p><p>Second one</p>" +
      "<script>skip()</script></body></html>"
    val doc = parser.parse("/x/page.html", html.getBytes("UTF-8"))
    assert(doc.pageCount == 1)
    assert(doc.elements.map(_.text) == Seq("First paragraph here", "Second one"))
    assert(doc.elements.forall(_.elemType == "text"))
    // non-HTML payloads are untouched by the new sniff
    val plain = parser.parse("/x/a.txt", "just words".getBytes("UTF-8"))
    assert(plain.elements.map(_.text) == Seq("just words"))
  }

  test("E1 routing decodes meta-declared legacy charsets (r19)") {
    val parser = new graft.etl.Parse.TextDocParser
    // a BOM-less windows-1252 page declaring its charset only in <meta>:
    // curly quotes + euro live at 1252-specific code points that UTF-8
    // would mojibake into U+FFFD
    val text = "café “quoted” €9"
    val html = "<html><head><meta charset=\"windows-1252\"></head>" +
      s"<body><p>$text</p></body></html>"
    val bytes = html.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val doc = parser.parse("/x/legacy.html", bytes.clone())
    assert(doc.elements.map(_.text) == Seq(text))
    // a UTF-8 BOM wins over a (wrong) meta declaration
    val utf8Page = "<html><head><meta charset=\"windows-1252\"></head>" +
      s"<body><p>$text</p></body></html>"
    val bomBytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      utf8Page.getBytes("UTF-8")
    assert(parser.parse("/x/bom.html", bomBytes).elements.map(_.text) ==
      Seq(text))
  }
}
