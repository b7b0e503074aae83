package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Links

class LinksSpec extends AnyFunSuite {

  private def links(html: String): Vector[(String, String)] =
    Links.outlinksOf(html).map(l => (l.href, l.anchor))

  test("outlinks: order, entities, implicit nesting close, hrefless, rawtext, unquoted") {
    val html =
      """<!DOCTYPE html><html><head>
        |<script>var x = '<a href="/fake">nope</a>';</script>
        |<style>a::after { content: "</a>"; }</style>
        |</head><body>
        |<a href="/one">First &amp; best</a>
        |<a name="x">not a link</a>
        |<a href='/two'>outer <a href="/three">inner</a> tail
        |<a href=/four>unquoted</a>
        |<!-- <a href="/comment">no</a> -->
        |<a href="/five">spaced   text
        |   lines</a>
        |<a href="/q?a=1&amp;b=2">esc</a>
        |<a href="/lt">1 < 2</a>
        |<a href="/six"/>
        |</body></html>""".stripMargin
    assert(links(html) == Vector(
      "/one" -> "First & best",
      "/two" -> "outer", // implicitly closed by the nested <a>
      "/three" -> "inner",
      "/four" -> "unquoted",
      "/five" -> "spaced text lines",
      "/q?a=1&b=2" -> "esc",
      "/lt" -> "1 < 2",
      "/six" -> "", // self-closing anchor: link with no text
    ))
  }

  test("outlinks: EOF closes an open anchor; empty href skipped") {
    assert(links("""<a href="/open">dangling""") == Vector("/open" -> "dangling"))
    assert(links("""<a href="">x</a><a href="/y">y</a>""") == Vector("/y" -> "y"))
  }

  test("outlinks: generator family A pages yield the formula links in order") {
    val html = new String(
      graft.gen.HtmlGen.render(42L, "one two three", "en"),
      java.nio.charset.StandardCharsets.UTF_8)
    val got = links(html)
    val catN = (0 until 5).map(i => (42 + i) % 13)
    val relN = (0 until 4).map(i => (42 * 7 + i) % 31)
    assert(got == Vector("/" -> "Müller & Söhne «Webkorpus» #42") ++
      catN.map(k => s"/cat/$k" -> s"Category $k") ++
      Vector("/privacy" -> "Learn more") ++
      relN.map(k => s"/rel/$k" -> s"Related post $k …") ++
      Vector("/imprint" -> "Impressum"))
  }
}
