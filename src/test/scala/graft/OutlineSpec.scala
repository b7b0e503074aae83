package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Outline
import graft.core.Outline.Section

/** Heading-outline extraction (core/Outline.scala): breadcrumb-stack
  * semantics the e41 oracle's row equality can't explain on its own.
  */
class OutlineSpec extends AnyFunSuite {

  test("sibling headings replace on the stack; children nest") {
    val s = Outline.extract(
      "<h1>Top</h1><p>t</p><h2>A</h2><p>a</p><h3>A1</h3><p>a1</p><h2>B</h2><p>b</p>")
    assert(s.map(x => (x.level, x.title, x.path)) == Seq(
      (1, "Top", "Top"),
      (2, "A", "Top > A"),
      (3, "A1", "Top > A > A1"),
      (2, "B", "Top > B"))) // B popped both A1 and A
    assert(s.map(_.text) == Seq("t", "a", "a1", "b"))
    assert(s.map(_.idx) == Seq(0, 1, 2, 3))
  }

  test("skipped levels nest under the last shallower heading") {
    val s = Outline.extract("<h1>T</h1><h4>Deep</h4><p>x</p><h2>M</h2>")
    assert(s.map(x => (x.level, x.path)) == Seq(
      (1, "T"), (4, "T > Deep"), (2, "T > M")))
    assert(s(0).text == "" && s(1).text == "x") // empty-body heading still emits
  }

  test("preamble only when it has text; heading inside heading closes implicitly") {
    assert(Outline.extract("<html><body><h1>T</h1><p>x</p></body></html>")
      .map(x => (x.idx, x.level, x.title)) == Seq((0, 1, "T")))
    val pre = Outline.extract("lead<h1>T</h1>rest")
    assert(pre.map(x => (x.level, x.title, x.text)) ==
      Seq((0, "", "lead"), (1, "T", "rest")))
    // h2 opens while h1's title is still accumulating: h1 closes with
    // what it had, h2 becomes its child
    val nested = Outline.extract("<h1>Outer<h2>Inner</h2><p>body</p>")
    assert(nested.map(x => (x.level, x.title, x.path)) ==
      Seq((1, "Outer", "Outer"), (2, "Inner", "Outer > Inner")))
    assert(nested.last.text == "body")
  }

  test("block tags break words, inline tags do not; unclosed heading at EOF keeps its title") {
    val s = Outline.extract("<h1>T</h1><p>a</p><p>b</p><div><b>bo</b>ld</div>")
    assert(s.head.text == "a b bold")
    val u = Outline.extract("<p>x</p><h2>Cut off")
    assert(u.map(x => (x.level, x.title, x.text)) ==
      Seq((0, "", "x"), (2, "Cut off", "")))
  }

  test("totality: junk, orphan end tags, empty input") {
    assert(Outline.extract("").isEmpty)
    assert(Outline.extract("</h1></h2><h9>n</h9>").map(_.level) == Seq(0))
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { i =>
      val junk = (0 until rnd.nextInt(150)).map(_ => (rnd.nextInt(96) + 32).toChar).mkString
      val biased = (i % 3) match {
        case 0 => "<h1>" + junk
        case 1 => junk + "</h2>" + junk
        case _ => junk
      }
      Outline.extract(biased) // must not throw
    }
  }
}
