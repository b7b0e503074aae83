package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.gen.{HtmlGen, PdfGen}

/** hOCR renderer parity (SURVEY.md par 2.8): page/block/word hierarchy,
  * well-formedness, span titles, and parse-back counts — mirrors the
  * reference's hOCR structural assertions
  * (tests/unit/utils/test_hocr.py, tests/e2e/test_ocr_tesseract.py:264-274).
  */
class HocrSpec extends AnyFunSuite {

  private def words(n: Int): String =
    (0 until n).map(i => s"w$i").mkString(" ")

  test("html extraction renders to well-formed hOCR with full hierarchy") {
    val e = HtmlExtractor.extract(HtmlGen.render(5L, words(85), "en"), Html.Deadline.unlimited)
    val hocr = Hocr.render(e, "html")
    // well-formed XML (the reference validates hOCR responses the same way,
    // responses.py:60-69)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(hocr.getBytes("UTF-8")))
    assert(doc.getDocumentElement.getTagName == "html")
    val (pages, nWords, hasSpans) = Hocr.info(hocr)
    assert(pages == 1 && nWords == 85 && hasSpans)
  }

  test("pdf extraction renders multi-page hOCR") {
    val e = PdfExtractor.extract(PdfGen.render(3L, words(130)), Html.Deadline.unlimited)
    val hocr = Hocr.render(e, "pdf")
    val (pages, nWords, _) = Hocr.info(hocr)
    assert(pages == 2 && nWords == 130)
  }

  test("escaping: entity-bearing text cannot break the markup") {
    val e = Extracted("a<b & \"c\"", Vector(
      Span("page", "page/0", 0, 9),
      Span("block", "html/body", 0, 9),
      Span("word", "", 0, 3), Span("word", "", 4, 5), Span("word", "", 6, 9)), 1)
    val hocr = Hocr.render(e, "html")
    javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(hocr.getBytes("UTF-8")))
    assert(hocr.contains("a&lt;b"))
  }
}
