package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Extractor-param threading (SURVEY.md par 2.2 row 10): params are
  * validated at construction (the reference's 400-before-processing path,
  * /root/reference/src/services/ocr/registry_v2.py:427-471), APPLIED by
  * the kernels (not just described), and reflected by discovery.
  */
class ParamsSpec extends AnyFunSuite {

  private def extract(ex: Extractor, bytes: Array[Byte]): String =
    ex.extract(bytes, Html.Deadline.unlimited).text

  test("out-of-range params fail fast at construction") {
    intercept[IllegalArgumentException](HtmlParams(maxLinkDensity = 1.5))
    intercept[IllegalArgumentException](HtmlParams(maxLinkDensity = 0.0))
    intercept[IllegalArgumentException](HtmlParams(minWordsDense = 0))
    intercept[IllegalArgumentException](PdfParams(xGap = -1.0))
    intercept[IllegalArgumentException](PdfParams(yGap = 0.0))
    // and through the pipeline conf (plan build on the driver)
    intercept[IllegalArgumentException](
      graft.spark.ExtractConf(htmlParams = HtmlParams(maxLinkDensity = 2.0)))
  }

  test("maxLinkDensity is applied: tightening it drops a near-threshold block") {
    // block B: 10 words, 3 inside <a> => linkDensity 0.3 — primary content
    // at the default 0.33, boilerplate at 0.2
    val content = (0 until 30).map(i => s"alpha$i").mkString(" ")
    val b = "seven plain words sit right here then " +
      "<a href=\"/x\">three linked words</a>"
    val html = s"<html><body><div><p>$content</p></div><div><p>$b</p></div></body></html>"
      .getBytes("UTF-8")
    val loose = extract(HtmlExtractor, html)
    val tight = extract(new HtmlExtractor(HtmlParams(maxLinkDensity = 0.2)), html)
    assert(loose.contains("three linked words"), "default params must keep ld=0.3 block")
    assert(!tight.contains("three linked words"), "tightened maxLinkDensity must drop it")
    assert(tight.contains("alpha0"), "main content survives either way")
  }

  test("minWordsDense is applied: raising it demotes a mid-size isolated block") {
    // block B (12 words) is NOT adjacent to the primary block (a high-link
    // block C sits between), so neighbor smoothing can't rescue it once
    // it loses primary status
    val content = (0 until 40).map(i => s"beta$i").mkString(" ")
    val mid = (0 until 12).map(i => s"mid$i").mkString(" ")
    val links = (0 until 6).map(i => s"<a href=/l$i>l$i</a>").mkString(" ")
    val html = (s"<html><body><div><p>$content</p></div><div>$links</div>" +
      s"<div><p>$mid</p></div><div>$links</div></body></html>").getBytes("UTF-8")
    val keep = extract(HtmlExtractor, html)
    val drop = extract(new HtmlExtractor(HtmlParams(minWordsDense = 20)), html)
    assert(keep.contains("mid0"))
    assert(!drop.contains("mid0"))
  }

  test("pdf XY-cut gaps are applied: huge gaps collapse the column split") {
    val words = (0 until 120).map(i => s"w$i").mkString(" ")
    val pdf = graft.gen.PdfGen.render(2L, words) // (docId+page) even => compressed path
    val twoCol = extract(PdfExtractor, pdf)
    val noCut = extract(new PdfExtractor(PdfParams(xGap = 9999.0, yGap = 9999.0)), pdf)
    assert(twoCol != noCut, "gap params had no effect on reading order")
    // both orders contain the same words
    assert(twoCol.split("[ \n]").sorted.sameElements(noCut.split("[ \n]").sorted))
  }

  test("discovery reflects applied params, not defaults") {
    val ex = new HtmlExtractor(HtmlParams(maxLinkDensity = 0.25, minWordsDense = 7))
    assert(ex.describe("params") == "maxLinkDensity:double=0.25,minWordsDense:int=7")
    val pd = new PdfExtractor(PdfParams(xGap = 42.0, yGap = 13.5))
    assert(pd.describe("params") == "xGap:double=42.0,yGap:double=13.5")
  }
}
