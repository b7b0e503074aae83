package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.gen.HtmlGen

/** Families B and C pin the DENSITY path of the classifier (no
  * article/main markers — core/Blocks.scala:279-312): primary density
  * rule, neighbor smoothing, near-threshold link densities on both sides
  * of 0.33, and the trailing-short-paragraph drop. The same expectations
  * are mirrored in SparkEntry's e13/e14 DuckDB oracles.
  */
class DensitySpec extends AnyFunSuite {

  private def words(n: Int): String = (0 until n).map(i => s"tok$i").mkString(" ")

  private def extractB(docId: Long, text: String): String =
    HtmlExtractor.extract(HtmlGen.renderB(docId, text, "en"), Html.Deadline.unlimited).text

  private def extractC(docId: Long, text: String): String =
    HtmlExtractor.extract(HtmlGen.renderC(docId, text, "en"), Html.Deadline.unlimited).text

  test("family B: extraction equals the expected-text rule across word counts") {
    for (n <- Seq(0, 2, 3, 4, 9, 20, 40, 41, 43, 44, 79, 88, 89, 90, 93, 128, 130, 250)) {
      assert(extractB(5L, words(n)) == HtmlGen.expectedTextB(words(n)), s"nw=$n")
    }
  }

  test("families B and C: kernel == expected rule EXHAUSTIVELY for 0..200 words") {
    // every chunk-boundary / smoothing / trailing-drop edge in one sweep
    (0 to 200).foreach { n =>
      val t = words(n)
      assert(extractB(51L, t) == HtmlGen.expectedTextB(t), s"family B nw=$n")
      assert(extractC(57L, t) == HtmlGen.expectedTextC(t), s"family C nw=$n")
    }
  }

  test("family B: near-threshold blocks land on the right side of 0.33") {
    val out = extractB(28L, words(50))
    assert(out.contains(HtmlGen.PickText), "ld=0.23 block (13 words, 3 linked) must be kept")
    assert(!out.contains("promotion"), "ld=0.3333 block (12 words, 4 linked) must be dropped")
    assert(!out.contains("top stories"), "ld=1.0 link farm must be dropped")
  }

  test("family B: 5-word paragraph survives only via neighbor smoothing") {
    // present at nw>=90 (between two primary 40s)...
    val t90 = words(90)
    assert(extractB(5L, t90).contains(
      t90.split(" ").slice(40, 45).mkString(" ")), "smoothing para lost")
    // ...and a trailing <=3-word chunk is dropped (no smoothing below 4 words)
    val t43 = words(43)
    val out43 = extractB(5L, t43)
    assert(!out43.contains("tok40") && !out43.contains("tok42"))
  }

  test("family C: extraction equals the expected-text rule across word counts") {
    for (n <- Seq(0, 2, 3, 4, 8, 24, 25, 26, 29, 51, 53, 78, 100)) {
      assert(extractC(11L, words(n)) == HtmlGen.expectedTextC(words(n)), s"nw=$n")
    }
  }

  test("family C: intro anchors the density path; ld=0.5 tag cloud dropped") {
    val out = extractC(34L, words(30))
    assert(out.startsWith(HtmlGen.IntroText))
    assert(!out.contains("Browse more topics"))
    assert(!out.contains("alpha beta"))
  }

  test("family routing: only html-kind docs split; junk/oversize/pdf precedence wins") {
    import graft.gen.PagesGen
    // 28 % 23 == 5 => family B; 34 % 23 == 11 => family C (both html kind)
    assert(HtmlGen.familyOf(28L) == "B" && PagesGen.kindOf(28L) == "html")
    assert(HtmlGen.familyOf(34L) == "C" && PagesGen.kindOf(34L) == "html")
    val pb = new String(PagesGen.payload(28L, words(10), "en"), "UTF-8")
    assert(pb.contains("class=\"pick\"") && !pb.contains("<article>"))
    val pc = new String(PagesGen.payload(34L, words(10), "en"), "UTF-8")
    assert(pc.contains("class=\"wrap\"") && !pc.contains("<article>"))
    // 37*5=185 => junk precedence even though 185 % 23 == 1 (A) — and
    // oversize bases stay family A regardless of doc_id % 23
    assert(PagesGen.kindOf(185L) == "junk")
    val ov = 41L * 28 // oversize kind
    assert(PagesGen.kindOf(ov) == "oversize")
    assert(new String(PagesGen.payload(ov, words(10), "en"), "UTF-8").contains("<article>"))
  }
}
