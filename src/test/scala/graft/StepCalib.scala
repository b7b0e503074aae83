package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Pins the parse-step model that makes step-budget timeouts
  * oracle-verifiable (SURVEY.md par 2.4 row 21): for the HtmlGen template,
  * steps = A_v + 4 * paragraphs, where A = 138 (A - 5 for the v=1 variant,
  * whose nav items omit `</li>` end tags), independent of words per
  * paragraph. SparkEntry's e11 budget (148) and its DuckDB oracle both
  * encode this relation — if this test fails after a parser change, e11's
  * oracle constants must be re-derived with it.
  */
class StepCalib extends AnyFunSuite {

  private def stepsOf(docId: Long, nWords: Int): Long = {
    val words = (0 until nWords).map(i => s"w$i").mkString(" ")
    val html = graft.gen.HtmlGen.render(docId, words, "en")
    val d = new Html.Deadline(0L)
    BlockBuilder.buildStreaming(Html.decode(html), d)
    d.steps
  }

  test("parse steps are A_v + 4*paras, independent of para word counts") {
    for (v <- 0 to 3; p <- 1 to 4) {
      val docId = 100L * p * 4 + v
      val a = if (v == 1) 133 else 138
      assert(stepsOf(docId, p * 40) == a + 4L * p, s"v=$v p=$p")
    }
    // a partial trailing paragraph costs the same 4 steps as a full one
    assert(stepsOf(400L, 41) == 138 + 8L)
    assert(stepsOf(400L, 79) == 138 + 8L)
  }

  test("step budget 148 times out exactly at the oracle threshold") {
    val conf = graft.spark.ExtractConf(docBudgetSteps = 148)
    def statusFor(docId: Long, paras: Int): String = {
      val words = (0 until paras * 40).map(i => s"w$i").mkString(" ")
      graft.spark.ExtractPipeline.Kernel.process(
        s"https://x/$docId", graft.gen.HtmlGen.render(docId, words, "en"),
        null, 0, conf).status
    }
    // v != 1: timeout iff p >= 3; v == 1: iff p >= 4
    assert(statusFor(400L, 2) == Status.Ok)
    assert(statusFor(400L, 3) == Status.Timeout)
    assert(statusFor(401L, 3) == Status.Ok)
    assert(statusFor(401L, 4) == Status.Timeout)
  }

  test("step budget is deterministic: same doc, same outcome, every run") {
    val conf = graft.spark.ExtractConf(docBudgetSteps = 148)
    val html = graft.gen.HtmlGen.render(7L, (0 until 200).map(i => s"w$i").mkString(" "), "en")
    val outs = (0 until 5).map { _ =>
      graft.spark.ExtractPipeline.Kernel.process("https://x/7", html, null, 0, conf).status
    }
    assert(outs.distinct.length == 1)
  }
}
