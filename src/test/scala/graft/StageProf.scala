package graft

import graft.core._
import graft.gen.{HtmlGen, PdfGen}

/** Dev tool: per-stage timing of the HTML kernel to target optimization. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val pool = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def words(n: Int, seed: Int) =
      (0 until n).map(i => pool((i * 31 + seed) % pool.length)).mkString(" ")
    val docs = (0 until 200).map(i => HtmlGen.render(i.toLong, words(50, i), "en")).toArray
    val decoded = docs.map(Html.decode)

    def time(name: String)(f: => Long): Unit = {
      var sink = 0L
      for (_ <- 0 until 20) sink += f // warm
      val t0 = System.nanoTime()
      val reps = 50
      for (_ <- 0 until reps) sink += f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[$name] ${reps * 200 / sec}%.0f docs/s (sink=$sink)")
    }

    time("decode") { docs.map(Html.decode(_).length.toLong).sum }
    time("tokenize") { decoded.map(d => { var c = 0L; Html.tokenize(d).foreach(_ => c += 1); c }).sum }
    time("tok+build") { decoded.map(d => BlockBuilder.build(Html.tokenize(d)).length.toLong).sum }
    time("full") { docs.map(d => HtmlExtractor.extract(d, Html.Deadline.unlimited).text.length.toLong).sum }
    val blocks = decoded.map(d => BlockBuilder.build(Html.tokenize(d)))
    time("classify") { blocks.map(b => BoilerplateClassifier.classify(b).length.toLong).sum }
    val contents = blocks.map(b => BoilerplateClassifier.classify(b).map(x => (x.text, x.tagPath)))
    time("assemble") { contents.map(c => HtmlExtractor.assemble(c).text.length.toLong).sum }
    time("decode+tok+build+cls+asm") {
      docs.map { d =>
        val dd = Html.decode(d)
        val bl = BlockBuilder.build(Html.tokenize(dd))
        val ct = BoilerplateClassifier.classify(bl)
        HtmlExtractor.assemble(ct.map(x => (x.text, x.tagPath))).text.length.toLong
      }.sum
    }
    time("full-again") { docs.map(d => HtmlExtractor.extract(d, Html.Deadline.unlimited).text.length.toLong).sum }
    time("composed-again") {
      docs.map { d =>
        val dd = Html.decode(d)
        val bl = BlockBuilder.build(Html.tokenize(dd))
        val ct = BoilerplateClassifier.classify(bl)
        HtmlExtractor.assemble(ct.map(x => (x.text, x.tagPath))).text.length.toLong
      }.sum
    }
    val pdfs = (0 until 200).map(i => PdfGen.render(i.toLong, words(50, i))).toArray
    time("pdf-full") { pdfs.map(d => PdfExtractor.extract(d, Html.Deadline.unlimited).text.length.toLong).sum }
  }
}
