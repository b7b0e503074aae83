package graft

import graft.core._
import graft.gen.{HtmlGen, PdfGen}

/** Single-thread kernel micro-benchmark (dev tool, not part of the driver
  * contract): docs/sec/core for the HTML and PDF kernels, used to size the
  * bench corpus so ScalingBench runs long enough to measure scaling.
  *
  *   sbt "Test/runMain graft.MicroBench"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val pool = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def words(n: Int, seed: Int) =
      (0 until n).map(i => pool((i * 31 + seed) % pool.length)).mkString(" ")

    val htmlDocs = (0 until 200).map(i => HtmlGen.render(i.toLong, words(50, i), "en")).toArray
    val pdfDocs = (0 until 200).map(i => PdfGen.render(i.toLong, words(50, i))).toArray
    val htmlBytes = htmlDocs.map(_.length.toLong).sum / htmlDocs.length
    val pdfBytes = pdfDocs.map(_.length.toLong).sum / pdfDocs.length

    def bench(name: String, docs: Array[Array[Byte]], ex: Extractor, avgBytes: Long): Unit = {
      var sink = 0L
      // warm-up for JIT
      for (_ <- 0 until 20; d <- docs) sink += ex.extract(d, Html.Deadline.unlimited).text.length
      val t0 = System.nanoTime()
      val reps = 50
      for (_ <- 0 until reps; d <- docs) sink += ex.extract(d, Html.Deadline.unlimited).text.length
      val sec = (System.nanoTime() - t0) / 1e9
      val n = reps * docs.length
      println(f"[$name] $n docs (${avgBytes}B avg) in $sec%.2fs = ${n / sec}%.0f docs/s/core, " +
        f"${n * avgBytes / sec / 1e6}%.1f MB/s/core (sink=$sink)")
    }
    bench("html", htmlDocs, HtmlExtractor, htmlBytes)
    bench("pdf", pdfDocs, PdfExtractor, pdfBytes)
  }
}
