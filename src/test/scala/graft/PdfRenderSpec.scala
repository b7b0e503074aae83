package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Html, PdfExtractor, PdfRender}

/** Searchable-PDF re-render family (SURVEY.md par 2.3 rows 15-16, par 2.6
  * row 30 — reference dynamic_routes.py:253-364): the renderer's output
  * must round-trip byte-identically through the from-scratch PDF kernel,
  * with page counts a pure function of the text, and the binary must
  * survive the parquet sink unchanged.
  */
class PdfRenderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pdfrender-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rt(text: String): (String, Int) = {
    val e = PdfExtractor.extract(PdfRender.render(text), Html.Deadline.unlimited)
    (e.text, e.pages)
  }

  private def wordsBlock(n: Int, tag: String = "w"): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("round-trip identity across block shapes, unicode, and page boundaries") {
    val cases = Seq(
      "single",
      wordsBlock(7),                                // one line, no wrap
      wordsBlock(8),                                // exactly one full line
      wordsBlock(9),                                // wraps to two lines
      wordsBlock(100),                              // oversized block, overflows page bottom
      (0 until 3).map(b => wordsBlock(5, s"b$b-")).mkString("\n"),   // 3 blocks, 1 page
      (0 until 10).map(b => wordsBlock(2, s"b$b-")).mkString("\n"),  // exactly 1 full page
      (0 until 11).map(b => wordsBlock(2, s"b$b-")).mkString("\n"),  // spills to page 2
      (0 until 25).map(b => wordsBlock(13, s"b$b-")).mkString("\n"), // 3 pages, wrapped lines
      "héllo wörld №42 中文 テスト العربية ελληνικά",               // full-unicode text layer
      "parens (and) \\backslash\\ (((nested)))",                     // string-escape path
    )
    cases.foreach { text =>
      val (t, p) = rt(text)
      assert(t == text, s"round-trip text diverged for: ${text.take(40)}")
      assert(p == PdfRender.pagesFor(text), s"pages mismatch for: ${text.take(40)}")
    }
  }

  test("non-canonical text (empty blocks) is rejected, not silently lossy") {
    Seq("a\n\nb", "\na", "a\n").foreach { bad =>
      intercept[IllegalArgumentException](PdfRender.render(bad))
      intercept[IllegalArgumentException](PdfRender.pagesFor(bad))
    }
  }

  test("page count formula: ceil(blocks/10), min 1, blocks never split across pages") {
    assert(rt("")._2 == 1 && PdfRender.pagesFor("") == 1)
    assert(rt("")._1 == "")
    Seq(1, 9, 10, 11, 20, 21, 35).foreach { nBlocks =>
      val text = (0 until nBlocks).map(b => wordsBlock(4, s"b$b-")).mkString("\n")
      assert(rt(text)._2 == math.max(1, math.ceil(nBlocks / 10.0).toInt))
    }
  }

  test("rendered binary survives the parquet results sink byte-for-byte (par 2.6 row 30)") {
    val s = spark
    import s.implicits._
    val texts = (0 until 20).map { i =>
      (s"https://h$i.example.com/doc/$i",
        (0 to i % 4).map(b => wordsBlock(3 + i, s"d$i-b$b-")).mkString("\n"))
    }
    val rendered = texts.map { case (url, text) => (url, PdfRender.render(text)) }
    val dir = java.nio.file.Files.createTempDirectory("pdf_sink_").toString
    rendered.toDF("url", "pdf").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[(String, Array[Byte])].collect().toMap
    rendered.foreach { case (url, bytes) =>
      assert(java.util.Arrays.equals(back(url), bytes), s"binary diverged for $url")
    }
    // and the read-back binary still extracts to the original text
    texts.foreach { case (url, text) =>
      val e = PdfExtractor.extract(back(url), Html.Deadline.unlimited)
      assert(e.text == text, s"post-sink extraction diverged for $url")
    }
  }
}
