package graft.gen

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic synthetic PDF writer over the bounded grammar the
  * from-scratch parser understands (FIXTURES.md par 3): xref table,
  * FlateDecode content streams, BT/ET + Tm/Tj text operators, 2-column
  * layout to exercise XY-cut reading order.
  *
  * Oracle contract: `words` are laid out [[LineWords]] per line,
  * [[ColLines]] lines per column, two columns per page — so the expected
  * extraction is the words re-chunked into groups of
  * [[ColWords]] (one block per column) joined with '\n', and
  * pages = ceil(words / PageWords).
  */
object PdfGen {
  val LineWords = 6
  val ColLines = 10
  val ColWords: Int = LineWords * ColLines // 60
  val PageWords: Int = ColWords * 2        // 120

  /** Expected canonical extraction for this generator's output. */
  def expectedText(text: String): String = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    words.grouped(ColWords).map(_.mkString(" ")).mkString("\n")
  }

  def expectedPages(text: String): Int = {
    val n = text.trim.split("\\s+").count(_.nonEmpty)
    math.max(1, math.ceil(n.toDouble / PageWords).toInt)
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '('  => sb ++= "\\("
      case ')'  => sb ++= "\\)"
      case c    => sb += c
    }
    sb.result()
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  /** Render one page's content stream: two columns at x=50 and x=320,
    * first line at y=750, 14pt leading.
    */
  private def pageContent(pageWords: Array[String]): Array[Byte] = {
    val sb = new StringBuilder(2048)
    sb ++= "BT\n/F1 10 Tf\n"
    val cols = pageWords.grouped(ColWords).toSeq
    cols.zipWithIndex.foreach { case (colWords, ci) =>
      val x = 50 + ci * 270
      val lines = colWords.grouped(LineWords).toSeq
      lines.zipWithIndex.foreach { case (lw, li) =>
        val y = 750 - li * 14
        sb ++= s"1 0 0 1 $x $y Tm\n(${esc(lw.mkString(" "))}) Tj\n"
      }
    }
    sb ++= "ET\n"
    sb.result().getBytes(StandardCharsets.UTF_8)
  }

  /** Build a complete PDF file with xref + trailer. */
  def render(docId: Long, text: String): Array[Byte] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val pagesWords: Seq[Array[String]] =
      if (words.isEmpty) Seq(Array.empty[String])
      else words.grouped(PageWords).toSeq

    val out = new ByteArrayOutputStream(8192)
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def writeBytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)

    write("%PDF-1.4\n%âãÏÓ\n")

    val nPages = pagesWords.length
    // object layout: 1=catalog, 2=pages, 3=font, 4..(3+n)=page, (4+n)..(3+2n)=content
    def beginObj(num: Int): Unit = { offsets += out.size(); write(s"$num 0 obj\n") }
    def endObj(): Unit = write("endobj\n")

    beginObj(1); write("<< /Type /Catalog /Pages 2 0 R >>\n"); endObj()
    val kidRefs = (0 until nPages).map(i => s"${4 + i} 0 R").mkString(" ")
    beginObj(2); write(s"<< /Type /Pages /Kids [ $kidRefs ] /Count $nPages >>\n"); endObj()
    beginObj(3); write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"); endObj()
    (0 until nPages).foreach { i =>
      beginObj(4 + i)
      write(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${4 + nPages + i} 0 R >>\n")
      endObj()
    }
    pagesWords.zipWithIndex.foreach { case (pw, i) =>
      val content = pageContent(pw)
      // alternate compressed/uncompressed streams deterministically to
      // exercise both parser paths
      val compress = (docId + i) % 2 == 0
      val payload = if (compress) deflate(content) else content
      beginObj(4 + nPages + i)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      write(s"<< /Length ${payload.length}$filter >>\nstream\n")
      writeBytes(payload)
      write("\nendstream\nendobj\n")
    }

    val xrefPos = out.size()
    val nObjs = offsets.length + 1
    write(s"xref\n0 $nObjs\n")
    write("0000000000 65535 f \n")
    offsets.foreach { off => write(f"$off%010d 00000 n \n") }
    write(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
