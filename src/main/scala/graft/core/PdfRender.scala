package graft.core

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Searchable-PDF renderer — the Spark mapping of the reference's
  * "re-render with a text layer" family (PDF→searchable-PDF and
  * image→PDF conversion endpoints, `/root/reference/src/api/
  * dynamic_routes.py:253-364`, plus the result-PDF binary download at
  * `dynamic_routes.py:330-364`): the reference runs OCR and hands back a
  * PDF whose text layer carries the recognized words; here the extraction
  * result (canonical text, from ANY supported payload — HTML or PDF) is
  * re-rendered as a deterministic single-column searchable PDF over the
  * same bounded grammar the from-scratch parser reads, so
  * `PdfExtractor.extract(render(text)).text == text` (round-trip
  * identity, oracle-gated by e16).
  *
  * Layout contract (all constants are part of the oracle):
  *  - input blocks = `text.split('\n')` (canonical block separator);
  *  - a block is wrapped into lines of at most [[LineWords]] words; lines
  *    within a block sit [[Leading]] pt apart (< the XY-cut yGap of 25,
  *    so the block stays one leaf) and blocks [[Leading]]*2 = 28 pt apart
  *    (>= yGap, so XY-cut re-splits exactly at block boundaries);
  *  - [[BlocksPerPage]] blocks per page — a block never splits across
  *    pages, and an oversized block simply overflows below the nominal
  *    page bottom (the parser has no clip box; "virtual paper"), keeping
  *    `pages = max(1, ceil(nBlocks / BlocksPerPage))` a pure SQL-
  *    expressible function of the text;
  *  - content streams are always FlateDecode (production choice — the
  *    alternating raw/deflate split in gen/PdfGen exists only to exercise
  *    both parser paths).
  *
  * Scale: a pure per-row kernel (bytes out of text in), embarrassingly
  * parallel, no state — it runs inside the same scan-stage map as the
  * extraction kernel, so rendering adds zero shuffles.
  */
object PdfRender {
  val LineWords = 8
  val Leading = 14
  val BlocksPerPage = 10
  val StartY = 750
  val MarginX = 50

  /** Page count the renderer will produce for a given canonical text —
    * `GREATEST(1, CEIL(nBlocks / 10.0))` in oracle SQL.
    */
  def pagesFor(text: String): Int = {
    val blocks = blocksOf(text)
    math.max(1, (blocks.length + BlocksPerPage - 1) / BlocksPerPage)
  }

  /** The round-trip identity holds only for CANONICAL extraction text
    * (blocks joined by single `\n`, no empty blocks — what
    * [[Canonicalizer]] emits). Empty blocks cannot be represented in the
    * rendered layout (a block is >= 1 line), so rather than silently
    * dropping them and returning a lossy round trip, reject the input.
    */
  private def blocksOf(text: String): Array[String] = {
    require(!text.startsWith("\n") && !text.endsWith("\n") && !text.contains("\n\n"),
      "PdfRender expects canonical extraction text (single-\\n block joins, " +
        "no empty/leading/trailing blocks); empty blocks would not survive the round trip")
    text.split("\n").filter(_.nonEmpty)
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

  /** One page's text layer: sequential y cursor, one Tj per wrapped line.
    * UTF-8 bytes — the parser re-decodes string bytes as UTF-8, so the
    * full Unicode range of the corpus round-trips.
    */
  private def pageContent(blocks: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder(1024)
    sb ++= "BT\n/F1 10 Tf\n"
    var y = StartY
    blocks.foreach { block =>
      block.split(" ").grouped(LineWords).foreach { lw =>
        sb ++= s"1 0 0 1 $MarginX $y Tm\n(${esc(lw.mkString(" "))}) Tj\n"
        y -= Leading
      }
      y -= Leading // extra leading => 2*Leading = 28pt block gap >= yGap
    }
    sb ++= "ET\n"
    sb.result().getBytes(StandardCharsets.UTF_8)
  }

  /** Render the searchable PDF for one extraction result. */
  def render(text: String): Array[Byte] = {
    val pages: Seq[Seq[String]] = {
      val bs = blocksOf(text)
      if (bs.isEmpty) Seq(Seq.empty) else bs.toSeq.grouped(BlocksPerPage).toSeq
    }
    val out = new ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(num: Int): Unit = { offsets += out.size(); write(s"$num 0 obj\n") }

    write("%PDF-1.4\n%âãÏÓ\n")
    val n = pages.length
    // object layout: 1=catalog, 2=pages, 3=font, 4..(3+n)=page, then content
    beginObj(1); write("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    write(s"<< /Type /Pages /Kids [ ${(0 until n).map(i => s"${4 + i} 0 R").mkString(" ")} ] /Count $n >>\nendobj\n")
    beginObj(3); write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    (0 until n).foreach { i =>
      beginObj(4 + i)
      write(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${4 + n + i} 0 R >>\nendobj\n")
    }
    pages.zipWithIndex.foreach { case (blocks, i) =>
      val payload = deflate(pageContent(blocks))
      beginObj(4 + n + i)
      write(s"<< /Length ${payload.length} /Filter /FlateDecode >>\nstream\n")
      out.write(payload, 0, payload.length)
      write("\nendstream\nendobj\n")
    }
    val xrefPos = out.size()
    write(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => write(f"$off%010d 00000 n \n"))
    write(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
