package graft.core

/** Character-offset span into the extracted text — the structured
  * replacement for hOCR's element/bbox hierarchy
  * (/root/reference/src/models/responses.py:90: ocr_page/ocr_carea/
  * ocr_par/ocr_line/ocrx_word with pixel bboxes). Pixel boxes become
  * [begin, end) character offsets per the north_star.
  *
  * kind: page | block | line | word
  * path: tag path (html) or "page/<n>/col/<m>" (pdf)
  */
final case class Span(kind: String, path: String, begin: Int, end: Int)

/** Kernel output for one document (pre-Spark, pure). */
final case class Extracted(text: String, spans: Vector[Span], pages: Int)

/** Status taxonomy — the reference's HTTP error codes as data
  * (400/413/404/503/504 at /root/reference/src/api/middleware/
  * error_handler.py:11-63 become column values; SURVEY.md par 2.6 item 33).
  */
object Status {
  val Ok = "ok"
  val RejectedFormat = "rejected_format"
  val RejectedSize = "rejected_size"
  val Timeout = "timeout"
  val Error = "error"
  val all: Seq[String] = Seq(Ok, RejectedFormat, RejectedSize, Timeout, Error)
}

/** Content sniffing by magic bytes, like the reference's libmagic allowlist
  * (/root/reference/src/utils/validators.py:28-56; magic prefixes pinned at
  * tests/unit/utils/test_validators.py:26-48). Payload graft: webtext, so
  * the closed set is {html, pdf}.
  */
object ContentType {
  val Html = "html"
  val Pdf = "pdf"
  val Unknown = "unknown"

  private val pdfMagic = "%PDF-".getBytes("US-ASCII")

  def detect(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return Unknown
    if (bytes.length >= 5 && startsWith(bytes, pdfMagic, 0)) return Pdf
    // HTML: optional BOM/whitespace then '<'; or a tag marker in the head
    var i = 0
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) i = 3
    while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\n' || bytes(i) == '\r')) i += 1
    if (i < bytes.length && bytes(i) == '<') return Html
    val n = math.min(bytes.length, 1024)
    val head = new String(bytes, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    if (head.contains("<html") || head.contains("<!doctype")) Html else Unknown
  }

  private def startsWith(b: Array[Byte], prefix: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < prefix.length) { if (b(off + i) != prefix(i)) return false; i += 1 }
    true
  }
}

/** Per-format extraction kernel. The moral equivalent of the reference's
  * OCREngine.process contract (/root/reference/tests/mocks/
  * mock_engines.py:26-42), minus the filesystem: Array[Byte] in,
  * Extracted out, deterministic.
  */
trait Extractor extends Serializable {
  def name: String

  /** @throws Html.TimeoutException when the deadline expires */
  def extract(bytes: Array[Byte], deadline: Html.Deadline): Extracted

  /** Discovery metadata — parity with GET /v2/ocr/engines/{engine}/info
    * (/root/reference/src/services/ocr/registry_v2.py:367-408).
    */
  def describe: Map[String, String]
}

/** HTML main-content extractor: tokenizer -> block builder -> density
  * classifier -> canonical join, with spans.
  */
object HtmlExtractor extends Extractor {
  val name = "html"

  def extract(bytes: Array[Byte], deadline: Html.Deadline): Extracted = {
    val decoded = Html.decode(bytes)
    val blocks = BlockBuilder.build(Html.tokenize(decoded, deadline))
    val content = BoilerplateClassifier.classify(blocks)
    assemble(content.map(b => (b.text, b.tagPath)))
  }

  /** Build (text, spans, pages=1) from canonical (blockText, path) pairs.
    * Shared with tests and goldens.
    */
  def assemble(blocks: Seq[(String, String)]): Extracted = {
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var first = true
    blocks.foreach { case (text, path) =>
      if (text.nonEmpty) {
        if (!first) sb.append('\n')
        first = false
        val b0 = sb.length
        sb.append(text)
        spans += Span("block", path, b0, sb.length)
        // word spans inside the block
        var i = 0
        while (i < text.length) {
          while (i < text.length && text.charAt(i) == ' ') i += 1
          val ws = i
          while (i < text.length && text.charAt(i) != ' ') i += 1
          if (i > ws) spans += Span("word", path, b0 + ws, b0 + i)
        }
      }
    }
    val text = sb.toString
    Extracted(text, Span("page", "page/0", 0, text.length) +: spans.result(), pages = 1)
  }

  val describe: Map[String, String] = Map(
    "name" -> name,
    "version" -> "1.0.0",
    "supported_formats" -> "text/html",
    "params" -> "maxLinkDensity:double=0.33,minWordsDense:int=10",
  )
}

/** Registry of extraction kernels — the static-Scala equivalent of the
  * reference's entry-point discovery (/root/reference/src/services/ocr/
  * registry_v2.py:44-163). Construction never throws; unknown formats are
  * routed to rejected status by the pipeline, mirroring failure isolation
  * (tests/unit/services/ocr/test_registry_v2.py:68-86).
  */
object Extractors {
  val all: Map[String, Extractor] = Map(
    ContentType.Html -> HtmlExtractor,
    ContentType.Pdf -> PdfExtractor,
  )

  def forType(contentType: String): Option[Extractor] = all.get(contentType)

  /** Discovery surface as rows, for the `engines` metadata DataFrame. */
  def describeAll: Seq[Map[String, String]] = all.values.map(_.describe).toSeq
}
