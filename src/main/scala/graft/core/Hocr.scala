package graft.core

/** hOCR renderer — the structured spans rendered back to the reference's
  * wire format (XHTML with ocr_page / ocr_carea / ocrx_word classes and
  * per-element title attributes; canonical example at
  * /root/reference/src/models/responses.py:90 and
  * /root/reference/tests/conftest.py:176-233). Character-offset spans
  * replace pixel bboxes (webtext payload), carried as
  * `title="cspan <begin> <end>"` the way hOCR carries `bbox x0 y0 x1 y1`.
  *
  * A user of the reference consuming hOCR strings can point their parser
  * at this output: page/block/word hierarchy, one div per page, one span
  * per word, XML-escaped text. Pure function of Extracted — used by tests
  * and available as a column expression via a one-line UDF if an hOCR
  * column is ever required.
  */
object Hocr {

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Render one document's extraction as an hOCR XHTML string. */
  def render(e: Extracted, engine: String): String = {
    val sb = new java.lang.StringBuilder(e.text.length * 2 + 512)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<html xmlns=\"http://www.w3.org/1999/xhtml\">\n<head>\n")
    sb.append("<meta name=\"ocr-system\" content=\"graft-").append(engine).append("\"/>\n")
    sb.append("<meta name=\"ocr-capabilities\" content=\"ocr_page ocr_carea ocrx_word\"/>\n")
    sb.append("</head>\n<body>\n")
    val pages = e.spans.filter(_.kind == "page")
    val blocks = e.spans.filter(_.kind == "block")
    var pageId = 0
    pages.foreach { pg =>
      pageId += 1
      sb.append(s"""<div class="ocr_page" id="page_$pageId" title="cspan ${pg.begin} ${pg.end}">""").append('\n')
      var blockId = 0
      blocks.filter(b => b.begin >= pg.begin && b.end <= pg.end).foreach { b =>
        blockId += 1
        sb.append(s"""<div class="ocr_carea" id="block_${pageId}_$blockId" title="cspan ${b.begin} ${b.end}">""").append('\n')
        var wordId = 0
        // word spans are derived from the canonical text, not stored
        Span.wordSpans(e.text, b.begin, b.end).foreach { w =>
          wordId += 1
          val t = escape(e.text.substring(w.begin, w.end))
          sb.append(s"""<span class="ocrx_word" id="word_${pageId}_${blockId}_$wordId" title="cspan ${w.begin} ${w.end}">$t</span>""").append('\n')
        }
        sb.append("</div>\n")
      }
      sb.append("</div>\n")
    }
    sb.append("</body>\n</html>\n")
    sb.toString
  }

  /** Parse-back of the info the reference's hOCR utilities extract
    * (parse_hocr -> {page_count, word_count, has_spans}; contract pinned
    * at /root/reference/tests/unit/utils/test_hocr.py:10-31).
    */
  def info(hocr: String): (Int, Int, Boolean) = {
    def countOf(marker: String): Int = {
      var c = 0; var i = hocr.indexOf(marker)
      while (i >= 0) { c += 1; i = hocr.indexOf(marker, i + marker.length) }
      c
    }
    (countOf("class=\"ocr_page\""), countOf("class=\"ocrx_word\""), hocr.contains("title=\"cspan "))
  }
}
