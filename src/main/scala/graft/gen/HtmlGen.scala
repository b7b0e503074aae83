package graft.gen

import java.nio.charset.StandardCharsets

/** Deterministic synthetic HTML writer (FIXTURES.md par 2).
  *
  * Oracle contract: the ONLY text the extraction kernel may keep is the
  * main-content paragraphs — `words` chunked into groups of
  * [[HtmlGen.ParaWords]], one <p> per chunk inside <article>. Everything
  * else (head, nav, header, aside cookie banner, footer) lives under
  * structural-boilerplate elements so classification is unambiguous and a
  * SQL oracle can reconstruct the expected output from the raw text alone.
  * Template variation (charset decl, entities, unclosed tags, multibyte
  * text, stray '<') is keyed off docId and confined to boilerplate.
  */
object HtmlGen {

  /** Words per paragraph — part of the oracle contract (mirrored in
    * SparkEntry.oracleSql); changing it regenerates goldens.
    */
  val ParaWords = 40

  def paragraphs(words: Array[String]): Seq[String] =
    words.grouped(ParaWords).map(_.mkString(" ")).toSeq

  /** Expected canonical extraction for this generator's output. */
  def expectedText(text: String): String = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    paragraphs(words).mkString("\n")
  }

  def render(docId: Long, text: String, lang: String): Array[Byte] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val paras = paragraphs(words)
    val v = (docId % 4).toInt
    val charsetDecl = v match {
      case 0 => """<meta charset="utf-8">"""
      case 1 => """<meta charset=UTF-8>"""
      case 2 => """<meta http-equiv="Content-Type" content="text/html; charset=utf-8">"""
      case _ => """<meta charset='utf-8'>"""
    }
    val navItems = (0 until 5).map { i =>
      val li = s"""<li><a href="/cat/${(docId + i) % 13}">Category ${(docId + i) % 13}</a>"""
      if (v == 1) li else li + "</li>" // unclosed <li> variant
    }.mkString("\n      ")
    val sb = new StringBuilder(4096)
    sb ++= "<!DOCTYPE html>\n"
    sb ++= s"""<html lang="$lang">\n<head>\n  $charsetDecl\n"""
    sb ++= s"  <title>Synthetic document $docId</title>\n"
    sb ++= "  <style>body { color: #333; } .x > .y { margin: 0; }</style>\n"
    sb ++= "  <script>var gnarly = 1 < 2 && \"</div>\"; // <p>not text</p></script>\n"
    sb ++= "</head>\n<body>\n"
    sb ++= "  <header>\n"
    sb ++= s"""    <h1><a href="/">Müller &amp; Söhne &laquo;Webkorpus&raquo; #$docId</a></h1>\n"""
    sb ++= "    <nav>\n      <ul>\n      " + navItems + "\n      </ul>\n    </nav>\n"
    sb ++= "  </header>\n"
    sb ++= "  <!-- boilerplate below; comment with <fake tags> and -- dashes -->\n"
    sb ++= "  <aside class=\"cookie\" data-x='q\"uote'>We use cookies to improve your experience "
    sb ++= s"""<a href="/privacy">Learn more</a> <button>OK $docId</button> stray < bracket</aside>\n"""
    sb ++= "  <main>\n    <article>\n"
    paras.foreach { p => sb ++= s"      <p>${p}</p>\n" }
    if (paras.isEmpty) sb ++= "      <p></p>\n" // content-free page stays ok
    sb ++= "    </article>\n  </main>\n"
    sb ++= "  <aside>\n    <ul>\n"
    sb ++= (0 until 4).map(i => s"""      <li><a href="/rel/${(docId * 7 + i) % 31}">Related post ${(docId * 7 + i) % 31} &hellip;</a></li>""").mkString("\n")
    sb ++= "\n    </ul>\n  </aside>\n"
    sb ++= s"  <footer><p>&copy; 2026 Example Corp &middot; <a href=\"/imprint\">Impressum</a> &#8211; id&nbsp;$docId</p></footer>\n"
    sb ++= "</body>\n</html>\n"
    sb.result().getBytes(StandardCharsets.UTF_8)
  }

  /** Deterministic pseudo-random junk payload (rejected_format rows). */
  def junkBytes(docId: Long, n: Int = 256): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = docId * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      // avoid '<' and '%' so the payload can never sniff as html/pdf
      var b = ((x >>> 33) & 0xff).toInt
      if (b == '<' || b == '%') b = 0x7f
      out(i) = b.toByte
      i += 1
    }
    out
  }

  /** Oversized payload: valid html plus a filler comment pushing it past
    * the size gate (rejected_size rows; parity with the reference's 413
    * path, /root/reference/src/utils/validators.py:108-136).
    */
  def oversizedBytes(docId: Long, text: String, lang: String, minLen: Int): Array[Byte] = {
    val base = render(docId, text, lang)
    if (base.length > minLen) return base
    val filler = new Array[Byte](minLen - base.length + 1024)
    java.util.Arrays.fill(filler, 'x'.toByte)
    val head = "<!-- filler ".getBytes(StandardCharsets.UTF_8)
    val tail = " -->\n</html>\n".getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(base.length + filler.length + 64)
    // insert the filler before </html> is unnecessary; append as comment
    out.write(base, 0, base.length)
    out.write(head); out.write(filler); out.write(tail)
    out.toByteArray
  }
}
