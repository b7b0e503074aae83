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

  // ------------------------------------------------------ template families
  //
  // Family A (render above) marks content explicitly (<article>/<main>),
  // so the classifier's inContent rule decides. Families B and C have NO
  // content markers: classification runs purely on the density rules,
  // neighbor smoothing, and link-density thresholds
  // (core/Blocks.scala:279-312), with near-threshold boilerplate on both
  // sides of the 0.33 line — each family's expected extraction is a pure
  // function of (doc_id, text) mirrored in SparkEntry's oracle SQL.

  /** Family split for html-kind docs (routed by PagesGen.payload; the
    * junk/oversize/pdf precedence applies first, and oversize bases stay
    * family A).
    */
  def familyOf(docId: Long): String =
    if (docId % 23 == 5) "B" else if (docId % 23 == 11) "C" else "A"

  /** Family B fixed 13-word block, 3 words linked => linkDensity 0.23 —
    * just UNDER the 0.33 threshold, so the density rule keeps it (words
    * >= 10). Guarantees every family-B page has a primary block, pinning
    * the classifier to the density path (never the fallback rungs).
    */
  val PickText = "Editors pick of the week stays readable without heavy markup read more now"

  /** Family B fixed 12-word block with 4 words linked => linkDensity
    * 0.3333 — just OVER the threshold: must be dropped.
    */
  val PromoText = "Todays promotion brings savings across categories shop the big sale everywhere online"

  /** Family C fixed 11-word intro (no links): the density-rule anchor. */
  val IntroText = "This page collects field notes gathered quietly over several seasons here"

  /** Family B paragraph sizes: one 40-word para, one 5-word para (kept
    * only by NEIGHBOR SMOOTHING: 4 <= words < 10 between primaries), then
    * 40s — when the text is long enough (>= 90 words) for the 5-word
    * para to sit strictly between two primary blocks; plain 40s otherwise.
    */
  private def chunksB(words: Array[String]): Seq[Array[String]] =
    if (words.length >= 90)
      Seq(words.slice(0, 40), words.slice(40, 45)) ++ words.drop(45).grouped(40)
    else words.grouped(40).toSeq

  /** Classifier-kept content chunks: a trailing chunk of <= 3 words fails
    * both the density rule and smoothing (neighborMinWords = 4) and has
    * no inContent rescue in families B/C — it is dropped.
    */
  private def keptChunks(chunks: Seq[Array[String]]): Seq[Array[String]] =
    if (chunks.nonEmpty && chunks.last.length <= 3) chunks.dropRight(1) else chunks

  def expectedTextB(text: String): String = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    (PickText +: keptChunks(chunksB(words)).map(_.mkString(" "))).mkString("\n")
  }

  def expectedTextC(text: String): String = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    (IntroText +: keptChunks(words.grouped(25).toSeq).map(_.mkString(" "))).mkString("\n")
  }

  /** Cross-host blogroll appended to families B and C — the LINK-GRAPH
    * seed: 4 formula-keyed partner hosts plus a hub link on even ids, all
    * absolute urls into the same host universe as PagesGen.hostOf, so the
    * host graph has cycles and a skew hub. Boilerplate by construction
    * (link density 0.8+, above every classifier threshold; 10+ words, so
    * never smoothing-eligible) — extracted text is unchanged. Mirrored in
    * SparkEntry's e22/e23 oracles.
    */
  def blogrollHosts(docId: Long): Seq[String] =
    (0 until 4).map(i => s"h${(docId * 11 + i) % 97}.example.com") ++
      (if (docId % 2 == 0) Seq("big.example.com") else Nil)

  private def blogrollDiv(docId: Long): String = {
    val items = blogrollHosts(docId).map { h =>
      val label =
        if (h == "big.example.com") "hub site"
        else "mirror " + h.substring(1, h.indexOf('.'))
      s"""<a href="https://$h/">$label</a>"""
    }
    s"""  <div class="blogroll">Partner sites ${items.mkString(" ")}</div>\n"""
  }

  /** Family B: link-farm (ld 1.0 — dropped even by the last fallback
    * rung), near-threshold keeper (0.23), bare <div>/<p> content, 5-word
    * smoothing para, near-threshold dropper (0.3333). No article/main.
    */
  def renderB(docId: Long, text: String, lang: String): Array[Byte] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val sb = new StringBuilder(4096)
    sb ++= "<!DOCTYPE html>\n"
    sb ++= s"""<html lang="$lang">\n<head>\n  <meta charset="utf-8">\n  <title>Feed $docId</title>\n</head>\n<body>\n"""
    sb ++= "  <div class=\"toplinks\"><a href=\"/f/0\">top stories</a> <a href=\"/f/1\">world news</a> " +
      "<a href=\"/f/2\">local sport</a> <a href=\"/f/3\">tech desk</a> " +
      "<a href=\"/f/4\">art corner</a> <a href=\"/f/5\">site map</a></div>\n"
    sb ++= s"""  <div class="pick">Editors pick of the week stays readable without heavy markup <a href="/pick/$docId">read more now</a></div>\n"""
    sb ++= "  <div class=\"body\">\n"
    chunksB(words).foreach { c => sb ++= s"    <p>${c.mkString(" ")}</p>\n" }
    sb ++= "  </div>\n"
    sb ++= s"""  <div class="promo">Todays promotion brings savings across categories <a href="/promo/$docId">shop the big sale</a> everywhere online</div>\n"""
    sb ++= blogrollDiv(docId)
    sb ++= "</body>\n</html>\n"
    sb.result().getBytes(StandardCharsets.UTF_8)
  }

  /** Family C: fixed no-link intro, 25-word paragraphs in bare divs, and
    * a tag cloud at ld 0.5 (above threshold, below rung-1's 0.55 — only
    * the primary+smoothing path may run, and it must drop it).
    */
  def renderC(docId: Long, text: String, lang: String): Array[Byte] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val sb = new StringBuilder(4096)
    sb ++= "<!DOCTYPE html>\n"
    sb ++= s"""<html lang="$lang">\n<head>\n  <meta charset="utf-8">\n  <title>Notes $docId</title>\n</head>\n<body>\n"""
    sb ++= "  <div class=\"wrap\">\n"
    sb ++= s"    <p>$IntroText</p>\n"
    words.grouped(25).foreach { c => sb ++= s"    <p>${c.mkString(" ")}</p>\n" }
    sb ++= "    <div class=\"tags\">Browse more topics <a href=\"/t/a\">alpha beta</a> and <a href=\"/t/g\">gamma delta</a></div>\n"
    sb ++= "  </div>\n"
    sb ++= blogrollDiv(docId)
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
