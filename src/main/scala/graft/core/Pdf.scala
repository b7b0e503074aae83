package graft.core

import java.nio.charset.StandardCharsets
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Minimal from-scratch PDF text extractor (SURVEY.md par 7.2 items 4-5):
  * object/stream parser (xref-free linear object scan, FlateDecode),
  * content-stream text operators (BT/ET, Tf, Td/TD/TL/T*, Tm, Tj/TJ/'/"),
  * then XY-cut region segmentation + reading-order sort over the positioned
  * chunks (north_star: "PDF payloads via XY-cut layout segmentation +
  * reading-order sort"). Grammar bounded by our own synthetic writer
  * (FIXTURES.md par 3) but tolerant: unknown operators are skipped,
  * missing pages yield empty text rather than throwing.
  */
object Pdf {

  // ------------------------------------------------------------ object model

  sealed trait PObj
  final case class PNum(v: Double) extends PObj
  final case class PName(v: String) extends PObj
  final case class PStr(v: String) extends PObj
  final case class PBool(v: Boolean) extends PObj
  case object PNull extends PObj
  final case class PArr(v: Vector[PObj]) extends PObj
  final case class PDict(v: Map[String, PObj]) extends PObj
  final case class PRef(num: Int) extends PObj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj

  // ------------------------------------------------------------------- lexer

  /** Exact powers of ten for the lexer's manual number parse. */
  private val POW10: Array[Double] = Array.tabulate(16)(i => math.pow(10, i))

  /** Operators/keywords the lexer interns (most-frequent first). */
  private val Keywords: Array[String] = Array(
    "Tj", "TJ", "Td", "TD", "Tm", "Tf", "TL", "T*", "BT", "ET",
    "obj", "endobj", "stream", "endstream", "xref", "trailer",
    "startxref", "true", "false", "null", "'", "\"")

  private def isWs(b: Int) = b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0
  private def isDelim(b: Int) =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' || b == '{' || b == '}' || b == '/' || b == '%'

  final class Lexer(val bytes: Array[Byte], var pos: Int = 0) {
    def eof: Boolean = pos >= bytes.length
    def peek: Int = if (eof) -1 else bytes(pos) & 0xff

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val b = peek
        if (isWs(b)) pos += 1
        else if (b == '%') { while (!eof && peek != '\n' && peek != '\r') pos += 1 }
        else go = false
      }
    }

    /** Next bare keyword/operator token (letters, digits, quotes, stars).
      * Known operators return interned constants — content streams are
      * mostly operators, and a fresh String per operator was a top
      * allocation site.
      */
    def keyword(): String = {
      skipWs()
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      val len = pos - start
      val known = Keywords
      var k = 0
      while (k < known.length) {
        val w = known(k)
        if (w.length == len) {
          var i = 0
          var ok = true
          while (ok && i < len) { if ((bytes(start + i) & 0xff) != w.charAt(i)) ok = false; i += 1 }
          if (ok) return w
        }
        k += 1
      }
      new String(bytes, start, len, StandardCharsets.ISO_8859_1)
    }

    def parseString(): String = {
      // pos at '('
      pos += 1
      val sb = new java.lang.StringBuilder
      var depth = 1
      while (!eof && depth > 0) {
        val b = peek; pos += 1
        b match {
          case '\\' =>
            if (!eof) {
              val e = peek; pos += 1
              e match {
                case 'n' => sb.append('\n')
                case 'r' => sb.append('\r')
                case 't' => sb.append('\t')
                case 'b' => sb.append('\b')
                case 'f' => sb.append('\f')
                case '(' => sb.append('(')
                case ')' => sb.append(')')
                case '\\' => sb.append('\\')
                case d if d >= '0' && d <= '7' =>
                  var oct = d - '0'
                  var k = 0
                  while (k < 2 && !eof && peek >= '0' && peek <= '7') { oct = oct * 8 + (peek - '0'); pos += 1; k += 1 }
                  sb.append(oct.toChar)
                case '\n' => // line continuation
                case other => sb.append(other.toChar)
              }
            }
          case '(' => depth += 1; sb.append('(')
          case ')' => depth -= 1; if (depth > 0) sb.append(')')
          case other => sb.append(other.toChar)
        }
      }
      // PDF strings in our writer are UTF-8 byte sequences wrapped as latin-1
      // chars; re-decode to proper UTF-16
      val raw = sb.toString
      val byteArr = new Array[Byte](raw.length)
      var i = 0
      while (i < raw.length) { byteArr(i) = raw.charAt(i).toByte; i += 1 }
      new String(byteArr, StandardCharsets.UTF_8)
    }

    def parseHexString(): String = {
      pos += 1 // '<'
      val sb = new ArrayBuffer[Byte]
      var hi = -1
      while (!eof && peek != '>') {
        val b = peek; pos += 1
        val d = Character.digit(b, 16)
        if (d >= 0) { if (hi < 0) hi = d else { sb += ((hi << 4) | d).toByte; hi = -1 } }
      }
      if (hi >= 0) sb += (hi << 4).toByte
      if (!eof) pos += 1 // '>'
      new String(sb.toArray, StandardCharsets.UTF_8)
    }

    def parseName(): PName = {
      pos += 1 // '/'
      val start = pos
      while (!eof && !isWs(peek) && !isDelim(peek)) pos += 1
      PName(new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1))
    }

    /** Manual digit parse — no substring/parseDouble allocation per
      * number (numbers are the most common token in a content stream).
      * Exact: mantissa and 10^k are exact longs, one correctly-rounded
      * division — identical to parseDouble for this writer's subset
      * (<= 15 significant digits).
      */
    def parseNumber(): Double = {
      val start = pos
      var neg = false
      if (peek == '+') pos += 1
      else if (peek == '-') { neg = true; pos += 1 }
      var mant = 0L
      var digits = 0
      var fracDigits = 0
      var seenDot = false
      var overflow = false
      while (!eof && ((peek >= '0' && peek <= '9') || peek == '.')) {
        val b = peek
        if (b == '.') {
          if (seenDot) overflow = true // malformed: defer to parseDouble's error
          seenDot = true
        } else {
          if (digits < 15) { // 15 digits stay exact in a double's mantissa
            mant = mant * 10 + (b - '0')
            digits += 1
            if (seenDot) fracDigits += 1
          } else overflow = true
        }
        pos += 1
      }
      if (digits == 0 || overflow)
        return java.lang.Double.parseDouble(
          new String(bytes, start, pos - start, StandardCharsets.ISO_8859_1))
      val v = if (fracDigits == 0) mant.toDouble else mant.toDouble / POW10(fracDigits)
      if (neg) -v else v
    }

    /** Parse one object value (dicts/arrays/refs/scalars). */
    def parseObj(): PObj = {
      skipWs()
      if (eof) return PNull
      peek match {
        case '<' =>
          if (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == '<') {
            pos += 2
            val m = mutable.LinkedHashMap.empty[String, PObj]
            var go = true
            while (go) {
              skipWs()
              if (eof) go = false
              else if (peek == '>' && pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == '>') { pos += 2; go = false }
              else if (peek == '/') { val k = parseName().v; val v = parseObj(); m += (k -> v) }
              else { pos += 1 } // tolerate junk
            }
            PDict(m.toMap)
          } else PStr(parseHexString())
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PObj]
          var go = true
          while (go) {
            skipWs()
            if (eof) go = false
            else if (peek == ']') { pos += 1; go = false }
            else items += parseObj()
          }
          PArr(items.result())
        case '(' => PStr(parseString())
        case '/' => parseName()
        case b if b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9') =>
          val save = pos
          val n1 = parseNumber()
          // lookahead for "gen R" => reference
          val save2 = pos
          skipWs()
          if (!eof && peek >= '0' && peek <= '9') {
            val g0 = pos
            while (!eof && peek >= '0' && peek <= '9') pos += 1
            val save3 = pos
            skipWs()
            if (!eof && peek == 'R' && (pos + 1 >= bytes.length || isWs(bytes(pos + 1) & 0xff) || isDelim(bytes(pos + 1) & 0xff))) {
              pos += 1
              return PRef(n1.toInt)
            }
            pos = save2 // not a ref; rewind
            val _ = (g0, save3, save)
          } else pos = save2
          PNum(n1)
        case _ =>
          val kw = keyword()
          kw match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case ""      => pos += 1; PNull
            case _       => PNull
          }
      }
    }
  }

  // ------------------------------------------------------------ file parsing

  /** Linear scan for "N G obj ... endobj"; robust to broken xref tables.
    * Returns object map + trailer dict (if present).
    */
  def parseFile(bytes: Array[Byte]): (Map[Int, PObj], Option[PDict]) = {
    val objs = mutable.Map.empty[Int, PObj]
    var trailer: Option[PDict] = None
    val lx = new Lexer(bytes)
    while (!lx.eof) {
      lx.skipWs()
      val p0 = lx.pos
      if (lx.eof) {}
      else if (lx.peek >= '0' && lx.peek <= '9') {
        // maybe "num gen obj"
        val num = try lx.parseNumber().toInt catch { case _: Exception => lx.pos = p0 + 1; -1 }
        if (num >= 0) {
          lx.skipWs()
          val p1 = lx.pos
          if (!lx.eof && lx.peek >= '0' && lx.peek <= '9') {
            try lx.parseNumber() catch { case _: Exception => () }
            lx.skipWs()
            val kw = lx.keyword()
            if (kw == "obj") {
              val body = lx.parseObj()
              lx.skipWs()
              val after = lx.keyword()
              val value: PObj =
                if (after == "stream") {
                  // consume EOL after 'stream'
                  if (!lx.eof && lx.peek == '\r') lx.pos += 1
                  if (!lx.eof && lx.peek == '\n') lx.pos += 1
                  val dict = body match { case d: PDict => d; case _ => PDict(Map.empty) }
                  val len = dict.v.get("Length") match {
                    case Some(PNum(v)) => v.toInt
                    case _ =>
                      // scan for endstream
                      val idx = indexOf(bytes, "endstream".getBytes(StandardCharsets.ISO_8859_1), lx.pos)
                      (if (idx < 0) bytes.length else idx) - lx.pos
                  }
                  val raw = java.util.Arrays.copyOfRange(bytes, lx.pos, math.min(lx.pos + len, bytes.length))
                  lx.pos = math.min(lx.pos + len, bytes.length)
                  lx.skipWs(); lx.keyword() // endstream
                  lx.skipWs(); lx.keyword() // endobj
                  PStream(dict, raw)
                } else body // after == "endobj" or junk
              objs(num) = value
            } else lx.pos = p1
          }
        }
      } else {
        val kw = lx.keyword()
        if (kw == "trailer") {
          lx.parseObj() match { case d: PDict => trailer = Some(d); case _ => () }
        } else if (kw == "xref") {
          // skip xref lines until trailer/eof (entries are digits; loop handles)
        } else if (kw == "startxref") { try lx.parseObj() catch { case _: Exception => () } }
        else if (kw == "") lx.pos += 1
      }
    }
    (objs.toMap, trailer)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case _: Exception => out.toByteArray }
    finally inf.end()
  }

  private def resolve(o: PObj, objs: Map[Int, PObj]): PObj = o match {
    case PRef(n) => objs.getOrElse(n, PNull)
    case x       => x
  }

  /** Page content streams in document order via Root -> Pages -> Kids.
    * Falls back to "every stream in object order" when the graph is broken.
    */
  def pageContents(objs: Map[Int, PObj], trailer: Option[PDict]): Vector[Array[Byte]] = {
    def streamBytes(o: PObj): Option[Array[Byte]] = o match {
      case PStream(dict, raw) =>
        val flate = dict.v.get("Filter") match {
          case Some(PName("FlateDecode"))                    => true
          case Some(PArr(v)) if v.contains(PName("FlateDecode")) => true
          case _                                             => false
        }
        Some(if (flate) inflate(raw) else raw)
      case _ => None
    }

    def walkPages(node: PObj, acc: ArrayBuffer[Array[Byte]]): Unit = resolve(node, objs) match {
      case PDict(d) =>
        d.get("Type") match {
          case Some(PName("Pages")) =>
            d.get("Kids") match {
              case Some(PArr(kids)) => kids.foreach(k => walkPages(k, acc))
              case _                => ()
            }
          case Some(PName("Page")) =>
            d.get("Contents") match {
              case Some(c) =>
                resolve(c, objs) match {
                  case PArr(parts) =>
                    val all = new java.io.ByteArrayOutputStream()
                    parts.foreach(p => streamBytes(resolve(p, objs)).foreach(all.write))
                    acc += all.toByteArray
                  case other => streamBytes(other).foreach(acc += _)
                }
              case None => acc += Array.emptyByteArray
            }
          case _ => ()
        }
      case _ => ()
    }

    val acc = ArrayBuffer.empty[Array[Byte]]
    val root = trailer.flatMap(_.v.get("Root")).map(r => resolve(r, objs))
    val pagesNode = root match {
      case Some(PDict(d)) => d.get("Pages")
      case _              => None
    }
    pagesNode match {
      case Some(p) => walkPages(p, acc)
      case None =>
        // fallback: any Page-typed dict in numeric object order
        objs.toVector.sortBy(_._1).foreach {
          case (_, pd @ PDict(d)) if d.get("Type").contains(PName("Page")) => walkPages(pd, acc)
          case _ => ()
        }
    }
    if (acc.isEmpty) {
      // last resort: every stream in object order is one "page"
      objs.toVector.sortBy(_._1).foreach { case (_, o) => streamBytes(o).foreach(acc += _) }
    }
    acc.toVector
  }

  // --------------------------------------------------- content stream -> text

  /** One positioned text chunk (PDF user space, origin bottom-left). */
  final case class Chunk(x: Double, y: Double, text: String)

  /** Interpret text operators; unknown operators are consumed and skipped. */
  def contentChunks(content: Array[Byte], deadline: Html.Deadline): Vector[Chunk] = {
    val lx = new Lexer(content)
    val stack = ArrayBuffer.empty[PObj]
    val out = Vector.newBuilder[Chunk]
    var x = 0.0; var y = 0.0        // current text position
    var lineX = 0.0; var lineY = 0.0 // text line origin
    var leading = 12.0

    def popNum(): Double = if (stack.nonEmpty) {
      stack.remove(stack.length - 1) match { case PNum(v) => v; case _ => 0.0 }
    } else 0.0

    def showString(o: PObj): Unit = o match {
      case PStr(s) if s.nonEmpty => out += Chunk(x, y, s); x += s.length * 5.0
      case _                     => ()
    }

    while (!lx.eof) {
      if (deadline.expired()) throw new Html.TimeoutException
      lx.skipWs()
      if (!lx.eof) {
        val b = lx.peek
        if (b == '(' || b == '<' || b == '[' || b == '/' || b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9')) {
          stack += lx.parseObj()
        } else {
          val op = lx.keyword()
          op match {
            case "BT" => x = 0; y = 0; lineX = 0; lineY = 0; stack.clear()
            case "ET" => stack.clear()
            case "Tf" => stack.clear()
            case "TL" => leading = popNum(); stack.clear()
            case "Td" =>
              val ty = popNum(); val tx = popNum()
              lineX += tx; lineY += ty; x = lineX; y = lineY; stack.clear()
            case "TD" =>
              val ty = popNum(); val tx = popNum()
              leading = -ty; lineX += tx; lineY += ty; x = lineX; y = lineY; stack.clear()
            case "Tm" =>
              val f = popNum(); val e = popNum()
              popNum(); popNum(); popNum(); popNum()
              lineX = e; lineY = f; x = e; y = f; stack.clear()
            case "T*" => lineY -= leading; x = lineX; y = lineY; stack.clear()
            case "Tj" => if (stack.nonEmpty) showString(stack.remove(stack.length - 1)); stack.clear()
            case "'" =>
              lineY -= leading; x = lineX; y = lineY
              if (stack.nonEmpty) showString(stack.remove(stack.length - 1)); stack.clear()
            case "\"" =>
              lineY -= leading; x = lineX; y = lineY
              if (stack.nonEmpty) showString(stack.remove(stack.length - 1)); stack.clear()
            case "TJ" =>
              if (stack.nonEmpty) stack.remove(stack.length - 1) match {
                case PArr(items) =>
                  val sb = new java.lang.StringBuilder
                  items.foreach { case PStr(s) => sb.append(s); case _ => () }
                  if (sb.length > 0) showString(PStr(sb.toString))
                case _ => ()
              }
              stack.clear()
            case "" => lx.pos += 1
            case _  => stack.clear() // unknown operator: drop its operands
          }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------ XY-cut

  /** Recursive XY-cut over point chunks: split on the largest projection
    * gap (x gap >= xGap or y gap >= yGap), larger axis first; leaves come
    * out in reading order (top-to-bottom for y splits, left-to-right for x
    * splits). Within a leaf: sort by (-y, x), group equal-y into lines.
    */
  def xyCut(chunks: Vector[Chunk], xGap: Double = 60.0, yGap: Double = 25.0): Vector[Vector[Vector[Chunk]]] = {
    // returns: leaves, each a Vector of lines, each a Vector of chunks

    def largestGap(values: Vector[Double], minGap: Double): Option[Double] = {
      val sorted = values.distinct.sorted
      var best = 0.0; var bestMid = 0.0
      var i = 1
      while (i < sorted.length) {
        val g = sorted(i) - sorted(i - 1)
        if (g > best) { best = g; bestMid = (sorted(i) + sorted(i - 1)) / 2.0 }
        i += 1
      }
      if (best >= minGap) Some(bestMid) else None
    }

    def leafLines(cs: Vector[Chunk]): Vector[Vector[Chunk]] = {
      val sorted = cs.sortBy(c => (-c.y, c.x))
      val lines = Vector.newBuilder[Vector[Chunk]]
      var cur = Vector.newBuilder[Chunk]
      var curY = Double.NaN
      sorted.foreach { c =>
        if (curY.isNaN || math.abs(c.y - curY) <= 1.0) { cur += c; if (curY.isNaN) curY = c.y }
        else { lines += cur.result(); cur = Vector.newBuilder[Chunk]; cur += c; curY = c.y }
      }
      val lastLine = cur.result()
      if (lastLine.nonEmpty) lines += lastLine
      lines.result()
    }

    def rec(cs: Vector[Chunk], depth: Int): Vector[Vector[Vector[Chunk]]] = {
      if (cs.isEmpty) return Vector.empty
      if (depth > 12) return Vector(leafLines(cs))
      val gx = largestGap(cs.map(_.x), xGap)
      val gy = largestGap(cs.map(_.y), yGap)
      (gx, gy) match {
        case (None, None) => Vector(leafLines(cs))
        case (Some(mx), None) =>
          val (l, r) = cs.partition(_.x < mx)
          rec(l, depth + 1) ++ rec(r, depth + 1)
        case (None, Some(my)) =>
          val (top, bot) = cs.partition(_.y > my)
          rec(top, depth + 1) ++ rec(bot, depth + 1)
        case (Some(mx), Some(my)) =>
          // prefer the axis with the wider *relative* gap; ties favor y
          // (horizontal bands first, the classic XY-cut order)
          val xs = cs.map(_.x).distinct.sorted
          val ys = cs.map(_.y).distinct.sorted
          val xGapW = maxGapWidth(xs)
          val yGapW = maxGapWidth(ys)
          if (yGapW >= xGapW) {
            val (top, bot) = cs.partition(_.y > my)
            rec(top, depth + 1) ++ rec(bot, depth + 1)
          } else {
            val (l, r) = cs.partition(_.x < mx)
            rec(l, depth + 1) ++ rec(r, depth + 1)
          }
      }
    }

    def maxGapWidth(sorted: Vector[Double]): Double = {
      var best = 0.0; var i = 1
      while (i < sorted.length) { val g = sorted(i) - sorted(i - 1); if (g > best) best = g; i += 1 }
      best
    }

    rec(chunks, 0)
  }
}

/** PDF extraction kernel: parse -> per-page chunks -> XY-cut -> canonical
  * text + page/block/line/word spans.
  */
class PdfExtractor(val params: PdfParams) extends Extractor {
  val name = "pdf"

  def extract(bytes: Array[Byte], deadline: Html.Deadline): Extracted = {
    val (objs, trailer) = Pdf.parseFile(bytes)
    val pages = Pdf.pageContents(objs, trailer)
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var first = true
    var pageIdx = 0
    pages.foreach { content =>
      val p0 = if (first) 0 else sb.length + 1
      val chunks = Pdf.contentChunks(content, deadline)
      val leaves = Pdf.xyCut(chunks, params.xGap, params.yGap)
      var blockIdx = 0
      leaves.foreach { lines =>
        // canonicalize each line once; the block text is their single-space
        // join (identical to canonicalizing the joined raw text, since
        // line texts are trimmed and NFC never composes across a space)
        val lineTexts = lines.map(line => Canonicalizer.block(line.map(_.text).mkString(" ")))
          .filter(_.nonEmpty)
        val blockText = lineTexts.mkString(" ")
        if (blockText.nonEmpty) {
          if (!first) sb.append('\n')
          first = false
          val b0 = sb.length
          val path = s"page/$pageIdx/block/$blockIdx"
          var cursor = b0
          lineTexts.foreach { lt =>
            val l0 = if (cursor == b0) cursor else cursor + 1
            spans += Span("line", Span.NoPath, l0, l0 + lt.length)
            cursor = l0 + lt.length
          }
          sb.append(blockText)
          spans += Span("block", path, b0, sb.length)
          // word spans derived on demand (Span.wordSpans), not stored
          blockIdx += 1
        }
      }
      val pageEnd = sb.length
      spans += Span("page", s"page/$pageIdx", math.min(p0, pageEnd), pageEnd)
      pageIdx += 1
    }
    val text = sb.toString
    Extracted(text, spans.result(), pages = math.max(pages.length, 1))
  }

  def describe: Map[String, String] = Map(
    "name" -> name,
    "version" -> "1.0.0",
    "supported_formats" -> "application/pdf",
    "params" -> s"xGap:double=${params.xGap},yGap:double=${params.yGap}",
  )
}

/** Default-params instance (the golden contract). */
object PdfExtractor extends PdfExtractor(PdfParams())
