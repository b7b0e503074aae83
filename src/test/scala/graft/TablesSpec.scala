package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.core.Tables.Cell

/** Table-structure extraction (core/Tables.scala): grid recovery
  * semantics the e40 oracle's arithmetic equality can't explain —
  * omitted-closer equivalence, nesting isolation, fostering, totality.
  */
class TablesSpec extends AnyFunSuite {

  test("clean grid: header flags, 0-based indices, document order") {
    val cells = Tables.extract(Tables.synthetic(0)) // 1 data row x 2 cols + header
    assert(cells == Seq(
      Cell(0, 0, 0, header = true, "h0_0"),
      Cell(0, 0, 1, header = true, "h1_0"),
      Cell(0, 1, 0, header = false, "c0_0_0"),
      Cell(0, 1, 1, header = false, "c0_1_0")))
  }

  test("omitted </td>/</tr> parse to the SAME grid as the fully-closed twin") {
    val lenient = Tables.extract(Tables.synthetic(1)) // id=1: m-cells
    val closed = Tables.extract(
      "<table><tr><td>m00_1</td><td>m01_1</td></tr>" +
        "<tr><td>m10_1</td><td>m11_1</td></tr></table>")
    assert(lenient == closed)
    assert(lenient.map(_.text) == Seq("m00_1", "m01_1", "m10_1", "m11_1"))
  }

  test("nested table: inner gets its own index, inner text never leaks into the outer cell") {
    val cells = Tables.extract(Tables.synthetic(2)) // id=2
    val outer = cells.filter(_.tableIdx == 0)
    val inner = cells.filter(_.tableIdx == 1)
    assert(outer == Seq(Cell(0, 0, 0, header = false, "out 2")))
    assert(inner == Seq(
      Cell(1, 0, 0, header = false, "in2_0"),
      Cell(1, 0, 1, header = false, "in2_1")))
  }

  test("sibling tables, entity decoding, no-table page") {
    val cells = Tables.extract(Tables.synthetic(3)) // id=3
    assert(cells == Seq(
      Cell(0, 0, 0, header = false, "x & y 3_0"),
      Cell(1, 0, 0, header = false, "x & y 3_1")))
    assert(Tables.extract(Tables.synthetic(4)).isEmpty)
  }

  test("fostered text dropped; td without tr opens an implicit row; EOF closes open tables") {
    assert(Tables.extract("<table>loose<tr>fost<td>a</td>er</tr></table>")
      == Seq(Cell(0, 0, 0, header = false, "a")))
    assert(Tables.extract("<table><td>a</td><td>b</td></table>")
      == Seq(Cell(0, 0, 0, header = false, "a"), Cell(0, 0, 1, header = false, "b")))
    // unclosed everything: the open cell still comes out
    assert(Tables.extract("<table><tr><td>tail text")
      == Seq(Cell(0, 0, 0, header = false, "tail text")))
  }

  test("whitespace normalization, empty cells, markup inside cells") {
    assert(Tables.extract("<table><tr><td>  a\n\t b  </td><td></td></tr></table>")
      == Seq(Cell(0, 0, 0, header = false, "a b"), Cell(0, 0, 1, header = false, "")))
    // inline markup contributes its text; tags vanish
    assert(Tables.extract("<table><tr><td><b>bo</b>ld</td></tr></table>")
      == Seq(Cell(0, 0, 0, header = false, "bold")))
  }

  test("totality: junk and adversarial inputs yield cell lists, never throws") {
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { i =>
      val junk = (0 until rnd.nextInt(200)).map(_ => (rnd.nextInt(96) + 32).toChar).mkString
      val biased = (i % 4) match {
        case 0 => "<table>" + junk
        case 1 => "<table><tr><td>" + junk + "</table>"
        case 2 => junk
        case _ => "<td>" + junk + "</td>"
      }
      Tables.extract(biased) // must not throw
    }
    // td outside any table is ignored entirely
    assert(Tables.extract("<td>orphan</td>").isEmpty)
  }
}
