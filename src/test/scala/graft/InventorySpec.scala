package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the blueprint every round's audit runs against; an op
  * whose query key has no inventory row is invisible to that audit (the
  * r4 verdict's "What's missing" #2 — t61 shipped without its row). This
  * spec turns the sync into a failing test: add a query, add its row.
  */
class InventorySpec extends AnyFunSuite {

  private lazy val survey: String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("every SparkEntry.queries key has a SURVEY.md inventory row") {
    // anchored as a backticked code span (`key`), the form every
    // inventory row uses — raw substring containment would let a key
    // that happens to be a prefix/substring of another key's row slip
    // through undocumented
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => survey.contains("`" + k + "`"))
    assert(missing.isEmpty,
      s"SURVEY.md is missing backticked inventory rows for: ${missing.mkString(", ")}")
  }

  test("every query is oracle-gated: oracleSql keys == queries keys") {
    // the driver records a weaker rows-only check for queries without an
    // oracle — the repo's standard is FULL gating, so a missing (or
    // orphaned) oracle entry is a regression, not an option
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
