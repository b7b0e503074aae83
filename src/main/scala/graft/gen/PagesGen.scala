package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.PageRow

/** Deterministic pages-table synthesis (FIXTURES.md par 1) seeded from the
  * driver's `documents` table: every payload byte derives from
  * (doc_id, text, lang), so the corpus rebuilds identically anywhere and a
  * SQL oracle over documents.parquet can predict the pipeline's output.
  *
  * Row taxonomy (precedence matters; mirrored in SparkEntry.oracleSql):
  *   doc_id % 37 == 0          -> junk payload      (rejected_format)
  *   else doc_id % 41 == 0     -> oversized payload (rejected_size)
  *   else doc_id % 10 == 7     -> synthetic PDF     (pdf engine)
  *   else                      -> synthetic HTML    (html engine)
  * Plus: doc_id % 20 == 3 rows are emitted twice (re-crawl dedup) and
  * ~30 % of urls land on one skewed host (salting observability).
  */
object PagesGen {

  /** Bump when generator output changes (payload bytes or row taxonomy):
    * benchmark corpora cached under /tmp are keyed by this, so a stale
    * cache can never silently measure an old generator.
    */
  val GenVersion = 3

  val Epoch: Long = 1767225600000L // 2026-01-01T00:00:00Z

  def kindOf(docId: Long): String =
    if (docId % 37 == 0) "junk"
    else if (docId % 41 == 0) "oversize"
    else if (docId % 10 == 7) "pdf"
    else "html"

  def hostOf(docId: Long): String =
    if (docId % 10 < 3) "big.example.com" else s"h${docId % 97}.example.com"

  def urlOf(docId: Long): String = s"https://${hostOf(docId)}/doc/$docId"

  /** Column twins of [[hostOf]]/[[urlOf]] and [[row]]'s `warc_ts` — the ONE
    * Catalyst mirror of the row contract, for queries that need
    * (url, warc_ts) from doc_id without paying payload generation (e17's
    * join side). Any change to hostOf/urlOf/Epoch must change these too.
    */
  def urlCol(docId: Column): Column =
    concat(lit("https://"),
      when(docId % 10 < 3, lit("big.example.com"))
        .otherwise(concat(lit("h"), docId % 97, lit(".example.com"))),
      lit("/doc/"), docId)

  def warcTsCol(docId: Column): Column =
    (docId + lit(Epoch / 1000L)).cast("timestamp")

  def isDup(docId: Long): Boolean = docId % 20 == 3

  /** Oversize rows must exceed this; the pipeline's size gate sits below. */
  val OversizeLen = 70 * 1024

  def payload(docId: Long, text: String, lang: String): Array[Byte] = kindOf(docId) match {
    case "junk"     => HtmlGen.junkBytes(docId)
    case "oversize" => HtmlGen.oversizedBytes(docId, text, lang, OversizeLen)
    case "pdf"      => PdfGen.render(docId, text)
    case _ => HtmlGen.familyOf(docId) match { // html: template family split
      case "B" => HtmlGen.renderB(docId, text, lang)
      case "C" => HtmlGen.renderC(docId, text, lang)
      case _   => HtmlGen.render(docId, text, lang)
    }
  }

  def row(docId: Long, text: String, lang: String): PageRow =
    PageRow(
      url = urlOf(docId),
      warc_ts = new Timestamp(Epoch + docId * 1000L),
      html = payload(docId, text, lang),
      text = null,
      lang = lang,
    )

  /** Pages table from the driver's documents table at `sfDir`.
    * Generation is distributed (runs inside tasks), deterministic, and
    * emits duplicate re-crawls for the dedup gate.
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      .flatMap { case (id, text, lang) =>
        val r = row(id, text, lang)
        if (isDup(id)) Seq(r, r) else Seq(r)
      }
  }

  /** Bench-scale corpus: each document replicated `replicas` times with
    * distinct urls (doc_id' = doc_id + k * 1_000_000). No oracle — used by
    * Bench/ScalingBench only. Generation happens inside tasks so the
    * driver never materializes payloads.
    */
  def replicated(spark: SparkSession, sfDir: String, replicas: Int, outParts: Int = 64): Dataset[PageRow] = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)]
      // spread generation across tasks AND produce one output file per
      // partition — a single-file corpus caps the downstream scan (and
      // with it the map-stage kernel) at one task
      .repartition(outParts)
    docs.flatMap { case (id, text, lang) =>
      (0 until replicas).iterator.map { k =>
        row(id + k.toLong * 1000000L, text, lang)
      }
    }
  }
}
