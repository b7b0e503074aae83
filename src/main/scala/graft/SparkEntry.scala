package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.PagesGen
import graft.spark._

/** Driver contract — see /root/repo/SURVEY.md par 7 + the builder prompt.
  *
  * Extraction queries synthesize the Common-Crawl-style pages table
  * deterministically from the driver's documents table (FIXTURES.md par 1:
  * every payload byte derives from (doc_id, text, lang)), run the kernel
  * pipeline, and are oracle-checked because the generator embeds the main
  * content verbatim — the DuckDB SQL reconstructs the expected extraction
  * from documents.parquet alone.
  */
object SparkEntry {

  /** Pipeline config used by the oracle-checked queries. Part of the
    * oracle contract (the size gate interacts with PagesGen.OversizeLen).
    */
  val conf: ExtractConf = ExtractConf(maxBytes = 64L * 1024, buckets = 16, salt = 2)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** kind predicate mirrors PagesGen.kindOf — precedence junk > oversize > pdf. */
  private def onlyKind(df: DataFrame, kind: String): DataFrame = kind match {
    case "html" =>
      df.filter(col("doc_id") % 37 =!= 0 && col("doc_id") % 41 =!= 0 && col("doc_id") % 10 =!= 7)
    case "pdf" =>
      df.filter(col("doc_id") % 37 =!= 0 && col("doc_id") % 41 =!= 0 && col("doc_id") % 10 === 7)
    case _ => df
  }

  private def pagesOf(s: SparkSession, df: DataFrame) = {
    import s.implicits._
    df.select("doc_id", "text", "lang").as[(Long, String, String)]
      .flatMap { case (id, text, lang) =>
        val r = PagesGen.row(id, text, lang)
        if (PagesGen.isDup(id)) Seq(r, r) else Seq(r)
      }
  }

  private def extracted(s: SparkSession, dir: String, kind: String) = {
    implicit val spark: SparkSession = s
    ExtractPipeline.run(pagesOf(s, onlyKind(docs(s, dir), kind)), conf)
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    extracted(spark, "/root/testdata/sf0.001", "all").toDF()

  /** One per implemented operator from SURVEY.md par 2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- extraction spine (SURVEY.md par 2.3 item 11a: HTML kernel) ---
    "e1_extract_html" -> ((s, dir) => {
      extracted(s, dir, "html").toDF().select("url", "text")
    }),
    // par 2.3 item 11b: PDF kernel (XY-cut + reading order)
    "e2_extract_pdf" -> ((s, dir) => {
      extracted(s, dir, "pdf").toDF().select("url", "text", "pages")
    }),
    // par 2.2 items 6-8 + par 2.6 item 33: gates + status taxonomy as data
    "e3_status_taxonomy" -> ((s, dir) => {
      extracted(s, dir, "all").toDF().select("url", "engine", "status", "error_code")
    }),
    // par 2.4 item 18: request counters by (engine, status)
    "e4_metrics_status" -> ((s, dir) => {
      MetricsStage.statusCounts(extracted(s, dir, "all"))
    }),
    // par 2.8 items 40-41: span introspection — block spans via
    // higher-order array fns, word count derived from the canonical text
    // (word offsets are a pure function of text and are not stored)
    "e5_span_counts" -> ((s, dir) => {
      extracted(s, dir, "html").toDF().select(
        col("url"),
        size(filter(col("spans"), x => x.getField("kind") === "block")).as("n_blocks"),
        size(split(col("text"), "[ \n]")).as("n_words"),
        col("pages"))
    }),
    // par 2.9: ingest dedup (re-crawled urls collapse to one row)
    "e6_dedup_count" -> ((s, dir) => {
      extracted(s, dir, "all").toDF().agg(count(lit(1)).as("n_rows"))
    }),
    // par 2.7 items 34/36: engine discovery surface
    "e7_engines" -> ((s, _) => ExtractPipeline.engines(s)),
    // par 2.4 item 20: file-size histogram over the synthesized corpus
    "e8_size_histogram" -> ((s, dir) => {
      MetricsStage.sizeHistogram(pagesOf(s, docs(s, dir)).toDF())
    }),
    // par 2.9 joins: results joined back to the pages table on url (the
    // golden-gate join shape) + flat aggregation of span-derived word
    // counts by language
    "e9_words_by_lang" -> ((s, dir) => {
      val pages = pagesOf(s, onlyKind(docs(s, dir), "html")).toDF()
        .select(col("url"), col("lang")).dropDuplicates("url")
      extracted(s, dir, "html").toDF()
        .join(pages, "url")
        .groupBy("lang")
        .agg(
          sum(size(split(col("text"), "[ \n]"))).as("n_words"),
          count(lit(1)).as("n_docs"))
    }),
    // par 2.10 scalar functions: host parse (regexp) + per-host counts —
    // the skew-observability aggregate (FIXTURES.md par 1: one host
    // carries ~30% of urls)
    "e10_host_counts" -> ((s, dir) => {
      extracted(s, dir, "all").toDF()
        .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_ok"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = {
    val urlExpr =
      "'https://' || CASE WHEN doc_id % 10 < 3 THEN 'big.example.com' " +
        "ELSE 'h' || (doc_id % 97) || '.example.com' END || '/doc/' || doc_id"
    val htmlKinds = "doc_id % 37 <> 0 AND doc_id % 41 <> 0 AND doc_id % 10 <> 7"
    val pdfKinds = "doc_id % 37 <> 0 AND doc_id % 41 <> 0 AND doc_id % 10 = 7"
    val words = "regexp_split_to_array(trim(text), '\\s+')"
    def chunked(sz: Int) =
      s"array_to_string(list_transform(range(CAST(ceil(len(w)/$sz.0) AS BIGINT)), " +
        s"i -> array_to_string(w[(i*$sz+1):least((i+1)*$sz, len(w))], ' ')), chr(10))"
    val kindCase =
      "CASE WHEN doc_id % 37 = 0 THEN 'junk' WHEN doc_id % 41 = 0 THEN 'oversize' " +
        "WHEN doc_id % 10 = 7 THEN 'pdf' ELSE 'html' END"
    Map(
      "e1_extract_html" ->
        (s"WITH d AS (SELECT doc_id, $words AS w FROM documents WHERE $htmlKinds) " +
          s"SELECT $urlExpr AS url, ${chunked(40)} AS text FROM d"),
      "e2_extract_pdf" ->
        (s"WITH d AS (SELECT doc_id, $words AS w FROM documents WHERE $pdfKinds) " +
          s"SELECT $urlExpr AS url, ${chunked(60)} AS text, " +
          "GREATEST(1, CAST(ceil(len(w)/120.0) AS INT)) AS pages FROM d"),
      "e3_status_taxonomy" ->
        (s"WITH d AS (SELECT doc_id, $kindCase AS kind FROM documents) " +
          s"SELECT $urlExpr AS url, " +
          "CASE kind WHEN 'pdf' THEN 'pdf' WHEN 'html' THEN 'html' ELSE 'none' END AS engine, " +
          "CASE kind WHEN 'junk' THEN 'rejected_format' WHEN 'oversize' THEN 'rejected_size' ELSE 'ok' END AS status, " +
          "CASE kind WHEN 'junk' THEN 'unsupported_format' WHEN 'oversize' THEN 'file_too_large' ELSE NULL END AS error_code " +
          "FROM d"),
      "e4_metrics_status" ->
        (s"WITH d AS (SELECT doc_id, $kindCase AS kind FROM documents) " +
          "SELECT CASE kind WHEN 'pdf' THEN 'pdf' WHEN 'html' THEN 'html' ELSE 'none' END AS engine, " +
          "CASE kind WHEN 'junk' THEN 'rejected_format' WHEN 'oversize' THEN 'rejected_size' ELSE 'ok' END AS status, " +
          "count(*) AS n FROM d GROUP BY 1, 2"),
      "e5_span_counts" ->
        (s"WITH d AS (SELECT doc_id, $words AS w FROM documents WHERE $htmlKinds) " +
          s"SELECT $urlExpr AS url, CAST(ceil(len(w)/40.0) AS INT) AS n_blocks, " +
          "CAST(len(w) AS INT) AS n_words, 1 AS pages FROM d"),
      "e6_dedup_count" ->
        "SELECT count(*) AS n_rows FROM documents",
      "e7_engines" ->
        ("SELECT 'html' AS name, '1.0.0' AS version, 'text/html' AS supported_formats, " +
          "'maxLinkDensity:double=0.33,minWordsDense:int=10' AS params " +
          "UNION ALL SELECT 'pdf', '1.0.0', 'application/pdf', 'xGap:double=60.0,yGap:double=25.0'"),
      "e9_words_by_lang" ->
        (s"WITH d AS (SELECT lang, $words AS w FROM documents WHERE $htmlKinds) " +
          "SELECT lang, CAST(SUM(len(w)) AS BIGINT) AS n_words, count(*) AS n_docs FROM d GROUP BY lang"),
      "e10_host_counts" ->
        (s"WITH d AS (SELECT doc_id, $kindCase AS kind, " +
          "CASE WHEN doc_id % 10 < 3 THEN 'big.example.com' ELSE 'h' || (doc_id % 97) || '.example.com' END AS host " +
          "FROM documents) " +
          "SELECT host, count(*) AS n_docs, " +
          "CAST(SUM(CASE WHEN kind IN ('html','pdf') THEN 1 ELSE 0 END) AS BIGINT) AS n_ok " +
          "FROM d GROUP BY host"),
    )
  }
}
