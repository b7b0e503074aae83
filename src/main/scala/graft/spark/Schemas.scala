package graft.spark

import java.sql.Timestamp
import graft.core.{HtmlParams, PdfParams, Span}

/** One row of the pages table — exactly BASELINE.json:input_hint
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
)

/** One row of the results table — the reference's SyncOCRResponse +
  * ErrorResponse flattened to error-as-data columns
  * (/root/reference/src/models/responses.py:8-96; SURVEY.md par 1.2).
  *
  * @param bucket url-hash bucket (pmod(xxhash64(url), B)) — the commit /
  *               resume / lineage unit
  */
final case class ResultRow(
    url: String,
    text: String,
    spans: Seq[Span],
    pages: Int,
    engine: String,
    status: String,
    error_code: String,
    duration_ms: Double,
    bucket: Int,
)

/** Pipeline configuration — the moral equivalent of the reference's env
  * Settings (/root/reference/src/config.py:11-219), bound driver-side and
  * validated at plan build (fail-fast like the 400-before-processing path).
  */
final case class ExtractConf(
    maxBytes: Long = 64L * 1024,       // size gate (reference: 5 MB sync limit)
    buckets: Int = 32,                 // url-hash commit buckets
    salt: Int = 4,                     // skew salt factor within a bucket
    docBudgetNanos: Long = 30L * 1000 * 1000 * 1000, // per-doc deadline (30 s)
    docBudgetSteps: Long = 0,          // per-doc parse-step budget (0 = unlimited) — the deterministic twin of the wall deadline (Html.Deadline scaladoc)
    breakerThreshold: Int = 0,         // consecutive kernel failures that open the per-partition breaker (0 = disabled — the batch default: failures here are per-DOCUMENT properties of a pure kernel, not shared-backend health, so shedding neighbors would turn row order into output; enable for resident/streaming modes). Reference: CIRCUIT_BREAKER_FAILURE_THRESHOLD=5, config.py:66-84; when enabled the breaker half-opens (probes every 16th doc) so a success can close it.
    htmlParams: HtmlParams = HtmlParams(), // html kernel thresholds (validated at construction — the 400 path)
    pdfParams: PdfParams = PdfParams(),    // pdf XY-cut gaps (validated at construction)
) {
  require(maxBytes > 0, "maxBytes must be positive")
  require(buckets > 0 && buckets <= (1 << 20), "buckets out of range")
  require(salt > 0, "salt must be positive")
  require(breakerThreshold >= 0, "breakerThreshold must be >= 0")
}
