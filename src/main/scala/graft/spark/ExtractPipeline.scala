package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** The extraction job spine (SURVEY.md par 3.1 "Spark equivalent"):
  *
  *   pages --dropDuplicates(url)--> size gate (Catalyst predicate)
  *     --repartition(buckets*salt, salted url-hash)--> mapPartitions(kernel)
  *
  * One shuffle total. The kernel is a per-executor object (JVM lazy
  * singleton = the reference's double-checked-lock engine cache,
  * /root/reference/src/services/ocr/registry_v2.py:332-357); the
  * per-document deadline replaces asyncio.wait_for
  * (dynamic_routes.py:231-234); all failures are error-as-data rows so a
  * poison document never kills the job (the purpose of the reference's
  * circuit breaker, registry_v2.py:473-551).
  */
object ExtractPipeline {

  /** Add the url-hash bucket column — the commit/lineage/resume unit
    * (north_rule: "url-hash bucketed partitioning").
    */
  def withBucket(pages: DataFrame, conf: ExtractConf): DataFrame =
    pages.withColumn("bucket", pmod(xxhash64(col("url")), lit(conf.buckets)).cast("int"))

  /** Salted repartition key: bucket spread over `salt` sub-keys so one hot
    * bucket (skewed host set, giant documents) fans out across tasks while
    * bucket-level commit atomicity is preserved by the partitioned write
    * (north_rule: "salted repartition for skewed hosts").
    */
  def saltedKey(conf: ExtractConf) =
    concat_ws("#", col("bucket"),
      pmod(xxhash64(col("url"), lit(0x5a17)), lit(conf.salt)))

  /** Ingest prep: dedup re-crawls, derive the commit bucket, apply the
    * cheap Catalyst size gate first (fail-fast ordering — the reference
    * checks size before reading content, validators.py:90-99). Split out
    * so the resume filter (a bucket predicate) can sit between prep and
    * the shuffle, pruning committed buckets before any kernel work.
    */
  def prepared(pages: Dataset[PageRow], conf: ExtractConf): DataFrame =
    withBucket(pages.toDF().dropDuplicates("url"), conf)
      .withColumn("status_pre",
        when(length(col("html")) > lit(conf.maxBytes), lit(Status.RejectedSize)))

  /** Shuffle on the salted bucket key, then run the kernel once per row.
    * Oversized rows skip the kernel but still reach the results table as
    * answers (error-as-data).
    */
  def extractFrom(bucketed: DataFrame, conf: ExtractConf)(implicit spark: SparkSession): Dataset[ResultRow] = {
    import spark.implicits._
    val numParts = math.max(conf.buckets, spark.sparkContext.defaultParallelism)
    bucketed
      .repartition(numParts * conf.salt, saltedKey(conf))
      .select(col("url"), col("html"), col("status_pre"), col("bucket"))
      .as[(String, Array[Byte], String, Int)]
      .mapPartitions { rows =>
        rows.map { case (url, html, statusPre, bucket) =>
          Kernel.process(url, html, statusPre, bucket, conf)
        }
      }
  }

  /** Full transform: typed results, no side effects. */
  def run(pages: Dataset[PageRow], conf: ExtractConf = ExtractConf())(implicit spark: SparkSession): Dataset[ResultRow] =
    extractFrom(prepared(pages, conf), conf)

  /** Per-executor extraction kernel. Object = one lazy init per JVM
    * executor, thread-safe for free (SURVEY.md par 2.3 item 13).
    */
  object Kernel extends Serializable {
    def process(url: String, html: Array[Byte], statusPre: String, bucket: Int, conf: ExtractConf): ResultRow = {
      val t0 = System.nanoTime()
      def durMs = (System.nanoTime() - t0) / 1e6
      if (statusPre != null)
        return ResultRow(url, "", Nil, 0, "none", statusPre, "file_too_large", durMs, bucket)
      val ct = ContentType.detect(html)
      Extractors.forType(ct) match {
        case None =>
          ResultRow(url, "", Nil, 0, "none", Status.RejectedFormat, "unsupported_format", durMs, bucket)
        case Some(ex) =>
          try {
            val deadline = new Html.Deadline(conf.docBudgetNanos)
            val r = ex.extract(html, deadline)
            ResultRow(url, r.text, r.spans, r.pages, ex.name, Status.Ok, null, durMs, bucket)
          } catch {
            case _: Html.TimeoutException =>
              ResultRow(url, "", Nil, 0, ex.name, Status.Timeout, "deadline_exceeded", durMs, bucket)
            case e: Exception =>
              ResultRow(url, "", Nil, 0, ex.name, Status.Error, e.getClass.getSimpleName, durMs, bucket)
          }
      }
    }
  }

  /** Discovery surface — parity with GET /v2/ocr/engines
    * (/root/reference/src/api/routes/v2/dynamic_routes.py:656-713).
    */
  def engines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Extractors.describeAll
      .map(m => (m("name"), m("version"), m("supported_formats"), m("params")))
      .toDF("name", "version", "supported_formats", "params")
  }
}
