package graft.spark

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Iceberg-shaped table layer over Parquet + JSON metadata (SURVEY.md
  * par 7.1: no Iceberg jars in the sandbox, so this reproduces the
  * semantics the pipeline needs — atomic per-bucket commits, snapshot
  * metadata with lineage + throughput, snapshot expiry — behind call
  * sites where `format("iceberg")` is a drop-in swap).
  *
  * Layout under the table root:
  *   data/bucket=N/ (parquet)  committed results (move = commit point)
  *   _ledger/bucket-N.json     per-bucket lineage record (exists <=> committed)
  *   _snapshots/<runId>.json   run-level snapshot metadata
  *   _staging/<runId>/...      uncommitted writer output
  *
  * Commit protocol: write everything to _staging via partitionBy(bucket),
  * then per bucket atomically move the directory into data/ and write the
  * ledger record. A killed run leaves only _staging garbage; re-running
  * anti-joins committed buckets away and processes the rest (north_rule:
  * "resumes from the last committed partition"). This replaces the
  * reference's request-id logging + result persistence
  * (/root/reference/src/api/middleware/logging.py:17-61,
  * src/services/file_handler.py:99-121) with (run_id, bucket) lineage.
  */
object LakehouseIO {

  final case class BucketLedger(
      bucket: Int,
      runId: String,
      rows: Long,
      okRows: Long,
      committedAtMs: Long,
  )

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def ledgerDir(root: String): Path = Paths.get(root, "_ledger")
  def dataDir(root: String): Path = Paths.get(root, "data")
  def snapshotsDir(root: String): Path = Paths.get(root, "_snapshots")
  def stagingDir(root: String, runId: String): Path = Paths.get(root, "_staging", runId)

  /** Buckets already committed (ledger record exists). */
  def committedBuckets(root: String): Set[Int] = {
    val dir = ledgerDir(root)
    if (!Files.isDirectory(dir)) return Set.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("bucket-") && s.endsWith(".json") =>
        s.stripPrefix("bucket-").stripSuffix(".json").toInt
      }
      .toSet
  }

  /** Resume filter: drop rows of already-committed buckets. The committed
    * set is tiny, so Catalyst folds `isin` into the scan as a pushed
    * predicate — the distributed-join analog is a broadcast left_anti,
    * which this degenerates to (SURVEY.md par 2.9 "resume").
    */
  def resumeFilter(bucketed: DataFrame, root: String): DataFrame = {
    val done = committedBuckets(root)
    if (done.isEmpty) bucketed
    else bucketed.filter(!col("bucket").isin(done.toSeq: _*))
  }

  /** Write results with per-bucket atomic commits; returns committed
    * bucket ledgers. `failAfterBuckets` injects a mid-commit crash for the
    * resume test.
    */
  def writeCommitted(
      results: Dataset[ResultRow],
      root: String,
      runId: String,
      inputPath: String,
      failAfterBuckets: Option[Int] = None,
  )(implicit spark: SparkSession): Seq[BucketLedger] = {
    val t0 = System.currentTimeMillis()
    val staging = stagingDir(root, runId)
    Files.createDirectories(staging)
    Files.createDirectories(dataDir(root))
    Files.createDirectories(ledgerDir(root))
    Files.createDirectories(snapshotsDir(root))

    results.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)

    val bucketDirs = Files.list(staging).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("bucket="))
      .toSeq.sortBy(_.getFileName.toString.stripPrefix("bucket=").toInt)

    // per-bucket stats for the ledger (request-counter parity, SURVEY.md
    // par 2.4 item 18) — one tiny aggregate over the staged output. A
    // fully-resumed run stages zero rows (no part files → no inferable
    // schema), hence the emptiness guard.
    val stats: Map[Int, (Long, Long)] =
      if (bucketDirs.isEmpty) Map.empty
      else spark.read.schema(results.schema).parquet(staging.toString)
        .groupBy("bucket")
        .agg(count(lit(1)).as("rows"),
          sum(when(col("status") === "ok", 1L).otherwise(0L)).as("ok_rows"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
        .toMap

    val already = committedBuckets(root)
    val ledgers = Seq.newBuilder[BucketLedger]
    var committed = 0

    bucketDirs.foreach { src =>
      val b = src.getFileName.toString.stripPrefix("bucket=").toInt
      failAfterBuckets.foreach { k =>
        if (committed >= k) throw new RuntimeException(s"injected failure after $k bucket commits")
      }
      if (!already.contains(b)) {
        val dst = dataDir(root).resolve(s"bucket=$b")
        if (Files.exists(dst)) deleteRecursively(dst) // stale partial from a dead run
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
        val (rows, ok) = stats.getOrElse(b, (0L, 0L))
        val lg = BucketLedger(b, runId, rows, ok, System.currentTimeMillis())
        val json =
          s"""{"bucket":${lg.bucket},"run_id":${q(lg.runId)},"rows":${lg.rows},""" +
            s""""ok_rows":${lg.okRows},"committed_at_ms":${lg.committedAtMs}}"""
        atomicWrite(ledgerDir(root).resolve(s"bucket-$b.json"), json)
        ledgers += lg
        committed += 1
      }
    }

    val wallMs = System.currentTimeMillis() - t0
    val ls = ledgers.result()
    val totalRows = ls.map(_.rows).sum
    val snapshot =
      s"""{"run_id":${q(runId)},"input":${q(inputPath)},""" +
        s""""app_id":${q(spark.sparkContext.applicationId)},""" +
        s""""committed_buckets":[${ls.map(_.bucket).mkString(",")}],""" +
        s""""previously_committed":[${already.toSeq.sorted.mkString(",")}],""" +
        s""""rows":$totalRows,"ok_rows":${ls.map(_.okRows).sum},""" +
        s""""wall_ms":$wallMs,""" +
        s""""docs_per_sec":${if (wallMs > 0) totalRows * 1000.0 / wallMs else 0.0},""" +
        s""""committed_at_ms":${System.currentTimeMillis()}}"""
    atomicWrite(snapshotsDir(root).resolve(s"$runId.json"), snapshot)
    deleteRecursively(staging)
    ls
  }

  /** Committed results (data/ holds only committed buckets by construction). */
  def readResults(root: String)(implicit spark: SparkSession): DataFrame =
    spark.read
      .option("basePath", dataDir(root).toString)
      .parquet(dataDir(root).toString)

  /** Retention sweep — the reference's TTL cleanup loop
    * (/root/reference/src/services/cleanup.py:22-58, 48 h TTL) as a
    * scheduled maintenance call: expire old snapshots and orphaned staging.
    */
  def expire(root: String, ttlMs: Long, nowMs: Long = System.currentTimeMillis()): Int = {
    var n = 0
    val snaps = snapshotsDir(root)
    if (Files.isDirectory(snaps)) {
      Files.list(snaps).iterator().asScala.toSeq.foreach { p =>
        if (nowMs - Files.getLastModifiedTime(p).toMillis > ttlMs && !Files.isSymbolicLink(p)) {
          Files.deleteIfExists(p); n += 1
        }
      }
    }
    val stg = Paths.get(root, "_staging")
    if (Files.isDirectory(stg)) {
      Files.list(stg).iterator().asScala.toSeq.foreach { p =>
        if (nowMs - Files.getLastModifiedTime(p).toMillis > ttlMs) { deleteRecursively(p); n += 1 }
      }
    }
    n
  }

  def atomicWrite(path: Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
