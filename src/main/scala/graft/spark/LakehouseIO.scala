package graft.spark

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.AccumulatorV2

/** Iceberg-shaped table layer over Parquet + JSON metadata (SURVEY.md
  * par 7.1: no Iceberg jars in the sandbox, so this reproduces the
  * semantics the pipeline needs — atomic per-bucket commits, snapshot
  * metadata with lineage + throughput, snapshot expiry — behind call
  * sites where `format("iceberg")` is a drop-in swap).
  *
  * All filesystem ops go through the Hadoop `FileSystem` API, so the same
  * commit protocol runs unchanged against file://, hdfs://, or any
  * Hadoop-compatible store (rename-atomicity caveat: object stores
  * without atomic rename — raw S3A — need the Iceberg swap or an
  * S3-committer underneath, exactly as they do for Spark's own output
  * committers). Local paths resolve through RawLocalFileSystem, where
  * rename is the same atomic rename(2) the earlier java.nio
  * implementation used.
  *
  * Layout under the table root:
  *   data/bucket=N/ (parquet)  committed results (rename = commit point)
  *   _ledger/bucket-N.json     per-bucket lineage record (exists <=> committed)
  *   _snapshots/<runId>.json   run-level snapshot metadata
  *   _staging/<runId>/...      uncommitted writer output
  *
  * Commit protocol: write everything to _staging via partitionBy(bucket),
  * then per bucket atomically rename the directory into data/ and write
  * the ledger record. A killed run leaves only _staging garbage;
  * re-running anti-joins committed buckets away and processes the rest
  * (north_rule: "resumes from the last committed partition"). This
  * replaces the reference's request-id logging + result persistence
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

  def ledgerDir(root: String): Path = new Path(root, "_ledger")
  def dataDir(root: String): Path = new Path(root, "data")
  def snapshotsDir(root: String): Path = new Path(root, "_snapshots")
  def stagingDir(root: String, runId: String): Path = new Path(new Path(root, "_staging"), runId)

  /** FileSystem for a path: the Spark session's Hadoop conf when one is
    * active (cluster credentials, fs.defaultFS), a vanilla conf otherwise.
    */
  private def fsOf(p: Path): FileSystem = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    p.getFileSystem(conf)
  }

  /** Buckets already committed (ledger record exists). */
  def committedBuckets(root: String): Set[Int] = {
    val dir = ledgerDir(root)
    val fs = fsOf(dir)
    if (!fs.isDirectory(dir)) return Set.empty
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
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
    else bucketed.filter(!org.apache.spark.sql.functions.col("bucket").isin(done.toSeq: _*))
  }

  /** Per-bucket (rows, okRows) tallied DURING the result write — replaces
    * the round-1 second scan of the staged parquet. Merge is a map union;
    * the value is informational lineage (ledger stats), where Spark's
    * at-least-once accumulator semantics under task retry are acceptable —
    * commit atomicity never depends on it.
    */
  private final class BucketStatsAcc
      extends AccumulatorV2[(Int, Boolean), Map[Int, (Long, Long)]] {
    private val m = scala.collection.mutable.HashMap.empty[Int, (Long, Long)]
    def isZero: Boolean = m.isEmpty
    def copy(): BucketStatsAcc = {
      val c = new BucketStatsAcc
      m.foreach { case (k, v) => c.m.update(k, v) }
      c
    }
    def reset(): Unit = m.clear()
    def add(v: (Int, Boolean)): Unit = {
      val (rows, ok) = m.getOrElse(v._1, (0L, 0L))
      m.update(v._1, (rows + 1, if (v._2) ok + 1 else ok))
    }
    def merge(other: AccumulatorV2[(Int, Boolean), Map[Int, (Long, Long)]]): Unit =
      other.value.foreach { case (k, (r, o)) =>
        val (rows, ok) = m.getOrElse(k, (0L, 0L))
        m.update(k, (rows + r, ok + o))
      }
    def value: Map[Int, (Long, Long)] = m.toMap
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
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val staging = stagingDir(root, runId)
    val fs = fsOf(new Path(root))
    fs.mkdirs(staging)
    fs.mkdirs(dataDir(root))
    fs.mkdirs(ledgerDir(root))
    fs.mkdirs(snapshotsDir(root))

    // per-bucket stats for the ledger (request-counter parity, SURVEY.md
    // par 2.4 item 18), tallied in the same pass that writes the parquet
    val acc = new BucketStatsAcc
    spark.sparkContext.register(acc, s"bucketStats-$runId")
    val instrumented = results.map { r => acc.add((r.bucket, r.status == graft.core.Status.Ok)); r }
    instrumented.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    val stats: Map[Int, (Long, Long)] = acc.value

    val bucketDirs =
      (if (fs.isDirectory(staging)) fs.listStatus(staging).toSeq else Seq.empty)
        .map(_.getPath)
        .filter(_.getName.startsWith("bucket="))
        .sortBy(_.getName.stripPrefix("bucket=").toInt)

    val already = committedBuckets(root)
    val ledgers = Seq.newBuilder[BucketLedger]
    var committed = 0

    bucketDirs.foreach { src =>
      val b = src.getName.stripPrefix("bucket=").toInt
      failAfterBuckets.foreach { k =>
        if (committed >= k) throw new RuntimeException(s"injected failure after $k bucket commits")
      }
      if (!already.contains(b)) {
        val dst = new Path(dataDir(root), s"bucket=$b")
        if (fs.exists(dst)) fs.delete(dst, true) // stale partial from a dead run
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"commit rename failed: $src -> $dst")
        val (rows, ok) = stats.getOrElse(b, (0L, 0L))
        val lg = BucketLedger(b, runId, rows, ok, System.currentTimeMillis())
        val json =
          s"""{"bucket":${lg.bucket},"run_id":${q(lg.runId)},"rows":${lg.rows},""" +
            s""""ok_rows":${lg.okRows},"committed_at_ms":${lg.committedAtMs}}"""
        atomicWrite(new Path(ledgerDir(root), s"bucket-$b.json"), json)
        ledgers += lg
        committed += 1
      }
    }

    val wallMs = System.currentTimeMillis() - t0
    val ls = ledgers.result()
    val totalRows = ls.map(_.rows).sum
    // data sequence number, PERSISTED in the receipt (not derived from
    // list position): snapshot expiry deletes old receipts, and Iceberg
    // semantics require the survivors to KEEP their sequence numbers —
    // a position-derived number would silently renumber history
    val seqNum = (snapshotHistory(root).map(_.seq) :+ 0L).max + 1
    // post-commit whole-table row count, PERSISTED: overwrite snapshots
    // (applyChanges) report post-rewrite counts in `rows`, so the Iceberg
    // summary's total-records cannot be a cumulative sum of `rows` across
    // history — each receipt carries the ledger sum as of its commit.
    // Cost: one O(#buckets) ledger sweep per commit — the same metadata
    // plane readAsOf/readIncremental already walk (a crashed run leaves
    // committed ledgers with NO snapshot receipt, so no receipt-delta
    // shortcut is sound); beyond ~10^5 buckets the `format("iceberg")`
    // swap's manifest lists are the intended path
    val tableRows = bucketLedgers(root).map(_.rows).sum
    val snapshot =
      s"""{"run_id":${q(runId)},"input":${q(inputPath)},"seq":$seqNum,""" +
        s""""app_id":${q(spark.sparkContext.applicationId)},""" +
        s""""committed_buckets":[${ls.map(_.bucket).mkString(",")}],""" +
        s""""previously_committed":[${already.toSeq.sorted.mkString(",")}],""" +
        s""""rows":$totalRows,"ok_rows":${ls.map(_.okRows).sum},""" +
        s""""table_rows":$tableRows,""" +
        s""""wall_ms":$wallMs,""" +
        s""""docs_per_sec":${if (wallMs > 0) totalRows * 1000.0 / wallMs else 0.0},""" +
        s""""committed_at_ms":${System.currentTimeMillis()}}"""
    atomicWrite(new Path(snapshotsDir(root), s"$runId.json"), snapshot)
    // project the (updated) commit history as Iceberg-v2 table metadata —
    // derivation-only, so a crash between the receipt above and here
    // costs nothing (the next commit re-derives the full history)
    commitIcebergMetadata(root, results.schema)
    fs.delete(staging, true)
    ls
  }

  /** Committed results (data/ holds only committed buckets by construction). */
  def readResults(root: String)(implicit spark: SparkSession): DataFrame =
    spark.read
      .option("basePath", dataDir(root).toString)
      .parquet(dataDir(root).toString)

  /** Parsed ledger records of all committed buckets (the table's commit
    * history — one record per bucket, fields as written by
    * [[writeCommitted]]).
    */
  def bucketLedgers(root: String): Seq[BucketLedger] = {
    val dir = ledgerDir(root)
    val fs = fsOf(dir)
    if (!fs.isDirectory(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("bucket-") && n.endsWith(".json")
      }
      .map { st =>
        val in = fs.open(st.getPath)
        val content =
          try {
            val buf = new Array[Byte](st.getLen.toInt)
            in.readFully(0, buf)
            new String(buf, StandardCharsets.UTF_8)
          } finally in.close()
        def num(k: String): Long =
          ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(content)
            .getOrElse(throw new java.io.IOException(s"ledger ${st.getPath}: missing $k"))
            .group(1).toLong
        val runId = "\"run_id\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(content)
          .getOrElse(throw new java.io.IOException(s"ledger ${st.getPath}: missing run_id"))
          .group(1).replace("\\\"", "\"").replace("\\\\", "\\")
        BucketLedger(num("bucket").toInt, runId, num("rows"), num("ok_rows"),
          num("committed_at_ms"))
      }
      .sortBy(_.bucket)
  }

  /** Time-travel read: the table as of a past instant — only buckets whose
    * ledger commit time is <= `asOfMs` (the stand-in for Iceberg's
    * `VERSION AS OF`/`TIMESTAMP AS OF`; bucket ledgers are this layer's
    * snapshot log, and a bucket is immutable once committed). Partition
    * pruning is structural: only the selected bucket directories are even
    * listed, so a narrow time-travel read of a 10^12-doc table scans just
    * the buckets that existed then.
    */
  def readAsOf(root: String, asOfMs: Long)(implicit spark: SparkSession): DataFrame =
    readBuckets(root,
      bucketLedgers(root).filter(_.committedAtMs <= asOfMs).map(_.bucket))

  /** Structural-pruning read of an explicit bucket subset — the shared
    * tail of [[readAsOf]] and [[readIncremental]]: only the named bucket
    * directories are listed/read; an empty pick yields an empty frame of
    * the results schema. A picked bucket is skipped ONLY when its ledger
    * records rows=0 — the one state where a committed bucket legitimately
    * has no data directory ([[applyChanges]] deleted its every row). A
    * bucket whose ledger says rows>0 but whose directory is missing is a
    * crash window awaiting [[repairCompaction]] or real data loss, and
    * the read must throw LOUDLY (Spark's PATH_NOT_FOUND), never return a
    * silently partial table. The distinction costs one O(#buckets)
    * ledger sweep — the metadata plane readAsOf/readIncremental walk
    * anyway.
    */
  private def readBuckets(root: String, picked: Seq[Int])
      (implicit spark: SparkSession): DataFrame = {
    val zeroRows = bucketLedgers(root).filter(_.rows == 0L).map(_.bucket).toSet
    val keep = picked.filterNot(zeroRows)
    if (keep.isEmpty) {
      import spark.implicits._
      spark.emptyDataset[ResultRow].toDF()
    } else
      spark.read
        .option("basePath", dataDir(root).toString)
        .parquet(keep.map(b => new Path(dataDir(root), s"bucket=$b").toString): _*)
  }

  /** Row-level UPSERT + DELETE via copy-on-write bucket rewrite — the
    * merge-on-write half of the table layer (Iceberg v2's
    * MERGE INTO/DELETE FROM analog at bucket granularity): re-extracted
    * pages replace their previous rows by url, takedown/expired urls
    * disappear, untouched buckets are never read or written.
    *
    * Protocol: affected buckets = distinct buckets across both change
    * sets (bucket-cardinality, a driver scalar); ONE Spark job reads
    * exactly those bucket directories, anti-joins the change keys by
    * url, unions the upsert rows, and stages the rewritten buckets;
    * then per bucket the SAME move-aside two-rename swap as [[compact]]
    * (old dir -> `_maintenance/trash-N`, staged dir in, delete trash)
    * replaces the directory and the ledger record is rewritten under
    * this `runId` (a bucket whose rows all died ends with no data dir
    * and a rows=0 ledger; [[readBuckets]] skips the absent dir). A
    * crash at ANY point is recoverable: before the move-aside the table
    * is untouched; between the renames the committed data sits in
    * trash-N, which [[repairCompaction]] — run first thing here and in
    * [[compact]] — renames back; after the swap-in the bucket is the
    * new data and only trash cleanup remains. A snapshot receipt with
    * op=`overwrite` joins the history, so the Iceberg metadata
    * projection reports the operation exactly as `expire_snapshots`-era
    * readers expect. Re-running the same change set is idempotent
    * (upsert-by-key + delete-by-key), including against a
    * crash-interrupted previous attempt (mixed old/new buckets repair
    * to a readable state first, and the change application converges on
    * both).
    *
    * Documented trade (sandbox stand-in): copy-on-write REPLACES the
    * bucket files, so [[readAsOf]] time travel no longer reproduces a
    * rewritten bucket's pre-change state — real Iceberg retains the old
    * files until snapshot expiry; that restoration is part of the
    * `format("iceberg")` reader swap, not this layer's contract.
    *
    * Scale shape: cost is O(affected buckets), never O(table); the
    * anti-join keys are (url) pairs hash-joined inside the affected
    * slice; with url-hash bucketing a change set touching k urls
    * rewrites at most k buckets.
    */
  def applyChanges(root: String, upserts: Dataset[ResultRow],
      deleteUrls: DataFrame, runId: String,
      failDuringSwapOf: Option[Int] = None)
      (implicit spark: SparkSession): Seq[Int] = {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val t0 = System.currentTimeMillis()
    val fs = fsOf(new Path(root))
    repairCompaction(root) // self-heal a crashed swap before reading
    val up = upserts.toDF()
    val affected: Seq[Int] =
      up.select(col("bucket").cast("int"))
        .union(deleteUrls.select(col("bucket").cast("int")))
        .distinct().collect().map(_.getInt(0)).sorted.toSeq
    if (affected.isEmpty) return Seq.empty
    val committed = committedBuckets(root)
    require(affected.forall(committed.contains),
      s"applyChanges targets uncommitted buckets: ${affected.filterNot(committed.contains).mkString(",")}" +
        " — route inserts to new buckets through writeCommitted")
    val staging = stagingDir(root, runId)
    fs.mkdirs(staging)
    val current = readBuckets(root, affected)
    val changeKeys = up.select(col("url"))
      .union(deleteUrls.select(col("url"))).distinct()
    val next = current.join(changeKeys, Seq("url"), "left_anti")
      .unionByName(up.select(current.columns.map(col).toIndexedSeq: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    next.write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    val stats: Map[Int, (Long, Long)] = next.groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("status") === graft.core.Status.Ok, 1L).otherwise(0L)).as("ok"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    next.unpersist(blocking = false)
    affected.foreach { b =>
      val src = new Path(staging, s"bucket=$b")
      val dst = new Path(dataDir(root), s"bucket=$b")
      val trash = new Path(maintenanceDir(root), s"trash-$b")
      fs.mkdirs(maintenanceDir(root))
      if (fs.exists(trash)) fs.delete(trash, true) // stale (repair already ran)
      if (fs.exists(dst) && !fs.rename(dst, trash))
        throw new java.io.IOException(s"rewrite move-aside failed for bucket $b")
      failDuringSwapOf.foreach { fb =>
        if (fb == b) throw new RuntimeException(
          s"injected crash between the two renames of bucket $b")
      }
      if (fs.exists(src)) {
        if (!fs.rename(src, dst)) {
          if (fs.exists(trash) && !fs.rename(trash, dst)) // restore — unchanged
            throw new java.io.IOException(
              s"rewrite swap-in AND restore failed for bucket $b — data is in $trash; " +
                "run repairCompaction")
          throw new java.io.IOException(s"rewrite swap-in failed for bucket $b (restored)")
        }
      } // else: every row of the bucket died — directory stays absent
      fs.delete(trash, true)
      val (rows, ok) = stats.getOrElse(b, (0L, 0L))
      atomicWrite(new Path(ledgerDir(root), s"bucket-$b.json"),
        s"""{"bucket":$b,"run_id":${q(runId)},"rows":$rows,""" +
          s""""ok_rows":$ok,"committed_at_ms":${System.currentTimeMillis()}}""")
    }
    val seqNum = (snapshotHistory(root).map(_.seq) :+ 0L).max + 1
    val rows = stats.values.map(_._1).sum
    val tableRows = bucketLedgers(root).map(_.rows).sum
    atomicWrite(new Path(snapshotsDir(root), s"$runId.json"),
      s"""{"run_id":${q(runId)},"input":${q("applyChanges")},"seq":$seqNum,"op":"overwrite",""" +
        s""""committed_buckets":[${affected.mkString(",")}],""" +
        s""""rows":$rows,"ok_rows":${stats.values.map(_._2).sum},""" +
        s""""table_rows":$tableRows,""" +
        s""""wall_ms":${System.currentTimeMillis() - t0},"docs_per_sec":0.0,""" +
        s""""committed_at_ms":${System.currentTimeMillis()}}""")
    commitIcebergMetadata(root, upserts.schema)
    fs.delete(staging, true)
    affected
  }

  /** Incremental read — rows in buckets committed AFTER `sinceMs` and at
    * or before `untilMs`: the Iceberg incremental-scan analog, and the
    * consumption pattern every DOWNSTREAM job wants against a long-lived
    * results table (process only what the last run hasn't seen; `sinceMs`
    * = the consumer's stored high-watermark, `untilMs` = the snapshot it
    * advances to). Bucket selection is ledger-driven — structural
    * partition pruning: only the new buckets' directories are listed or
    * read, so an incremental pass over a 10^12-row table costs O(new
    * data), not O(table). Commit-time granularity is the bucket (the
    * atomic commit unit), matching Iceberg's snapshot granularity.
    */
  def readIncremental(root: String, sinceMs: Long, untilMs: Long = Long.MaxValue)
      (implicit spark: SparkSession): DataFrame = {
    require(sinceMs <= untilMs, "sinceMs must be <= untilMs")
    readBuckets(root, bucketLedgers(root)
      .filter(l => l.committedAtMs > sinceMs && l.committedAtMs <= untilMs)
      .map(_.bucket))
  }

  def maintenanceDir(root: String): Path = new Path(root, "_maintenance")

  /** Crash recovery for the move-aside two-rename swap shared by
    * [[compact]] and [[applyChanges]]: restore any bucket whose
    * move-aside survived but whose swap-in didn't, and sweep leftovers.
    * `_maintenance/trash-N` with `data/bucket=N` absent means the crash
    * hit between the renames — the trash IS the committed data, rename it
    * back; with `data/bucket=N` present the swap completed and the trash
    * is the superseded copy — delete it. Orphan `compact-N` rewrite dirs
    * are garbage (an applyChanges staging dir is NOT: it lives under
    * `_staging` and is TTL-swept by [[expire]] like any dead run's).
    * Runs automatically at every [[compact]] and [[applyChanges]] entry,
    * so the first maintenance pass after a crash self-heals; kept public
    * as the operator's explicit recovery hook. Returns buckets restored.
    *
    * Lives under `_maintenance`, NOT `_staging`: [[expire]] TTL-sweeps
    * _staging, and TTL-deleting a not-yet-restored trash dir would make a
    * crash loss permanent (the ledger says committed, so nothing would
    * ever rewrite the bucket).
    */
  def repairCompaction(root: String): Int = {
    val dir = maintenanceDir(root)
    val fs = fsOf(dir)
    if (!fs.isDirectory(dir)) return 0
    var restored = 0
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("trash-")) {
        val dst = new Path(dataDir(root), s"bucket=${name.stripPrefix("trash-")}")
        if (!fs.exists(dst)) {
          if (!fs.rename(st.getPath, dst))
            throw new java.io.IOException(s"repair: restore failed: ${st.getPath} -> $dst")
          restored += 1
        } else fs.delete(st.getPath, true)
      } else if (name.startsWith("compact-")) fs.delete(st.getPath, true)
    }
    restored
  }

  /** Small-file compaction — the table-maintenance job a long-lived
    * 100 TB table needs (many runs x many buckets => many small parquet
    * files; scan cost and NameNode/object-store metadata pressure grow
    * with file COUNT, not bytes). Rewrites each committed bucket holding
    * more than `maxFilesPerBucket` data files into exactly
    * `maxFilesPerBucket`, preserving rows byte-for-byte and the ledger
    * (rows/lineage are unchanged — compaction is not a commit).
    *
    * Swap protocol per bucket: rewrite into `_maintenance/compact-N`,
    * rename old dir to `_maintenance/trash-N`, rename new dir in, delete
    * trash. Every failure mode is recoverable: a failed swap-in restores
    * the old dir in-line (rename back, checked); a CRASH between the two
    * renames leaves the data in trash-N, which [[repairCompaction]] —
    * run first thing on every compact() — renames back. Readers racing
    * the two renames can observe the bucket absent (same caveat as any
    * Spark/Hive rename-based maintenance; the Iceberg swap makes it
    * snapshot-atomic). Returns the number of buckets rewritten.
    */
  def compact(root: String, maxFilesPerBucket: Int = 1)(implicit spark: SparkSession): Int = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val data = dataDir(root)
    val fs = fsOf(data)
    repairCompaction(root)
    if (!fs.isDirectory(data)) return 0
    var n = 0
    fs.listStatus(data).filter(_.getPath.getName.startsWith("bucket=")).foreach { st =>
      val dataFiles = fs.listStatus(st.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (dataFiles.length > maxFilesPerBucket) {
        val b = st.getPath.getName.stripPrefix("bucket=")
        val tmp = new Path(maintenanceDir(root), s"compact-$b")
        val trash = new Path(maintenanceDir(root), s"trash-$b")
        Seq(tmp, trash).foreach(p => if (fs.exists(p)) fs.delete(p, true))
        spark.read.parquet(st.getPath.toString)
          .coalesce(maxFilesPerBucket)
          .write.mode("overwrite").parquet(tmp.toString)
        if (!fs.rename(st.getPath, trash))
          throw new java.io.IOException(s"compact: move-aside failed for bucket $b")
        if (!fs.rename(tmp, st.getPath)) {
          if (!fs.rename(trash, st.getPath)) // restore — table state unchanged
            throw new java.io.IOException(
              s"compact: swap-in AND restore failed for bucket $b — data is in $trash; " +
                "run repairCompaction")
          throw new java.io.IOException(s"compact: swap-in failed for bucket $b (restored)")
        }
        fs.delete(trash, true)
        n += 1
      }
    }
    n
  }

  /** Retention sweep — the reference's TTL cleanup loop
    * (/root/reference/src/services/cleanup.py:22-58, 48 h TTL) as a
    * scheduled maintenance call: expire old snapshots and orphaned staging.
    */
  def expire(root: String, ttlMs: Long, nowMs: Long = System.currentTimeMillis()): Int = {
    var n = 0
    val fs = fsOf(new Path(root))
    val snaps = snapshotsDir(root)
    if (fs.isDirectory(snaps)) {
      fs.listStatus(snaps).foreach { st =>
        if (nowMs - st.getModificationTime > ttlMs && !st.isSymlink) {
          if (fs.delete(st.getPath, false)) {
            n += 1
            // the receipt IS the snapshot's truth: drop its (now
            // orphaned) Iceberg manifest list too. Surviving snapshots
            // keep their PERSISTED sequence numbers, so the metadata
            // re-derived at the next commit shows the expiry exactly as
            // Iceberg's expire_snapshots would (gaps in the sequence,
            // not a renumbering)
            val runId = st.getPath.getName.stripSuffix(".json")
            fs.delete(new Path(metadataDir(root),
              s"snap-${snapshotIdOf(runId)}-manifest-list.json"), false)
          }
        }
      }
    }
    val stg = new Path(root, "_staging")
    if (fs.isDirectory(stg)) {
      fs.listStatus(stg).foreach { st =>
        if (nowMs - st.getModificationTime > ttlMs) {
          if (fs.delete(st.getPath, true)) n += 1
        }
      }
    }
    n
  }

  /** Write-temp-then-rename through the Hadoop FS. Ledger and snapshot
    * names are unique per (bucket | runId), so the delete-before-rename
    * replace path only ever runs for idempotent re-writes of the same
    * content.
    */
  // ---- Iceberg-spec metadata projection --------------------------------
  // The custom ledger/_snapshots machinery above is this layer's commit
  // TRUTH; the files below are the same history re-expressed as Iceberg
  // format-version-2 table metadata (JSON, per the spec's TableMetadata
  // serialization) so the promised `format("iceberg")` swap is a READER
  // change: an Iceberg catalog pointed at `metadata/` sees the table
  // uuid, schema with field-ids, the bucket identity partition spec, the
  // full snapshot history with sequence numbers and summaries, and a
  // manifest-list per snapshot whose entries point at the per-bucket
  // ledger receipts. Documented deviation (sandbox: no Iceberg/Avro
  // jars): manifest lists and manifests are JSON, not Avro — the one
  // remaining writer change for a byte-level Iceberg commit.

  def metadataDir(root: String): Path = new Path(root, "metadata")

  /** Stable positive snapshot id for a run (FNV-1a over the run id —
    * deterministic so re-deriving metadata never renumbers history).
    */
  def snapshotIdOf(runId: String): Long = {
    var h = 0xcbf29ce484222325L
    runId.getBytes(StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    h & Long.MaxValue
  }

  /** Iceberg JSON for a Spark type; assigns element/field ids via `next`
    * in depth-first order (the spec's id-assignment convention).
    */
  private def icebergTypeJson(dt: org.apache.spark.sql.types.DataType,
      next: () => Int): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => q("string")
      case IntegerType => q("int")
      case LongType => q("long")
      case DoubleType => q("double")
      case FloatType => q("float")
      case BooleanType => q("boolean")
      case BinaryType => q("binary")
      case TimestampType => q("timestamptz")
      case TimestampNTZType => q("timestamp")
      case DateType => q("date")
      case s: StructType =>
        val fields = s.fields.map { f =>
          val id = next()
          s"""{"id":$id,"name":${q(f.name)},"required":${!f.nullable},""" +
            s""""type":${icebergTypeJson(f.dataType, next)}}"""
        }
        s"""{"type":"struct","fields":[${fields.mkString(",")}]}"""
      case a: ArrayType =>
        val eid = next()
        s"""{"type":"list","element-id":$eid,""" +
          s""""element-required":${!a.containsNull},""" +
          s""""element":${icebergTypeJson(a.elementType, next)}}"""
      case m: MapType =>
        val kid = next(); val vid = next()
        s"""{"type":"map","key-id":$kid,"key":${icebergTypeJson(m.keyType, next)},""" +
          s""""value-id":$vid,"value-required":${!m.valueContainsNull},""" +
          s""""value":${icebergTypeJson(m.valueType, next)}}"""
      case other =>
        throw new IllegalArgumentException(s"no Iceberg mapping for $other")
    }
  }

  private final case class SnapRec(runId: String, rows: Long, okRows: Long,
      tsMs: Long, buckets: Seq[Int], seq: Long, op: String, tableRows: Long)

  /** Committed-run history, parsed from the `_snapshots/` receipts the
    * commit protocol writes (the same minimal-extractor style as
    * [[bucketLedgers]]). Ordered by commit time.
    */
  private def snapshotHistory(root: String): Seq[SnapRec] = {
    val dir = snapshotsDir(root)
    val fs = fsOf(dir)
    if (!fs.isDirectory(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".json")).map { st =>
      val in = fs.open(st.getPath)
      val content = try {
        val buf = new Array[Byte](st.getLen.toInt)
        in.readFully(0, buf)
        new String(buf, StandardCharsets.UTF_8)
      } finally in.close()
      def num(k: String): Long =
        ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(content)
          .getOrElse(throw new java.io.IOException(s"snapshot ${st.getPath}: missing $k"))
          .group(1).toLong
      val runId = "\"run_id\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(content)
        .getOrElse(throw new java.io.IOException(s"snapshot ${st.getPath}: missing run_id"))
        .group(1).replace("\\\"", "\"").replace("\\\\", "\\")
      val buckets = "\"committed_buckets\":\\[([0-9,]*)\\]".r
        .findFirstMatchIn(content).map(_.group(1)).getOrElse("")
      val seq = "\"seq\":(\\d+)".r.findFirstMatchIn(content)
        .map(_.group(1).toLong).getOrElse(-1L)
      val op = "\"op\":\"(\\w+)\"".r.findFirstMatchIn(content)
        .map(_.group(1)).getOrElse("append")
      val tableRows = "\"table_rows\":(\\d+)".r.findFirstMatchIn(content)
        .map(_.group(1).toLong).getOrElse(-1L) // pre-r5 receipts: unknown
      SnapRec(runId, num("rows"), num("ok_rows"), num("committed_at_ms"),
        if (buckets.isEmpty) Seq.empty else buckets.split(",").map(_.trim.toInt).toSeq,
        seq, op, tableRows)
    }.sortBy(r => (r.tsMs, r.runId)) match {
      // receipts written before the seq field (or hand-placed) get
      // positional numbers filled monotonically AFTER the persisted ones
      case recs =>
        var nextSeq = (recs.map(_.seq) :+ 0L).max
        recs.map { r =>
          if (r.seq > 0) r
          else { nextSeq += 1; r.copy(seq = nextSeq) }
        }.sortBy(_.seq)
    }
  }

  /** Re-derive the Iceberg metadata files from the commit history: one
    * JSON manifest list per snapshot (entries point at the bucket
    * ledgers that run committed), one new `v<N>.metadata.json` (N =
    * snapshot count) carrying the full history, and `version-hint.text`
    * (the HadoopCatalog current-version convention). Idempotent and
    * derivation-only — re-running after any commit produces the same
    * ids and sequence numbers, and deleting `metadata/` loses nothing
    * (the ledger receipts remain the truth).
    */
  def commitIcebergMetadata(root: String,
      schema: org.apache.spark.sql.types.StructType): Path = {
    val history = snapshotHistory(root)
    require(history.nonEmpty, s"no committed snapshots under $root")
    val mdir = metadataDir(root)
    val fs = fsOf(mdir)
    fs.mkdirs(mdir)
    // manifest lists (one per snapshot; skip ones already written)
    history.foreach { sn =>
      val sid = snapshotIdOf(sn.runId)
      val p = new Path(mdir, s"snap-$sid-manifest-list.json")
      if (!fs.exists(p)) {
        val entries = sn.buckets.map { b =>
          s"""{"manifest_path":${q(new Path(ledgerDir(root), s"bucket-$b.json").toString)},""" +
            s""""partition_spec_id":0,"content":0,"sequence_number":${sn.seq},""" +
            s""""added_snapshot_id":$sid,""" +
            s""""partitions":[{"contains_null":false,"lower_bound":$b,"upper_bound":$b}]}"""
        }
        atomicWrite(p, s"[${entries.mkString(",")}]")
      }
    }
    // schema with depth-first field ids (top-level fields first would
    // renumber nested ids, so one pre-order pass assigns everything)
    var idc = 0
    val next = () => { idc += 1; idc }
    val schemaJson = icebergTypeJson(schema, next) match {
      case s0 => s0.patch(s0.indexOf("\"type\":\"struct\""), "\"schema-id\":0,", 0)
    }
    val lastColumnId = idc
    val bucketSourceId = {
      // pre-order id of the top-level `bucket` field: walk the same
      // assignment to find it
      var c = 0
      var found = -1
      def walk(dt: org.apache.spark.sql.types.DataType, name: String): Unit = dt match {
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.foreach { f =>
            c += 1
            if (found < 0 && (dt eq schema) && f.name == "bucket") found = c
            walk(f.dataType, f.name)
          }
        case a: org.apache.spark.sql.types.ArrayType => c += 1; walk(a.elementType, name)
        case m: org.apache.spark.sql.types.MapType =>
          c += 2; walk(m.keyType, name); walk(m.valueType, name)
        case _ => ()
      }
      walk(schema, "")
      require(found > 0, "results schema must carry a bucket column")
      found
    }
    val uuid = java.util.UUID.nameUUIDFromBytes(
      ("graft-table:" + new Path(root).toUri.getPath)
        .getBytes(StandardCharsets.UTF_8)).toString
    // running whole-table size: receipts carry the post-commit ledger sum
    // (`table_rows`); pre-r5 receipts without it fall back to the
    // append-cumulative estimate. An overwrite snapshot's `rows` is the
    // post-rewrite count of its affected buckets — added-records (records
    // in the files the snapshot added) is exactly that, and
    // deleted-records (records in the files it removed) falls out of the
    // running totals: prev + added - total.
    var running = 0L
    var havePrev = false // false until >=1 snapshot processed: expiry can
    // delete a snapshot's predecessors, and without them the pre-image of
    // the FIRST survivor is unknowable — deleted-records is then omitted
    // (an optional summary field) rather than derived from a prev of 0,
    // which would go negative for any surviving overwrite
    val snapsJson = history.map { sn =>
      val sid = snapshotIdOf(sn.runId)
      val prev = running
      running = if (sn.tableRows >= 0) sn.tableRows else running + sn.rows
      val deleted = math.max(0L, prev + sn.rows - running)
      val emitDeleted = sn.op == "overwrite" && sn.tableRows >= 0 && havePrev
      havePrev = true
      s"""{"snapshot-id":$sid,"sequence-number":${sn.seq},""" +
        s""""timestamp-ms":${sn.tsMs},"schema-id":0,""" +
        s""""manifest-list":${q(new Path(mdir, s"snap-$sid-manifest-list.json").toString)},""" +
        s""""summary":{"operation":"${sn.op}",""" +
        s""""added-data-files":${q(sn.buckets.length.toString)},""" +
        s""""added-records":${q(sn.rows.toString)},""" +
        (if (emitDeleted) s""""deleted-records":${q(deleted.toString)},""" else "") +
        s""""total-records":${q(running.toString)}}}"""
    }
    val logJson = history.map(sn =>
      s"""{"timestamp-ms":${sn.tsMs},"snapshot-id":${snapshotIdOf(sn.runId)}}""")
    val current = snapshotIdOf(history.last.runId)
    val md =
      s"""{"format-version":2,"table-uuid":${q(uuid)},""" +
        s""""location":${q(root)},""" +
        s""""last-sequence-number":${history.map(_.seq).max},""" +
        s""""last-updated-ms":${history.last.tsMs},""" +
        s""""last-column-id":$lastColumnId,""" +
        s""""schemas":[$schemaJson],"current-schema-id":0,""" +
        s""""partition-specs":[{"spec-id":0,"fields":[""" +
        s"""{"name":"bucket","transform":"identity","source-id":$bucketSourceId,"field-id":1000}]}],""" +
        s""""default-spec-id":0,"last-partition-id":1000,""" +
        s""""sort-orders":[{"order-id":0,"fields":[]}],"default-sort-order-id":0,""" +
        s""""properties":{"write.format.default":"parquet"},""" +
        s""""current-snapshot-id":$current,""" +
        s""""snapshots":[${snapsJson.mkString(",")}],""" +
        s""""snapshot-log":[${logJson.mkString(",")}],""" +
        s""""metadata-log":[]}"""
    val version = history.map(_.seq).max
    val out = new Path(mdir, s"v$version.metadata.json")
    atomicWrite(out, md)
    atomicWrite(new Path(mdir, "version-hint.text"), version.toString)
    out
  }

  def atomicWrite(path: Path, content: String): Unit = {
    val fs = fsOf(path)
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"atomic write rename failed: $tmp -> $path")
  }
}
