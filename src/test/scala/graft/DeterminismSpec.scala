package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance — the determinism axis the ORACLE GATE
  * cannot see: the driver compares Spark vs DuckDB once, with one
  * shuffle-partition setting, so an operator whose output depends on
  * partitioning (a double sum folded in partition order, a per-group
  * `first()`, an un-tiebroken rank, exchange-order-dependent limits)
  * can pass every CORRECTNESS row and still produce different corpora
  * on different clusters. Reproducible-corpus pipelines live and die
  * on this property (the same curation run must emit the same corpus
  * on 8 or 800 executors), so the riskiest queries — rank/sample/
  * iterate/aggregate-heavy — are run at two shuffle-partition settings
  * and compared as exact row multisets.
  */
class DeterminismSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("determinism-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def runCanon(name: String): Seq[String] = {
    val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      .map(_.toSeq.map(v => String.valueOf(v)).mkString("\u0001"))
      .toSeq.sorted
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    rows
  }

  // The rank/sample/iterate/float-adjacent subset — every query where a
  // partitioning dependence could plausibly hide. Map-only projections
  // are partition-invariant by construction and are left to the oracle.
  private val risky = Seq(
    "d2_dedup_minhash_lsh", "d5_ann_cosine_topk", "d7_ann_topk_scalable",
    "d10_dup_clusters", "d16_pq_codes", "d17_adc_topk", "d24_cluster_reps",
    "d28_kmeans_train", "d32_containment", "d37_mutual_knn", "d38_knn_components",
    "t8_stratified_sample", "t11_global_shuffle", "t13_source_cap",
    "t15_frequent_ngrams", "t19_bpe_merges", "t22_inverted_index",
    "t31_token_shards", "t56_bm25_topk", "e20_sessionize", "e23_host_rank",
    "e29_politeness_schedule", "e44_hits", "e48_components",
    "e65_host_scorecard", "e67_host_wilson", "q1_pricing_summary",
    "q3_shipping_priority", "p12_rendezvous_shards", "p16_epoch_order",
    // the north rule itself: BYTE-identical extracted text per url must
    // not depend on how the pages happened to be partitioned — the
    // kernel spine, the link scan, and the composed release pipeline
    "e1_extract_html", "e2_extract_pdf", "e22_outlinks",
    "d39_sq8_encode", "p8_corpus_release")

  test("risky queries are bit-identical across shuffle-partition settings (4 vs 7)") {
    risky.foreach { name =>
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = runCanon(name)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = runCanon(name)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b,
        s"$name: output depends on shuffle partitioning (${a.length} vs ${b.length} rows; " +
          s"first diff: ${a.zip(b).find { case (x, y) => x != y }})")
    }
  }
}
