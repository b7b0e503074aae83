package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.datapipe.TrainingOps

/** Training-data pipeline ops (SURVEY.md par 2.10) over the driver's
  * documents/embeddings tables at sf0.001. The oracle compare
  * (graft.Verify + DuckDB) is the authoritative gate; these tests pin
  * semantic invariants that SQL equality alone wouldn't explain.
  */
class DataPipeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("datapipe-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("exact dedup partitions the corpus: group sizes sum to row count") {
    val n = docs.count()
    val g = TrainingOps.dedupExact(docs).agg(sum("n_copies")).collect()(0).getLong(0)
    assert(g == n)
  }

  test("minhash LSH finds exact duplicates as candidate pairs") {
    // exact dups (same text, different doc_id) are near-dups at jaccard 1.0
    // and MUST appear among LSH candidates (identical signatures)
    val dupPair = docs.as("x").join(docs.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .filter(length(col("x.text")) > 50)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .collect()
    val cands = TrainingOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    dupPair.foreach { r =>
      assert(cands.contains((r.getLong(0), r.getLong(1))),
        s"exact dup pair ${r.getLong(0)}-${r.getLong(1)} missed by LSH")
    }
  }

  test("jaccard verify: scores in (0,1], exact dups score 1.0") {
    val rows = TrainingOps.jaccardVerify(docs).collect()
    assert(rows.nonEmpty, "no candidate survived jaccard >= 0.4")
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("simhash: near-identical docs have small hamming distance") {
    val sh = TrainingOps.simhash(docs)
    val joined = docs.select(col("doc_id"), col("text"))
      .join(sh, "doc_id")
    val pair = joined.as("x").join(joined.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .filter(length(col("x.text")) > 50)
      .select(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("d"))
      .collect()
    pair.foreach(r => assert(r.getInt(0) == 0, "identical text must give identical simhash"))
  }

  test("ann cosine top-k: k rows per probe, scores descending, self excluded") {
    val rows = TrainingOps.annCosineTopK(embs).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (q, rs) =>
      assert(rs.length == 5, s"probe $q has ${rs.length} rows")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(_.getLong(2) == q))
    }
  }

  test("scalable top-k (partition heaps + merge) == brute-force baseline") {
    implicit val sp: SparkSession = spark
    val base = TrainingOps.annCosineTopK(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val scal = TrainingOps.annCosineTopKScalable(embs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(scal == base)
  }

  test("ann lsh buckets: deterministic and correlated with cosine neighbors") {
    val b1 = TrainingOps.annLshBuckets(embs).collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b2 = TrainingOps.annLshBuckets(embs).collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(b1 == b2)
    // top-1 cosine neighbors should share more bucket bits than random
    // pairs on average (sign-LSH property); verify directionally
    val top1 = TrainingOps.annCosineTopK(embs, 1).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val hams = top1.map { case (q, v) => Integer.bitCount(b1(q) ^ b1(v)) }
    assert(hams.sum.toDouble / hams.length < 8.0,
      s"top-1 neighbors average ${hams.sum.toDouble / hams.length} of 16 bits differing — LSH uncorrelated")
  }

  test("language id: deterministic argmax with fixed tie order") {
    val out = TrainingOps.langId(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(Set("en", "de", "es", "fr", "zh").contains(r.getString(1)))
      assert(r.getInt(2) <= r.getInt(3)) // n_stop <= n_words
    }
  }

  test("quality + token + fingerprint invariants") {
    TrainingOps.qualityScore(docs).collect().foreach { r =>
      val q = r.getDouble(7)
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of range")
    }
    TrainingOps.tokenCounts(docs).collect().foreach { r =>
      assert(r.getInt(1) >= 1 && r.getInt(2) >= 0)
    }
    val fps = TrainingOps.fingerprint(docs).collect()
    assert(fps.nonEmpty)
    // identical docs -> identical fingerprints
    val withText = docs.select(col("doc_id"), col("text"))
    val fpDf = TrainingOps.fingerprint(docs).join(withText, "doc_id")
    val clash = fpDf.as("x").join(fpDf.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .filter(col("x.fp") =!= col("y.fp")).count()
    assert(clash == 0)
  }

  test("binary features stub: md5 and byte length match the payload") {
    val out = TrainingOps.binaryFeatures(spark, docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(md5(col("text")) =!= col("content_md5") ||
        length(encode(col("text"), "UTF-8")) =!= col("n_bytes"))
    assert(out.count() == 0)
  }
}
