package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.Base64
import org.apache.spark.sql.SparkSession
import graft.core.Span
import graft.gen.PagesGen
import graft.spark._

/** Explicit golden-regeneration task (SURVEY.md par 7.5 item 1: "goldens
  * are regenerated only by an explicit, logged task"). Freezes the
  * pipeline's output on the sf0.001 corpus as a TSV under
  * src/test/resources/golden/; GoldenSpec then holds every future run to
  * byte equality against it.
  *
  *   sbt "Test/runMain graft.GoldenGen"
  */
object GoldenGen {

  val GoldenPath = "src/test/resources/golden/sf0.001.tsv"
  val CorpusDir = "/root/testdata/sf0.001"

  def spansDigest(spans: Seq[Span]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    spans.foreach { s =>
      md.update(s"${s.kind}|${s.path}|${s.begin}|${s.end};".getBytes(StandardCharsets.UTF_8))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  def line(r: ResultRow): String = {
    val textB64 = Base64.getEncoder.encodeToString(r.text.getBytes(StandardCharsets.UTF_8))
    s"${r.url}\t${r.status}\t${r.engine}\t${r.pages}\t${r.spans.size}\t${spansDigest(r.spans)}\t$textB64"
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    val results = ExtractPipeline
      .run(PagesGen.fromDocuments(spark, CorpusDir), SparkEntry.conf)
      .collect()
      .sortBy(_.url)
    val out = results.map(line).mkString("", "\n", "\n")
    Files.createDirectories(Paths.get(GoldenPath).getParent)
    Files.write(Paths.get(GoldenPath), out.getBytes(StandardCharsets.UTF_8))
    println(s"[golden] wrote ${results.length} rows to $GoldenPath")
    spark.stop()
  }
}
