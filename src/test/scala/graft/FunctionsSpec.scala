package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Html, HtmlExtractor}
import graft.gen.{HtmlGen, PdfGen}

/** SQL-surface kernel expressions (graft.functions): extension
  * registration, codegen participation, and equality with the typed
  * kernel path.
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("functions-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def words(n: Int, seed: Int) = {
    val pool = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (0 until n).map(i => pool((i * 31 + seed) % pool.length)).mkString(" ")
  }

  test("extract_text via SQL == typed kernel output; pdf pages count") {
    val s = spark; import s.implicits._
    val rows = (0L to 20L).map { id =>
      val bytes =
        if (id % 5 == 4) PdfGen.render(id, words(150, id.toInt))
        else HtmlGen.render(id, words(60, id.toInt), "en")
      (id, bytes)
    }
    rows.toSeq.toDF("id", "html").createOrReplaceTempView("pages_v")
    val out = spark.sql(
      "SELECT id, extract_text(html) AS text, extract_pages(html) AS pages FROM pages_v")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    rows.foreach { case (id, bytes) =>
      val expect = graft.core.Extractors
        .forType(graft.core.ContentType.detect(bytes)).get
        .extract(bytes, Html.Deadline.unlimited)
      assert(out(id)._1 == expect.text, s"text mismatch for doc $id")
      assert(out(id)._2 == expect.pages, s"pages mismatch for doc $id")
    }
  }

  test("unknown format and null yield SQL NULL (error-as-data)") {
    val s = spark; import s.implicits._
    Seq((1L, HtmlGen.junkBytes(7L)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "html").createOrReplaceTempView("junk_v")
    val out = spark.sql("SELECT extract_text(html), extract_pages(html) FROM junk_v").collect()
    out.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("min_k_longs: bounded heap aggregate — exact, partial-merge-safe, null-safe") {
    val s = spark; import s.implicits._
    // registered via the session extension AND imperatively (idempotent)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val rows = (0L until 1000L).map(i => ((i % 7).toString, (i * 2654435761L) % 100003L)) ++
      Seq(("g0", -5L), ("g0", -5L)) // duplicates + negatives survive
    val df = rows.toDF("g", "v").repartition(11) // force multi-partition partial merge
    val out = df.groupBy("g").agg(expr("min_k_longs(v, 5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val truth = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.take(5).toSeq }
    assert(out == truth, s"min-5 per group must be exact: $out vs $truth")
    // k larger than the group returns the whole group, ascending
    val small = Seq(("a", 3L), ("a", 1L)).toDF("g", "v")
      .groupBy("g").agg(expr("min_k_longs(v, 10)")).collect()(0).getSeq[Long](1)
    assert(small == Seq(1L, 3L))
    // nulls are ignored, not counted
    val withNull = Seq(("a", Some(2L)), ("a", None), ("a", Some(1L)))
      .toDF("g", "v").groupBy("g").agg(expr("min_k_longs(v, 2)"))
      .collect()(0).getSeq[Long](1)
    assert(withNull == Seq(1L, 2L))
    // non-literal k fails at plan build, not at runtime
    intercept[Exception] {
      Seq(("a", 1L)).toDF("g", "v").groupBy("g")
        .agg(expr("min_k_longs(v, v)")).collect()
    }
    // an INT column coerces to BIGINT at analysis (ImplicitCastInputTypes)
    val ints = Seq(("a", 3), ("a", 1)).toDF("g", "v")
      .groupBy("g").agg(expr("min_k_longs(v, 1)")).collect()(0).getSeq[Long](1)
    assert(ints == Seq(1L))
    // a NULL or non-numeric k literal fails at plan build with a clear error
    intercept[Exception] {
      Seq(("a", 1L)).toDF("g", "v").groupBy("g")
        .agg(expr("min_k_longs(v, NULL)")).collect()
    }
  }

  test("expression participates in whole-stage codegen") {
    val s = spark; import s.implicits._
    // a local relation constant-folds to LocalTableScan (interpreted), so
    // drive the expression from a real scan
    val dir = java.nio.file.Files.createTempDirectory("fnspec").toString
    (0L to 8L).map(id => (id, HtmlGen.render(id, words(40, id.toInt), "en")))
      .toDF("id", "html").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).selectExpr("length(extract_text(html)) AS n")
    val exec = df.queryExecution.executedPlan
    // the starred nodes ("*(1) Project") are WholeStageCodegenExec spans
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty, s"no WholeStageCodegenExec in:\n$exec")
    assert(!exec.toString.contains("CodegenFallback"), s"fell back to interpretation:\n$exec")
    assert(df.collect().forall(_.getInt(0) > 0))
  }
}
