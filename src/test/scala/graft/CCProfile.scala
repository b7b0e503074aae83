package graft

import org.apache.spark.sql.SparkSession
import graft.datapipe.TrainingOps

/** Throwaway profiling main for dupClusters phases. */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[cc] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("jaccardVerify.count")(TrainingOps.jaccardVerify(docs).count())
    val df = time("dupClusters build (loop)")(TrainingOps.dupClusters(docs))
    time("final count")(df.count())
    time("final count again")(df.count())
    spark.stop()
  }
}
