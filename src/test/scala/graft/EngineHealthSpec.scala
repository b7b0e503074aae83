package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

/** Streaming breaker parity (reference registry_v2.py:473-551): keyed
  * engine health over micro-batches — open after 5 consecutive failures,
  * shed while open, half-open after the 300 s window, close after 3
  * successful probes, re-open on a failed probe. Timing is EVENT time, so
  * the whole test is deterministic.
  */
class EngineHealthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("state machine: open -> shed -> half-open probe -> close; failed probe re-opens") {
    val t0 = 1000L
    // 5 consecutive failures open it
    val (s1, shed1) = EngineHealth.fold(EngineHealth.initial,
      (0 until 5).map(i => HealthEvent("html", ok = false, t0 + i)))
    assert(s1.status == "open" && shed1 == 0)
    // inside the window: everything shed, state unchanged
    val (s2, shed2) = EngineHealth.fold(s1,
      (0 until 7).map(i => HealthEvent("html", ok = true, t0 + 100 + i)))
    assert(s2.status == "open" && shed2 == 7)
    // window elapsed: first event is a probe; 3 successes close it
    val tProbe = t0 + 4 + EngineHealth.RetryAfterMs
    val (s3, shed3) = EngineHealth.fold(s2,
      (0 until 3).map(i => HealthEvent("html", ok = true, tProbe + i)))
    assert(s3.status == "closed" && shed3 == 0)
    // ...but a FAILED probe re-opens with a fresh window
    val (s4, _) = EngineHealth.fold(s2, Seq(HealthEvent("html", ok = false, tProbe)))
    assert(s4.status == "open" && s4.openedAtMs == tProbe)
    val (s5, shed5) = EngineHealth.fold(s4, Seq(HealthEvent("html", ok = true, tProbe + 10)))
    assert(s5.status == "open" && shed5 == 1, "fresh window must shed again")
  }

  test("keyed mapGroupsWithState stream: engines evolve independently across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val t0 = 50000L
    val input = MemoryStream[HealthEvent]
    val query = EngineHealth.track(input.toDS())
      .writeStream
      .outputMode(EngineHealth.outputMode)
      .format("memory")
      .queryName("engine_health")
      .start()
    def latest(): Map[String, (String, Long)] =
      spark.table("engine_health")
        .collect()
        .map(r => (r.getString(0), (r.getString(1), r.getLong(4), r.getLong(5))))
        .groupBy(_._1)
        .map { case (k, rs) => k -> { val m = rs.maxBy(_._2._3); (m._2._1, m._2._2) } }

    // batch 1: html fails 5x (opens), pdf succeeds (stays closed)
    input.addData((0 until 5).map(i => HealthEvent("html", ok = false, t0 + i)) :+
      HealthEvent("pdf", ok = true, t0))
    query.processAllAvailable()
    assert(latest()("html")._1 == "open")
    assert(latest()("pdf")._1 == "closed")

    // batch 2: html work inside the window is shed; pdf unaffected
    input.addData(Seq(HealthEvent("html", ok = true, t0 + 1000),
      HealthEvent("pdf", ok = true, t0 + 1000)))
    query.processAllAvailable()
    val (st2, shed2) = latest()("html")
    assert(st2 == "open" && shed2 == 1)

    // batch 3: after the 300 s window, probes close html again
    val tp = t0 + 4 + EngineHealth.RetryAfterMs
    input.addData((0 until 3).map(i => HealthEvent("html", ok = true, tp + i)))
    query.processAllAvailable()
    assert(latest()("html")._1 == "closed")
    query.stop()
  }
}
