package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One extraction outcome, keyed by engine. `atMs` is EVENT time (the
  * result row's timestamp), so breaker timing is deterministic and
  * replay-safe — a replayed micro-batch folds to the same state.
  */
final case class HealthEvent(engine: String, ok: Boolean, atMs: Long)

/** Keyed breaker state carried across micro-batches. */
final case class EngineState(
    status: String,       // closed | open | half_open
    fails: Int,           // consecutive failures while closed
    okProbes: Int,        // successful probes while half_open
    openedAtMs: Long,     // when the breaker last opened
)

/** Per-batch health decision emitted downstream. */
final case class HealthRow(
    engine: String,
    status: String,
    fails: Int,
    okProbes: Int,
    shedEvents: Long,     // events ignored because the breaker was open
    updatedAtMs: Long,
)

/** The faithful STREAMING mapping of the reference's circuit breaker
  * (/root/reference/src/services/ocr/registry_v2.py:473-551): per-engine
  * keyed state via `mapGroupsWithState` — open after
  * [[EngineHealth.FailureThreshold]] consecutive failures, shed while
  * open, HALF-OPEN after [[EngineHealth.RetryAfterMs]] (300 s), close
  * after [[EngineHealth.SuccessesToClose]] successful probes, re-open on
  * a failed probe.
  *
  * The batch pipeline's task-scoped breaker (ExtractPipeline.Kernel
  * .Breaker) approximates this inside one task where no cross-batch time
  * axis exists; a RESIDENT stream has real time between micro-batches, so
  * the 300 s retry window maps directly. State lives in the streaming
  * state store (checkpointed, exactly-once across restarts); scale-wise
  * the keyed state is O(#engines) — constant.
  */
object EngineHealth {
  val FailureThreshold = 5    // CIRCUIT_BREAKER_FAILURE_THRESHOLD, config.py:66-84
  val RetryAfterMs = 300000L  // 300 s half-open window
  val SuccessesToClose = 3    // reset after 3 successes

  val initial: EngineState = EngineState("closed", 0, 0, 0L)

  /** Fold one engine's events (in event-time order) into the breaker
    * state machine. Events arriving while the breaker is open (inside the
    * retry window) are SHED — the streaming analog of the reference's 503
    * — and counted, not folded.
    */
  def fold(state: EngineState, events: Seq[HealthEvent]): (EngineState, Long) = {
    var s = state
    var shed = 0L
    events.sortBy(e => (e.atMs, !e.ok)).foreach { e =>
      s.status match {
        case "closed" =>
          s =
            if (e.ok) s.copy(fails = 0)
            else if (s.fails + 1 >= FailureThreshold)
              EngineState("open", s.fails + 1, 0, e.atMs)
            else s.copy(fails = s.fails + 1)
        case "open" =>
          if (e.atMs - s.openedAtMs >= RetryAfterMs) {
            // window elapsed: this event is the first half-open probe
            s =
              if (e.ok) EngineState("half_open", 0, 1, s.openedAtMs)
              else EngineState("open", FailureThreshold, 0, e.atMs) // failed probe re-opens
          } else shed += 1
        case _ => // half_open: every event is a probe
          s =
            if (!e.ok) EngineState("open", FailureThreshold, 0, e.atMs)
            else if (s.okProbes + 1 >= SuccessesToClose) EngineState("closed", 0, 0, 0L)
            else s.copy(okProbes = s.okProbes + 1)
      }
    }
    (s, shed)
  }

  private def updateState(
      engine: String,
      events: Iterator[HealthEvent],
      gs: GroupState[EngineState],
  ): HealthRow = {
    val evs = events.toSeq
    val (next, shed) = fold(gs.getOption.getOrElse(initial), evs)
    gs.update(next)
    HealthRow(engine, next.status, next.fails, next.okProbes, shed,
      if (evs.isEmpty) 0L else evs.map(_.atMs).max)
  }

  /** Streaming health tracker: one updated [[HealthRow]] per engine per
    * micro-batch. Attach to the extraction result stream with
    * `results.map(r => HealthEvent(r.engine, r.status == "ok", ts))`.
    */
  def track(events: Dataset[HealthEvent]): Dataset[HealthRow] = {
    implicit val se: org.apache.spark.sql.Encoder[EngineState] = Encoders.product[EngineState]
    implicit val sh: org.apache.spark.sql.Encoder[HealthRow] = Encoders.product[HealthRow]
    implicit val ss: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    events
      .groupByKey(_.engine)
      .mapGroupsWithState[EngineState, HealthRow](GroupStateTimeout.NoTimeout)(updateState)
  }

  /** Output mode required by mapGroupsWithState. */
  val outputMode: OutputMode = OutputMode.Update()
}
