package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Running totals emitted per user as events arrive. */
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** Custom keyed state via `flatMapGroupsWithState` — the capability class
  * the built-in windows can't express: state that survives across
  * micro-batches with explicit lifecycle (update / emit / timeout-evict).
  * [[EventAggregates.userSessions]] covers gap sessions with the built-in
  * `session_window`; this operator is the general form for state machines
  * (e.g. per-scene pipeline progress, per-user counters).
  *
  * Scale design: state lives in the executor state store partitioned by
  * key (one shuffle on user_id); each micro-batch touches only keys with
  * new events, and idle keys are EVICTED by the processing-time timeout —
  * without eviction a 10⁹-user stream accretes state forever. Batch inputs
  * run the same function with per-key state scoped to the single batch
  * (timeouts never fire), yielding plain per-key totals.
  */
object StatefulAggregates {

  /** `idleTimeout = Some(d)` arms processing-time eviction — required for
    * unbounded key domains. Caveat: an armed timeout makes the micro-batch
    * engine schedule continuous empty batches to check expiry (even
    * `Trigger.AvailableNow` keeps running them), which is correct for a
    * long-lived production query but livelocks drain-style test harnesses —
    * leave it `None` there. */
  /** The same running totals on Spark 4's `transformWithState` — the
    * successor API: typed named state (`ValueState`) with optional TTL
    * instead of one opaque blob, timers decoupled from state, and the
    * RocksDB state store required for streaming (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `RocksDBStateStoreProvider`). Batch inputs run the same processor
    * with single-batch state. TTL (`ttl`) is the eviction story here —
    * declarative, no hand-rolled timeout branch. */
  class RunningTotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Double), UserTotals] {
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), ttl)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0; var s = s0
      rows.foreach { case (_, v) => n += 1; s += v }
      totals.update((n, s))
      Iterator.single(UserTotals(key, n, s))
    }
  }

  def runningUserTotalsTws(events: DataFrame,
                           ttl: TTLConfig = TTLConfig.NONE): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("CAST(user_id AS LONG) AS user_id", "CAST(value AS DOUBLE) AS value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  def runningUserTotals(events: DataFrame,
                        idleTimeout: Option[String] = None): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val typed = events
      .selectExpr("CAST(user_id AS LONG) AS user_id", "CAST(value AS DOUBLE) AS value")
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserTotals](
        OutputMode.Update, timeoutConf) {
        case (userId, rows, state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            // idle key: drop the state, emit nothing — bounded state store
            state.remove()
            Iterator.empty
          } else {
            val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
            var n = n0; var s = s0
            rows.foreach { case (_, v) => n += 1; s += v }
            state.update((n, s))
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(UserTotals(userId, n, s))
          }
      }
  }
}
