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

  /** One flagged bucket from [[onlineVolumeAnomalies]]. */
  final case class BucketAnomaly(event_type: String,
                                 bucket_start: java.sql.Timestamp,
                                 n: Long, z: Double)

  /** Streaming twin of [[graft.functions.EventAnalytics.volumeAnomalies]]:
    * an ONLINE z-score per (type, bucket) against the type's history SO
    * FAR, held as Welford running moments (count, mean, M2) — three
    * numbers per key, the smallest possible baseline state. The batch
    * operator scores against the full series (retrospective audit); this
    * scores each bucket as it closes (the pager alert), which is why the
    * two legitimately disagree on early buckets: the stream has no future
    * to normalize against. `minHistory` suppresses the cold start, where
    * one observation would make every second bucket an "anomaly".
    *
    * Input contract: closed (event_type, bucket_start, n) rows — i.e. the
    * APPEND-mode output of a watermarked windowed count upstream, so each
    * bucket arrives exactly once. Rows are sorted by bucket_start within
    * each micro-batch (arrival order inside a batch is not meaningful);
    * cross-batch ordering is the upstream watermark's contract.
    *
    * Scale shape: state is O(types) × 3 doubles in the keyed state store,
    * one shuffle on event_type; each micro-batch touches only types with
    * closed buckets. A spike does inflate the running variance after it
    * is scored (self-poisoning) — production hardening would clamp or use
    * MAD, noted here because the spec pins the current semantics. */
  class OnlineAnomalyProcessor(threshold: Double, minHistory: Int)
      extends StatefulProcessor[String, (String, java.sql.Timestamp, Long),
        BucketAnomaly] {
    @transient private var stats: ValueState[(Long, Double, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Double, Double)]("welford",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaDouble), TTLConfig.NONE)
    override def handleInputRows(key: String,
                                 rows: Iterator[(String, java.sql.Timestamp, Long)],
                                 timerValues: TimerValues): Iterator[BucketAnomaly] = {
      var (cnt, mean, m2) =
        if (stats.exists()) stats.get() else (0L, 0.0, 0.0)
      val out = scala.collection.mutable.ArrayBuffer.empty[BucketAnomaly]
      rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, n) =>
        if (cnt >= minHistory && cnt >= 2) {
          val sigma = math.sqrt(m2 / (cnt - 1)) // sample stddev of history
          if (sigma > 0) {
            val z = (n - mean) / sigma
            if (math.abs(z) >= threshold) out += BucketAnomaly(key, ts, n, z)
          }
        }
        cnt += 1
        val d = n - mean
        mean += d / cnt
        m2 += d * (n - mean)
      }
      stats.update((cnt, mean, m2))
      out.iterator
    }
  }

  /** Run [[OnlineAnomalyProcessor]] over closed bucket counts
    * (event_type, bucket_start, n) — streaming or batch (batch scores the
    * whole series in one pass, state scoped to it). */
  def onlineVolumeAnomalies(bucketCounts: DataFrame, threshold: Double = 3.0,
                            minHistory: Int = 6): Dataset[BucketAnomaly] = {
    val spark = bucketCounts.sparkSession
    import spark.implicits._
    bucketCounts
      .selectExpr("CAST(event_type AS STRING) AS event_type",
        "CAST(bucket_start AS TIMESTAMP) AS bucket_start", "CAST(n AS LONG) AS n")
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new OnlineAnomalyProcessor(threshold, minHistory),
        TimeMode.None(), OutputMode.Append())
  }

  /** Per-key EWMA summary from [[onlineEwma]]. */
  final case class EwmaSummary(event_type: String, n_buckets: Long,
                               ewma: Double, n_spikes: Long)

  /** Streaming twin of q145's batch EWMA fold: per key, the sequential
    * smoother e ← α·x + β·e (spike when x > factor·e BEFORE the update —
    * the same op order as the batch `aggregate` HOF, so after the last
    * bucket the streaming state equals the batch fold BIT-FOR-BIT; the
    * spec pins that equality across micro-batch boundaries).
    *
    * β is an explicit parameter rather than 1−α because `1.0 - 0.3`
    * rounds to a DIFFERENT double than the literal `0.7` — passing both
    * keeps the twin's arithmetic identical to the batch query's literals.
    *
    * Input contract: closed buckets in event-time order across batches
    * (the watermark's append contract, same as [[onlineVolumeAnomalies]]);
    * rows within a micro-batch are sorted here. State: (n, e, k) — three
    * scalars per key. */
  class OnlineEwmaProcessor(alpha: Double, beta: Double, spikeFactor: Double)
      extends StatefulProcessor[String, (String, java.sql.Timestamp, Double),
        EwmaSummary] {
    @transient private var st: ValueState[(Long, Double, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Long)]("ewma",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(key: String,
                                 rows: Iterator[(String, java.sql.Timestamp, Double)],
                                 timerValues: TimerValues): Iterator[EwmaSummary] = {
      var (n, e, k) = if (st.exists()) st.get() else (0L, 0.0, 0L)
      rows.toSeq.sortBy(_._2.getTime).foreach { case (_, _, x) =>
        if (n == 0L) e = x
        else {
          if (x > spikeFactor * e) k += 1
          e = alpha * x + beta * e
        }
        n += 1
      }
      st.update((n, e, k))
      Iterator.single(EwmaSummary(key, n, e, k))
    }
  }

  /** Run [[OnlineEwmaProcessor]] over closed (event_type, bucket_start, x)
    * buckets — streaming or batch. */
  def onlineEwma(bucketCounts: DataFrame, alpha: Double = 0.3,
                 beta: Double = 0.7, spikeFactor: Double = 2.0): Dataset[EwmaSummary] = {
    val spark = bucketCounts.sparkSession
    import spark.implicits._
    bucketCounts
      .selectExpr("CAST(event_type AS STRING) AS event_type",
        "CAST(bucket_start AS TIMESTAMP) AS bucket_start", "CAST(x AS DOUBLE) AS x")
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(new OnlineEwmaProcessor(alpha, beta, spikeFactor),
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

  /** One key's current top-k partners after a micro-batch; `n_seen` is
    * the cumulative (non-NaN) pair count — monotone per key, so the row
    * with the largest n_seen IS the latest state. */
  final case class TopKState(id_a: Long, n_seen: Long, ids: Array[Long],
                             scores: Array[Double])

  /** Streaming twin of [[graft.functions.SimilarityFunctions.topKPerDoc]]
    * (the bounded [[graft.expr.TopKPairsAgg]]): maintain each key's exact
    * top-k (score DESC, id ASC; `ascending` flips the rank direction, NaN
    * scores skipped) as scored pairs ARRIVE — the online view of "this
    * doc's k closest partners" that a continuously-ingesting curation
    * pipeline reads between batch rebuilds. Exact for append-only pair
    * streams: top-k is a monotone fold, so merging each batch's pairs
    * into the retained k suffices — state is ≤ k entries per key, emitted
    * state after ANY prefix of batches equals the batch operator over the
    * union of those batches (the spec's invariant).
    *
    * Scale shape: one shuffle on the key per micro-batch (only keys with
    * new pairs are touched); state-store payload is k (id, score) pairs
    * per key — the same docs × k bound as the batch cap. */
  def runningTopKPartners(pairs: DataFrame, k: Int,
                          ascending: Boolean = false): Dataset[TopKState] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = pairs.sparkSession
    import spark.implicits._
    val sign = if (ascending) -1.0 else 1.0
    val typed = pairs
      .selectExpr("CAST(id_a AS LONG) AS id_a", "CAST(id_b AS LONG) AS id_b",
        "CAST(score AS DOUBLE) AS score")
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[(Double, Long)]), TopKState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (idA, rows, state: GroupState[(Long, Array[(Double, Long)])]) =>
          val (n0, kept0) = state.getOption.getOrElse((0L, Array.empty[(Double, Long)]))
          val buf = new graft.expr.TopKPairsAgg.Buf(k)
          kept0.foreach { case (s, i) => buf.add(s, i) }
          var n = n0
          rows.foreach { case (_, idB, score) =>
            if (!java.lang.Double.isNaN(score)) { buf.add(score * sign, idB); n += 1 }
          }
          buf.compact()
          val kept = Array.tabulate(buf.len)(i => (buf.scores(i), buf.ids(i)))
          state.update((n, kept))
          // `+ 0.0` normalizes the −0.0 the ascending sign-flip can
          // produce, exactly like the batch operator
          Iterator.single(TopKState(idA, n, kept.map(_._2),
            kept.map(p => p._1 * sign + 0.0)))
      }
  }
}
