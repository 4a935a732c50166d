package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming aggregates over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no event-time aggregation (SURVEY.md §2.11 notes
  * this); these exist for the training-data-pipeline side of the engine —
  * monitoring ingest throughput and per-type rates over a live stream with
  * the same code in batch (the functions are shape-agnostic: pass a batch
  * DataFrame and they run as plain group-bys).
  */
object EventAggregates {

  /** Watermarks (and the downstream oracle's epoch arithmetic) require
    * TIMESTAMP (LTZ) event time; a caller-provided frame read straight
    * from naive-`timestamp[us]` parquet arrives as TIMESTAMP_NTZ and
    * fails at analysis with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Coerce
    * under the session zone (graft sessions pin UTC) — the streaming-
    * surface twin of [[graft.catalog.Tables.normalizeTimestamps]], for
    * frames that never passed through the Tables layer. */
  private def withEventTime(df: DataFrame, tsCol: String): DataFrame =
    if (df.schema.fields.exists(f => f.name == tsCol &&
      f.dataType == org.apache.spark.sql.types.TimestampNTZType))
      df.withColumn(tsCol, col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
    else df

  /** Tumbling-window counts+sums per event type with a watermark for state
    * eviction. Works on streaming and batch inputs alike. */
  def windowedTypeCounts(events0: DataFrame, windowLen: String = "5 minutes",
                         watermark: String = "10 minutes"): DataFrame = {
    val events = withEventTime(events0, "ts")
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Tumbling-window frequent keys with BOUNDED state: a Misra-Gries
    * summary (≤ k counters) per window instead of one count per distinct
    * key — the shape that survives a key column with web-scale
    * cardinality (domains, tokens, user agents). Emits the window plus a
    * count-descending array of (k, n) candidates; every key with true
    * in-window frequency > N/(k+1) is guaranteed present, counts are
    * lower bounds (exact, and merge-order independent, when k ≥ distinct
    * keys — see [[graft.functions.Sketches.MisraGriesAggregator]]).
    * Streaming and batch inputs run the same aggregation. */
  def windowedHeavyHitters(events0: DataFrame, key: Column, k: Int = 16,
                           windowLen: String = "5 minutes",
                           watermark: String = "10 minutes"): DataFrame = {
    val events = withEventTime(events0, "ts")
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val mg = udaf(new graft.functions.Sketches.MisraGriesAggregator(k))
    src.groupBy(window(col("ts"), windowLen))
      .agg(mg(key.cast("string")).as("hh"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        reverse(array_sort(transform(map_entries(col("hh")),
          e => struct(e.getField("value").as("n"), e.getField("key").as("k")))))
          .as("top"))
  }

  /** Calendar-aligned (month) counts — the batch analogue the reference's
    * period loops produce (ST9): streaming `window()` is NOT calendar
    * aligned, so month grouping uses date_trunc (SURVEY §2.11 ST9 note). */
  def monthlyCounts(events: DataFrame): DataFrame =
    withEventTime(events, "ts")
      .groupBy(date_trunc("month", col("ts")).cast("date").as("month"))
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup (the dedup family × streams): drop duplicate
    * event_ids, keeping state only within the watermark horizon — the
    * training-pipeline guard against at-least-once upstream delivery
    * (e.g. the queue re-enqueues of StreamingRunner). Batch inputs fall
    * back to a plain dropDuplicates. State is bounded: one key per
    * event_id seen within the watermark, evicted as the watermark
    * advances. */
  def dedupEvents(events0: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val events = withEventTime(events0, "ts")
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")
  }

  /** Streaming NEAR-dedup for a document stream: drops any doc whose
    * normalized-text digest (whitespace/case/punct variants) OR 64-bit
    * simhash fingerprint (token-multiset-level near-dups) was already
    * seen within the watermark horizon. Two chained
    * `dropDuplicatesWithinWatermark` stages, one state store each —
    * state is (key → horizon) bounded exactly like [[dedupEvents]].
    * Catch-crawl-duplicates-at-ingest is the streaming half of the
    * batch [[graft.functions.DedupFunctions.dedupNear]] story: the
    * LSH+Jaccard pass still runs batch-side for fuzzy near-dups; this
    * guard stops the (dominant) exact-and-fingerprint duplicates from
    * ever landing. Batch inputs fall back to plain dropDuplicates. */
  def dedupDocsNear(docs0: DataFrame, textCol: String = "text",
                    tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame = {
    val docs = withEventTime(docs0, tsCol)
    val keyed = docs
      .withColumn("__digest", graft.functions.DedupFunctions.exactKey(
        graft.functions.TextFunctions.normalizeForDedup(col(textCol))))
      .withColumn("__simhash", graft.functions.DedupFunctions.simhash64(col(textCol)))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__digest")
          .dropDuplicatesWithinWatermark("__simhash")
      else keyed.dropDuplicates("__digest").dropDuplicates("__simhash")
    deduped.drop("__digest", "__simhash")
  }

  /** Streaming MEDIA dedup — the signature plane × streams: decode each
    * arriving image/audio/video payload scan-side into its 64-bit
    * perceptual signature ([[graft.functions.MultimodalFunctions
    * .mediaSignatures]], a stateless mapPartitions that runs unchanged on
    * a stream) and drop any item whose (modality, signature) was already
    * seen within the watermark horizon. Catches the dominant duplicate
    * classes at ingest — byte re-hosts, re-encodes, gain-scaled audio,
    * brightness-shifted images — because those collide at distance 0;
    * hamming 1..τ near-dups remain the batch/index side's job
    * ([[dedupMediaAgainstIndex]] per micro-batch, or the nightly
    * [[graft.functions.DedupFunctions.neardupPairsByHamming64]] sweep).
    * State = one (modality, sig) key per horizon, evicted by watermark —
    * so dropping a duplicate is GUARANTEED when the twin arrives within
    * the watermark delay of the original and best-effort beyond it
    * (the standard dropDuplicatesWithinWatermark contract; size the
    * delay to the re-post horizon you care about). Batch inputs fall
    * back to plain dropDuplicates. Returns (idCol, modality, sig, tsCol)
    * survivors. */
  def dedupMediaStream(media0: DataFrame, idCol: String = "media_id",
                       modalityCol: String = "modality",
                       contentCol: String = "content", tsCol: String = "ts",
                       watermark: String = "10 minutes"): DataFrame = {
    val media = withEventTime(media0, tsCol)
    val spark = media.sparkSession
    import spark.implicits._
    // ts rides THROUGH the stateless kernel (a post-hoc re-join of sig
    // rows to their timestamps would be a stream-stream self-join —
    // unbounded state); the kernel itself is the same signatureOf
    // dispatch as the batch mediaSignatures
    val sigs = media
      .select(col(idCol).cast("long"), col(modalityCol), col(contentCol),
        col(tsCol).cast("timestamp"))
      .as[(Long, String, Array[Byte], java.sql.Timestamp)]
      .mapPartitions(_.flatMap { case (id, modality, bytes, ts) =>
        graft.functions.MultimodalFunctions.signatureOf(modality, bytes)
          .map(s => (id, modality, s, ts))
      })
      .toDF(idCol, modalityCol, "sig", tsCol)
    if (media.isStreaming)
      sigs.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(modalityCol, "sig")
    else sigs.dropDuplicates(modalityCol, "sig")
  }

  /** One micro-batch of the INCREMENTAL media-dedup loop (the
    * `foreachBatch` body for hamming-τ near-dup semantics): probe the
    * batch's signatures against the persisted hamming index
    * ([[graft.functions.DedupFunctions.probeHammingIndex]] — broadcast
    * probe, index side never exchanges), drop every item within
    * `maxDistance` of an already-indexed one AND batch-internal
    * near-dups (keep-first by id), then append the survivors so the next
    * batch sees them. Returns the surviving (modality, id, sig) rows. */
  def dedupMediaAgainstIndex(batch: DataFrame, indexPath: String,
                             sigCol: String = "sig", idCol: String = "id",
                             partitionCols: Seq[String] = Seq("modality"),
                             bands: Int = 8, maxDistance: Int = 4): DataFrame = {
    val D = graft.functions.DedupFunctions
    val hits = D.probeHammingIndex(batch.sparkSession, indexPath, batch,
        sigCol, idCol, partitionCols, bands, maxDistance)
      .select(col("id_new").as(idCol)).distinct()
    val afterIndex = batch.join(hits, Seq(idCol), "left_anti")
    val internal = D.neardupPairsByHamming64(afterIndex, sigCol, idCol,
      partitionCols, bands, maxDistance)
    val survivors = D.dropByPairGraph(afterIndex, idCol, internal)
      .localCheckpoint(true)
    D.appendToHammingIndex(survivors, sigCol, idCol, indexPath,
      partitionCols, bands)
    survivors
  }

  /** Stream-static enrichment: attach dimension attributes to a live event
    * stream. The dimension side is a plain batch DataFrame — Spark re-reads
    * it per micro-batch (picking up slowly-changing updates) and broadcasts
    * it, so the stream side never shuffles. Works identically on a batch
    * `events` input. */
  def enrichEvents(events: DataFrame, dim: DataFrame,
                   eventKey: String, dimKey: String): DataFrame =
    // side-qualified columns: col(eventKey) would be AMBIGUOUS_REFERENCE
    // whenever the dim carries a same-named key (the common case)
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")

  /** Stream-stream correlation join: pair each left event with the right
    * events of the same `key` whose timestamp falls within the trailing
    * `gapSeconds` window (r.ts ∈ [l.ts − gap, l.ts]) — e.g. purchases with
    * the errors that preceded them. Both sides carry watermarks, and the
    * two-sided time constraint lets Spark bound the join state and evict
    * buffered rows as the watermark advances — without it, stream-stream
    * join state grows forever. Columns are prefixed l_/r_ to keep the pair
    * schema explicit. Batch inputs run the same join unwatermarked. */
  def correlateWithin(lhs: DataFrame, rhs: DataFrame, key: String,
                      gapSeconds: Long,
                      watermark: String = "30 minutes",
                      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    def side(df0: DataFrame, p: String) = {
      val df = withEventTime(df0, tsCol)
      val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
      wm.select(col(key).as(s"${p}_key"), col(tsCol).as(s"${p}_ts"),
        col(idCol).as(s"${p}_id"))
    }
    val l = side(lhs, "l")
    val r = side(rhs, "r")
    l.join(r, col("l_key") === col("r_key") &&
      col("r_ts") >= col("l_ts") - expr(s"interval $gapSeconds seconds") &&
      col("r_ts") <= col("l_ts"))
  }

  /** Sessionization: gap-based sessions per user via session_window —
    * the stateful-grouping capability (mapGroupsWithState class) expressed
    * with the built-in session window. */
  def userSessions(events0: DataFrame, gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val events = withEventTime(events0, "ts")
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
  }
}
