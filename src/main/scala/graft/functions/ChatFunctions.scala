package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Assembling interaction logs into chat-style training conversations —
  * the conversion step between raw event streams and supervised chat
  * corpora (sessionize → order turns → render a role-tagged transcript →
  * truncate to a context budget).
  *
  * Scale shape: ONE user-keyed exchange carries the whole operator — the
  * sessionization window, the running-token window, and the final
  * per-session aggregate all share the `user_id` partitioning, so at
  * 100 TB the operator is a single shuffle of the event stream. Aggregate
  * state per session is bounded by the TOKEN BUDGET, not the session
  * length: turns past the budget contribute only to the counters, never
  * to the collected transcript, so a pathological million-event session
  * cannot blow executor memory.
  *
  * Reference anchor: the reference's activity history assembles per-scene
  * task chains ordered by start date (bdc_collection_builder/celery/
  * tasks.py:130–391); the chat rendering generalizes that "ordered
  * per-key log → one document" shape to training-data export.
  */
object ChatFunctions {

  /** Default role mapping: read-side event types become the user turn,
    * everything else the assistant turn. */
  def defaultRole(eventType: Column): Column =
    when(eventType.isin("view", "click"), lit("user")).otherwise(lit("assistant"))

  /** Sessionize `events` (gap rule: a pause > `gapMicros` starts a new
    * session, the q48 convention) and render each session as a chat
    * transcript truncated to `tokenBudget` whitespace tokens.
    *
    * Output per (user_id, session_id): `n_turns` (all turns), `n_kept`
    * (turns whose RUNNING token total fits the budget — prefix
    * truncation, the convention context-window packing uses), `tokens_kept`,
    * and `transcript` = kept turns as `role: event_type props` lines
    * joined with '\n' in (ts, event_id) order.
    */
  def assembleConversations(
      events: DataFrame,
      gapMicros: Long = 600000000L,
      tokenBudget: Int = 24,
      role: Column => Column = defaultRole): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser) > gapMicros, 1)
      .otherwise(0)
    // props is coalesced to '' (NOT skipped): concat_ws would silently
    // drop a NULL props while a '||' replay nulls the whole line — the
    // explicit empty pins ONE cross-engine behavior (trailing space and
    // all) for null-props events
    val line = concat_ws(" ",
      concat(role(col("event_type")), lit(":")), col("event_type"),
      coalesce(col("props"), lit("")))
    val withSession = events
      .withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s")).over(byUser).cast("int"))
      .withColumn("line", line)
      .withColumn("turn_tokens", TextFunctions.tokenCount(col("line")))
    val bySession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSession
      .withColumn("running", sum(col("turn_tokens")).over(bySession))
      .withColumn("kept", col("running") <= tokenBudget)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("kept"), col("turn_tokens").cast("long"))), lit(0L))
          .as("tokens_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("ts"), col("event_id"), col("line"))))),
            t => t.getField("line")),
          "\n").as("transcript"))
  }
}
