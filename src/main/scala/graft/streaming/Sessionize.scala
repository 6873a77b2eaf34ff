package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming (SURVEY §2.12) — this is the forward-
  * looking extension: the same sessionization semantics expressed twice,
  *   - batch: gaps-and-islands with window functions (deterministic,
  *     oracle-checkable),
  *   - streaming: `session_window` over `readStream` with a watermark
  *     (state-store backed, late-data tolerant).
  * Both shuffle once on user_id. */
object Sessionize {

  /** Batch sessionization: a session breaks after `gapMinutes` of
    * inactivity per user. Returns one row per session with bounds and
    * counts. `session_end` is the LAST EVENT time (max ts) — the
    * streaming form's `last_event` column; its `session_end` is the
    * half-open window end (last event + gap, Spark's session_window
    * definition). Compare the two forms on (start, last event, counts). */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
               userCol: String = "user_id", tsCol: String = "ts",
               valueCol: String = "value"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    // microsecond precision so the gap test is exact (and engine-portable),
    // not truncated to seconds. The boundary uses >= to match Spark's
    // session_window semantics exactly: a session window is
    // [start, last + gap) — half-open — so an event arriving at EXACTLY
    // last + gap starts a new session. Keeping both formulations identical
    // is what makes the batch ≡ streaming equivalence hold everywhere,
    // including the boundary (pinned by the evt_session_window oracle and
    // SessionizeSpec's boundary test).
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("__new_session")).over(byUser))
      .groupBy(col(userCol), col("session_no"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
  }

  /** Per-user session counts (the compact oracle-friendly shape). */
  def sessionCounts(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessions(events, gapMinutes)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("n_events")).as("n_events"))

  /** Streaming sessionization: the same session MEMBERSHIP as [[sessions]]
    * via the built-in session_window with watermark-based state eviction.
    * Column semantics differ by definition on the end bound:
    * `session_end` here is the half-open WINDOW end (last event + gap —
    * Spark's session_window contract), while the batch form's
    * `session_end` is the last event itself; `last_event` (max ts) is
    * emitted too and equals the batch column exactly — compare the forms
    * on (start, last_event, counts). Feed with `spark.readStream` and
    * finish with `writeStream` + a mode of `update`/`append`; state lives
    * in the state store keyed by (user_id, session window). */
  def streamingSessions(events: DataFrame, gapMinutes: Int = 30,
                        watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"),
        max(col("ts")).as("last_event"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("last_event"),
        col("n_events"), col("total_value"))

  /** Tumbling-window event rates (the standard streaming agg; batch-callable
    * for tests/oracle). */
  def windowedCounts(events: DataFrame, windowExpr: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 6).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
}
