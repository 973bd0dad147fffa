package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch analog of the reference's
  * file-change debounce/coalesce (reference: watcher/debounce.py:149-260,
  * "quiet period ≥ delay ⇒ emit batch"): events separated by more than
  * `gapSeconds` of quiet start a new session.
  *
  * Implemented with one window partitioned by the session key: a single
  * shuffle on `userCol`, then lag + running-sum inside each partition (no
  * second shuffle — the session-id assignment reuses the same partitioning).
  * At 100 TB the shuffle is unavoidable (grouping is per-key by definition);
  * skewed keys are handled by AQE skew-join/partition splitting.
  */
object Sessionize {

  /** Assigns `session_id` (0-based per user) to each event. `tieCol` breaks
    * ordering ties deterministically (required for exact oracle parity).
    */
  def assignSessions(events0: DataFrame, userCol: String, tsCol: String,
                     tieCol: String, gapSeconds: Long): DataFrame = {
    // Callers hand us externally-loaded frames; a TIMESTAMP_NTZ ts column
    // would fail the cast("double") below, so coerce it — raw long epochs
    // are rejected (ambiguous unit; see Tables.requireTimestamp)
    val events = graft.core.Tables.requireTimestamp(events0, tsCol)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    // cast-to-double keeps fractional seconds (unix_timestamp truncates to
    // whole seconds and diverges from epoch() semantics on sub-second gaps
    // straddling the threshold)
    val isNew = when(
      prevTs.isNull.or(col(tsCol).cast("double") - prevTs.cast("double") > gapSeconds.toDouble),
      lit(1L)).otherwise(lit(0L))
    events
      .withColumn("_new_sess", isNew)
      .withColumn("session_id", sum(col("_new_sess")).over(w) - lit(1L))
      .drop("_new_sess")
  }

  /** Per-session summary: event count and span. */
  def sessionSummaries(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, gapSeconds: Long): DataFrame =
    assignSessions(events, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("sess_start"),
        max(col(tsCol)).as("sess_end")
      )

  /** The same gap semantics over an UNBOUNDED stream: Spark's native
    * `session_window` merges events within `gap` into one growing window
    * per key, and the watermark both bounds the session state and decides
    * when a closed session is final (append mode emits a session only
    * once nothing can extend it). The batch form above answers "what were
    * the sessions"; this one maintains them live.
    */
  def streamingSessions(events: DataFrame, userCol: String, tsCol: String,
                        gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"))
}
