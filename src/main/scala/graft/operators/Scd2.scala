package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder: compress an append-only change
  * log into one row per (key, consecutive-state run) with half-open
  * `[valid_from, valid_to)` validity, a per-key version number, and an
  * `is_current` flag on the open run — the standard warehouse shape for
  * "what was this entity's state at time t" point-in-time joins (the
  * static counterpart of the q122 snapshot diff, which compares two
  * snapshots; this derives ALL versions from the full log).
  *
  * Scale: both window passes partition by the dimension key, so state per
  * task is one entity's history — bounded, never a global sort. The lag
  * dedup (drop rows whose state equals the previous row's) runs FIRST, so
  * the lead/version pass only sees change points: for a log where most
  * events repeat the current state (the common case for dimension feeds)
  * the second shuffle carries a small fraction of the input. An entity
  * with a pathologically long history is still one partition — at 100 TB
  * that is the SCD2 contract itself (versions of one key must be ordered
  * together), not an implementation choice.
  */
object Scd2 {

  /** Build the SCD2 table. Output columns: `keyCol`, `stateCol`,
    * `valid_from`/`valid_to` (the `tsCol` type; `valid_to` null on the
    * current run), `version` (1-based per key), `is_current`.
    *
    * `tieCol` breaks equal-timestamp ordering deterministically (a raw
    * event-id / offset column); ties in `tsCol` are real in any feed that
    * timestamps at second granularity.
    */
  def build(log: DataFrame, keyCol: String, stateCol: String,
            tsCol: String, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = log
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      .withColumn("_prev", lag(col(stateCol), 1).over(ord))
      .filter(col("_prev").isNull || col("_prev") =!= col(stateCol))
      .drop("_prev")

    changes
      .withColumn("version", row_number().over(ord).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(ord))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("version"), col("is_current"))
  }
}
