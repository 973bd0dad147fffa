package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the DataFrame API lacks as primitives, composed from
  * window functions and bucketed equi-joins so they stay single-shuffle at
  * 100 TB (no range-probe nested loop, no crossJoin anywhere).
  *
  * Neither operator exists in the reference (its only temporal logic is the
  * watcher debounce); they are part of the LLM-data-pipeline extension
  * surface — event-stream feature engineering ("state as of time t",
  * "activity inside a window") next to the sessionization in q9.
  */
object TemporalJoins {

  /** AS-OF JOIN: attach to each left row the MOST RECENT right row with the
    * same `key` and `rightTs` <= `leftTs` (the standard time-series join —
    * e.g. the latest price quote at order time).
    *
    * Shape: tagged union of both sides + ONE window pass
    * (`last(..., ignoreNulls)` over rows-unbounded-preceding), so the cost
    * is a single shuffle on `key` and a per-key sort — the same cost class
    * as the q9 sessionization window, independent of how many right rows
    * precede each left row (a range join would re-scan them per left row).
    *
    * Right rows sharing (key, ts) are resolved by the LARGEST `rightId`
    * (the window tie-break), which also names the matched row in the
    * output. Left columns pass through; the match arrives as
    * `asof_<rightId>` + `asof_ts`.
    */
  def asof(left0: DataFrame, right0: DataFrame, key: String,
           leftTs: String, rightTs: String, rightId: String): DataFrame = {
    // Normalize first: a TIMESTAMP_NTZ side would make the tagged union's
    // _ts columns type-mismatch (and sort semantics ambiguous).
    val left = graft.core.Tables.requireTimestamp(left0, leftTs)
    val right = graft.core.Tables.requireTimestamp(right0, rightTs)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
      .withColumn("_rid", lit(null).cast("long"))
    val r = right.select(
      Seq(col(key), col(rightTs).as("_ts"), lit(0).as("_tag"),
        col(rightId).cast("long").as("_rid")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right-before-left at equal ts (_tag 0 < 1) gives <= semantics; _rid
    // asc puts the largest right id last among equal-(key, ts) right rows,
    // so `last` resolves ties to it
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_tag").asc, col("_rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(r.columns.map(col): _*).unionByName(r)
      // both lasts in ONE select: chained withColumn would plan two Window
      // nodes (same shuffle, but two passes over the sorted partition)
      .select(col("*"),
        last(when(col("_tag") === 0, col("_rid")), ignoreNulls = true).over(w).as("_m_rid"),
        last(when(col("_tag") === 0, col("_ts")), ignoreNulls = true).over(w).as("_m_ts"))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) :+
        col("_m_rid").as(s"asof_$rightId") :+ col("_m_ts").as("asof_ts"): _*)
  }

  /** RANGE JOIN (interval × point) via time bucketing: for each left row,
    * aggregate the right rows with the same `key` whose `rightTs` falls in
    * `[leftTs, leftTs + windowUs)`.
    *
    * Scale shape: each point lands in exactly ONE bucket of width
    * `windowUs`; each interval overlaps at most TWO buckets (its length
    * equals the bucket width), so the candidate join is a plain equi-join
    * on (key, bucket) with fan-out <= 2 — the standard bucketed range-join
    * rewrite that replaces an unbounded theta-join. The exact `[t, t+w)`
    * predicate filters candidates after the join.
    *
    * Returns the left rows + `n_in_window` (0 when nothing matched).
    */
  def countInWindow(left0: DataFrame, right0: DataFrame, key: String, leftId: String,
                    leftTs: String, rightTs: String, windowUs: Long): DataFrame = {
    // unix_micros below requires TimestampType; NTZ casts exactly, raw longs
    // are rejected (ambiguous epoch unit — see Tables.requireTimestamp).
    val left = graft.core.Tables.requireTimestamp(left0, leftTs)
    val right = graft.core.Tables.requireTimestamp(right0, rightTs)
    // candidates group and join back on (key, leftId, ts) — NOT leftId alone —
    // so a leftId reused across keys or timestamps neither merges counts nor
    // fans out. Exact full-duplicate left rows remain ambiguous: each copy
    // enters the candidate join, so both carry the summed count.
    val lKeyed = left.withColumn("_lus", unix_micros(col(leftTs)))
    val lb = lKeyed
      .withColumn("_b", explode(array(floor(col("_lus") / windowUs),
        floor(col("_lus") / windowUs) + 1)))
    val rb = right.select(col(key), unix_micros(col(rightTs)).as("_rus"))
      .withColumn("_b", floor(col("_rus") / windowUs))
    val counts = lb.select(col(key), col(leftId), col("_lus"), col("_b"))
      .join(rb, Seq(key, "_b"))
      .filter(col("_rus") >= col("_lus") && col("_rus") < col("_lus") + windowUs)
      .groupBy(col(key), col(leftId), col("_lus")).agg(count(lit(1)).as("n_in_window"))
    lKeyed.join(counts, Seq(key, leftId, "_lus"), "left")
      .withColumn("n_in_window", coalesce(col("n_in_window"), lit(0L)))
      .drop("_lus")
  }
}
