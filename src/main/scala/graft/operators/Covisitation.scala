package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session co-visitation mining — the classic recommender/association
  * signal ("items seen together in one session"), the building block of
  * co-visitation matrices: gap-sessionize each user's event stream, dedup
  * items within a session, count sessions per unordered item pair.
  *
  * Scale shape: the sessionize window partitions by user (bounded
  * per-user history); the pair build self-joins the per-session DISTINCT
  * item set on the session id, so fan-out is bounded by session size² —
  * session length is capped by the gap rule, never corpus-sized. The
  * pair table partial-aggregates before the final top-k
  * (TakeOrderedAndProject).
  */
object Covisitation {

  /** The per-session DISTINCT item sets — (sid, item) — shared by the
    * pair miner below and the association-rule statistics
    * ([[AssociationRules]]).
    */
  def sessionItems(events: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, itemCol: String, gapSec: Long): DataFrame = {
    val ts = graft.core.Tables.requireTimestamp(events, tsCol)
    val secs = (unix_micros(col(tsCol)) / 1000000L).cast("long")
    val w = Window.partitionBy(col(userCol)).orderBy(col("s"), col(tieCol))
    ts
      .select(col(userCol), col(tieCol), col(itemCol).as("item"), secs.as("s"))
      .withColumn("prev", lag(col("s"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("s") - col("prev") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("sess_no",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(concat_ws("#", col(userCol), col("sess_no")).as("sid"), col("item"))
      .distinct()
  }

  /** Top-k item pairs by distinct-session support. Output: `item_a` <
    * `item_b`, `n_sessions`.
    */
  def topPairs(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, itemCol: String,
               gapSec: Long, k: Int): DataFrame = {
    val sess = sessionItems(events, userCol, tsCol, tieCol, itemCol, gapSec)
    sess.as("a").join(sess.as("b"),
        col("a.sid") === col("b.sid") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("item_a"), col("item_b"))
      .limit(k)
  }
}
