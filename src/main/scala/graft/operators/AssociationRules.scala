package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over session baskets (Agrawal & Srikant's
  * a-priori statistics at the 2-itemset level): for item pairs seen in
  * the same session, emit DIRECTED rules a→b with support, confidence
  * `P(b|a)` and lift `P(ab)/(P(a)P(b))` — the recommender/merchandising
  * staple one level up from raw co-visitation counts (q182).
  *
  * Scale shape: the basket build is [[Covisitation.sessionItems]]
  * (per-user windows, per-session distinct); supports are partial-agg
  * counts; the pair self-join keys on the session id with fan-out
  * bounded by session size²; item supports join back BY ITEM (two
  * broadcast-sized joins at any realistic item-vocabulary), and the
  * 1-row session total broadcasts. Confidence/lift are one float
  * formula over exact integer counts at the output edge.
  */
object AssociationRules {

  /** Directed rules with ≥ `minSupport` co-sessions, top-`k` by lift
    * (ties: confidence desc, antecedent, consequent). Output:
    * (antecedent, consequent, n_ab, n_a, n_b, n_total, confidence, lift),
    * floats rounded to 6 dp.
    */
  def rules(events: DataFrame, userCol: String, tsCol: String,
            tieCol: String, itemCol: String, gapSec: Long,
            minSupport: Long, k: Int): DataFrame = {
    val sess = Covisitation.sessionItems(events, userCol, tsCol, tieCol,
      itemCol, gapSec).localCheckpoint(false) // lazy (r13)
    val itemSupp = sess.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val total = sess.select(col("sid")).distinct()
      .agg(count(lit(1)).as("n_total")) // 1 row
    val pairs = sess.as("a").join(sess.as("b"),
        col("a.sid") === col("b.sid") && col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("antecedent"), col("b.item").as("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemSupp.select(col("item").as("antecedent"), col("n_item").as("n_a")),
        Seq("antecedent"))
      .join(itemSupp.select(col("item").as("consequent"), col("n_item").as("n_b")),
        Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"),
        col("n_ab"), col("n_a"), col("n_b"), col("n_total"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("n_ab").cast("double") * col("n_total")
          / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("confidence").desc,
        col("antecedent"), col("consequent"))
      .limit(k)
  }
}
