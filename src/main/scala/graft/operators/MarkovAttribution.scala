package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain channel attribution (Anderl et al. 2014's removal-effect
  * formulation): model user journeys as a first-order chain over event
  * types, absorb at the first conversion, and credit each channel by how
  * much total conversion probability disappears when transitions into it
  * are redirected to the null sink — the data-driven alternative to
  * last-touch attribution.
  *
  * Scale shape: ONE distributed pass builds the journey transitions (a
  * per-user lag window — bounded by a user's history — plus a partial-agg
  * count rollup); everything after operates on the transition MATRIX,
  * which is ≤ (|event types|+3)² rows regardless of corpus size — the
  * bounded-driver-materialization class (k-means centroids, bloom words).
  * The chain is solved by `iters` fixed mass-propagation rounds with
  * absorbing self-loops, summed in sorted state order so the fold is
  * deterministic; the oracle unrolls the same recurrence.
  */
object MarkovAttribution {

  val Start = "START"
  val Conv = "CONV"
  val Null = "NULL"

  /** Journey transition counts: START → events (in (ts, id) order,
    * truncated at the user's FIRST `convType` event, which maps to CONV)
    * → NULL if the journey ends unconverted. Output: (src, dst, n).
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val ranked = events
      .withColumn("_rn", row_number().over(w))
      .withColumn("_cvrn", min(when(col(typeCol) === convType, col("_rn"))).over(
        Window.partitionBy(col(userCol))))
    val kept = ranked
      .filter(col("_cvrn").isNull || col("_rn") <= col("_cvrn"))
      .withColumn("_state",
        when(col("_rn") === col("_cvrn"), lit(Conv)).otherwise(col(typeCol)))
    val steps = kept
      .withColumn("_prev", lag(col("_state"), 1, Start).over(w))
      .select(col("_prev").as("src"), col("_state").as("dst"))
    // unconverted journeys: last state → NULL
    val tails = kept
      .withColumn("_last", max(col("_rn")).over(Window.partitionBy(col(userCol))))
      .filter(col("_cvrn").isNull && col("_rn") === col("_last"))
      .select(col("_state").as("src"), lit(Null).as("dst"))
    steps.unionByName(tails).groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** Absorbing-chain conversion probability after `iters` propagation
    * rounds from START, with CONV/NULL self-looping. `probs` maps
    * (src, dst) → p; summation runs in sorted (src, dst) order so the
    * float fold is reproducible.
    */
  private def converge(probs: Map[(String, String), Double], iters: Int): Double = {
    val states = (probs.keysIterator.flatMap(k => Iterator(k._1, k._2)).toSet
      + Conv + Null).toSeq.sorted
    var mass = states.map(s => s -> (if (s == Start) 1.0 else 0.0)).toMap
    for (_ <- 1 to iters) {
      mass = states.map { dst =>
        val selfLoop = dst == Conv || dst == Null
        dst -> states.iterator.map { src =>
          val p = probs.getOrElse((src, dst),
            if (selfLoop && src == dst) 1.0 else 0.0)
          mass(src) * p
        }.sum
      }.toMap
    }
    mass(Conv)
  }

  /** Removal effects: for each non-conversion channel, redirect all
    * transitions INTO it to NULL, re-solve, and report
    * `(base − removed) / base`. Output rows: (channel, p_conv, p_removed,
    * removal_effect), all rounded to 6 dp, ordered by channel.
    */
  def removalEffects(spark: SparkSession, trans: DataFrame, iters: Int = 12): DataFrame = {
    // bounded collect: the transition matrix of a ≤K-state chain
    val rows = trans.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val totals = rows.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val probs = rows.map { case (s, d, n) => (s, d) -> n.toDouble / totals(s) }.toMap
    val base = converge(probs, iters)
    val channels = rows.iterator.flatMap(r => Iterator(r._1, r._2))
      .filter(s => s != Start && s != Conv && s != Null).toSet.toSeq.sorted
    import spark.implicits._
    channels.map { ch =>
      // redirect dst==ch to NULL (merge with any existing →NULL mass)
      val removed = probs.toSeq
        .map { case ((s, d), p) => ((s, if (d == ch) Null else d), p) }
        .groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).sum }
      val pRemoved = converge(removed.filter { case ((s, _), _) => s != ch }, iters)
      (ch, round6(base), round6(pRemoved),
        round6(if (base == 0.0) 0.0 else (base - pRemoved) / base))
    }.toDF("channel", "p_conv", "p_removed", "removal_effect")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
