package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample autocorrelation of a regular integer-keyed series (daily
  * counts, hourly volumes) and the Ljung-Box portmanteau test over the
  * first L lags — the "is this series white noise" read that gates
  * seasonality modeling (q197) and drift alarms (q226/q252).
  *
  * Numeric discipline: the per-lag sufficient statistics (Σxy, Σx on
  * each side of the pair, pair count) are exact integer sums from an
  * integer-key equi-join of the value grid with itself at key+lag —
  * never a corpus-sized float sum. The ACF ratio is one float formula
  * per LAG over those integers, with every product cast to double
  * before multiplying (n·Σx² style cross-terms overflow a long on a
  * 100 TB feed long before they trouble a double's exponent). Ljung-Box
  * folds the ROUNDED r_l² terms on the ordered bounded lag grid.
  */
object Autocorr {

  /** One row per lag 1..maxLag: `lag`, `n_pairs`, `r` (6 dp, sign-pinned).
    * Uses the standard fixed-mean estimator: r_L = Σ(x_t−x̄)(x_{t+L}−x̄)
    * / Σ(x−x̄)² with x̄ the GLOBAL mean, denominator over the full grid.
    */
  def acf(grid: DataFrame, keyCol: String, valCol: String,
          maxLag: Int): DataFrame = {
    val g = grid.select(col(keyCol).cast("long").as("day"),
      col(valCol).cast("long").as("x"))
    val tot = g.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val lags = tot.select(col("n"), col("sx"), col("sxx"),
      explode(sequence(lit(1), lit(maxLag))).as("lag"))
    val pairs = g.as("a").crossJoin(broadcast(lags))
      .join(g.as("b"), col("b.day") === col("a.day") + col("lag"))
      .groupBy(col("lag"), col("n"), col("sx"), col("sxx"))
      .agg(count(lit(1)).as("np"),
        sum(col("a.x") * col("b.x")).as("sxy"),
        sum(col("a.x")).as("s1"),
        sum(col("b.x")).as("s2"))
    pairs.select(col("lag").cast("long").as("lag"), col("np").as("n_pairs"),
      when(col("sxx").cast("double") * col("n") * col("n")
          - col("sx").cast("double") * col("sx") * col("n") > 0,
        round((col("sxy").cast("double") * col("n") * col("n")
            - col("sx").cast("double") * col("n") * (col("s1") + col("s2"))
            + col("np").cast("double") * col("sx") * col("sx"))
          / (col("sxx").cast("double") * col("n") * col("n")
            - col("sx").cast("double") * col("sx") * col("n")), 6)
          + lit(0.0)).as("r"))
      .orderBy(col("lag"))
  }

  /** Ljung-Box Q over lags 1..maxLag of [[acf]]: Q = n(n+2) Σ r_l²/(n−l),
    * folded from the ROUNDED r_l on the ordered bounded lag grid (the
    * q240 rounded-selection rule — both engines square identical 6 dp
    * values). `crit` is the caller-supplied χ²(maxLag) cutoff literal.
    */
  def ljungBox(grid: DataFrame, keyCol: String, valCol: String,
               maxLag: Int, crit: Double): DataFrame = {
    val g = grid.select(col(keyCol).cast("long").as("day"),
      col(valCol).cast("long").as("x"))
    val n1 = g.agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = acf(grid, keyCol, valCol, maxLag)
      .crossJoin(broadcast(n1))
      .withColumn("qacc", sum(
        col("r") * col("r") / (col("n") - col("lag"))).over(w))
    acc.orderBy(col("lag").desc).limit(1)
      .select(col("n"), col("lag").as("max_lag"),
        round(col("n").cast("double") * (col("n") + 2) * col("qacc"), 6)
          .as("q_lb"),
        lit(crit).as("crit"),
        (round(col("n").cast("double") * (col("n") + 2) * col("qacc"), 6)
          > lit(crit)).as("reject_white_noise"))
  }

  /** Durbin-Watson statistic over the ordered series: DW =
    * n·Σ(Δx)² / (n·Σx² − (Σx)²) — the demeaning cancels inside Δ, so
    * EVERY sufficient statistic is an exact integer (one lag pass on
    * the ordered bounded grid + plain integer aggs); the cross-terms
    * are cast to double before multiplying. DW ≈ 2 for white noise,
    * → 0 under positive serial correlation, → 4 under negative: the
    * one-number companion to [[acf]]'s per-lag view.
    */
  def durbinWatson(grid: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val g = grid.select(col(keyCol).cast("long").as("day"),
      col(valCol).cast("long").as("x"))
    val w = Window.orderBy(col("day"))
    val sums = g
      .withColumn("dx", col("x") - lag(col("x"), 1).over(w))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("dx") * col("dx")).as("sdd")) // first row's NULL dx drops out
    sums.select(col("n"),
      col("sdd").as("sum_sq_diff"),
      when(col("sxx").cast("double") * col("n")
          - col("sx").cast("double") * col("sx") > 0,
        round(col("sdd").cast("double") * col("n")
          / (col("sxx").cast("double") * col("n")
            - col("sx").cast("double") * col("sx")), 6)).as("dw"))
  }

  /** Wald-Wolfowitz runs test for randomness: classify each grid point
    * above/below the global type-7 median (ties drop out), count the
    * maximal same-sign runs with one lag pass over the ordered bounded
    * grid, and z-test R against its exact null moments. The complement
    * of [[acf]]: ACF sees linear dependence, the runs test sees ANY
    * sign-pattern structure. All sufficient statistics (n₁, n₂, R, the
    * variance's integer numerator/denominator) are exact integers.
    */
  def runsTest(grid: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val g = grid.select(col(keyCol).cast("long").as("day"),
      col(valCol).cast("long").as("x"))
    val med = g.agg(expr("percentile(x, 0.5)").as("median"))
    val signed = g.crossJoin(broadcast(med))
      .select(col("day"),
        when(col("x") > col("median"), 1L)
          .when(col("x") < col("median"), -1L).otherwise(0L).as("s"))
      .filter(col("s") =!= 0)
    val w = Window.orderBy(col("day"))
    val runs = signed
      .withColumn("newrun",
        when(lag(col("s"), 1).over(w).isNull
          || lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
      .agg(sum(when(col("s") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("s") === -1, 1L).otherwise(0L)).as("n2"),
        sum(col("newrun")).as("r"))
    runs.crossJoin(broadcast(med))
      .withColumn("m", col("n1") + col("n2"))
      .withColumn("var_num",
        lit(2L) * col("n1") * col("n2")
          * (lit(2L) * col("n1") * col("n2") - col("n1") - col("n2")))
      .withColumn("var_den",
        col("m") * col("m") * (col("m") - 1))
      .select(col("n1"), col("n2"), col("r"), col("median"),
        when(col("m") > 0,
          round(lit(1.0) + lit(2.0) * col("n1") * col("n2") / col("m"), 6))
          .as("e_r"),
        when(col("var_num") > 0,
          round((col("r") - (lit(1.0) + lit(2.0) * col("n1") * col("n2")
              / col("m")))
            / sqrt(col("var_num").cast("double") / col("var_den")), 6)
            + lit(0.0)).as("z"))
  }
}
