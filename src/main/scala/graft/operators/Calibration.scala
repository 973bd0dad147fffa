package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reliability-diagram binning + Brier decomposition for a probabilistic
  * binary classifier (Murphy 1973; the standard calibration audit): bucket
  * predictions by predicted probability, compare mean predicted
  * probability to the empirical positive rate per bucket. A filter model
  * whose 0.9-bin is only 60% positive is miscalibrated — its threshold
  * sweeps admit different data than its scores claim.
  *
  * Probabilities are 6dp-rounded BEFORE binning so the bin edge
  * comparison is on a value both engines agree on exactly (a raw σ(w·x)
  * double at a bin edge could land either side across engines). The
  * positive-rate column is integer/integer; mean-prediction and the Brier
  * sum are float partial aggs rounded at 6dp (the q95 discipline). One
  * shuffle: the per-bin partial agg.
  */
object Calibration {

  /** Per-bin report: `bin` ∈ [0, bins), `n`, `n_pos`, `mean_pred`,
    * `frac_pos`, `brier_sum` (Σ(p−y)² within the bin).
    */
  def report(scored: DataFrame, probCol: String, labelCol: String,
             bins: Int = 10): DataFrame = {
    val d = scored.select(
      round(col(probCol), 6).as("p"),
      col(labelCol).cast("double").as("y"))
    d.withColumn("bin",
        least(floor(col("p") * bins), lit(bins - 1)).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        round(avg(col("p")), 6).as("mean_pred"),
        round(sum(col("y")) / count(lit(1)), 6).as("frac_pos"),
        round(sum(pow(col("p") - col("y"), 2)), 6).as("brier_sum"))
  }

  /** Isotonic (monotone non-decreasing) calibration of the binned
    * reliability curve via the PAV minimax identity (Ayer et al. 1955;
    * Zadrozny-Elkan 2002 use it exactly this way for classifier
    * calibration): iso_i = max_{j≤i} min_{k≥i} mean(y over bins j..k).
    * Pool-adjacent-violators is a sequential stack algorithm, but over
    * the BOUNDED bin grid the closed minimax form is a pair of bounded
    * joins instead: segment means come from integer prefix sums over
    * ≤ b(b+1)/2 (j,k) cells, min-over-k then max-over-j are two grid
    * aggs. Nothing scales with the corpus — the corpus was already
    * reduced by the one binning agg; division happens at the edge.
    */
  def isotonicBins(scored: DataFrame, probCol: String, labelCol: String,
                   bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = report(scored, probCol, labelCol, bins)
      .select(col("bin"), col("n"), col("n_pos"), col("frac_pos"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = base.select(col("bin"), col("n"), col("n_pos"), col("frac_pos"),
      sum(col("n")).over(w).as("cn"), sum(col("n_pos")).over(w).as("cp"))
    // segment (j, k): mean = (cp_k - cp_{j-1}) / (cn_k - cn_{j-1})
    val segs = pre.select(col("bin").as("j"), col("cn").as("cnj"), col("cp").as("cpj"),
        col("n").as("nj"), col("n_pos").as("pj"))
      .join(pre.select(col("bin").as("k"), col("cn").as("cnk"), col("cp").as("cpk")),
        col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cpk") - col("cpj") + col("pj")).cast("double")
          / (col("cnk") - col("cnj") + col("nj"))).as("seg_mean"))
    val is = base.select(col("bin").as("i"))
    val minOverK = is.join(segs, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("seg_mean")).as("m"))
    val iso = minOverK.groupBy(col("i").as("bin"))
      .agg(round(max(col("m")), 6).as("iso"))
    base.join(iso, Seq("bin"))
      .select(col("bin"), col("n"), col("n_pos"), col("frac_pos"), col("iso"))
  }

  /** Murphy (1973) decomposition of the Brier score over the same bins:
    * reliability REL = Σ n_b(p̄_b − ȳ_b)²/N (want small), resolution
    * RES = Σ n_b(ȳ_b − ȳ)²/N (want large), uncertainty UNC = ȳ(1 − ȳ).
    * One corpus binning agg + one bounded agg over the b bins. With
    * CONTINUOUS forecasts the textbook identity gains two exact terms:
    * brier = REL − RES + UNC + within_bin_var − 2·within_bin_cov
    * (the within-bin variance of p and the within-bin p,y covariance,
    * both zero for binned forecasts); both are emitted so the ledger
    * closes to float exactness — CalibrationSpec asserts it.
    */
  def brierDecomposition(scored: DataFrame, probCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    val d = scored.select(round(col(probCol), 6).as("p"),
      col(labelCol).cast("double").as("y"))
    val b = d.withColumn("bin",
        least(floor(col("p") * bins), lit(bins - 1)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"), sum(col("p")).as("sp"),
        sum(col("p") * col("p")).as("spp"),
        sum(col("p") * col("y")).as("spy"),
        sum(pow(col("p") - col("y"), 2)).as("bsum"))
    b.agg(sum(col("n")).as("nn"), sum(col("sy")).as("ssy"),
        sum(col("bsum")).as("brier_total"),
        // Σ n_b (p̄_b − ȳ_b)²  =  Σ (sp² − 2·sp·sy + sy²)/n_b
        sum((col("sp") * col("sp") - lit(2.0) * col("sp") * col("sy")
          + col("sy") * col("sy")) / col("n")).as("rel_sum"),
        sum(col("sy") * col("sy") / col("n")).as("res_raw"),
        sum(col("spp") - col("sp") * col("sp") / col("n")).as("wvar_sum"),
        sum(col("spy") - col("sp") * col("sy") / col("n")).as("wcov_sum"))
      .select(col("nn").as("n"),
        round(col("ssy") / col("nn"), 6).as("base_rate"),
        round(col("brier_total") / col("nn"), 6).as("brier"),
        round(col("rel_sum") / col("nn"), 6).as("reliability"),
        // Σ n_b(ȳ_b − ȳ)²/N = (Σ sy²/n_b)/N − ȳ²
        round(col("res_raw") / col("nn")
          - (col("ssy") / col("nn")) * (col("ssy") / col("nn")), 6).as("resolution"),
        round((col("ssy") / col("nn")) * (lit(1.0) - col("ssy") / col("nn")), 6)
          .as("uncertainty"),
        round(col("wvar_sum") / col("nn"), 6).as("within_bin_var"),
        round(col("wcov_sum") / col("nn"), 6).as("within_bin_cov"))
  }
}
