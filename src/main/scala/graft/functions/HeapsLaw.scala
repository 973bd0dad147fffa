package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heaps/Herdan vocabulary-growth law fit: V(N) ≈ K·N^β estimated by OLS
  * on (ln N, ln V) at corpus prefixes — the public scaling law behind
  * "how much vocabulary will 100 TB add". β well below 1 means the
  * tokenizer's open-vocab tail is flattening; β near 1 means the corpus
  * is still discovering types linearly (a dedup / noise smell).
  *
  * Prefix state is NEVER accumulated row-by-row: a token's contribution
  * to every checkpoint is decided by its FIRST document id alone, so
  * V(c) = |{tokens: first_doc < c}| and N(c) = Σ tokens of docs < c are
  * plain conditional aggs against a broadcast 8-row checkpoint table —
  * no unpartitioned running window anywhere (the construction that
  * would collapse to one task at scale). The OLS runs on the 8-row grid.
  */
object HeapsLaw {

  /** Adjacent-token bigram types from a token-array column. A closed
    * unigram vocabulary (the synthetic corpus has 30 types — saturated at
    * the first checkpoint) makes the Heaps fit degenerate; its bigram
    * family keeps discovering types across the whole corpus, so the fit
    * over bigrams genuinely exercises V(N)=K·N^β with β>0.
    */
  def bigrams(tokens: Column): Column =
    when(size(tokens) >= 2,
      zip_with(slice(tokens, lit(1), size(tokens) - 1),
               slice(tokens, lit(2), size(tokens) - 1),
               (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))

  /** Checkpoint grid with the fitted law attached to every row:
    * `ck` (exclusive doc-id bound), `n_tokens`, `vocab`, `beta`, `log_k`
    * (natural-log intercept), both 6dp.
    */
  def fit(docs: DataFrame, idCol: String, tokens: Column,
          checkpoints: Int = 8): DataFrame = {
    val toks = docs.select(col(idCol).as("_id"), explode(tokens).as("w"))
    val perDoc = toks.groupBy(col("_id")).agg(count(lit(1)).as("nt"))
    val firstDoc = toks.groupBy(col("w")).agg(min(col("_id")).as("fd"))
    val maxId = docs.agg(max(col(idCol)).as("mx"))

    val cps = maxId.select(explode(sequence(lit(1), lit(checkpoints))).as("k"),
        col("mx"))
      .select(floor((col("mx") + 1) * col("k") / checkpoints).cast("long").as("ck"))
    val n = perDoc.crossJoin(broadcast(cps))
      .filter(col("_id") < col("ck"))
      .groupBy(col("ck")).agg(sum(col("nt")).as("n_tokens"))
    val v = firstDoc.crossJoin(broadcast(cps))
      .filter(col("fd") < col("ck"))
      .groupBy(col("ck")).agg(count(lit(1)).as("vocab"))

    val grid = n.join(v, "ck")
      .select(col("ck"), col("n_tokens"), col("vocab"),
        log(col("n_tokens")).as("x"), log(col("vocab")).as("y"))
    val ols = grid.agg(
      count(lit(1)).cast("double").as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val fit = ols.select(
      ((col("m") * col("sxy") - col("sx") * col("sy")) /
        (col("m") * col("sxx") - col("sx") * col("sx"))).as("b"),
      col("m"), col("sx"), col("sy"))
      // `+ 0.0` sign-stabilizes a pure-cancellation slope: when vocab is
      // constant the numerator is a ±1e-16 float residual whose SIGN
      // depends on summation order, and round(±ε, 6) yields ±0.0 — a
      // cross-engine hash coin-flip (observed live: DuckDB returned -0.0
      // and +0.0 for the same query in two runs). IEEE: -0.0 + 0.0 = +0.0
      // in both engines, and every nonzero value is untouched.
      .select((round(col("b"), 6) + lit(0.0)).as("beta"),
        (round((col("sy") - col("b") * col("sx")) / col("m"), 6) + lit(0.0)).as("log_k"))

    grid.select(col("ck"), col("n_tokens"), col("vocab"))
      .crossJoin(broadcast(fit))
  }
}
