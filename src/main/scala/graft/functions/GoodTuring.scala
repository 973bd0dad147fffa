package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unseen-vocabulary estimation from frequency-of-frequencies: the
  * Good–Turing missing mass (Good 1953) and the Chao1 richness estimator
  * (Chao 1984) — both public textbook methods. For a training corpus these
  * answer "how much probability mass belongs to tokens we have NOT seen"
  * (missing mass f₁/N) and "how many token types exist in the population
  * the corpus samples" (Chao1 = V + f₁²/(2·f₂)) — the quantitative version
  * of "is the corpus big enough for this tokenizer".
  *
  * Everything reduces to integer sufficient statistics (N, V, f₁, f₂) via
  * two stacked partial aggs (token → count, count → count), then two
  * scalar divisions — exact across engines, no float accumulation.
  */
object GoodTuring {

  /** One-row report over a tokenized column expression. */
  def report(docs: DataFrame, tokens: Column): DataFrame = {
    val counts = docs
      .select(explode(tokens).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    counts.agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(
        col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        round(col("f1").cast("double") / col("n_tokens"), 6).as("p_unseen"),
        when(col("f2") > 0,
          round(col("vocab") + col("f1") * col("f1") / (lit(2.0) * col("f2")), 4))
          .as("chao1"))
  }
}
