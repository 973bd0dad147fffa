package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flesch readability metrics (Flesch 1948; Kincaid et al. 1975) — the
  * classic length/syllable text-difficulty scores used as cheap quality
  * features in pretraining-corpus curation (alongside the Gopher rule
  * battery and the stopword/punctuation ratios in TextOps).
  *
  * Everything is a single codegen projection per row — `split`,
  * `regexp_extract_all`, arithmetic — no UDF, no shuffle, so the pass is
  * scan-bound at any scale. Syllables use the standard vowel-group
  * heuristic (runs of `[aeiouy]+` in the lowercased text); counting over
  * the whole text equals the per-word sum because a vowel run never spans
  * a non-letter.
  */
object Readability {

  /** Adds `n_words`, `n_sentences`, `n_syllables`, `flesch` (reading
    * ease), `fk_grade` (Flesch-Kincaid grade level), both rounded to
    * 4 dp. Rows with no words or no sentences are scored NULL rather
    * than dividing by zero.
    */
  def score(docs: DataFrame, textCol: String): DataFrame = {
    val words = size(filter(split(col(textCol), "\\s+"), w => length(w) > 0))
    val sents = size(filter(split(col(textCol), "[.!?]+"),
      s => length(trim(s)) > 0))
    val sylls = size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
    docs
      .withColumn("n_words", words.cast("long"))
      .withColumn("n_sentences", sents.cast("long"))
      .withColumn("n_syllables", sylls.cast("long"))
      .withColumn("flesch",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          round(lit(206.835)
            - lit(1.015) * col("n_words") / col("n_sentences")
            - lit(84.6) * col("n_syllables") / col("n_words"), 4)))
      .withColumn("fk_grade",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          round(lit(0.39) * col("n_words") / col("n_sentences")
            + lit(11.8) * col("n_syllables") / col("n_words")
            - lit(15.59), 4)))
  }
}
