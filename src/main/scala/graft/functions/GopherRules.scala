package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Gopher corpus-quality rule battery (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A — public method). Unlike the generic score of q41, this is
  * the PUBLISHED rule set with per-rule verdicts, so a curation run can
  * report *which* rule rejected how much of each source:
  *
  *   - word count within [minWords, maxWords]
  *   - mean word length within [3, 10] characters
  *   - symbol-to-word ratio (`#`, `...`) at most 0.1
  *   - at most 90% of lines starting with a bullet
  *   - at most 30% of lines ending with an ellipsis
  *   - at least 80% of words containing an alphabetic character
  *   - at least `minStopwords` distinct required stopwords present
  *
  * Every rule is a codegen HOF/regex map over the text column — one scan
  * pass, no UDF; the only shuffle is the per-source partial agg of seven
  * booleans. At 100 TB this is scan-bound by construction.
  */
object GopherRules {

  val RequiredStopwords: Seq[String] = Seq("the", "and", "of", "to", "in", "it")

  /** Per-source admission report: docs passing each rule and all rules. */
  def report(docs: DataFrame, groupCol: String, textCol: String,
             minWords: Int = 50, maxWords: Int = 100000,
             minStopwords: Int = 2): DataFrame = {
    val words = split(col(textCol), "\\s+")
    val nonEmpty = filter(words, w => length(w) > 0)
    val lines = split(col(textCol), "\n")

    val d = docs.select(
      col(groupCol),
      size(nonEmpty).as("n_words"),
      // mean word length over non-empty words
      (aggregate(nonEmpty, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(nonEmpty)).as("mwl"),
      // '#' occurrences + '...' occurrences (counted non-overlapping)
      ((length(col(textCol)) - length(regexp_replace(col(textCol), "#", ""))) +
        (length(col(textCol)) - length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3)
        .cast("double").as("n_sym"),
      size(lines).as("n_lines"),
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).as("n_bullet"),
      size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).as("n_ellipsis"),
      size(filter(nonEmpty, w => w.rlike("[A-Za-z]"))).as("n_alpha"),
      size(filter(
        array_distinct(transform(nonEmpty, w => lower(w))),
        w => w.isInCollection(RequiredStopwords))).as("n_stop"))

    val flags = d.select(
      col(groupCol),
      (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_words"),
      (col("mwl") >= 3.0 && col("mwl") <= 10.0).as("r_mwl"),
      (col("n_sym") / col("n_words") <= 0.1).as("r_symbol"),
      (col("n_bullet").cast("double") / col("n_lines") <= 0.9).as("r_bullet"),
      (col("n_ellipsis").cast("double") / col("n_lines") <= 0.3).as("r_ellipsis"),
      (col("n_alpha").cast("double") / col("n_words") >= 0.8).as("r_alpha"),
      (col("n_stop") >= minStopwords).as("r_stop"))

    val ruleCols = Seq("r_words", "r_mwl", "r_symbol", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stop")
    val passAll = ruleCols.map(col).reduce(_ && _)
    flags.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        ruleCols.map(r => sum(when(col(r), 1L).otherwise(0L)).as(s"n_$r")) :+
          sum(when(passAll, 1L).otherwise(0L)).as("n_pass_all"): _*)
  }
}
