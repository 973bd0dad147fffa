package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5-style span-corruption pair builder (Raffel et al. 2020, public
  * method): a contiguous token span is cut from each document and
  * replaced by a sentinel; the model input is the text with the hole, the
  * target is the sentinel plus the removed span. Deterministic variant of
  * the objective: ONE span per document at a position and length that are
  * pure functions of the token count (span ≈ the middle `spanFrac`), so
  * the dataset replays identically on re-run — the q145/q171 zero-RNG
  * rule.
  *
  * Pure HOF map pass, zero shuffles, scan-bound at any scale.
  */
object SpanCorruption {

  val Sentinel = "<extra_id_0>"

  /** Output: `n_tokens`, `span_start` (1-based), `span_len`, `inputs`,
    * `targets`. Documents under `minTokens` produce no pair.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            spanFrac: Double = 0.15, minTokens: Int = 7): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs.select(col(idCol), toks.as("_t"))
      .withColumn("n_tokens", size(col("_t")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("span_len",
        greatest(lit(1L), floor(col("n_tokens") * spanFrac)).cast("long"))
      .withColumn("span_start",
        (floor((col("n_tokens") - col("span_len")) / 2) + 1).cast("long"))
      .select(
        col(idCol), col("n_tokens"), col("span_start"), col("span_len"),
        array_join(
          concat(
            slice(col("_t"), lit(1), (col("span_start") - 1).cast("int")),
            array(lit(Sentinel)),
            slice(col("_t"), (col("span_start") + col("span_len")).cast("int"),
              (col("n_tokens") - col("span_start") - col("span_len") + 1).cast("int"))),
          " ").as("inputs"),
        concat(lit(Sentinel + " "),
          array_join(slice(col("_t"), col("span_start").cast("int"),
            col("span_len").cast("int")), " ")).as("targets"))
  }
}
