package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cloze training-pair builder: mask the middle token of
  * each document and emit (masked context, answer) — the classic masked-LM
  * / cloze-test example shape (Taylor 1953's cloze procedure; BERT-style
  * masking), made reproducible by construction: the mask POSITION is a
  * pure function of the token count, so re-runs, retries, and the oracle
  * derive the identical dataset with zero RNG (the q145 dropout
  * discipline — rand() would make every run a different dataset).
  *
  * One codegen HOF map pass over the corpus; no shuffle at all. At 100 TB
  * this is scan-bound and embarrassingly parallel.
  */
object ClozeBuilder {

  /** Emits `n_tokens`, `answer` (the masked token), and `masked` (the
    * text with position ⌈n/2⌉, 1-based, replaced by `maskTok`). Documents
    * with fewer than `minTokens` tokens produce no pair — a cloze with no
    * context on either side trains nothing.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            maskTok: String = "<mask>", minTokens: Int = 3): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs.select(col(idCol), toks.as("_t"))
      .withColumn("n_tokens", size(col("_t")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("_k", floor((col("n_tokens") + 1) / 2).cast("int"))
      .select(
        col(idCol),
        col("n_tokens"),
        element_at(col("_t"), col("_k")).as("answer"),
        array_join(
          concat(
            slice(col("_t"), lit(1), col("_k") - 1),
            array(lit(maskTok)),
            slice(col("_t"), col("_k") + 1,
              (col("n_tokens") - col("_k")).cast("int"))),
          " ").as("masked"))
  }
}
