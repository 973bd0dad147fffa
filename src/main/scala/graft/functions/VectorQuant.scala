package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric max-abs int8 embedding quantization — the standard memory
  * lever for a vector index at scale: a 100 TB float32 corpus index drops
  * to 25 TB (plus one float scale per vector), and cosine ranking is
  * scale-invariant per vector, so search quality degrades only by the
  * rounding (recall floor pinned in RecallSpec).
  *
  * Exact-replay discipline: every step is either float32 arithmetic both
  * engines share (abs/max over the raw elements) or explicit float→double
  * promotion followed by IEEE double ops and `floor(x + 0.5)` (symmetric
  * half-up — `round` half-up vs half-even vs half-away differs BETWEEN
  * engines; `floor(x + 0.5)` is the same everywhere). No UDF, pure HOF
  * column expressions.
  */
object VectorQuant {

  /** Per-vector quantization scale: max |element| (float32). */
  def scaleOf(vec: Column): Column = array_max(transform(vec, v => abs(v)))

  /** int8 code vector: `floor(v / scale * 127 + 0.5)` per element, in
    * [-127, 127]; the all-zero vector quantizes to zeros. Pass the
    * PRE-COMPUTED scale column (bind it with a `withColumn` first) — an
    * inline `scaleOf(vec)` would be re-evaluated per element inside the
    * lambda, turning a d-long pass into d².
    */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, v =>
      when(scale === 0.0f, lit(0))
        .otherwise(
          floor(v.cast("double") / scale.cast("double") * 127.0d + 0.5d).cast("int")))

  /** The int8 codes re-widened to float for cosine scoring (cosine is
    * invariant to the per-vector scale, which therefore never needs to be
    * re-applied for ranking).
    */
  def quantizedAsFloat(vec: Column, scale: Column): Column =
    transform(quantize(vec, scale), q => q.cast("float"))
}
