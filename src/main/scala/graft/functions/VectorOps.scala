package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.CosineSimilarity

/** Dense-vector similarity primitives.
  *
  * The hot path (top-k cosine over 100 TB of embeddings) uses a native
  * Catalyst expression with `doGenCode` so the score stays inside
  * whole-stage codegen — no UDF boxing, no Scala closure per row
  * (SURVEY.md §4 "custom physical work" item 1; reference semantics:
  * cosine distance in storage/qdrant.py:105-109).
  */
object VectorOps {

  /** Codegen'd cosine similarity (see [[org.apache.spark.sql.graftx.CosineSimilarity]]). */
  def cosine(a: Column, b: Column): Column = CosineSimilarity.asColumn(a, b)

  /** Pure-function fallback (no custom expression) — same math via
    * higher-order functions; used in tests to cross-check the codegen path.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(ad, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(bd, lit(0.0), (acc, x) => acc + x * x)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / sqrt(na * nb))
  }

  /** Literal query vector as an array<double> column. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)
}
