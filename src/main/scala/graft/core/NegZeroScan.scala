package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** CI defense against the float-cancellation gate-flake class (r10's q176):
  * an OLS/correlation numerator that cancels to ±1e-16 rounds to ±0.0, and
  * the driver's hash does NOT normalize -0.0, so the gate becomes a
  * summation-order coin flip across engines.
  *
  * Two detectors over every double/float column of a gate's output:
  *  - `-0.0` cells — always a violation: a gate must sign-stabilize with
  *    the `round(...) + 0.0` idiom (IEEE: -0.0 + 0.0 = +0.0 in both Spark
  *    and DuckDB) so exact-zero outputs are bit-deterministic.
  *  - rounding-boundary cells — a finite value within 1e-9 of a
  *    k.5×10⁻⁶ boundary, where a 1-ulp cross-engine difference in an
  *    unordered float sum flips round(x, 6). Reported as a warning, not a
  *    violation: raw data columns legitimately contain arbitrary floats,
  *    so only gate-computed aggregates make this actionable.
  */
object NegZeroScan {

  final case class ColScan(column: String, negZero: Long, nearBoundary: Long)

  /** One aggregate pass; returns a row per double/float column that has at
    * least one -0.0 or near-boundary cell. Detection avoids division
    * (ANSI throws on x/0.0): -0.0 is the unique value equal to 0.0 whose
    * string cast leads with '-'.
    */
  def scan(df: DataFrame): Seq[ColScan] = {
    val floatCols = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }
    if (floatCols.isEmpty) return Nil
    val aggs = floatCols.flatMap { c =>
      val v = col(c).cast("double")
      val scaled = v * lit(1e6)
      val frac = scaled - floor(scaled)
      Seq(
        sum(when(v === 0.0 && v.cast("string").startsWith("-"), 1L)
          .otherwise(0L)).as(s"__nz_$c"),
        sum(when(!isnan(v) && abs(v) < 1e12 &&
            abs(frac - 0.5) < 1e-3, 1L).otherwise(0L)).as(s"__nb_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    floatCols.flatMap { c =>
      val nz = Option(row.getAs[Any](s"__nz_$c")).fold(0L)(_.asInstanceOf[Long])
      val nb = Option(row.getAs[Any](s"__nb_$c")).fold(0L)(_.asInstanceOf[Long])
      if (nz > 0 || nb > 0) Some(ColScan(c, nz, nb)) else None
    }
  }
}
