package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DETERMINISTIC RANDOM PROJECTION (Johnson–Lindenstrauss, sign matrix):
  * compact a d-dim embedding to k dims via y_j = (1/√k) Σ_i v_i·s(i,j)
  * with s(i,j) ∈ {±1} derived from the engine's portable md5-31 hash of
  * `"rp:i:j"` — no RNG, no stored matrix, any engine (and any executor,
  * any retry) reconstructs the identical projection. The standard way to
  * cut an embedding corpus's footprint (and every downstream shuffle's
  * width) 4× before ANN indexing, at a bounded cosine distortion.
  *
  * Scale shape: ONE JIT'd typed map pass (the k×d inner loop is the hot
  * path — interpreted HOF lambdas would evaluate per element), no
  * shuffle; the output column is narrower than the input, so everything
  * downstream (bucketed dedup, IVF fit, export) gets cheaper.
  */
object RandomProjection {

  /** +1/−1 sign for matrix cell (i, j) — portable md5-31 parity. */
  private[functions] def sign(i: Int, j: Int): Double =
    if (graft.core.Ids.hash31(s"rp:$i:$j") % 2 == 0) 1.0 else -1.0

  /** `(id, y)` with `y = (1/√k)·Sᵀv` — `k` = outDim, `d` = inDim.
    * Component sums run in ascending input-index order (the same order
    * the SQL oracle's `generate_series` fold uses). The d×k sign matrix
    * is hashed ONCE on the driver and ships in the task closure — the
    * per-row work is the pure multiply-accumulate loop.
    */
  def project(points: DataFrame, idCol: String, vecCol: String,
              inDim: Int, outDim: Int): DataFrame = {
    import points.sparkSession.implicits._
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val signs = Array.tabulate(inDim, outDim)((i, j) => sign(i + 1, j + 1))
    points.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val arr = v.toArray
        val d = math.min(arr.length, inDim)
        val y = Array.tabulate(outDim) { j =>
          var s = 0.0
          var i = 0
          while (i < d) { s += arr(i) * signs(i)(j); i += 1 }
          s * scale
        }
        (id, y.toSeq)
      }.toDF("id", "y")
  }
}
