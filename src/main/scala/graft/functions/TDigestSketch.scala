package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** T-DIGEST QUANTILE SKETCH (Dunning & Ertl, "Computing extremely
  * accurate quantiles using t-digests") — the mergeable quantile
  * structure the sketch family was missing: the equi-width histogram
  * (q106) needs the value range up front and loses tail resolution; the
  * t-digest sizes its centroids by `q(1−q)`, so p99/p999 of a
  * heavy-tailed latency or doc-length column stay sharp while the bulk
  * compresses — and two shards' digests merge into the digest of the
  * union within the same error class.
  *
  * Scale shape: the digest lives in a typed [[Aggregator]] — the buffer
  * is ≤ ~2·compression (mean, weight) centroids plus a bounded insert
  * buffer, partial-aggregated map-side, so a billion-row group ships a
  * few KB to the shuffle like every sketch here. No oracle gate: the
  * centroid layout depends on Spark's partition merge ORDER (the
  * documented t-digest property), so correctness is spec'd as rank-error
  * bounds that hold for EVERY merge order, not value-replay.
  */
object TDigestSketch {

  /** Compression δ — centroid count stays ≤ ~2δ after compress. */
  val Compression = 100

  /** Interleaved [mean0, weight0, mean1, weight1, ...] centroid array,
    * sorted by mean. Flat doubles keep the buffer encoder primitive.
    */
  type Digest = Array[Double]

  private val BufferCap = 512 // raw inserts held before an amortized compress

  private[functions] def compress(pts: Digest, delta: Int): Digest = {
    val n = pts.length / 2
    if (n <= 1) return pts
    // sort centroid pairs by mean
    val idx = Array.range(0, n).sortBy(i => pts(2 * i))
    var total = 0.0
    idx.foreach(i => total += pts(2 * i + 1))
    val outM = new Array[Double](n); val outW = new Array[Double](n)
    var k = 0
    var curM = pts(2 * idx(0)); var curW = pts(2 * idx(0) + 1)
    var wSoFar = 0.0
    // k1 scale function (the paper's arcsine rule): a centroid may span
    // at most one unit of k(q) = δ/2π·asin(2q−1) — tails get tiny
    // centroids, the bulk gets fat ones, and TOTAL count stays ≤ ~δ
    // (the q(1−q) weight-limit variant leaks log(n) singletons at the
    // extremes and blew the size bound in TDigestSpec).
    val z = delta / (2.0 * math.Pi)
    def kOf(q: Double): Double = z * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
    var kLeft = kOf(0.0)
    var i = 1
    while (i < n) {
      val m = pts(2 * idx(i)); val w = pts(2 * idx(i) + 1)
      val qRight = (wSoFar + curW + w) / total
      if (kOf(qRight) - kLeft <= 1.0) {
        // weighted-mean merge keeps the centroid's center of mass
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM(k) = curM; outW(k) = curW; k += 1
        wSoFar += curW
        kLeft = kOf(wSoFar / total)
        curM = m; curW = w
      }
      i += 1
    }
    outM(k) = curM; outW(k) = curW; k += 1
    val out = new Array[Double](2 * k)
    var j = 0
    while (j < k) { out(2 * j) = outM(j); out(2 * j + 1) = outW(j); j += 1 }
    out
  }

  /** Quantile estimate: interpolate between centroid means by cumulative
    * weight midpoints (the standard t-digest query walk).
    */
  def quantile(digest: Digest, q: Double): Double = {
    val n = digest.length / 2
    require(n > 0, "empty digest")
    var total = 0.0
    var i = 0
    while (i < n) { total += digest(2 * i + 1); i += 1 }
    val target = q * total
    var cum = 0.0
    i = 0
    while (i < n) {
      val w = digest(2 * i + 1)
      if (cum + w / 2 >= target) {
        if (i == 0) return digest(0)
        val prevMid = cum - digest(2 * (i - 1) + 1) / 2
        val thisMid = cum + w / 2
        val f = if (thisMid == prevMid) 0.0 else (target - prevMid) / (thisMid - prevMid)
        val fc = math.max(0.0, math.min(1.0, f))
        return digest(2 * (i - 1)) + fc * (digest(2 * i) - digest(2 * (i - 1)))
      }
      cum += w
      i += 1
    }
    digest(2 * (n - 1))
  }

  /** Accumulation buffer: flat centroid storage + fill cursor, so the
    * per-row reduce appends in O(1) amortized (geometric growth) — a
    * bare array buffer re-copied every row costs O(BufferCap) per input
    * and terabytes of memcpy on a billion-row group.
    */
  case class Buf(data: Array[Double], used: Int)

  private def grown(b: Buf, need: Int): Buf =
    if (b.used + need <= b.data.length) b
    else Buf(java.util.Arrays.copyOf(b.data,
      math.max(16, math.max(b.used + need, b.data.length * 2))), b.used)

  private def compacted(b: Buf, delta: Int): Buf =
    if (b.used / 2 <= BufferCap) b
    else {
      val c = compress(java.util.Arrays.copyOf(b.data, b.used), delta)
      Buf(c, c.length)
    }

  class TDigestAgg(delta: Int) extends Aggregator[Double, Buf, Digest] {
    def zero: Buf = Buf(Array.emptyDoubleArray, 0)

    def reduce(st: Buf, x: Double): Buf = {
      val b = grown(compacted(st, delta), 2)
      b.data(b.used) = x; b.data(b.used + 1) = 1.0
      Buf(b.data, b.used + 2)
    }

    def merge(a: Buf, bb: Buf): Buf = {
      val b = grown(compacted(a, delta), bb.used)
      System.arraycopy(bb.data, 0, b.data, b.used, bb.used)
      compacted(Buf(b.data, b.used + bb.used), delta)
    }

    def finish(st: Buf): Digest =
      compress(java.util.Arrays.copyOf(st.data, st.used), delta)
    def bufferEncoder: ExpressionEncoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: ExpressionEncoder[Digest] = ExpressionEncoder[Digest]()
  }

  private val tdigest = udaf(new TDigestAgg(Compression),
    org.apache.spark.sql.Encoders.scalaDouble)

  /** `(grp, digest)` — per-group t-digest of `valCol`. */
  def sketch(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    df.select(col(grpCol).as("grp"), col(valCol).cast("double").as("v"))
      .groupBy(col("grp")).agg(tdigest(col("v")).as("digest"))

  /** Merge per-shard digest tables — the rollup never rescans data. */
  def merge(sketches: DataFrame*): DataFrame = {
    val all = sketches.reduce(_ unionByName _)
    val merger = udaf(new MergeAgg(Compression), ExpressionEncoder[Digest]())
    all.groupBy(col("grp")).agg(merger(col("digest")).as("digest"))
  }

  class MergeAgg(delta: Int) extends Aggregator[Digest, Buf, Digest] {
    def zero: Buf = Buf(Array.emptyDoubleArray, 0)
    def reduce(st: Buf, d: Digest): Buf = append(st, d)
    def merge(a: Buf, b: Buf): Buf =
      append(a, java.util.Arrays.copyOf(b.data, b.used))
    def finish(st: Buf): Digest =
      compress(java.util.Arrays.copyOf(st.data, st.used), delta)
    private def append(st: Buf, d: Digest): Buf = {
      val b = grown(compacted(st, delta), d.length)
      System.arraycopy(d, 0, b.data, b.used, d.length)
      compacted(Buf(b.data, b.used + d.length), delta)
    }
    def bufferEncoder: ExpressionEncoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: ExpressionEncoder[Digest] = ExpressionEncoder[Digest]()
  }
}
