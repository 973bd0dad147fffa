package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CONTENT-DEFINED CHUNKING (Rabin/rsync/LBFS lineage; Muthitacharoen et
  * al., SOSP 2001) — chunk boundaries chosen by a rolling CONTENT hash
  * instead of fixed offsets, so inserting one character early in a
  * document shifts only the chunk containing the edit: every later
  * boundary re-synchronizes. That shift-stability is why dedup storage
  * and incremental-sync systems chunk this way, and why it complements
  * the fixed [[SlidingChunker]] (whose windows all move under an insert).
  *
  * Boundary rule: position `i` (1-based, `i ≥ Window`, `i < len`) is a cut
  * when `h(i) mod Divisor == 0`, with `h(i) = Σ_{j=0..Window-1}
  * code(c_{i−j})·Bʲ mod M` — pure integer arithmetic over BMP char codes,
  * so any engine replays the cut set exactly. Expected chunk length ≈
  * Divisor chars. Optional min/max bounds for adversarial content are
  * enforced in [[chunkLengths]].
  *
  * Scale shape: a per-document JVM pass in a typed map (the parser
  * discipline) — no shuffle; chunk digests key directly into the
  * dedup/embedding stages.
  */
object CdcChunker {

  val Window = 8
  val B = 31L
  val M = 2147483647L
  val Divisor = 64L

  private val Pow: Array[Long] = {
    val a = new Array[Long](Window)
    a(0) = 1L
    (1 until Window).foreach(j => a(j) = a(j - 1) * B)
    a
  }

  /** 1-based cut positions: chunk k ends at (exclusive-of-next) cut.
    * TRUE rolling evaluation — h(i+1) = (h(i) − c_out·B^(W−1))·B + c_in —
    * one multiply-add per character instead of re-summing the window, and
    * an index buffer instead of per-position boxing.
    */
  def cutPositions(text: String): Seq[Int] = {
    val n = text.length
    if (n <= Window) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    // h over chars at 1-based positions [i-Window+1, i]; newest has B^0
    var h = 0L
    var p = 0
    while (p < Window) { h += text.charAt(p).toLong * Pow(Window - 1 - p); p += 1 }
    var i = Window // 1-based position of the newest char in the window
    while (i < n) {
      if ((h % M) % Divisor == 0L) out += i
      h = (h - text.charAt(i - Window).toLong * Pow(Window - 1)) * B +
        text.charAt(i).toLong
      i += 1
    }
    out.toSeq
  }

  /** Chunk lengths from the cut set, with optional min/max enforcement:
    * cuts closer than `minLen` to the previous kept cut are skipped, and
    * a run longer than `maxLen` is force-cut at `maxLen`.
    */
  def chunkLengths(text: String, minLen: Int = 1, maxLen: Int = Int.MaxValue): Seq[Int] = {
    require(minLen >= 1 && maxLen >= minLen,
      s"need 1 <= minLen ($minLen) <= maxLen ($maxLen)")
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var prev = 0
    val cuts = cutPositions(text).iterator.buffered
    while (prev < n) {
      var chosen = -1
      var stop = false
      // long arithmetic: prev + Int.MaxValue (the unbounded default)
      // would wrap as an Int
      val hardCut = math.min(prev.toLong + maxLen, n.toLong).toInt
      while (!stop && cuts.hasNext) {
        val c = cuts.head
        if (c.toLong <= prev.toLong + (minLen - 1)) cuts.next() // too close: skip
        else if (c <= hardCut) { chosen = cuts.next(); stop = true }
        else stop = true // beyond maxLen: force-cut below
      }
      val cut = if (chosen > 0) chosen else hardCut
      out += (cut - prev)
      prev = cut
    }
    out.toSeq
  }

  /** Per-document boundary statistics: `(doc_id, n_chunks, max_len,
    * first_cut)` over the PURE rule (no min/max) — the form an engine
    * replays with positional integer arithmetic alone.
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val cuts = cutPositions(text)
        val bounds = cuts :+ text.length
        val maxLen = bounds.zip(0 +: cuts).map { case (b, a) => b - a }.max
        (id, cuts.length.toLong + 1L, maxLen.toLong,
          cuts.headOption.getOrElse(0).toLong)
      }
      .toDF("doc_id", "n_chunks", "max_len", "first_cut")
  }
}
