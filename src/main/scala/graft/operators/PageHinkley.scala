package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Page-Hinkley drift detector (Page 1954; Hinkley 1971) over a keyed
  * integer series: after each observation, m_t accumulates the deviation
  * from the RUNNING mean (minus a slack δ), and the test statistic
  * PH_t = m_t − min_{i≤t} m_i alarms when it exceeds λ — the online
  * "this feed's level has shifted" tripwire that CUSUM (q199) answers
  * offline.
  *
  * Scale story: the fold state is four numbers per key forever (count,
  * integer sum, m, min m) — one `flatMapGroups` per key after one
  * (key, bucket) partial agg, the q233 replay discipline. The running
  * mean is sx/cnt with an INTEGER numerator, so every float in the fold
  * derives from the same two integers in the same expression order and a
  * recursive-CTE oracle replays it bit-for-bit.
  */
object PageHinkley {

  case class BucketCount(key: String, bucket: Long, n: Long)

  case class PhRow(key: String, bucket: Long, n: Long,
                   m: Double, ph: Double, nSeen: Long)

  /** Distributed batch fold: buckets must be unique per (key, bucket) —
    * they come out of a groupBy — so the in-group sort is a total order.
    */
  def detectDs(buckets: Dataset[BucketCount], delta: Double): Dataset[PhRow] = {
    import buckets.sparkSession.implicits._
    buckets.groupByKey(_.key).flatMapGroups {
      (key: String, rows: Iterator[BucketCount]) =>
        var cnt = 0L
        var sx = 0L
        var m = 0.0
        var minM = 0.0
        rows.toSeq.sortBy(_.bucket).map { b =>
          cnt += 1
          sx += b.n
          val mean = sx.toDouble / cnt
          m = m + (b.n - mean - delta)
          minM = math.min(minM, m)
          PhRow(key, b.bucket, b.n, m, m - minM, cnt)
        }.iterator
    }
  }
}
