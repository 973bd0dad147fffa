package graft.mm

import graft.SparkSpec
import graft.mm.Multimodal.MediaRow
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint matches a hand-computed envelope on a constructed clip") {
    // 64 samples, 32 frames of 2: frame f holds samples 2f, 2f+1 with
    // amplitude f+1 and -(f+1) → E_f = 2(f+1), strictly increasing →
    // every bit set: fp = 2^31 - 1
    val samples = Array.tabulate[Short](64)(t => {
      val f = t / 2
      (if (t % 2 == 0) f + 1 else -(f + 1)).toShort
    })
    val bytes = Multimodal.encodeWav(samples, 8000)
    assert(AudioFingerprint.fingerprint(bytes).contains((1L << 31) - 1))

    // strictly decreasing envelope → no bit set
    val down = Array.tabulate[Short](64)(t => (32 - t / 2).toShort)
    assert(AudioFingerprint.fingerprint(Multimodal.encodeWav(down, 8000))
      .contains(0L))
  }

  test("undecodable payloads drop out of fingerprints()") {
    val media = Seq(
      MediaRow(1L, "audio", Multimodal.encodeWav(Array.tabulate[Short](100)(_.toShort), 8000), Map.empty),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3, 4), Map.empty)).toDS()
    val got = AudioFingerprint.fingerprints(media).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
  }

  test("banded candidates are COMPLETE vs brute force on the q305 corpus") {
    val media = spark.range(MultimodalQueries.NumClips)
      .map(i => MultimodalQueries.syntheticFpWav(i.longValue))
    val banded = AudioFingerprint.nearDupPairs(media, 3)
      .select("clip_a", "clip_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val fps = AudioFingerprint.fingerprints(media)
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    // the generator's (i, i+35) envelope twins guarantee near-dup mass
    assert(brute.nonEmpty && brute.exists { case (a, b, h) => b - a == 35 && h == 0 })
  }
}
