package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val df = Seq(text).toDF("t")
      .select(PiiScrub.emailCount(col("t")).cast("long"),
        PiiScrub.urlCount(col("t")).cast("long"),
        PiiScrub.phoneCount(col("t")).cast("long"),
        PiiScrub.redact(col("t")))
    val r = df.collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("detects and redacts emails, urls, phones; order URL > email > phone") {
    val (e, u, p, red) = one(
      "write a.b+tag@ex-ample.co or visit https://ex.org/path?q=1 or call +1 (555) 123-4567 today")
    assert((e, u, p) == (1L, 1L, 1L))
    assert(red == "write <EMAIL> or visit <URL> or call <PHONE> today")
  }

  test("redaction order: url swallows embedded @ and digits in one sentinel") {
    val (e, u, _, red) = one("see https://user@host.example/thing/1234567 plain text")
    assert(u == 1L)
    // counts are RAW-TEXT detections, so the user@host span also counts as
    // an email candidate; the redaction order (URL first) is what prevents
    // double-marking in the output
    assert(e == 1L)
    assert(red == "see <URL> plain text")
  }

  test("clean text untouched; short digit runs are not phones") {
    val (e, u, p, red) = one("order 1234 of 99 widgets")
    assert((e, u, p) == (0L, 0L, 0L))
    assert(red == "order 1234 of 99 widgets")
  }
}
