package graft.functions

import graft.SparkSpec

class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def one(host: String): (Option[String], Option[String]) = {
    val r = PublicSuffix.registrableDomain(Seq(host).toDF("host"), "host")
      .select("suffix", "etld1").collect().head
    (Option(r.getString(0)), Option(r.getString(1)))
  }

  test("longest suffix wins: co.uk beats a shorter match") {
    assert(one("a.b.example.co.uk") == (Some("co.uk"), Some("example.co.uk")))
  }

  test("single-label suffix gives last-two-labels registrable domain") {
    assert(one("deep.sub.example.com") == (Some("com"), Some("example.com")))
  }

  test("private registry entries act as suffixes (github.io)") {
    assert(one("mysite.github.io") == (Some("github.io"), Some("mysite.github.io")))
  }

  test("a bare public suffix has no registrable domain") {
    assert(one("github.io") == (Some("github.io"), None))
    assert(one("co.uk") == (Some("co.uk"), None))
  }

  test("unknown TLD matches nothing") {
    assert(one("router.localdomain") == (None, None))
  }

  test("duplicate hosts keep one row each and agree on the domain") {
    val df = Seq("x.example.com", "x.example.com", "y.example.com").toDF("host")
    val r = PublicSuffix.registrableDomain(df, "host")
    assert(r.count() == 3)
    assert(r.select("etld1").distinct().collect().map(_.getString(0)).toSet ==
      Set("example.com"))
  }
}
