package graft.ingest

import graft.SparkSpec

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """User-agent: graftbot
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp*
      |Disallow: /*.php$
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("UA group selection: most specific token wins, * is the fallback, none = allow all") {
    val g = RobotsTxt.selectGroup(body, "GraftBot-1.0")
    assert(g.rules.map(_.pattern) == Seq("/private", "/private/ok", "/tmp*", "/*.php$"))
    assert(g.crawlDelay.contains(2.5))
    val star = RobotsTxt.selectGroup(body, "otherbot")
    assert(star.rules == Seq(RobotsTxt.Rule(allow = false, "/")))
    assert(RobotsTxt.selectGroup("User-agent: onlythis\nDisallow: /\n", "someone")
      .rules.isEmpty) // no matching group -> everything allowed
  }

  test("longest-match admission: nested Allow overrides, ties go to Allow") {
    val g = RobotsTxt.selectGroup(body, "graftbot")
    assert(RobotsTxt.isAllowed(g, "/a/page"))
    assert(!RobotsTxt.isAllowed(g, "/private/x"))
    assert(RobotsTxt.isAllowed(g, "/private/ok/x")) // Allow (11) > Disallow (8)
    val tie = RobotsTxt.RobotsGroup(Seq(
      RobotsTxt.Rule(allow = false, "/d/"), RobotsTxt.Rule(allow = true, "/d/")), None)
    assert(RobotsTxt.isAllowed(tie, "/d/x")) // equal length -> Allow wins
  }

  test("wildcard and anchor matching semantics") {
    assert(RobotsTxt.matches("/tmp*", "/tmp/x"))
    assert(RobotsTxt.matches("/tmp*", "/tmpfile"))
    assert(!RobotsTxt.matches("/tmp*", "/a/tmp"))
    assert(RobotsTxt.matches("/*.php$", "/a/p1.php"))
    assert(!RobotsTxt.matches("/*.php$", "/a/p1.php.txt"))
    // '$' with a final literal anchors at the END, not the leftmost hit
    assert(RobotsTxt.matches("/*b$", "/axbyb"))
    assert(RobotsTxt.matches("/a$", "/a"))
    assert(!RobotsTxt.matches("/a$", "/ab"))
    assert(RobotsTxt.matches("/a*$", "/anything"))
  }

  test("non-group records between User-agent lines don't split the group (RFC 9309 §2.2.2)") {
    val g = RobotsTxt.selectGroup(
      "User-agent: a\nSitemap: https://x/s.xml\nUser-agent: b\nDisallow: /\n", "a")
    assert(g.rules == Seq(RobotsTxt.Rule(allow = false, "/")),
      "agent 'a' must share the group with 'b' despite the Sitemap line")
  }

  test("empty Disallow allows all; comments and junk lines are ignored") {
    val g = RobotsTxt.selectGroup(
      "User-agent: graftbot # our bot\nDisallow:\nnoise line\nSitemap: https://x/s.xml\n",
      "graftbot")
    assert(g.rules.isEmpty)
    assert(RobotsTxt.isAllowed(g, "/anything"))
  }

  test("admit: broadcast-joined per-host rules; hosts without robots default to allowed") {
    val urls = Seq(
      ("h0", "/private/x"), ("h0", "/private/ok/x"), ("h0", "/fine"),
      ("nobots.example", "/anything")).toDF("host", "path")
    val robots = Seq(("h0", body)).toDF("host", "robots")
    val out = RobotsTxt.admit(urls, "host", "path", robots, "host", "robots", "graftbot")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getBoolean(2), r.getDouble(3)))).toMap
    assert(out(("h0", "/private/x")) == ((false, 2.5)))
    assert(out(("h0", "/private/ok/x")) == ((true, 2.5)))
    assert(out(("h0", "/fine")) == ((true, 2.5)))
    assert(out(("nobots.example", "/anything")) == ((true, 0.0)))
  }
}
