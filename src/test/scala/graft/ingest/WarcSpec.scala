package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import WarcParser.WarcRecord

class WarcSpec extends AnyFunSuite {

  private def rec(uri: String, body: String): WarcRecord =
    WarcRecord("response", uri, "2026-01-01T00:00:00Z",
      "application/http; msgtype=response",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body).getBytes("UTF-8"))

  test("encode -> parse round trip preserves every record and payload byte") {
    val in = Seq(rec("https://a/1", "hello world"), rec("https://a/2", "x" * 500),
      WarcRecord("warcinfo", "", "2026-01-01T00:00:00Z", "application/warc-fields",
        "software: graft\r\n".getBytes("UTF-8")))
    val out = WarcParser.parse(WarcParser.encode(in))
    assert(out.length == 3)
    out.zip(in).foreach { case (o, i) =>
      assert(o.recordType == i.recordType && o.targetUri == i.targetUri)
      assert(o.payload.toSeq == i.payload.toSeq)
    }
  }

  test("gzip members: per-record members decode in one pass; truncation keeps the prefix") {
    val in = Seq(rec("https://z/1", "alpha"), rec("https://z/2", "beta " * 100),
      rec("https://z/3", "gamma"))
    val gz = WarcParser.encodeGz(in)
    // decoded concatenation parses to the same records
    val out = WarcParser.parse(WarcParser.gunzipMembers(gz))
    assert(out.map(_.targetUri) == Seq("https://z/1", "https://z/2", "https://z/3"))
    assert(out.zip(in).forall { case (o, i) => o.payload.toSeq == i.payload.toSeq })
    // chopping the last member mid-stream: earlier members survive
    val cut = WarcParser.parse(WarcParser.gunzipMembers(gz.dropRight(12)))
    assert(cut.nonEmpty && cut.length < 3)
    assert(cut.head.targetUri == "https://z/1")
  }

  test("Content-Length governs record boundaries, not delimiter scanning") {
    // a payload that CONTAINS the record separator and a fake version line:
    // a delimiter-scanning parser would split here; a length-driven one not
    val trap = "part1\r\n\r\nWARC/1.0\r\npart2"
    val in = Seq(rec("https://t/1", trap), rec("https://t/2", "after"))
    val out = WarcParser.parse(WarcParser.encode(in))
    assert(out.length == 2)
    assert(new String(WarcParser.httpBody(out.head.payload).get, "UTF-8") == trap)
    assert(out(1).targetUri == "https://t/2")
  }

  test("httpBody splits on the first blank line; none for truncated payloads") {
    val b = WarcParser.httpBody("HTTP/1.1 200 OK\r\nA: b\r\n\r\nbody".getBytes)
    assert(new String(b.get) == "body")
    assert(WarcParser.httpBody("HTTP/1.1 200 OK\r\nno blank line".getBytes).isEmpty)
  }

  test("malformed input: garbage and truncated records are skipped, not thrown") {
    assert(WarcParser.parse("not a warc at all".getBytes).isEmpty)
    assert(WarcParser.parse(Array.empty[Byte]).isEmpty)
    // valid record followed by a truncated one: the valid one survives
    val good = WarcParser.encode(Seq(rec("https://g/1", "ok")))
    val truncated = WarcParser.encode(Seq(rec("https://g/2", "cut off here")))
      .dropRight(20)
    val out = WarcParser.parse(good ++ truncated)
    assert(out.length == 1 && out.head.targetUri == "https://g/1")
    // header without Content-Length is rejected
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload".getBytes
    assert(WarcParser.parse(noLen).isEmpty)
  }

  test("resync: a malformed record costs itself, not the file tail") {
    val good1 = WarcParser.encode(Seq(rec("https://r/1", "before")))
    val good2 = WarcParser.encode(Seq(rec("https://r/2", "after")))
    // CRLF-terminated garbage between two valid records
    val garbage = "GARBAGE LINE\r\nmore junk\r\n\r\n".getBytes("US-ASCII")
    val out1 = WarcParser.parse(good1 ++ garbage ++ good2)
    assert(out1.map(_.targetUri) == Seq("https://r/1", "https://r/2"))
    // a version-tagged record with NO Content-Length, then a valid one:
    // the header walk rejects the first, resync recovers the second
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes("US-ASCII")
    val out2 = WarcParser.parse(noLen ++ good2)
    assert(out2.map(_.targetUri) == Seq("https://r/2"))
    // oversized Content-Length mid-file: skip it, keep the next record
    val badLen = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999\r\n\r\nx".getBytes("US-ASCII")
    val out3 = WarcParser.parse(badLen ++ "\r\n".getBytes ++ good2)
    assert(out3.map(_.targetUri) == Seq("https://r/2"))
  }
}
