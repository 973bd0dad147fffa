package graft.index

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {

  test("estimateTokens: word-aware for prose, len/4 for long runs") {
    assert(EmbedBatching.estimateTokens("Hello world") == 2L)
    assert(EmbedBatching.estimateTokens("a" * 40) == 10L)
    assert(EmbedBatching.estimateTokens("") == 1L) // floor: never zero
    // marks count one each; "x.y" = x + . + y
    assert(EmbedBatching.estimateTokens("x.y") == 3L)
  }

  test("truncateToTokens cuts at a token boundary, keeps within-budget text intact") {
    val text = "alpha beta gamma delta"
    assert(EmbedBatching.truncateToTokens(text, 100) eq text) // untouched
    val cut = EmbedBatching.truncateToTokens(text, 2)
    assert(cut == "alpha beta") // boundary cut, no partial word
    // a FIRST pre-token alone over budget cannot bypass the context cap:
    // hard char-cut at the token-equivalent length (the only mid-token cut)
    assert(EmbedBatching.truncateToTokens("internationalization", 1) == "inte")
    assert(EmbedBatching.truncateToTokens("a" * 100, 5) == "a" * 20)
  }

  test("hard cut never splits a surrogate pair") {
    // one unbroken run of astral-plane chars (2 UTF-16 units each): budget 1
    // → char cut at offset 4, which lands mid-pair at an odd offset for a
    // 3-unit-aligned layout; build one where offset 4 splits a pair
    val astral = new String(Character.toChars(0x1F600)) // 2 units
    val text = "abc" + astral * 50 // offset 4 = high surrogate of first pair
    val cut = EmbedBatching.truncateToTokens(text, 1)
    assert(!Character.isHighSurrogate(cut.last), "cut must back off a dangling high surrogate")
    // round-trips through UTF-8 without replacement chars
    val rt = new String(cut.getBytes("UTF-8"), "UTF-8")
    assert(rt == cut)
  }

  test("remote embedder truncates over-long texts before transport") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val transport: Seq[String] => Seq[Seq[Double]] = { batch =>
      seen ++= batch; batch.map(t => Seq(t.length.toDouble))
    }
    val emb = RemoteEmbedder(dim = 1, transport = transport, backoffMs = 1L, maxTextTokens = 3)
    // driver path: embedText applies the same truncation as the embed pass
    val v = emb.embedText("one two three four five")
    assert(seen.head == "one two three")
    assert(v == Seq("one two three".length.toDouble))
  }
}
