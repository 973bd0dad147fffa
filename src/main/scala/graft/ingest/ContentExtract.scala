package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML MAIN-CONTENT EXTRACTION — the boilerpipe/jusText block-density
  * heuristic every web-corpus pipeline runs between fetch and dedup:
  * segment a page into block-level chunks, score each by text length and
  * LINK DENSITY (share of its text living inside <a> tags), and keep the
  * long, link-light blocks as main content. Navigation, footers, and
  * promo chrome are short and link-dense; articles are long and
  * link-light (Kohlschütter et al., WSDM 2010).
  *
  * Scale shape: a pure per-document JVM string pass in a typed map — the
  * WARC/tar parser discipline — so extraction over 100 TB of HTML is
  * embarrassingly parallel with zero shuffle; the per-block struct output
  * feeds directly into the dedup/quality stages.
  */
object ContentExtract {

  /** One segmented block with its density classification. */
  case class Block(idx: Int, text: String, nChars: Int, nLinkChars: Int,
                   content: Boolean)

  private val BlockTagRe =
    """(?i)</?(?:p|div|li|ul|ol|h[1-6]|section|article|header|footer|nav|table|thead|tbody|tr|td|th|blockquote|pre|br)\b[^>]*>""".r
  private val ARe = """(?is)<a\b[^>]*>(.*?)</a>""".r
  private val TagRe = """(?s)<[^>]*>""".r
  private val ScriptStyleRe = """(?is)<(script|style)\b[^>]*>.*?</\1>""".r

  private def stripTags(s: String): String = TagRe.replaceAllIn(s, "")

  /** Segment `html` into trimmed non-empty blocks and classify each:
    * content ⇔ text length ≥ `minChars` AND link density ≤
    * `maxLinkDensity`.
    */
  def blocks(html: String, minChars: Int = 25,
             maxLinkDensity: Double = 1.0 / 3): Seq[Block] = {
    val cleaned = ScriptStyleRe.replaceAllIn(html, " ")
    BlockTagRe.split(cleaned).iterator
      .map { seg =>
        val linkChars = ARe.findAllMatchIn(seg)
          .map(m => stripTags(m.group(1)).trim.length).sum
        val text = stripTags(seg).trim
        (text, linkChars)
      }
      .filter(_._1.nonEmpty)
      .zipWithIndex
      .map { case ((text, linkChars), i) =>
        val density = linkChars.toDouble / text.length // text nonempty here
        Block(i, text, text.length, linkChars,
          text.length >= minChars && density <= maxLinkDensity)
      }
      .toSeq
  }

  /** The extracted main text: content blocks joined by blank lines. */
  def mainText(html: String, minChars: Int = 25,
               maxLinkDensity: Double = 1.0 / 3): String =
    blocks(html, minChars, maxLinkDensity).filter(_.content).map(_.text)
      .mkString("\n\n")

  /** Per-document block statistics over an HTML column:
    * `(doc_id, n_blocks, n_content, content_chars)`.
    */
  def stats(df: DataFrame, idCol: String, htmlCol: String,
            minChars: Int = 25, maxLinkDensity: Double = 1.0 / 3): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(htmlCol))
      .as[(Long, String)]
      .map { case (id, html) =>
        val bs = blocks(html, minChars, maxLinkDensity)
        val content = bs.filter(_.content)
        (id, bs.size.toLong, content.size.toLong,
          content.map(_.nChars.toLong).sum)
      }
      .toDF("doc_id", "n_blocks", "n_content", "content_chars")
  }
}
