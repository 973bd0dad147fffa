package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.NfcNormalize

/** Crawl-text normalization: the cleanup pass that runs before any
  * dedup/fingerprint/tokenize stage, because all of those key on exact
  * bytes — two visually identical documents must normalize to the same
  * string or every downstream equality silently misses.
  *
  * Pure column expressions (regexp + the native NFC expression), so the
  * whole pass is one codegen map over the scan.
  */
object TextNorm {

  /** Unicode NFC canonical composition ([[NfcNormalize]] — é vs e+U+0301
    * unify; required before byte-keyed dedup of multi-source text).
    */
  def nfc(text: Column): Column = NfcNormalize(text)

  /** Whitespace + control normalization, structure-preserving:
    *   1. control chars stripped (C0 except \t\n, plus DEL),
    *   2. \r\n / \r -> \n,
    *   3. runs of spaces/tabs -> one space,
    *   4. spaces around newlines trimmed,
    *   5. 3+ consecutive newlines -> exactly 2 (paragraph break kept),
    *   6. leading/trailing whitespace trimmed.
    */
  def cleanWhitespace(text: Column): Column = {
    val noCtl = regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    val nl = regexp_replace(noCtl, "\\r\\n?", "\n")
    val sp = regexp_replace(nl, "[ \\t]+", " ")
    val tight = regexp_replace(sp, " ?\\n ?", "\n")
    val para = regexp_replace(tight, "\\n{3,}", "\n\n")
    trim(para, " \n")
  }

  /** The full pass: NFC then whitespace cleanup. */
  def clean(text: Column): Column = cleanWhitespace(nfc(text))

  /** Intra-document duplicate-line removal (the Gopher/C4-style repetition
    * scrub): keep each line's FIRST occurrence, preserve order, drop the
    * rest. Repeated nav chrome, cookie banners, and boilerplate footers
    * inside one page are the target — CROSS-document repetition belongs to
    * [[graft.dedup.ParagraphDedup]].
    *
    * Pure higher-order-function expression — `filter` keeps position i iff
    * no earlier element equals it (`exists` over the length-i prefix) — so
    * the whole scrub stays a codegen map over the scan: no explode, no
    * shuffle, no UDF. Quadratic in the line count of ONE document, which
    * is bounded and local; never in rows.
    */
  def dedupLines(text: Column, sep: String = "\n"): Column = {
    val arr = split(text, java.util.regex.Pattern.quote(sep))
    array_join(
      filter(arr, (x, i) => !exists(slice(arr, lit(1), i), y => y === x)),
      sep)
  }
}
