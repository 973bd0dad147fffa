package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / URL detection and redaction for training-data preparation — pure
  * regexp column expressions (codegen'd, one map pass over the corpus at
  * any scale; no UDFs).
  *
  * The patterns deliberately use only syntax with IDENTICAL semantics in
  * Java regex (Spark) and RE2 (DuckDB/Go tooling): character classes,
  * bounded repetition, alternation — no lookaround, no backreferences.
  * That keeps one pattern string valid across the whole data platform, and
  * the q49 gate replays the redaction in DuckDB to prove it.
  */
object PiiScrub {

  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  val UrlRx = "https?://[^\\s]+"

  /** 7+ chars of phone-shaped material: digits with (), -, space fill,
    * optional leading +. Long digit runs (ids, timestamps) match too — by
    * design: for scrubbing, over-redaction of number-like runs is the safe
    * default.
    */
  val PhoneRx = "\\+?[0-9][0-9()\\-\\s]{5,}[0-9]"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRx), lit(0)))

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlRx), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRx), lit(0)))

  /** Replace every URL / email / phone with a sentinel token. Order
    * matters and is part of the contract: URLs first (they may embed
    * @ and digit runs), then emails, then phone-shaped digit runs.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRx, "<URL>"),
        EmailRx, "<EMAIL>"),
      PhoneRx, "<PHONE>")
}
