package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl corpora — the standard prerequisite
  * for URL/host-level dedup and per-domain corpus statistics (none of this
  * exists in the reference; it is part of the LLM-data-pipeline extension
  * surface).
  *
  * Everything is pure column expressions over `parse_url` (Spark's
  * built-in java.net.URI-backed extractor) + regexp/HOF rewrites — no UDF,
  * so the whole normalization is a narrow map pass that survives any
  * scale-up, and the canonical URL can serve as a shuffle/partition key
  * immediately after.
  *
  * Canonical form: lowercase scheme and host, `www.` prefix stripped,
  * default ports (80/http, 443/https) dropped while non-default ports are
  * kept, fragment dropped, tracking query params (`utm_*`, `ref`,
  * `fbclid`, `gclid`) removed with the remaining params left in order,
  * and the path's trailing slash trimmed (root collapses to no path).
  */
object UrlOps {

  private val TrackingParam = "^(utm_[a-z]+|ref|fbclid|gclid)="

  /** Lowercased host with any `www.` prefix stripped; null for bad URLs. */
  def host(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** The canonical URL (see object doc for the exact rules). */
  def normalized(url: Column): Column = {
    val proto = lower(parse_url(url, lit("PROTOCOL")))
    // java.net.URI's HOST excludes the port; AUTHORITY keeps it
    val rawPort = regexp_extract(parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val defaultPort =
      when(proto === "http", "80").when(proto === "https", "443").otherwise("")
    val port = when(rawPort === "" || rawPort === defaultPort, "")
      .otherwise(concat(lit(":"), rawPort))
    val path = regexp_replace(parse_url(url, lit("PATH")), "/+$", "")
    val query = array_join(
      filter(split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&"),
        p => !p.rlike(TrackingParam) && p =!= ""),
      "&")
    concat(
      proto, lit("://"), host(url), port, path,
      when(query === "", "").otherwise(concat(lit("?"), query)))
  }
}
