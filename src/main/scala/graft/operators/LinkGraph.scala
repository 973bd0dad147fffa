package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LINK-GRAPH EXTRACTION from crawled HTML — the step between WARC
  * ingestion ([[graft.ingest.WarcParser]], q60/q74) and the graph
  * analytics already in the engine (PageRank q67, BFS q62): pages in,
  * `(src, dst)` edge table out, with relative hrefs resolved against the
  * page URI. In a crawl pipeline this edge table drives frontier
  * expansion, per-domain in-degree quality priors, and link-spam
  * detection.
  *
  * Scale shape: extraction is a NARROW pass — `regexp_extract_all` +
  * `explode` + column-only URL resolution (no UDF, no shuffle); the edge
  * table lands already keyed for whatever comes next, and `degrees` is
  * one partial-aggregated groupBy per side. At 100 TB the only shuffles
  * are the degree aggregations, both map-side combined; hub pages (the
  * in-degree skew case) collapse per partition before the exchange.
  *
  * Resolution rules (column expressions only):
  *   - `http(s)://...` absolute hrefs pass through verbatim (a server
  *     emitting `../` inside an absolute URL is its own canonicalization
  *     problem — documented limitation);
  *   - `/rooted` paths resolve to `scheme://host/rooted`;
  *   - `relative.html` resolves into the page URI's directory;
  *   - `./` and `seg/../` runs in the resolved path are collapsed (so
  *     `../a.html` lands on the SAME node as the canonical URL — without
  *     this one page fragments into several graph nodes), with leading
  *     `/../` clamped to root; nesting beyond depth 4 is left as-is;
  *   - `mailto:`/`javascript:`/`data:` schemes and fragment-only (`#...`)
  *     hrefs are dropped, and a trailing `#fragment` is trimmed.
  */
object LinkGraph {

  private val HrefRe = """<a[^>]*\bhref\s*=\s*["']([^"']+)["']"""
  private val AnchorRe = """<a[^>]*\bhref\s*=\s*["']([^"']+)["'][^>]*>([^<]*)</a>"""

  /** Collapse `/./` and `seg/../` in a path (RFC 3986 §5.2.4's common
    * cases) with a FIXED number of regexp passes — column-only, no UDF.
    * Java regex replaceAll resumes after each match, so one pass clears
    * non-overlapping runs and repetition handles nesting: 2 passes for
    * `/./` chains, 4 for `a/b/../../`-style unwinding (crawl hrefs
    * deeper than that are vanishingly rare and stay un-normalized).
    * Leading `/../` runs clamp to root, mirroring browser behavior.
    */
  private def normPath(p: Column): Column = {
    val noDot = (1 to 2).foldLeft(p)((c, _) => regexp_replace(c, "/\\.(/|$)", "$1"))
    val noUp = (1 to 4).foldLeft(noDot)((c, _) => regexp_replace(c, "/[^/]+/\\.\\.(/|$)", "$1"))
    regexp_replace(noUp, "^(/\\.\\.)+(/|$)", "/")
  }

  /** Fragment-trimmed href resolved against the page URI in `src`. */
  private def resolved(href: Column): Column = {
    val src = col("src")
    val proto = lower(parse_url(src, lit("PROTOCOL")))
    val hostPort = parse_url(src, lit("AUTHORITY"))
    val dir = regexp_replace(parse_url(src, lit("PATH")), "/[^/]*$", "")
    when(href.rlike("^https?://"), href)
      .when(href.startsWith("/"), concat(proto, lit("://"), hostPort, normPath(href)))
      .otherwise(concat(proto, lit("://"), hostPort,
        normPath(concat(dir, lit("/"), href))))
  }

  /** `(src, dst)` — distinct resolved link edges from an HTML page table. */
  def edges(pages: DataFrame, uriCol: String, htmlCol: String): DataFrame = {
    // all parts derive from the post-rename `src` column — the explode
    // projection below drops the original uriCol name
    val href = regexp_replace(col("_href"), "#.*$", "") // trim fragment
    pages
      .select(col(uriCol).as("src"),
        explode(regexp_extract_all(col(htmlCol), lit(HrefRe), lit(1))).as("_href"))
      .filter(!col("_href").rlike("^(mailto:|javascript:|data:|#)"))
      .filter(href =!= "") // href was ONLY a fragment + trailing junk
      .select(col("src"), resolved(href).as("dst"))
      .distinct()
  }

  /** `(src, dst, anchor)` — one row per link occurrence with its
    * trimmed inner text: the web-corpus signal that describes a TARGET
    * page in the words of the pages linking to it (the anchor-text
    * aggregation behind classic retrieval features and alt document
    * titles in crawl curation). Href and text come from ONE pattern via
    * two `regexp_extract_all` group pulls — position-aligned by
    * construction, paired with `posexplode` + `element_at` (narrow
    * codegen, no UDF). Duplicates are kept: the same link said twice is
    * twice the signal, and downstream aggs want occurrence counts.
    */
  def anchors(pages: DataFrame, uriCol: String, htmlCol: String): DataFrame = {
    val href = regexp_replace(col("_href"), "#.*$", "")
    pages
      .select(col(uriCol).as("src"),
        regexp_extract_all(col(htmlCol), lit(AnchorRe), lit(1)).as("_hrefs"),
        regexp_extract_all(col(htmlCol), lit(AnchorRe), lit(2)).as("_texts"))
      .select(col("src"), col("_texts"),
        posexplode(col("_hrefs")).as(Seq("_i", "_href")))
      .filter(!col("_href").rlike("^(mailto:|javascript:|data:|#)"))
      .filter(href =!= "")
      .select(col("src"), resolved(href).as("dst"),
        trim(element_at(col("_texts"), col("_i") + 1)).as("anchor"))
  }

  /** Per-page degree table: `(page, out_deg, in_deg)` — pages appearing
    * only as targets carry `out_deg` 0, dangling sources `in_deg` 0.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("page")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("page")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("page"), "full_outer")
      .select(col("page"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
