package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registration-domain (eTLD+1) extraction against a public-suffix list —
  * the Mozilla PSL algorithm (publicsuffix.org, public spec): the winning
  * suffix is the LONGEST list entry that label-suffix-matches the host,
  * and the registrable domain is that suffix plus one more label. This is
  * what turns raw crawl hosts into crawl-budget / dedup / politeness keys
  * ("a.b.example.co.uk" groups under "example.co.uk", not "co.uk" or
  * "b.example.co.uk").
  *
  * Shape: a host has at most a handful of labels, so each host emits its
  * ≤ `maxLabels` candidate label-suffixes (a bounded generate, no UDF) and
  * equi-joins them against the BROADCAST suffix list; max-by-length picks
  * the winner per host. No shuffle touches the host table itself beyond
  * the final per-host partial agg — at 100 TB the suffix list is still a
  * few thousand rows, broadcast everywhere.
  */
object PublicSuffix {

  /** Representative PSL subset for the engine's tests; a production run
    * loads the full published list into the same two-column shape.
    * Multi-label entries (co.uk) and private registries (github.io) are
    * what make naive "last two labels" splitting wrong.
    */
  val DefaultSuffixes: Seq[String] =
    Seq("com", "org", "net", "io", "gov", "edu", "co.uk", "org.uk",
      "com.au", "github.io", "blogspot.com", "s3.amazonaws.com")

  /** Adds `suffix` (winning public suffix, null if none matches) and
    * `etld1` (registrable domain, null if the host IS a bare suffix or
    * matches nothing) to `df`.
    */
  def registrableDomain(df: DataFrame, hostCol: String,
                        suffixes: Seq[String] = DefaultSuffixes,
                        maxLabels: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val suf = broadcast(suffixes.toDF("suffix"))

    val withId = df.withColumn("_labels", split(col(hostCol), "\\."))
    // candidate label-suffixes, longest-first: slice(labels, n-k+1, k)
    val cands = withId.withColumn("_k",
        explode(sequence(lit(1), least(size(col("_labels")), lit(maxLabels)))))
      .withColumn("_cand",
        array_join(slice(col("_labels"), size(col("_labels")) - col("_k") + 1, col("_k")), "."))
    val matched = cands.join(suf, col("_cand") === col("suffix"), "inner")
      // longest winning suffix per host row
      .groupBy(col(hostCol))
      .agg(max(struct(col("_k").as("k"), col("suffix").as("s"))).as("_w"))
      .select(col(hostCol), col("_w.s").as("suffix"), col("_w.k").as("_k"))

    df.join(matched, Seq(hostCol), "left")
      .withColumn("_labels", split(col(hostCol), "\\."))
      .withColumn("etld1",
        when(col("suffix").isNotNull && size(col("_labels")) > col("_k"),
          array_join(slice(col("_labels"),
            size(col("_labels")) - col("_k"), col("_k") + 1), ".")))
      .drop("_labels", "_k")
  }
}
