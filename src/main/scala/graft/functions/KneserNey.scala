package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.search.Bm25

/** Kneser-Ney smoothed bigram language model (Kneser & Ney 1995; the
  * interpolated form in Chen & Goodman 1998) — the standard n-gram
  * smoother, and a sharper corpus-quality/OOD scorer than the add-one
  * model in q95: probability mass freed by absolute discounting is
  * redistributed by CONTINUATION count (how many distinct contexts a
  * word follows), so "francisco" — frequent but only ever after "san" —
  * scores low in novel contexts where add-one overrates it.
  *
  * Everything is derived from three integer count tables (bigram counts,
  * per-context totals/fan-outs, per-word continuation counts) — term-keyed
  * partial aggs, a 1-row broadcast total, and one float formula at the
  * output edge. No windows, no doc×doc, scan-bound at corpus scale.
  */
object KneserNey {

  /** Top-`k` bigrams by raw count (ties by term) with their interpolated
    * KN probability, rounded to 6 dp:
    * `P(b|a) = max(c(ab)−D,0)/c(a) + D·N1+(a·)/c(a) · N1+(·b)/T`.
    */
  def bigramProbs(docs: DataFrame, textCol: String, k: Int,
                  discount: Double = 0.75): DataFrame = {
    val toks = docs.select(Bm25.tokens(col(textCol)).as("t"))
    val bg = toks.select(explode(expr(
      "zip_with(slice(t, 1, greatest(size(t) - 1, 0)), slice(t, 2, greatest(size(t) - 1, 0)), (x, y) -> struct(x AS a, y AS b))"))
      .as("u"))
      .select(col("u.a").as("a"), col("u.b").as("b"))
    val cab = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    // context totals + right fan-out in ONE agg over the (already
    // aggregated) bigram-type table — never re-reads the corpus
    val ctx = cab.groupBy(col("a"))
      .agg(sum(col("cab")).as("ca"), count(lit(1)).as("n1r"))
    val cont = cab.groupBy(col("b")).agg(count(lit(1)).as("n1l"))
    val types = cab.agg(count(lit(1)).as("tt"))
    cab.join(ctx, Seq("a")).join(cont, Seq("b"))
      .crossJoin(broadcast(types)) // 1 row
      .select(col("a"), col("b"), col("cab"),
        round(greatest(col("cab") - lit(discount), lit(0.0)) / col("ca")
          + lit(discount) * col("n1r") / col("ca")
            * (col("n1l").cast("double") / col("tt")), 6).as("pkn"))
      .orderBy(col("cab").desc, col("a"), col("b"))
      .limit(k)
  }
}
