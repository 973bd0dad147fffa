package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Page's trend test (Page 1963) for an ORDERED alternative across k
  * matched conditions — where [[Agreement.cochranQ]] asks "do the k
  * conditions differ at all", Page's L asks "do they increase in the
  * hypothesized order" (e.g. funnel depth view < click < purchase),
  * which is far more powerful when the order is known a priori.
  *
  * Input: the DENSE subject×condition grid with an integer condition
  * rank 1..k and a value per cell. Within-subject midranks come from
  * the bounded k×k pair comparison (2·rank stays integer under ½-tie
  * midranks), so L accumulates as an exact integer 2L. The null
  * moments E[L] = n·k(k+1)²/4 and Var[L] = n·k²(k+1)(k²−1)/144 are
  * closed-form (tie-free null; ties make z conservative — documented,
  * standard practice). z is one float division at the edge.
  */
object PageTrend {

  /** One row: `n_subjects`, `k`, `l` (Page's L), `z` (6 dp, sign-pinned). */
  def pageL(df: DataFrame, subjCol: String, condRankCol: String,
            valCol: String): DataFrame = {
    val d = df.select(col(subjCol).as("u"),
      col(condRankCol).cast("long").as("c"),
      col(valCol).cast("long").as("v"))
    // 2·midrank of condition c within subject u: 2 + 2·#worse + #tied-others
    val r2 = d.as("a").join(d.as("b"),
        col("a.u") === col("b.u") && col("a.c") =!= col("b.c"))
      .groupBy(col("a.u").as("u"), col("a.c").as("c"))
      .agg((lit(2L)
        + lit(2L) * sum(when(col("b.v") < col("a.v"), 1L).otherwise(0L))
        + sum(when(col("b.v") === col("a.v"), 1L).otherwise(0L))).as("r2"))
    val sums = r2.agg(
      countDistinct(col("u")).as("n"),
      (max(col("c"))).as("k"),
      sum(col("c") * col("r2")).as("l2")) // 2L, exact integer
    sums.select(col("n").as("n_subjects"), col("k"),
      (col("l2").cast("double") / 2.0).as("l"),
      // z = (L − n·k(k+1)²/4) / sqrt(n·k²(k+1)(k²−1)/144)
      when(col("n") > 0 && col("k") > 1,
        round((col("l2").cast("double") / 2.0
            - col("n").cast("double") * col("k") * (col("k") + 1)
              * (col("k") + 1) / 4.0)
          / sqrt(col("n").cast("double") * col("k") * col("k")
            * (col("k") + 1) * (col("k") * col("k") - 1) / 144.0), 6)
          + lit(0.0)).as("z"))
  }
}
