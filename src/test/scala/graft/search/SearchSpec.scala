package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorOps

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression matches higher-order-function fallback and hand math") {
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0)),
      (2L, Array(-1.0, 0.5, 0.0)),
      (3L, Array(0.0, 0.0, 0.0)) // zero norm -> 0.0
    ).toDF("id", "v")
    val q = VectorOps.vecLit(Seq(1.0, 0.0, 0.0))
    val rows = df
      .withColumn("c_expr", VectorOps.cosine(col("v"), q))
      .withColumn("c_hof", VectorOps.cosineHof(col("v"), q))
      .orderBy("id")
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12,
        s"expr vs hof mismatch: $r")
    }
    assert(math.abs(rows(0).getDouble(2) - 1.0 / math.sqrt(14.0)) < 1e-12)
    assert(rows(2).getDouble(2) == 0.0)
  }

  test("knn topK returns k best with deterministic tie-break") {
    val df = (1L to 100L).map(i => (i, Array(i.toDouble, 1.0))).toDF("id", "v")
    val top = KnnSearch.topK(df, "id", "v", Seq(1.0, 0.0), 5).collect()
    assert(top.length == 5)
    // score = i/sqrt(i^2+1), increasing in i -> ids 100..96
    assert(top.map(_.getLong(0)).toSeq == Seq(100L, 99L, 98L, 97L, 96L))
    assert(top.head.getDouble(1) > top.last.getDouble(1))
  }

  test("knn threshold filters low scores") {
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0))).toDF("id", "v")
    val top = KnnSearch.topK(df, "id", "v", Seq(1.0, 0.0), 10, threshold = 0.5).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("bm25: common terms get lower idf; tf boosts score; k1/b from reference") {
    val docs = Seq(
      (1L, "spark join spark join spark"),
      (2L, "spark filter scan"),
      (3L, "window sort merge"),
      (4L, "scan batch hash"),
      (5L, "merge sort value"),
      (6L, "value hash batch")
    ).toDF("doc_id", "text")
    val model = Bm25.fit(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(model("spark")._1 == 2) // df
    assert(model("window")._1 == 1)
    assert(model("spark")._2 < model("window")._2) // common -> lower idf
    // robertson idf goes NEGATIVE for terms in >half the corpus — faithful
    // to the reference formula ln((N-df+0.5)/(df+0.5))
    assert(model("spark")._2 > 0.0)
    val res = Bm25.search(docs, "doc_id", "text", Seq("spark"), 10).collect()
    // doc 1 has tf=3 of 'spark' -> highest positive score
    assert(res.head.getLong(0) == 1L)
  }

  test("bm25 tokens: lowercase, alnum runs, length>1") {
    val toks = Seq(Tuple1("Hello, WORLD! x a1-b2"))
      .toDF("t").select(Bm25.tokens(col("t"))).head().getSeq[String](0)
    assert(toks == Seq("hello", "world", "a1", "b2"))
  }

  test("snippets: first-hit window, left-edge clamp, right overrun, no-hit null") {
    val terms = Seq("join", "spark")
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg join hh ii jj kk ll"), // pos 8 -> window 3..13
      (2L, "spark aa bb"),                              // pos 1 -> clamp to 1..3
      (3L, "aa bb spark cc join"),                      // spark (3) before join (5)
      (4L, "nothing matching here at all")              // null snippet
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      Snippets.firstMatchPos(col("text"), terms).as("pos"),
      Snippets.extract(col("text"), terms, before = 2, width = 5).as("snip"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.getString(2)))).toMap
    assert(out(1L) == ((Some(8L), Some("ff gg join hh ii"))))
    assert(out(2L) == ((Some(1L), Some("spark aa bb")))) // clamped + short doc
    assert(out(3L) == ((Some(3L), Some("aa bb spark cc join"))))
    assert(out(4L) == ((None, None)))
  }

  test("rrf fuses ranks with k0=60 alpha=0.5; missing side contributes 0") {
    val dense = Seq((10L, 0.9), (20L, 0.8)).toDF("id", "score")
    val sparse = Seq((20L, 5.0), (30L, 4.0)).toDF("id", "score")
    val out = Hybrid.rrf(dense, sparse, "id", 10).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf_score")).toMap
    val e20 = 0.5 / 62 + 0.5 / 61 // dense rank 2, sparse rank 1
    val e10 = 0.5 / 61            // dense rank 1 only
    val e30 = 0.5 / 62            // sparse rank 2 only
    assert(math.abs(out(20L) - e20) < 1e-12)
    assert(math.abs(out(10L) - e10) < 1e-12)
    assert(math.abs(out(30L) - e30) < 1e-12)
  }

  test("lsh bucket is sign-bit integer; probe covers Hamming-1") {
    val df = Seq(
      (1L, Array(1.0, 1.0, -1.0)),   // bits 1,1,0 -> 3
      (2L, Array(-1.0, -1.0, 1.0))   // bits 0,0,1 -> 4
    ).toDF("id", "v")
    val b = df.withColumn("b", LshAnn.bucketOf(col("v"), 3))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b(1L) == 3L && b(2L) == 4L)
    assert(LshAnn.probeBuckets(3L, 3).toSet == Set(3L, 2L, 1L, 7L))
    // query [1,1,-1] -> bucket 3; id 2's bucket 4 is Hamming-3 away -> pruned
    val hits = LshAnn.topK(df, "id", "v", Seq(1.0, 1.0, -1.0), 10, nBits = 3)
    assert(hits.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
