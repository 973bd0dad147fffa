package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Reads the REAL driver-generated testdata through `Tables` — the one
  * boundary `sbt test` previously never crossed, which let a driver-side
  * parquet re-encoding (TIMESTAMP_NTZ ts) kill six gates while the suite
  * stayed green. Every table must load, normalize to the expected schema,
  * and answer a smoke aggregate.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def haveData: Boolean = Files.isDirectory(Paths.get(sfDir))

  private val allTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  test("every testdata table loads via Tables and is non-empty") {
    assume(haveData, s"$sfDir not present")
    allTables.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, name)
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("events.ts normalizes to TimestampType regardless of parquet encoding") {
    assume(haveData, s"$sfDir not present")
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts must normalize to TIMESTAMP, got ${ev.schema("ts").dataType}")
    // the operations that died on NTZ must work on the normalized frame
    val probe = ev.select(
      unix_micros(col("ts")).as("us"),
      col("ts").cast("double").as("d")).agg(min("us"), max("d")).collect()(0)
    assert(probe.getLong(0) > 0L)
  }

  test("smoke aggregates per table match basic sanity bounds") {
    assume(haveData, s"$sfDir not present")
    assert(Tables.region(spark, sfDir).select("r_regionkey").distinct.count() == 5)
    assert(Tables.nation(spark, sfDir).select("n_nationkey").distinct.count() == 25)
    val li = Tables.lineitem(spark, sfDir)
    assert(li.agg(sum(col("l_quantity"))).collect()(0).getDouble(0) > 0)
    val docs = Tables.documents(spark, sfDir)
    assert(docs.schema.fieldNames.contains("text") ||
      docs.schema.fieldNames.exists(_.contains("content")))
    val emb = Tables.embeddings(spark, sfDir)
    val dim = emb.select(size(col(emb.schema.fields
      .find(f => f.dataType.isInstanceOf[ArrayType]).get.name))).limit(1).collect()(0).getInt(0)
    assert(dim > 0, "embeddings must carry a non-empty vector column")
  }

  test("embeddings normalize to array<float> + int label even if the writer drifts") {
    assume(haveData, s"$sfDir not present")
    val emb = Tables.embeddings(spark, sfDir)
    assert(emb.schema("embedding").dataType === ArrayType(FloatType, containsNull = true)
      || emb.schema("embedding").dataType === ArrayType(FloatType, containsNull = false),
      s"got ${emb.schema("embedding").dataType}")
    assert(emb.schema("label").dataType === IntegerType)
    // a double-typed regeneration must normalize through the same loader path
    val tmp = java.nio.file.Files.createTempDirectory("emb_drift").toString
    import spark.implicits._
    Seq((1L, Seq(0.5d, 0.25d), 3L)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val drifted = Tables.embeddings(spark, tmp)
    assert(drifted.schema("embedding").dataType.asInstanceOf[ArrayType].elementType === FloatType)
    assert(drifted.schema("label").dataType === IntegerType)
    assert(drifted.select(element_at(col("embedding"), 1)).collect()(0).getFloat(0) == 0.5f)
  }

  test("normalizeTimestamp: INT64-nanos-as-long, NTZ-us and LTZ-us encodings of the same data normalize to identical rows") {
    import spark.implicits._
    val base = Seq(
      (1L, "2024-03-01 10:15:30.123456"),
      (2L, "2024-03-01 10:15:30.0"),
      (3L, "2024-12-31 23:59:59.999999"),
      (4L, "1999-01-01 00:00:00.000001")
    ).toDF("id", "s").withColumn("ts", to_timestamp(col("s"))).select("id", "ts")

    val tmp = Files.createTempDirectory("graft_ts_chaos")
    val dirLong = tmp.resolve("long").toString
    val dirNtz = tmp.resolve("ntz").toString
    val dirLtz = tmp.resolve("ltz").toString

    // legacy pyarrow TIMESTAMP(NANOS) surfaces as a raw long under
    // nanosAsLong — model it as an actual INT64 nanos column
    base.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$dirLong/events.parquet")
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dirNtz/events.parquet")
    base.write.mode("overwrite").parquet(s"$dirLtz/events.parquet")

    val frames = Seq(dirLong, dirNtz, dirLtz).map(d => Tables.events(spark, d))
    frames.foreach { f =>
      assert(f.schema("ts").dataType === TimestampType, f.schema.treeString)
    }
    val rows = frames.map(_.orderBy("id").select("id", "ts").collect().toSeq)
    assert(rows(0) === rows(1), "long-nanos vs NTZ rows diverge")
    assert(rows(1) === rows(2), "NTZ vs LTZ rows diverge")
  }
}
