package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultipleTestingSpec extends SparkSpec {
  import spark.implicits._

  test("normalSf matches the textbook normal tail to the A-S 7.1.26 bound") {
    // Φ̄(0)=0.5, Φ̄(1.96)≈0.0249979, Φ̄(3)≈0.0013499
    val rows = Seq(0.0, 1.0, 1.959964, 3.0).toDF("z")
      .select(col("z"), MultipleTesting.normalSf(col("z")).as("sf"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows(0.0) - 0.5) < 1e-7)
    assert(math.abs(rows(1.0) - 0.15865525) < 1e-7)
    assert(math.abs(rows(1.959964) - 0.025) < 1e-7)
    assert(math.abs(rows(3.0) - 0.00134990) < 1e-7)
  }

  test("BH step-up: rejects the strong effects, keeps nulls, monotone in rank") {
    // 3 slices wildly enriched, 17 at the base rate
    val data = (1 to 20).flatMap { s =>
      val grp = f"s$s%02d"
      val hits = if (s <= 3) 180 else 60
      (1 to hits).map(_ => (grp, 1L)) ++ (1 to (300 - hits)).map(_ => (grp, 0L))
    }
    val out = MultipleTesting.bhFdr(data.toDF("g", "hit"), "g", "hit", alpha = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    val rejected = out.filter(_._2.getAs[Boolean]("rejected")).keySet
    assert(Set("s01", "s02", "s03").subsetOf(rejected), s"rejected: $rejected")
    // step-up property: the rejected set is a prefix of the p-rank order
    val ranksRej = out.values.filter(_.getAs[Boolean]("rejected")).map(_.getAs[Long]("p_rank"))
    assert(ranksRej.toSeq.sorted == (1L to ranksRej.size).toSeq)
    // p-values live in [0, 1]
    assert(out.values.forall { r =>
      val p = r.getAs[Double]("p"); p >= 0.0 && p <= 1.0
    })
  }

  test("Cochran-Armitage: a monotone dose-response yields a large positive z") {
    val data = (0 to 2).flatMap { d =>
      val hits = 20 + 30 * d // 20/200, 50/200, 80/200
      (1 to hits).map(_ => (d.toLong, 1L)) ++ (1 to (200 - hits)).map(_ => (d.toLong, 0L))
    }
    val r = MultipleTesting.cochranArmitage(data.toDF("dose", "hit"), "dose", "hit")
      .collect().head
    assert(r.getAs[Long]("n") == 600L && r.getAs[Long]("levels") == 3L)
    assert(r.getAs[Double]("z_trend") > 5.0)
    // flat response ~ 0
    val flat = (0 to 2).flatMap { d =>
      (1 to 50).map(_ => (d.toLong, 1L)) ++ (1 to 150).map(_ => (d.toLong, 0L))
    }
    val z0 = MultipleTesting.cochranArmitage(flat.toDF("dose", "hit"), "dose", "hit")
      .collect().head.getAs[Double]("z_trend")
    assert(math.abs(z0) < 1e-9)
  }

  test("twoPropPower: no effect gives alpha-level power; a huge effect gives ~1") {
    // identical 30% rates -> d = 0 -> power = Phi(-1.96)+Phi(-1.96) = 0.05
    val none = (1 to 1000).map(i => (i % 2, if ((i / 2) % 10 < 3) 1 else 0))
    val r0 = MultipleTesting.twoPropPower(none.toDF("grp", "hit"), "grp", "hit")
      .collect().head
    assert(math.abs(r0.getAs[Double]("power") - 0.05) < 1e-3)
    // 10% vs 90% at n=500/arm is essentially always detected
    val huge = (1 to 1000).map { i =>
      val g = i % 2
      (g, if (g == 0) (if (i % 10 == 0) 1 else 0) else (if (i % 10 != 0) 1 else 0))
    }
    val r1 = MultipleTesting.twoPropPower(huge.toDF("grp", "hit"), "grp", "hit")
      .collect().head
    assert(r1.getAs[Double]("power") > 0.9999)
    // MDE shrinks as the sample grows
    assert(r1.getAs[Double]("mde80") > 0.0)
  }

  test("tost: identical rates at scale prove equivalence; a real gap fails it") {
    val same = (1 to 4000).map(i => (i % 2, if ((i / 2) % 10 < 3) 1 else 0))
    val r0 = MultipleTesting.tostEquivalence(same.toDF("grp", "hit"),
      "grp", "hit", margin = 0.05, alpha = 0.05).collect().head
    assert(r0.getAs[Boolean]("equivalent"), r0.toString)
    val gap = (1 to 4000).map { i =>
      val g = i % 2
      (g, if ((i / 2) % 10 < (if (g == 0) 2 else 5)) 1 else 0)
    }
    val r1 = MultipleTesting.tostEquivalence(gap.toDF("grp", "hit"),
      "grp", "hit", margin = 0.05, alpha = 0.05).collect().head
    assert(!r1.getAs[Boolean]("equivalent"), r1.toString)
  }

  test("holm is never more liberal than BH on the same family") {
    val rows = (1 to 26).flatMap { g =>
      val p = if (g <= 3) 9 else 5 // three strongly deviant groups
      (1 to 200).map(i => (s"g$g", if (i % 10 < p) 1L else 0L))
    }
    val df = rows.toDF("grp", "hit")
    val holmRej = MultipleTesting.holm(df, "grp", "hit", 0.05)
      .filter(col("rejected")).collect().map(_.getString(0)).toSet
    val bhRej = MultipleTesting.bhFdr(df, "grp", "hit", 0.05)
      .filter(col("rejected")).collect().map(_.getString(0)).toSet
    assert(holmRej.subsetOf(bhRej), s"holm $holmRej vs bh $bhRej")
    assert(holmRej.nonEmpty, "the three deviant groups must survive Holm")
  }

  test("BY is never more liberal than BH, and its harmonic factor is H_m") {
    val rows = (1 to 26).flatMap { g =>
      val p = if (g <= 3) 9 else 5
      (1 to 200).map(i => (s"g$g", if (i % 10 < p) 1L else 0L))
    }
    val df = rows.toDF("grp", "hit")
    val by = MultipleTesting.byFdr(df, "grp", "hit", 0.05).collect()
    val byRej = by.filter(_.getAs[Boolean]("rejected")).map(_.getString(0)).toSet
    val bhRej = MultipleTesting.bhFdr(df, "grp", "hit", 0.05)
      .filter(col("rejected")).collect().map(_.getString(0)).toSet
    assert(byRej.subsetOf(bhRej), s"by $byRej vs bh $bhRej")
    assert(byRej.nonEmpty, "the three deviant groups must survive BY")
    // c(26) = Σ_{i=1..26} 1/i = 3.854420 (6dp)
    assert(by.head.getAs[Double]("c_m") == 3.85442)
  }
}
