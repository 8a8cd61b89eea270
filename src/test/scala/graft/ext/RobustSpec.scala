package graft.ext

import graft.SparkTestBase

class RobustSpec extends SparkTestBase {
  import spark.implicits._

  test("madOutliers: hand-checked median, MAD, and outlier count") {
    // g=a values 1..7 plus outlier 100: lower median of 8 values = 4,
    // deviations {3,2,1,0,1,2,3,96} sorted {0,1,1,2,2,3,3,96} -> MAD = 2
    // cut = 3*1.4826*2 = 8.8956 -> only 96 exceeds it
    val d = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0).zipWithIndex.map {
      case (v, i) => ("a", v, i.toLong)
    }).toDF("g", "v", "id")
    val got = Robust.madOutliers(d, "g", "v", "id")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(("a", 8L, 4.0, 2.0, 1L)))
  }

  test("madOutliers: median/MAD immune to a far outlier, mean/sigma is not") {
    // 9 clustered points + 1 at 1e6: the robust screen still flags
    // exactly the planted point; the 3-sigma rule flags nothing — a lone
    // outlier masks itself whenever |x−mean| < 3σ, i.e. n ≲ 10
    // (σ ≈ outlier/√n here: 3σ = 899,989.0... vs deviation 899,989)
    val vals = (1 to 9).map(i => 10.0 + (i % 5)) :+ 1e6
    val d = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("g", "v", "id")
    val (_, n, med, mad, out) = Robust.madOutliers(d, "g", "v", "id")
      .as[(String, Long, Double, Double, Long)].collect().head
    assert(n == 10L && med == 12.0 && mad == 1.0 && out == 1L)
    val stats = d.agg(
      org.apache.spark.sql.functions.avg("v"),
      org.apache.spark.sql.functions.stddev_pop("v"))
      .as[(Double, Double)].collect().head
    val zFlagged = vals.count(v => math.abs(v - stats._1) > 3 * stats._2)
    assert(zFlagged == 0) // the planted outlier masks itself under z-score
  }

  test("trimmedMean: exact rank cuts, outlier dropped, grid-exact mean") {
    // 10 values: trim 100 permille cuts exactly 1 from each end — the
    // planted 1e6 and the 0.0 both fall; kept = {2..9} -> mean 5.5
    val vals = Seq(0.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1e6)
    val d = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      .toDF("g", "v", "id")
    val (_, n, kept, mean) = Robust.trimmedMean(d, "g", "v", "id")
      .as[(String, Long, Long, Double)].collect().head
    assert(n == 10L && kept == 8L && mean == 5.5)
  }

  test("trimmedMean: trim 0 is the grid mean; invariance under repartition") {
    val rnd = new scala.util.Random(59)
    val d = (1 to 3000).map { i =>
      (s"g${i % 4}", rnd.nextDouble() * 100, i.toLong)
    }.toDF("g", "v", "id")
    val a = Robust.trimmedMean(d, "g", "v", "id", trimPermille = 0)
      .orderBy("g").collect().toSeq
    val b = Robust.trimmedMean(d.repartition(21), "g", "v", "id",
      trimPermille = 0).orderBy("g").collect().toSeq
    assert(a == b && a.size == 4)
    val c = Robust.trimmedMean(d, "g", "v", "id", trimPermille = 250)
      .orderBy("g").collect().toSeq
    assert(c.map(_.getLong(2)).sum < a.map(_.getLong(2)).sum) // fewer kept
  }

  test("percentRank: SQL PERCENT_RANK semantics, singleton group -> 0") {
    val d = Seq(("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 30.0, 3L),
      ("a", 20.0, 4L), ("b", 5.0, 9L)).toDF("g", "v", "id")
    val got = Robust.percentRank(d, "g", "v", "id")
      .as[(String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // order within a: (10,1) (20,2) (20,4) (30,3) -> ranks 1..4, /(n-1)=3
    assert(got(("a", 1L)) == 0.0)
    assert(got(("a", 2L)) == 1.0 / 3)
    assert(got(("a", 4L)) == 2.0 / 3)
    assert(got(("a", 3L)) == 1.0)
    assert(got(("b", 9L)) == 0.0)
  }

  test("percentRank: partitioning-invariant") {
    val rnd = new scala.util.Random(71)
    val d = (1 to 2000).map { i =>
      (s"g${i % 3}", rnd.nextDouble(), i.toLong)
    }.toDF("g", "v", "id")
    val a = Robust.percentRank(d, "g", "v", "id").orderBy("g", "id")
      .collect().toSeq
    val b = Robust.percentRank(d.repartition(19), "g", "v", "id")
      .orderBy("g", "id").collect().toSeq
    assert(a == b && a.size == 2000)
  }

  test("madOutliers: per-group independence and partitioning invariance") {
    val rnd = new scala.util.Random(53)
    val d = (1 to 4000).map { i =>
      (s"g${i % 6}", rnd.nextGaussian() * (1 + i % 6), i.toLong)
    }.toDF("g", "v", "id")
    val a = Robust.madOutliers(d, "g", "v", "id").orderBy("g").collect().toSeq
    val b = Robust.madOutliers(d.repartition(29), "g", "v", "id")
      .orderBy("g").collect().toSeq
    assert(a == b && a.size == 6)
  }
}
