package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(2.5), Some("a")),
    (2L, Some(2.5), None),
    (3L, None, Some("b")),
    (4L, Some(7.0), Some("a"))
  ).toDF("id", "x", "tag")

  test("columnStats: counts, nulls, ndv, numeric min/max per column") {
    val got = Stats.columnStats(df)
      .select("col_name", "n_rows", "n_nulls", "ndv", "min_num", "max_num")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(got("id") == ((4L, 0L, 4L, Some(1.0), Some(4.0))))
    assert(got("x") == ((4L, 1L, 2L, Some(2.5), Some(7.0))))
    assert(got("tag") == ((4L, 1L, 2L, None, None)))
  }

  test("columnStats: approx NDV stays within the HLL error bound") {
    val big = spark.range(5000).select(col("id"), (col("id") % 100).as("m"))
    val got = Stats.columnStats(big.toDF(), approxNdv = true)
      .select("col_name", "ndv").as[(String, Long)].collect().toMap
    // default rsd is 5% (one sigma) — allow ~2 sigma
    assert(math.abs(got("id") - 5000L) <= 500, s"id ndv ${got("id")}")
    assert(math.abs(got("m") - 100L) <= 10, s"m ndv ${got("m")}")
  }

  test("integrityAudit: counts rows, null keys, and orphans per FK") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk_col")
    val got = Stats.integrityAudit(Seq(
        ("child.parent", child, "fk_col", parent, "pk"),
        ("parent.self", parent, "pk", parent, "pk")))
      .orderBy("fk")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("child.parent", 4L, 1L, 1L), // 9 is orphaned; NULL not an orphan
      ("parent.self", 3L, 0L, 0L)))
  }

  test("corrMatrix: hand-checked correlations, one row per pair") {
    val d = Seq(
      (1.0, 2.0, 1.0), (2.0, 4.0, 0.0), (3.0, 6.0, 1.0), (4.0, 8.0, 0.0)
    ).toDF("x", "y", "z")
    val got = Stats.corrMatrix(d, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("x", "y"), ("x", "z"), ("y", "z")))
    assert(got.forall(_._3 == 4L))
    val m = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(m(("x", "y")) == 1.0) // y = 2x exactly
    assert(math.abs(m(("x", "z")) - (-0.447214)) < 1e-6)
    assert(m(("x", "z")) == m(("y", "z"))) // z vs x and z vs 2x correlate equally
  }

  test("corrMatrix: partitioning-invariant (exact decimal sums)") {
    val rnd = new scala.util.Random(67)
    val d = (1 to 2000).map { _ =>
      (rnd.nextInt(10000) / 100.0, rnd.nextInt(10000) / 100.0)
    }.toDF("x", "y")
    val a = Stats.corrMatrix(d, Seq("x", "y")).collect().toSeq
    val b = Stats.corrMatrix(d.repartition(17), Seq("x", "y")).collect().toSeq
    assert(a == b && a.size == 1)
  }

  test("groupRegression: exact fit recovered, r2 = 1 on a perfect line") {
    val d = Seq(
      ("a", 1.0, 5.0), ("a", 2.0, 7.0), ("a", 3.0, 9.0),   // y = 2x + 3
      ("b", 1.0, 10.0), ("b", 2.0, 8.0), ("b", 3.0, 6.5)   // slope ~ -1.75
    ).toDF("g", "x", "y")
    val got = Stats.groupRegression(d, Seq("g"), "x", "y")
      .orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got.head == (("a", 3L, 2.0, 3.0, 1.0)))
    val b = got(1)
    assert(b._1 == "b" && b._2 == 3L)
    assert(math.abs(b._3 - (-1.75)) < 1e-6)        // lsq slope
    assert(math.abs(b._4 - 11.666667) < 1e-6)      // intercept
    assert(b._5 > 0.99 && b._5 < 1.0)              // near-perfect fit
  }

  test("groupRegression: partitioning-invariant (exact decimal sums)") {
    val rnd = new scala.util.Random(31)
    val d = (1 to 3000).map { i =>
      (i % 7, rnd.nextInt(10000) / 100.0, rnd.nextInt(10000) / 100.0)
    }.toDF("g", "x", "y")
    val a = Stats.groupRegression(d, Seq("g"), "x", "y").orderBy("g")
      .collect().toSeq
    val b = Stats.groupRegression(d.repartition(23), Seq("g"), "x", "y")
      .orderBy("g").collect().toSeq
    assert(a == b && a.size == 7)
  }

  test("chiSquare: uniform table has zero chi2; marginals drive expected") {
    val d = Seq(
      ("u", 1), ("u", 2), ("v", 1), ("v", 2),
      ("u", 1), ("u", 2), ("v", 1), ("v", 2)
    ).toDF("x", "y")
    val got = Stats.chiSquare(d, "x", "y").orderBy("x", "y")
      .as[(String, Int, Long, Double, Double)].collect().toSeq
    assert(got.size == 4)
    assert(got.forall(r => r._3 == 2L && r._4 == 2.0 && r._5 == 0.0))
  }

  test("chiSquare: hand-checked dependent 2x2 contributions") {
    // o: (a,1)=30 (a,2)=10 (b,1)=10 (b,2)=30; N=80, all marginals 40
    // e = 40*40/80 = 20 for every cell; chi2 cell = (10)^2/20 = 5
    val rows = Seq.fill(30)(("a", 1)) ++ Seq.fill(10)(("a", 2)) ++
      Seq.fill(10)(("b", 1)) ++ Seq.fill(30)(("b", 2))
    val got = Stats.chiSquare(rows.toDF("x", "y"), "x", "y")
      .orderBy("x", "y")
      .as[(String, Int, Long, Double, Double)].collect().toSeq
    assert(got.map(_._4) == Seq(20.0, 20.0, 20.0, 20.0))
    assert(got.map(_._5) == Seq(5.0, 5.0, 5.0, 5.0))
    assert(got.map(_._3) == Seq(30L, 10L, 10L, 30L))
  }

  test("twoProportionZ: hand-computed z, degenerate groups yield null") {
    // group g1: A 10 units 4 conv, B 10 units 1 conv
    // pooled = 5/20 = 0.25; se = sqrt(.25*.75*(0.2)) = sqrt(0.0375)
    // z = (0.4-0.1)/se = 0.3/0.19364916731... = 1.549193
    val units =
      (1 to 10).map(i => ("g1", "A", i <= 4)) ++
      (1 to 10).map(i => ("g1", "B", i <= 1)) ++
      // g2: everyone converts -> pooled 1 -> z null
      Seq(("g2", "A", true), ("g2", "B", true)) ++
      // g3: one arm empty -> z null
      Seq(("g3", "A", true), ("g3", "A", false)) ++
      // g4: a third arm + a typo — must land in n_other, NOT in arm B
      Seq(("g4", "A", true), ("g4", "B", false), ("g4", "C", true),
        ("g4", "b", true))
    val got = Stats.twoProportionZ(units.toDF("g", "variant", "converted"),
        Seq("g"), "variant", "converted")
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(got(0) == (("g1", 10L, 4L, 10L, 1L, 0L, Some(0.4), Some(0.1),
      Some(1.549193))))
    assert(got(1) == (("g2", 1L, 1L, 1L, 1L, 0L, Some(1.0), Some(1.0), None)))
    assert(got(2) == (("g3", 2L, 1L, 0L, 0L, 0L, Some(0.5), None, None)))
    // z = (1−0)/√(0.5·0.5·(1/1+1/1)) = √2
    assert(got(3) == (("g4", 1L, 1L, 1L, 0L, 2L, Some(1.0), Some(0.0),
      Some(1.414214))))
  }

  test("twoProportionZ: NULL variants are counted in n_other") {
    val units = Seq(("g1", Some("A"), true), ("g1", Some("B"), false),
      ("g1", None, true))
    val got = Stats.twoProportionZ(
        units.toDF("g", "variant", "converted"), Seq("g"), "variant",
        "converted")
      .select("n_a", "n_b", "n_other")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L)))
  }

  test("distributionStats: hand-checked HHI and entropy, degenerate group") {
    val rows =
      Seq.fill(2)(("g1", "u1")) ++ Seq.fill(2)(("g1", "u2")) ++ // 2+2
      Seq("u1", "u2", "u3", "u4").map(("g2", _)) ++             // uniform
      Seq.fill(5)(("g3", "u1"))                                 // one owner
    val got = Stats.distributionStats(rows.toDF("g", "v"), Seq("g"), "v")
      .orderBy("g")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got(0) == (("g1", 4L, 2L, 0.5, 0.693147))) // ln 2
    assert(got(1) == (("g2", 4L, 4L, 0.25, 1.386294))) // ln 4
    assert(got(2) == (("g3", 5L, 1L, 1.0, 0.0)))
  }

  test("distributionStats: partitioning-invariant") {
    val rnd = new scala.util.Random(67)
    val rows = Seq.fill(400)((s"g${rnd.nextInt(4)}", s"u${rnd.nextInt(25)}"))
    val a = Stats.distributionStats(rows.toDF("g", "v"), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    val b = Stats.distributionStats(rows.toDF("g", "v").repartition(11),
        Seq("g"), "v").orderBy("g").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("integrityAudit: duplicate parent keys do not double-count matches") {
    val parent = Seq(1L, 1L, 2L).toDF("pk")
    val child = Seq(1L, 2L, 3L).toDF("fk_col")
    val got = Stats.integrityAudit(Seq(
        ("c.p", child, "fk_col", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().head
    assert(got == (("c.p", 3L, 0L, 1L)))
  }
}
