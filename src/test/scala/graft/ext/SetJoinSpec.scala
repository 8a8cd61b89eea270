package graft.ext

import graft.SparkTestBase

class SetJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("jaccardPairs: hand-checked thresholding incl. exact duplicates") {
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L), // dup of 1
      (3L, 10L), (3L, 20L), (3L, 40L), // J with 1/2 = 2/4 = 0.5
      (4L, 99L) // disjoint
    ).toDF("id", "item")
    val got = SetJoin.jaccardPairs(rows, "id", "item", 0.5)
      .orderBy("id_l", "id_r")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 3L, 3L, 1.0),
      (1L, 3L, 2L, 3L, 3L, 0.5),
      (2L, 3L, 2L, 3L, 3L, 0.5)))
  }

  test("jaccardPairs: prefix filter is lossless vs brute force") {
    val rnd = new scala.util.Random(71)
    val rows = (1 to 60).flatMap { id =>
      val sz = 2 + rnd.nextInt(5)
      Seq.fill(sz)((id.toLong, rnd.nextInt(25).toLong))
    }.distinct.toDF("id", "item")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = SetJoin.jaccardPairs(rows, "id", "item", t)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      val sets = rows.as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val exp = (for {
        a <- sets.keys; b <- sets.keys if a < b
        j = sets(a).intersect(sets(b)).size.toDouble /
          sets(a).union(sets(b)).size
        if j >= t
      } yield (a, b)).toSet
      assert(got == exp, s"t=$t: missing ${exp -- got}, extra ${got -- exp}")
    }
  }

  test("length filter shrinks candidates on a skewed-size corpus, losslessly") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // bimodal sizes (3 vs ~35) over a small item pool: cross-size pairs
    // share prefix tokens constantly but are size-hopeless at t=0.5
    // (3/35 << 0.5), so the length filter should kill the bulk of them
    val rnd = new scala.util.Random(79)
    val rows = (1 to 120).flatMap { id =>
      val sz = if (id % 6 == 0) 33 + id % 5 else 3
      Seq.fill(sz)(rnd.nextInt(80).toLong).distinct.map(item => (id.toLong, item))
    }.toDF("id", "item").distinct()
    val size = rows.groupBy("id").agg(count(lit(1)).as("sz"))
    val without = SetJoin.candidates(rows, size, 0.5, lengthFilter = false).count()
    val withLf = SetJoin.candidates(rows, size, 0.5, lengthFilter = true).count()
    assert(withLf < without / 2,
      s"length filter should cut candidates materially: $without -> $withLf")
    // losslessness: final results identical either way (the filter only
    // drops pairs that cannot pass the final Jaccard predicate)
    val sets = rows.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exp = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if j >= 0.5
    } yield (a, b)).toSet
    val got = SetJoin.jaccardPairs(rows, "id", "item", 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(got == exp, s"missing ${exp -- got}, extra ${got -- exp}")
  }

  test("hot-token self-join fallback emits the same candidate pairs") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // hotDf = 1 forces EVERY token with ≥2 prefix postings down the
    // keyed-self-join arm; the pair set (post-dedup) must equal the
    // grouped double-explode arm's — the split is routing, not semantics
    val rnd = new scala.util.Random(31)
    val rows = (1 to 90).flatMap { id =>
      Seq.fill(8)(rnd.nextInt(40).toLong).distinct.map(item => (id.toLong, item))
    }.toDF("id", "item").distinct()
    val size = rows.groupBy("id").agg(count(lit(1)).as("sz"))
    def pairs(hotDf: Int) =
      SetJoin.candidates(rows, size, 0.4, lengthFilter = true, hotDf = hotDf)
        .as[(Long, Long)].collect().toSet
    val grouped = pairs(4096)
    val hot = pairs(1)
    assert(grouped == hot && grouped.nonEmpty,
      s"missing ${grouped -- hot}, extra ${hot -- grouped}")
  }

  test("containmentPairs: hand-checked directed semantics") {
    val rows = Seq(
      (1L, 10L), (1L, 20L),                       // {10,20}
      (2L, 10L), (2L, 20L), (2L, 30L), (2L, 40L), // {10,20,30,40}
      (3L, 30L),                                  // {30}
      (4L, 99L)                                   // disjoint
    ).toDF("id", "item")
    val got = SetJoin.containmentPairs(rows, "id", "item", 0.5)
      .orderBy("id_l", "id_r")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // 1→2: 2/2 = 1.0; 2→1: 2/4 = 0.5; 3→2: 1/1 = 1.0; 2→3: 1/4 < 0.5
    assert(got == Seq(
      (1L, 2L, 2L, 2L, 4L, 1.0),
      (2L, 1L, 2L, 4L, 2L, 0.5),
      (3L, 2L, 1L, 1L, 4L, 1.0)))
  }

  test("containmentPairs: one-sided prefix + bounds are lossless vs brute force") {
    val rnd = new scala.util.Random(83)
    // skewed sizes so small-in-large containment actually occurs
    val rows = (1 to 80).flatMap { id =>
      val sz = if (id % 5 == 0) 12 + id % 7 else 2 + rnd.nextInt(3)
      Seq.fill(sz)(rnd.nextInt(30).toLong).distinct.map(item => (id.toLong, item))
    }.toDF("id", "item").distinct()
    for (t <- Seq(0.5, 0.75, 1.0)) {
      val got = SetJoin.containmentPairs(rows, "id", "item", t)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      val sets = rows.as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val exp = (for {
        a <- sets.keys; b <- sets.keys if a != b
        c = sets(a).intersect(sets(b)).size.toDouble / sets(a).size
        if c >= t
      } yield (a, b)).toSet
      assert(got == exp, s"t=$t: missing ${exp -- got}, extra ${got -- exp}")
    }
  }

  test("jaccardPairs: deterministic and partitioning-invariant") {
    val rnd = new scala.util.Random(73)
    val rows = (1 to 80).flatMap { id =>
      Seq.fill(3 + rnd.nextInt(3))((id.toLong, rnd.nextInt(30).toLong))
    }.distinct.toDF("id", "item")
    val a = SetJoin.jaccardPairs(rows, "id", "item", 0.4)
      .orderBy("id_l", "id_r").collect().toSeq
    val b = SetJoin.jaccardPairs(rows.repartition(13), "id", "item", 0.4)
      .orderBy("id_l", "id_r").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("reusePrefix modes (false/true/auto at both thresholds) agree exactly") {
    // the knob chooses a MATERIALIZATION strategy for the prefix index —
    // results must be bit-identical in every mode. auto = checkpoint iff
    // the input's optimizer size estimate exceeds reuseAutoBytes; forcing
    // the threshold to 1 byte drives the tiny fixture down the
    // checkpoint path, so both auto branches are genuinely executed.
    val rnd = new scala.util.Random(79)
    val rows = (1 to 60).flatMap { id =>
      Seq.fill(3 + rnd.nextInt(3))((id.toLong, rnd.nextInt(25).toLong))
    }.distinct.toDF("id", "item")
    val keyMode = "spark.graft.setjoin.reusePrefix"
    val keyAuto = "spark.graft.setjoin.reuseAutoBytes"
    def run(): Seq[org.apache.spark.sql.Row] =
      SetJoin.jaccardPairs(rows, "id", "item", 0.4)
        .orderBy("id_l", "id_r").collect().toSeq
    val ref = try { spark.conf.set(keyMode, "false"); run() }
      finally spark.conf.unset(keyMode)
    def check(mode: String, autoBytes: Option[String]): Unit = {
      spark.conf.set(keyMode, mode)
      autoBytes.foreach(spark.conf.set(keyAuto, _))
      try assert(run() == ref, s"mode=$mode autoBytes=$autoBytes diverged")
      finally { spark.conf.unset(keyMode); spark.conf.unset(keyAuto) }
    }
    check("true", None)
    check("auto", None)      // estimate ≪ 64 MB default → recompute branch
    check("auto", Some("1")) // 1-byte threshold → checkpoint branch
    assert(ref.nonEmpty)
  }
}
