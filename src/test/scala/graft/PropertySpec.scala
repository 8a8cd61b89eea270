package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.JaroWinklerAlgo

/** Property tests (SURVEY.md §5: "per-operator ScalaTest units + property
  * tests"), using raw ScalaCheck generators with fixed seeds (the
  * scalatest bridge artifact is not on the offline classpath). Driver-side
  * algorithm properties run pure-JVM; distributed operators are checked
  * against in-memory reference implementations on small random instances. */
object PropertySupport {
  def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
}

class JaroWinklerPropertySpec extends SparkTestBase {
  import PropertySupport.samples

  private val word = Gen.alphaStr.map(_.take(16))

  test("jaro-winkler is symmetric, bounded, and 1 for equal strings") {
    samples(Gen.zip(word, word), 200).foreach { case (a, b) =>
      val s = JaroWinklerAlgo.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of bounds for ($a, $b): $s")
      assert(s == JaroWinklerAlgo.similarity(b, a), s"asymmetric for ($a, $b)")
      assert(JaroWinklerAlgo.similarity(a, a) == 1.0)
    }
  }

  test("single trailing edit keeps similarity high") {
    samples(word.suchThat(_.length >= 4), 100).foreach { a =>
      assert(JaroWinklerAlgo.similarity(a, a.dropRight(1)) > 0.85)
    }
  }
}

class ConnectedComponentsPropertySpec extends SparkTestBase {
  import PropertySupport.samples
  import graft.graph.{ConnectedComponents, PropertyGraph}
  import spark.implicits._

  /** reference union-find with min-id canonical roots */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("alternating-star CC matches union-find on random graphs") {
    val genCase = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(0, 35)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (n, es.map { case (a, b) => (a.toLong, b.toLong) })
    samples(genCase, 8).foreach { case (n, es) =>
      val v = (0L until n.toLong).toDF("id")
      val e = if (es.isEmpty) Seq((0L, 0L)).toDF("src", "dst") else es.toDF("src", "dst")
      val got = PropertyGraph(v, e).connectedComponents()
        .select("id", "component").as[(Long, Long)].collect().toMap
      assert(got == ufComponents(n, es), s"n=$n edges=$es")
    }
  }
}

class IsotonicPropertySpec extends SparkTestBase {
  import PropertySupport.samples
  import graft.er.FellegiSunter

  test("isotonic pooling always preserves masses and orders likelihood ratios") {
    val genArr = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(1e-6, 1.0))))
    samples(genArr, 100).foreach { pairs =>
      val m = pairs.map(_._1).toArray
      val u = pairs.map(_._2).toArray
      val (mi, ui) = FellegiSunter.isotonic(m, u)
      assert(math.abs(mi.sum - m.sum) < 1e-9 && math.abs(ui.sum - u.sum) < 1e-9)
      m.indices.foreach(i =>
        assert(math.abs(mi(i) + ui(i) - (m(i) + u(i))) < 1e-9))
      val ratios = mi.zip(ui).map { case (a, b) =>
        if (b > 0) a / b else Double.PositiveInfinity }
      assert(ratios.sliding(2).forall(p => p.head <= p.last * (1 + 1e-12) + 1e-12),
        s"m=${m.toSeq} u=${u.toSeq} -> ${ratios.toSeq}")
    }
  }
}

class SamplingPropertySpec extends SparkTestBase {
  import PropertySupport.samples
  import graft.ext.{Packing, Sampling}
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  test("hashSplit buckets are always in [0,100) and assignment depends only on (id, seed)") {
    val genIds = Gen.listOfN(30, Gen.choose(0L, 1000000L)).map(_.distinct)
    samples(Gen.zip(genIds, Gen.choose(0L, 99L)), 6).foreach { case (ids, seed) =>
      val a = Sampling.hashSplit(ids.toDF("id"), "id", seed)
        .select("id", "bucket", "split").as[(Long, Long, String)].collect()
      assert(a.forall(r => r._2 >= 0 && r._2 < 100))
      // a shuffled, duplicated cohort assigns identically per id
      val b = Sampling.hashSplit((ids.reverse ++ ids.take(5)).toDF("id"), "id", seed)
        .select("id", "split").as[(Long, String)].collect().toMap
      a.foreach(r => assert(b(r._1) == r._3))
    }
  }

  test("packing never splits a document and per-pack overflow is bounded by one document") {
    val genDocs = Gen.listOfN(40, Gen.choose(1L, 30L))
    samples(Gen.zip(genDocs, Gen.choose(20L, 60L)), 6).foreach { case (toks, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "tok")
      val packed = Packing.packByBudget(df, "id", col("tok"), budget, nShards = 3)
      val sums = Packing.packSummary(packed, "id")
        .select("total_tokens").as[Long].collect()
      val maxTok = toks.max
      assert(sums.forall(_ <= budget + maxTok),
        s"budget=$budget maxTok=$maxTok sums=${sums.toSeq}")
      assert(packed.count() == toks.length.toLong, "every document packed exactly once")
    }
  }
}

class MinHashPropertySpec extends SparkTestBase {
  import PropertySupport.samples
  import graft.ext.TextDedup
  import spark.implicits._

  test("lsh pairs are always a subset of exact jaccard pairs at the same threshold") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val genDoc = Gen.listOfN(12, Gen.oneOf(vocab)).map(_.mkString(" "))
    samples(Gen.listOfN(6, genDoc), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 2, 0.3)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text", 2, 8, 4, 0.3)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact), s"lsh=$lsh exact=$exact")
    }
  }
}

class MisraGriesPropertySpec extends SparkTestBase {
  import PropertySupport.samples
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // skewed streams: small alphabet with a heavy head
  private val stream: Gen[List[String]] = for {
    n <- Gen.choose(50, 400)
    items <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.oneOf((1 to 30).map(i => s"i$i"))))
  } yield items

  test("sketch guarantees hold on random skewed streams at random partitionings") {
    samples(Gen.zip(stream, Gen.choose(2, 12), Gen.choose(1, 6)), 12)
      .foreach { case (rows, k, parts) =>
        val n = rows.size
        val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val sk = rows.toDF("w").repartition(parts)
          .agg(call_function("approx_top_k", col("w"), lit(k)).as("sk"))
          .select(explode(col("sk")).as("e"))
          .select(col("e.item"), col("e.count_lb"))
          .as[(String, Long)].collect().toMap
        assert(sk.size <= k)
        val thr = n.toDouble / (k + 1)
        exact.foreach { case (item, c) =>
          if (c > thr) assert(sk.contains(item),
            s"n=$n k=$k parts=$parts lost $item (count $c > $thr)")
        }
        sk.foreach { case (item, lb) =>
          val t = exact(item)
          assert(lb <= t && lb >= t - thr,
            s"n=$n k=$k parts=$parts bad bound for $item: lb=$lb true=$t")
        }
      }
  }
}

class AucPropertySpec extends SparkTestBase {
  import spark.implicits._
  import PropertySupport.samples
  import org.apache.spark.sql.functions._

  private val rows = for {
    n <- Gen.choose(20, 120)
    r <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 15), Gen.oneOf(true, false)))
  } yield r.map { case (s, l) => (s.toDouble, l) }

  private def aucOf(df: Seq[(Double, Boolean)], f: Double => Double = identity) =
    graft.ext.Eval.auc(
      df.map { case (s, l) => (f(s), l) }.toDF("score", "label"),
      col("score"), col("label"))
      .select("auc").as[java.lang.Double].collect().head

  test("auc complement: relabeling flips the score to 1 - auc") {
    samples(rows, 8).foreach { r =>
      val a = aucOf(r)
      val b = graft.ext.Eval.auc(r.toDF("score", "label"),
        col("score"), !col("label")).select("auc").as[java.lang.Double].collect().head
      if (a != null && b != null)
        assert(math.abs(a + b - 1.0) < 1e-12, s"auc $a + complement $b != 1")
    }
  }

  test("auc is invariant under strictly monotone score transforms") {
    samples(rows, 8).foreach { r =>
      assert(aucOf(r) == aucOf(r, s => 2.0 * s + 7.0),
        "affine transform changed auc")
    }
  }
}
