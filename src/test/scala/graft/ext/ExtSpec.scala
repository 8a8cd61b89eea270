package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat tonight"), // near dup of 1
    (4L, "completely different words about spark query engines here"),
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("exact canonical ids") {
    val got = TextDedup.exactCanonical(docs, "doc_id", "text")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("shingles: distinct n-grams; short docs give empty arrays") {
    val sh = docs.select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).size == 8) // 10 words -> 8 trigrams, all distinct
    assert(sh(5L).isEmpty)
    // the codegen'd relational formulation produces the same shingle sets
    val relational = TextDedup.shingleRows(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(relational == sh.filter(_._2.nonEmpty).view.mapValues(_.toSet).toMap)
  }

  test("exact jaccard pairs find near-dups, not unrelated docs") {
    val pairs = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash-LSH candidates verify with exact jaccard; identical docs always collide") {
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect().toSet
    // verification uses the same exact jaccard -> LSH output is a subset
    assert(lsh.subsetOf(exact))
    // jaccard 1.0 means identical signatures -> collision in every band
    assert(lsh.contains((1L, 2L, 1.0)))
  }

  test("MirrorMode: strHash equals the reference polynomial fold; pipeline " +
      "verifies like XxMode (identical docs always collide)") {
    // the ANSI-mirrorable base hash, recomputed in plain Scala
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = docs.select(col("text"),
        TextDedup.strHash(col("text")).as("h"))
      .as[(String, Long)].collect()
    got.foreach { case (t, h) => assert(h == ref(t), s"strHash mismatch on '$t'") }
    // the codegen'd StrPolyHash must equal the declarative HOF fold it
    // replaced (aggregate over split) VALUE-FOR-VALUE — including empty,
    // whitespace-edged, and non-ASCII inputs (split('') pieces are code
    // points; ascii() is codePointAt(0)), so swapping formulations cannot
    // move any MirrorMode oracle hash
    // includes supplementary-plane input (surrogate pairs): the equivalence
    // argument rests on code-point iteration matching split('') pieces
    val edge = Seq("", " ", "  a  b ", "héllo wörld", "naïve café",
      "日本語 テスト", "a\tb\nc", "x" * 500,
      "a😀b", "😀", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🎉 done").toDF("s")
    val diff = edge.select(TextDedup.strHash(col("s")).as("fast"),
        TextDedup.strHashHof(col("s")).as("hof"), col("s"))
      .where(col("fast") =!= col("hof"))
      .collect()
    assert(diff.isEmpty, s"StrPolyHash != HOF fold on: ${diff.mkString(", ")}")
    // the MirrorMode pipeline keeps the XxMode guarantees: candidates
    // verify against exact jaccard (subset) and identical docs collide in
    // every band (the q188/q189/q190/q181 oracles additionally prove the
    // values are ANSI-reproducible — this spec pins engine-side semantics)
    val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect().toSet
    val mir = TextDedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.5,
        TextDedup.MirrorMode)
      .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(mir.subsetOf(exact))
    assert(mir.contains((1L, 2L, 1.0)))
  }

  test("exact dedup partitions on fixed-width content hashes, never raw text") {
    val out = TextDedup.exactCanonical(docs, "doc_id", "text")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // the window key is (xxhash64(text), md5(text)) — projected `_w#`
    // hash attributes, never the bare text attribute, so the shuffle sort
    // at document scale compares 24-byte keys instead of multi-MB strings
    windows.foreach { w =>
      assert(w.partitionSpec.size == 2)
      w.partitionSpec.foreach(e => assert(
        !e.references.exists(a => a.name == "text" || a.name == "doc_id"),
        s"raw column used as window partition key: $e"))
    }
    // the keys are computed hashes (visible pre-optimization; the optimizer
    // may fold them into a LocalRelation for literal test data)
    val planStr = out.queryExecution.analyzed.toString
    assert(planStr.contains("xxhash64(") && planStr.contains("md5("),
      s"expected hash-derived window keys in:\n$planStr")
  }

  test("chained minhash-LSH candidates are linear in clone-cluster size") {
    val n = 1000
    val clones = (1L to n).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val edges = TextDedup
      .minhashLshEdgesChained(clones, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect()
    // identical texts collide in every band; the window emits exactly the
    // consecutive-by-id chain — c−1 candidates, not the self-join's c(c−1)/2
    // ≈ half a million — and every chain edge verifies at jaccard 1
    assert(edges.length == n - 1, s"expected ${n - 1} chain edges, got ${edges.length}")
    assert(edges.forall(_._3 == 1.0))
    assert(edges.map(e => (e._1, e._2)).toSet ==
      (1L until n).map(i => (i, i + 1)).toSet)
  }

  test("chained minhash components refine pairwise components; equal on clone clusters") {
    // mixed corpus: a 6-clone cluster + the near-dup trio + unrelated docs
    val corpus = docs.union(Seq(
      (10L, "zeta omicron sigma tau upsilon phi chi psi omega now"),
      (11L, "zeta omicron sigma tau upsilon phi chi psi omega now"),
      (12L, "zeta omicron sigma tau upsilon phi chi psi omega now"),
      (13L, "zeta omicron sigma tau upsilon phi chi psi omega now"),
      (14L, "zeta omicron sigma tau upsilon phi chi psi omega now"),
      (15L, "zeta omicron sigma tau upsilon phi chi psi omega now")
    ).toDF("doc_id", "text"))
    def comps(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.graph.ConnectedComponents.runOnEdges(
        edges.select(col("id_l").as("src"), col("id_r").as("dst")))
        .as[(Long, Long)].collect().toMap
    val chained = comps(TextDedup
      .minhashLshEdgesChained(corpus, "doc_id", "text", 3, 16, 4, 0.5))
    val pairwise = comps(TextDedup
      .minhashLshPairs(corpus, "doc_id", "text", 3, 16, 4, 0.5))
    // refinement: ids sharing a chained component always share the pairwise
    // component (a chain edge is always a bucket collision, hence a
    // pairwise edge after the same verification)
    for (Seq(a, b) <- chained.keys.toSeq.combinations(2)) {
      if (chained(a) == chained(b)) assert(pairwise(a) == pairwise(b),
        s"chain merged $a,$b but pairwise did not")
    }
    // exact-clone clusters: identical components both ways
    val cloneIds = (10L to 15L).toSet
    assert(cloneIds.forall(chained.get(_).contains(10L)),
      s"clone cluster split by chaining: ${chained.view.filterKeys(cloneIds).toMap}")
    assert(cloneIds.forall(pairwise.get(_).contains(10L)))
  }

  test("text dedupClusters: one best-quality keeper per clone cluster, singletons kept") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "completely different text about engines here")
    ).toDF("doc_id", "text")
    val quality = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (4L, 0.5))
      .toDF("id", "quality")
    val got = TextDedup
      .dedupClusters(corpus, "doc_id", "text", quality, 3, 16, 4, 0.5)
      .as[(Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    // clones 1-3 cluster under min id 1; quality tie 2 vs 3 keeps lowest id
    assert(got(1L) == (1L, true) && got(2L) == (1L, false) && got(3L) == (1L, true))
    // doc 4 is a singleton cluster and its own keeper
    assert(got(4L) == (4L, false))
  }

  test("simhash: identical docs distance 0, near-dups close, unrelated far") {
    val fp = docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    // the aggregate formulation must produce identical fingerprints
    val fpAgg = TextDedup.simhashAgg(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fpAgg == fp)
    assert(fp(1L) == fp(2L))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(fp(1L), fp(3L)) < dist(fp(1L), fp(4L)))
    val pairs = TextDedup.simhashPairs(docs, "doc_id", "text", 6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash chunk blocking has recall 1 at the requested distance (pigeonhole)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (maxDist <- Seq(2, 6)) {
      val fp = TextDedup.simhashAgg(corpus, "doc_id", "text")
        .as[(Long, Long)].collect()
      val brute = (for {
        (i, fi) <- fp; (j, fj) <- fp
        if i < j && java.lang.Long.bitCount(fi ^ fj) <= maxDist
      } yield (i, j)).toSet
      val blocked = TextDedup.simhashPairs(corpus, "doc_id", "text", maxDist)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      assert(blocked == brute, s"maxDist=$maxDist")
    }
  }

  test("MirrorMode simhash: fingerprints equal the plain-Scala reference; " +
      "bits 61-63 structurally zero; pairs equal brute force") {
    def strHashRef(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def wordHashRef(w: String): Long =
      (strHashRef(w) * 2654435761L + 1000003L) & ((1L << 61) - 1)
    def fpRef(text: String): Long = {
      val hs = text.toLowerCase.split("\\s+").map(wordHashRef)
      (0 until 64).map { i =>
        val c = hs.count(h => ((h >> i) & 1L) == 1L)
        if (2 * c >= hs.length) 1L << i else 0L
      }.reduce(_ | _)
    }
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextDedup.simhashAgg(corpus, "doc_id", "text", TextDedup.MirrorMode)
      .as[(Long, Long)].collect()
    val texts = corpus.select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { case (id, fp) =>
      assert((fp >>> 61) == 0L, s"doc $id: bits 61-63 set in $fp")
      assert(fp == fpRef(texts(id)), s"doc $id fingerprint mismatch")
    }
    val brute = (for {
      (i, fi) <- got; (j, fj) <- got
      if i < j && java.lang.Long.bitCount(fi ^ fj) <= 3
    } yield (i, j)).toSet
    val blocked = TextDedup.simhashPairs(corpus, "doc_id", "text", 3,
        TextDedup.MirrorMode)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(blocked == brute)
  }

  test("stripCommonSegments: document-frequency boilerplate dropped, " +
      "within-doc repeats kept, order preserved, all-boilerplate doc empties") {
    val corpus = Seq(
      (1L, "aa bb cc dd ee"), // "aa bb" | "cc dd" | "ee" (partial tail)
      (2L, "aa bb xx yy"),
      (3L, "aa bb"), // every segment boilerplate -> empty text
      (4L, "cc dd cc dd") // same segment twice in ONE doc: df=2, kept
    ).toDF("doc_id", "text")
    val got = TextDedup.stripCommonSegments(corpus, "doc_id", "text",
        segWords = 2, minDocFreq = 3)
      .select("id", "clean_text", "n_segments", "n_dropped")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "cc dd ee", 3L, 1L),
      (2L, "xx yy", 2L, 1L),
      (3L, "", 1L, 1L),
      (4L, "cc dd cc dd", 2L, 0L)))
  }

  test("empirical near-dup correlations hold with tolerance (demoted from the q26/q27 oracles)") {
    // These were once zero-pinned oracle columns; they are properties of
    // the measured corpora, not operator guarantees (MinHash at 16 perms /
    // 4 bands catches a jaccard-0.5 pair with ~23% probability; pigeonhole
    // guarantees recall w.r.t. Hamming distance, not Jaccard), so they are
    // asserted here with tolerances and reported as data.
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextDedup.jaccardPairs(corpus, "doc_id", "text", 5, 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minhashLshPairs(corpus, "doc_id", "text", 5, 16, 4, 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "verification guarantees lsh ⊆ exact at the same threshold")
    val sim = TextDedup.simhashPairs(corpus, "doc_id", "text", 6)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    if (exact.nonEmpty) {
      val lshRecall = lsh.size.toDouble / exact.size
      val simRecall = exact.count(sim.contains).toDouble / exact.size
      info(f"minhash-lsh recall vs exact jaccard>=0.5: $lshRecall%.2f (${lsh.size}/${exact.size})")
      info(f"simhash hamming<=6 recall vs exact jaccard>=0.5: $simRecall%.2f")
      assert(lshRecall >= 0.5 && simRecall >= 0.5)
    }
    // reported simhash pairs overwhelmingly share non-trivial unigram overlap
    if (sim.nonEmpty) {
      val uni = corpus
        .select(col("doc_id"), array_distinct(TextDedup.words(col("text"))).as("w"))
        .as[(Long, Seq[String])].collect().toMap
      val lowOverlap = sim.count { case (l, r) =>
        val (a, b) = (uni(l).toSet, uni(r).toSet)
        a.intersect(b).size.toDouble / a.union(b).size < 0.2
      }
      info(s"simhash pairs with unigram jaccard < 0.2: $lowOverlap/${sim.size}")
      assert(lowOverlap.toDouble / sim.size <= 0.1)
    }
  }

  test("span duplication: shared spans counted across docs, intra-doc repeats excluded") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),        // 3 trigram occurrences
      (2L, "alpha beta gamma zeta eta"),             // shares "alpha beta gamma"
      (3L, "one two one two one two"),               // repeats only within itself
      (4L, "xy")                                      // too short for trigrams
    ).toDF("doc_id", "text")
    val got = TextDedup.spanDuplication(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3)))
    assert(got(2L) == ((3L, 1L, 1.0 / 3)))
    // intra-doc repetition is NOT cross-document sharing (ndocs stays 1)
    assert(got(3L) == ((4L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("contamination: planted train/test overlap is found, clean and short docs are not") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven"),
      (12L, "unrelated training content goes here today")
    ).toDF("doc_id", "text")
    val test = Seq(
      (20L, "alpha beta gamma delta epsilon zeta extra tail"), // contains train 3-grams
      (21L, "totally clean evaluation document with fresh words"),
      (22L, "tiny")                                            // < n words
    ).toDF("doc_id", "text")
    val got = TextDedup.contamination(train, test, "doc_id", "text", n = 3)
      .select("doc_id", "n_overlap_shingles", "n_train_docs", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(got(20L) == ((4L, 1L, true))) // 4 shared trigrams from train doc 10
    assert(got(21L) == ((0L, 0L, false)))
    assert(got(22L) == ((0L, 0L, false)))
  }

  test("jaccardPairs maxDf: capped output is a subset with lower-bound jaccard; rare-shingle dups survive") {
    // 30 docs all sharing one boilerplate trigram (df=30, capped away), plus
    // a planted near-dup pair whose overlap lives in rare shingles
    val boiler = "standard legal disclaimer applies"
    val corpus = ((1L to 30L).map(i => (i, s"$boiler unique$i filler$i trailer$i ending$i")) ++ Seq(
      (101L, s"$boiler orange mango papaya kiwi banana"),
      (102L, s"$boiler orange mango papaya kiwi cherry"))).toDF("doc_id", "text")
    def collectPairs(maxDf: Option[Long]) =
      TextDedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.15, maxDf)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val uncapped = collectPairs(None)
    val capped = collectPairs(Some(5L))
    // containment: capping can only drop pairs, never invent them
    assert(capped.keySet.subsetOf(uncapped.keySet))
    // per-pair lower bound: sizes stay uncapped, intersections only shrink
    capped.foreach { case (k, j) => assert(j <= uncapped(k) + 1e-12, s"pair $k") }
    // recall floor: the planted pair overlaps on rare trigrams, so it survives
    assert(capped.contains((101L, 102L)))
    // and the cap actually did something: boilerplate-only pairs are gone
    assert(capped.size < uncapped.size)
  }

  test("contamination: maxTrainDf drops boilerplate shingles shared by many train docs") {
    val boiler = "standard legal disclaimer text applies"
    val train = (1L to 5L).map(i => (i, s"$boiler variant $i")).toDF("doc_id", "text")
    val test = Seq((20L, s"$boiler in a test document")).toDF("doc_id", "text")
    val noCap = TextDedup.contamination(train, test, "doc_id", "text", n = 3)
      .select("contaminated").as[Boolean].head()
    val capped = TextDedup.contamination(train, test, "doc_id", "text", n = 3,
        maxTrainDf = Some(2L))
      .select("contaminated").as[Boolean].head()
    assert(noCap && !capped,
      "the df cap must drop shingles occurring in > cap train docs")
  }
}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)),
    (5L, Array(0.7f, 0.7f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine basics") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .filter(col("a.vec_id") === 1 && col("b.vec_id").isin(2, 3, 4))
      .select(col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .as[(Long, Double)].collect().toMap
    assert(c(2L) > 0.99 && math.abs(c(3L)) < 1e-9 && math.abs(c(4L) + 1.0) < 1e-9)
  }

  test("brute-force top-k ranks by cosine desc with id tie-break") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
        "vec_id", "embedding", 2)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(top.map(_._1).toSeq == Seq(2L, 5L))
  }

  test("lsh top-k returns a subset of the bucket with correct ranks and good recall on aligned vectors") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1),
        "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 1, numPlanes = 4, dim = 3)
      .select("neighbor_id").as[Long].collect().toSet
    // vec 2 is nearly parallel to vec 1 -> same side of every hyperplane
    assert(lsh == brute)
  }

  test("codegen'd cosine_sim is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val both = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // and via SQL
    emb.createOrReplaceTempView("emb_t")
    val viaSql = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) FROM emb_t a JOIN emb_t b ON a.vec_id=1 AND b.vec_id=2")
    assert(!viaSql.head().isNullAt(0))
  }

  test("multi-probe lsh recall is a superset of single-probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    def hits(multiProbe: Boolean): Map[Long, Set[Long]] =
      Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          k = 3, numPlanes = 6, dim = 64, multiProbe = multiProbe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val single = hits(multiProbe = false)
    val multi = hits(multiProbe = true)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(h: Map[Long, Set[Long]]): Double = {
      val (inter, total) = brute.map { case (q, b) =>
        (h.getOrElse(q, Set.empty[Long]).intersect(b).size, b.size)
      }.foldLeft((0, 0)) { case ((a, b), (c, d)) => (a + c, b + d) }
      inter.toDouble / total
    }
    assert(recall(multi) >= recall(single))
  }

  test("hard negatives = brute-force top-k restricted to other labels") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val hard = Similarity.hardNegatives(emb, queries, "vec_id", "embedding", "label", 3)
      .select("query_id", "neighbor_id", "neighbor_label")
      .as[(Long, Long, Int)].collect().toSeq
    // no neighbor may share its query's label
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(hard.forall { case (q, _, nl) => labels(q.toInt) != nl })
    assert(hard.forall { case (_, n, nl) => labels(n) == nl })
    // equals the unrestricted top-k computed over only other-label vectors
    val expected = queries.select("vec_id", "label").as[(Long, Int)].collect().flatMap {
      case (qid, ql) =>
        Similarity.bruteForceTopK(
            emb.filter(col("label") =!= ql), queries.filter(col("vec_id") === qid),
            "vec_id", "embedding", 3)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    }.toSet
    assert(hard.map(t => (t._1, t._2)).toSet == expected)
  }

  test("knn predict: planted clusters recover their labels by majority vote") {
    // three tight clusters along different axes; the 4th vector of each
    // cluster must inherit the cluster's label from its 3 nearest peers
    def v(axis: Int, jitter: Float): Seq[Float] =
      Seq.tabulate(8)(i => if (i == axis) 1.0f else if (i == axis + 1) jitter else 0.0f)
    val rows = (0 until 3).flatMap { cl =>
      (0 until 4).map(j => (cl * 4L + j, v(cl * 2, 0.01f * (j + 1)), cl))
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnPredict(df, df, "vec_id", "embedding", "label", 3)
      .select("query_id", "true_label", "predicted_label", "votes")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.size == 12)
    // every prediction is unanimous and correct: nearest 3 are the cluster
    assert(out.forall { case (_, t, p, votes) => t == p && votes == 3L })
  }

  test("banded near-dup is a subset of brute force with identical cosines") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.neardupPairs(emb, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val banded = Similarity.neardupPairsBanded(emb, "vec_id", "embedding", 0.3,
        bands = 8, rowsPerBand = 8, dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(banded.subsetOf(brute))
  }

  test("banded near-dup finds every planted near-duplicate") {
    // plant exact duplicates (cosine 1.0): identical vectors agree with
    // every hyperplane, so they collide in all bands regardless of params
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 100)
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = emb.union(planted)
    val got = Similarity.neardupPairsBanded(corpus, "vec_id", "embedding", 0.99,
        bands = 8, rowsPerBand = 8, dim = 64)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert((0L until 10L).forall(i => got.contains((i, i + 1000))))
  }

  test("semantic dedup drops the lower-quality member of planted duplicate pairs") {
    // identical vectors collide in every band regardless of parameters
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 50)
    val planted = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = emb.union(planted)
    // clones get LOWER quality than their originals
    val quality = corpus.select(col("vec_id").as("id"),
      when(col("vec_id") >= 1000, 0.1).otherwise(0.9).as("quality"))
    val got = Similarity.semanticDedup(corpus, quality, "vec_id", "embedding",
        threshold = 0.99, bands = 8, rowsPerBand = 8, dim = 64)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    (0L until 5L).foreach { i =>
      assert(got(i + 1000), s"low-quality clone $i must be dropped")
      assert(!got(i), s"original $i must be kept")
    }
    // with equal quality the higher id is the deterministic drop side
    val flat = corpus.select(col("vec_id").as("id"), lit(0.5).as("quality"))
    val tie = Similarity.semanticDedup(corpus, flat, "vec_id", "embedding",
        0.99, 8, 8, 64)
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r._3).toMap
    (0L until 5L).foreach { i => assert(tie(i + 1000) && !tie(i)) }
  }

  test("chained edges are linear in clone-cluster size; clusters keep exactly one best member") {
    // 1000 bit-identical embeddings: every band bucket holds all of them, so
    // the pairwise formulation would emit c(c-1)/2 = 499500 candidates; the
    // chain contraction emits exactly c-1 verified edges (all cosine 1)
    val c = 1000
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") === 0).select("embedding")
    val clones = base.crossJoin(spark.range(c).select(col("id").as("vec_id")))
      .select(col("vec_id"), col("embedding"))
    val edges = Similarity.neardupEdgesChained(clones, "vec_id", "embedding",
      threshold = 0.99, bands = 8, rowsPerBand = 8, dim = 64)
    assert(edges.count() == c - 1,
      "candidate contraction must be linear in cluster size")
    // dedup keeps exactly the single best-quality member of the c-clone cluster
    val quality = clones.select(col("vec_id").as("id"),
      (lit(1.0) - col("vec_id") / lit(10000.0)).as("quality")) // id 0 is best
    val verdicts = Similarity.semanticDedupClusters(clones, quality, "vec_id",
        "embedding", 0.99, 8, 8, 64)
      .as[(Long, Double, Long, Boolean)].collect()
    assert(verdicts.length == c)
    assert(verdicts.forall(_._3 == 0L), "one cluster, min-id component 0")
    val kept = verdicts.filter(!_._4).map(_._1).toSeq
    assert(kept == Seq(0L), s"exactly the best-quality member survives, got $kept")
  }

  test("chain components refine pairwise components; equal on exact-clone clusters") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").filter(col("vec_id") < 100)
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = emb.union(planted)
    def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
      // tiny driver-side union-find: ground truth for the spec only
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (edges.flatMap(e => Seq(e._1, e._2))).map(x => x -> find(x)).toMap
    }
    val pairEdges = Similarity.neardupPairsBanded(corpus, "vec_id", "embedding",
        0.30, 8, 8, 64).select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val chainEdges = Similarity.neardupEdgesChained(corpus, "vec_id", "embedding",
        0.30, 8, 8, 64).select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val pairComp = components(pairEdges)
    val chainComp = components(chainEdges)
    // refinement: two ids the chain groups together are also grouped pairwise
    chainComp.groupBy(_._2).values.foreach { members =>
      val pc = members.keys.map(pairComp).toSet
      assert(pc.size == 1, s"chain component ${members.keys} split across pairwise components $pc")
    }
    // exact clones (cosine 1): the chain connects them exactly as pairwise does
    (0L until 10L).foreach { i =>
      assert(chainComp.get(i).isDefined && chainComp(i) == chainComp(i + 1000),
        s"clone pair $i must share a chain component")
    }
  }

  test("hyperplanes are deterministic and in [-1,1)") {
    val p1 = Similarity.hyperplanes(4, 8)
    val p2 = Similarity.hyperplanes(4, 8)
    assert(p1.map(_.toSeq) == p2.map(_.toSeq))
    assert(p1.flatten.forall(x => x >= -1.0 && x < 1.0))
  }
}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("language id votes by stopwords with deterministic ties") {
    val d = Seq(
      "the cat sat of the mat and it is fine",
      "el perro y la casa de que en madrid",
      "le chat et les maisons des rues de paris",
      "der hund und die katze ist von hier",
      "xyzzy qwerty").toDF("text")
    val got = d.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "fr", "de", "und"))
  }

  test("metrics: counts, ratios, fingerprint stability") {
    val d = Seq((1L, "a bb ccc a")).toDF("doc_id", "text")
    val row = d.select(
      TextAnalysis.wordCount(col("text")),
      TextAnalysis.distinctWordRatio(col("text")),
      TextAnalysis.meanWordLength(col("text")),
      TextAnalysis.fingerprint(col("text"))).head()
    assert(row.getLong(0) == 4)
    assert(row.getDouble(1) == 0.75)
    assert(row.getDouble(2) == 7.0 / 4)
    // fold: codes for "a","bb","ccc","a" = 97*7+1, 98*7+2, 99*7+3, 97*7+1
    val codes = Seq(97 * 7 + 1, 98 * 7 + 2, 99 * 7 + 3, 97 * 7 + 1).map(_.toLong)
    val expected = codes.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(row.getLong(3) == expected)
  }

  test("bm25: rare-term matches outrank common-term matches; k and ties honored") {
    val docs = Seq(
      (1L, "spark spark spark common common"),   // heavy on the rare term
      (2L, "spark common common common common"), // one rare hit, longer on common
      (3L, "common common common common"),
      (4L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val q = Seq((1L, "spark"), (1L, "common")).toDF("query_id", "term")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", q, k = 3)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
    // doc 4 matches no term -> absent; k=3 keeps the three scored docs
    assert(got.map(_._2) == Seq(1L, 2L, 3L),
      s"ranking was ${got.map(r => (r._2, r._3))}")
    // 'spark' (df=2) carries more idf weight than 'common' (df=3): the
    // spark-heavy doc wins even though doc 3 is pure common
    assert(got.head._2 == 1L && got.head._3 > got(1)._3)
    assert(got.map(_._4) == Seq(1L, 2L, 3L))
  }
}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("typed mapPartitions decode matches the SQL stub") {
    val d = Seq((1L, "hello world"), (2L, "tiny"), (3L, "a much longer text payload here"))
      .toDF("doc_id", "text")
    val withMedia = Multimodal.withMedia(d, "text")
    val typed = Multimodal.decodeAll(withMedia, "doc_id", Multimodal.StubCodec)
      .collect().map(m => m.id -> ((m.meta.width, m.meta.format, m.label))).toMap
    val sql = withMedia
      .withColumn("meta", Multimodal.decodeStubSql(col("media")))
      .select(col("doc_id"), col("meta.width"), col("meta.format"),
        Multimodal.classifyStubSql(col("meta")))
      .as[(Long, Int, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(typed == sql)
  }

  test("resize and frame sampling operate on metadata") {
    val d = Seq((1L, "x" * 700)).toDF("doc_id", "text")
    val m = Multimodal.withMedia(d, "text")
      .withColumn("meta", Multimodal.decodeStubSql(col("media")))
    val row = m.select(
      Multimodal.resizeMeta(col("meta"), 32).getField("width"),
      Multimodal.sampleFrames(col("meta"), 4)).head()
    assert(row.getInt(0) <= 32)
    val frames = row.getSeq[Int](1)
    assert(frames.forall(_ % 4 == 0))
  }

  test("HeaderCodec parses genuinely-encoded PNG/JPEG/GIF containers") {
    import Multimodal.{HeaderCodec, MediaMeta, renderImage}
    // odd dimensions on purpose: a byte-order or offset slip cannot cancel
    assert(HeaderCodec.decode(renderImage(37, 19, "png", 1, 5L)) ==
      MediaMeta(37, 19, "png", 1))
    assert(HeaderCodec.decode(renderImage(19, 37, "jpeg", 1, 6L)) ==
      MediaMeta(19, 37, "jpeg", 1))
    assert(HeaderCodec.decode(renderImage(23, 11, "gif", 1, 7L)) ==
      MediaMeta(23, 11, "gif", 1))
    // frame count from the full GIF block walk, not a byte heuristic
    assert(HeaderCodec.decode(renderImage(12, 9, "gif", 4, 8L)) ==
      MediaMeta(12, 9, "gif", 4))
    // classify is pure geometry
    assert(HeaderCodec.classify(Array.empty, MediaMeta(4, 4, "png", 1)) == "landscape")
    assert(HeaderCodec.classify(Array.empty, MediaMeta(3, 4, "png", 1)) == "portrait")
  }

  test("HeaderCodec rejects non-container bytes instead of guessing") {
    import Multimodal.HeaderCodec
    intercept[IllegalArgumentException](HeaderCodec.decode("not an image".getBytes))
    intercept[IllegalArgumentException](HeaderCodec.decode(Array[Byte]()))
    // a JPEG SOI with no SOF before scan data is corrupt, not 0x0
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    intercept[IllegalArgumentException](HeaderCodec.decode(noSof))
    // TRUNCATED containers must throw the documented exception type, never
    // ArrayIndexOutOfBoundsException: a GIF header cut before the logical
    // screen descriptor, a JPEG cut inside its SOF payload, and a GIF whose
    // declared global color table runs past the byte stream
    intercept[IllegalArgumentException](
      HeaderCodec.decode("GIF89a  ".getBytes("ISO-8859-1")))
    val cutSof = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)
    intercept[IllegalArgumentException](HeaderCodec.decode(cutSof))
    val cutGct = ("GIF87a".getBytes("ISO-8859-1") ++
      Array(0x10, 0x00, 0x10, 0x00, 0x81, 0x00, 0x00, 0x2c).map(_.toByte))
    intercept[IllegalArgumentException](HeaderCodec.decode(cutGct))
  }

  test("HeaderCodec decodes a hand-built GIF87a with a global color table and extension") {
    import Multimodal.{HeaderCodec, MediaMeta}
    // header GIF87a, LSD 300x200 LE, GCT flag set with 2-bit depth
    // (3*4=12 table bytes), one graphic-control extension, one image
    // descriptor with a local color table, LZW data in two sub-blocks
    val b = scala.collection.mutable.ArrayBuffer[Int]()
    b ++= "GIF87a".getBytes.map(_.toInt)
    b ++= Seq(0x2c, 0x01, 0xc8, 0x00) // 300 LE, 200 LE
    b += 0x81 // GCT present, size bits = 1 -> 3*(2^2) = 12 bytes
    b ++= Seq(0x00, 0x00) // bg color, aspect
    b ++= Seq.fill(12)(0xaa) // GCT
    b ++= Seq(0x21, 0xf9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00) // GCE + terminator
    b ++= Seq(0x2c, 0, 0, 0, 0, 0x2c, 0x01, 0xc8, 0x00) // image desc 300x200
    b += 0x82 // LCT present, size bits = 2 -> 3*(2^3) = 24 bytes
    b ++= Seq.fill(24)(0xbb) // LCT
    b += 0x02 // LZW min code size
    b ++= Seq(0x03, 1, 2, 3, 0x01, 9, 0x00) // two sub-blocks + terminator
    b += 0x3b // trailer
    assert(HeaderCodec.decode(b.map(_.toByte).toArray) ==
      MediaMeta(300, 200, "gif", 1))
  }
}
