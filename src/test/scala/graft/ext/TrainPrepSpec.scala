package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hashSplit: boundaries respected, stable per id, independent of cohort") {
    val a = (1L to 400L).toDF("id")
    val split = Sampling.hashSplit(a, "id", seed = 7)
      .select("id", "bucket", "split").as[(Long, Long, String)].collect()
    split.foreach { case (_, b, s) =>
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == expect, s"bucket $b -> $s")
    }
    assert(split.map(_._3).toSet == Set("train", "val", "test"))
    // the same id keeps its split in a different cohort (growing the corpus
    // never reassigns existing rows — the non-randomSplit property)
    val sub = Sampling.hashSplit((1L to 50L).toDF("id"), "id", seed = 7)
      .select("id", "split").as[(Long, String)].collect().toMap
    val full = split.map(t => t._1 -> t._3).toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("groupSample picks exactly k per stratum, stable across partitionings") {
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val a = Sampling.groupSample(df, "id", "g", k = 4, seed = 5)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(a.size == 12 && a.groupBy(_._1).forall(_._2.size == 4))
    val b = Sampling.groupSample(df.repartition(7), "id", "g", k = 4, seed = 5)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(a == b) // partitioning-independent selection
    // a different seed changes the selection (not degenerate)
    val c = Sampling.groupSample(df, "id", "g", k = 4, seed = 6)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(a != c)
  }

  test("hashSplit: xxhash64 variant lands near the requested fractions") {
    val ids = (1L to 5000L).toDF("id")
    val frac = Sampling.hashSplit(ids, "id", seed = 3, hash = Sampling.xxHash)
      .groupBy("split").count().as[(String, Long)].collect().toMap
      .view.mapValues(_.toDouble / 5000).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.03, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.03, frac.toString)
  }

  test("hashSplit rejects non-cumulative boundaries") {
    val ids = (1L to 5L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", 1, boundaries = Seq("a" -> 90, "b" -> 80))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", 1, boundaries = Seq("a" -> 50))
    }
  }

  test("stratifiedSample keeps only bucket<quota rows and drops unknown strata") {
    val d = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(d, "id", "lang",
        Map("en" -> 100, "de" -> 0), seed = 5)
      .select("id", "lang").as[(Long, String)].collect()
    assert(kept.forall(_._2 == "en"), "de has quota 0 and xx is unlisted")
    assert(kept.length == 100, "en quota 100/100 keeps every en row")
  }
}

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("single-shard packing matches the hand-computed greedy fold") {
    val d = Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 9L), (4L, 2L), (5L, 8L))
      .toDF("id", "tok")
    val got = Packing.packByBudget(d, "id", col("tok"), budget = 10L, nShards = 1)
      .select("id", "pack_id", "cum_tokens").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    // cum: 4,9,12,21,23,31 -> pack index floor(pre/10): 0,0,0,1,2,2
    assert(got.map(_._2).toSeq == Seq(0L, 0L, 0L, 1L, 2L, 2L))
    assert(got.map(_._3).toSeq == Seq(4L, 9L, 12L, 21L, 23L, 31L))
    val packs = Packing.packSummary(
        Packing.packByBudget(d, "id", col("tok"), 10L, 1), "id")
      .select("pack_id", "n_docs", "total_tokens").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(packs.toSeq == Seq((0L, 3L, 12L), (1L, 1L, 9L), (2L, 2L, 10L)))
  }

  test("packs overflow by at most one document and ids are disjoint across shards") {
    val d = (0L until 500L).map(i => (i, 1L + i % 40)).toDF("id", "tok")
    val packed = Packing.packByBudget(d, "id", col("tok"), budget = 100L, nShards = 4)
    val maxTok = 40L
    val bad = Packing.packSummary(packed, "id")
      .filter(col("total_tokens") > lit(100L + maxTok)).count()
    assert(bad == 0, "a pack may only overflow by the crossing document")
    val shardsPerPack = packed.groupBy("pack_id")
      .agg(countDistinct("shard").as("s")).filter(col("s") > 1).count()
    assert(shardsPerPack == 0, "pack ids must never collide across shards")
  }
}

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("repetition metrics match hand computation and flag degenerate docs") {
    val d = Seq(
      (1L, "a a a a b"),                           // degenerate
      (2L, "the quick brown fox jumps over dogs"), // clean
      (3L, "x")                                    // too short for n-grams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(d, "doc_id", "text")
      .as[(Long, Long, Double, Long, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: 5 words, top word a=4 -> 0.8; bigrams: "a a"x3,"a b"x1 -> 0.75;
    // one 5-gram, distinct -> dup 0.0; flagged
    assert(got(1L) == ((1L, 5L, 0.8, 4L, 0.75, 0.0, true)))
    // doc 2: all words distinct -> minimal fractions, not flagged
    val c = got(2L)
    assert(c._3 == 1.0 / 7 && c._5 == 1.0 / 6 && c._6 == 0.0 && !c._7)
    // doc 3: a single word IS 100% of tokens (flagged, Gopher semantics);
    // no bigrams/5-grams -> zero fractions
    assert(got(3L) == ((3L, 1L, 1.0, 0L, 0.0, 0.0, true)))
  }

  test("PII redaction scrubs emails, IPs and phone runs, leaves clean text alone") {
    val d = Seq(
      (1L, "write to jane.doe+x@sub.example.org or bob@ex.io today"),
      (2L, "server 192.168.0.1 answered, backup at 10.0.255.7"),
      (3L, "call +1 555 010 9922 or 555-010-9923 now"),
      (4L, "no pii here, just words and the number 7")
    ).toDF("id", "text")
    val got = d.select(col("id"), TextAnalysis.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "write to <EMAIL> or <EMAIL> today")
    assert(got(2L) == "server <IP> answered, backup at <IP>")
    assert(got(3L) == "call <PHONE> or <PHONE> now")
    assert(got(4L) == "no pii here, just words and the number 7")
  }

  test("heavy-hitter ngrams rank by count with deterministic tie-break") {
    val d = Seq(
      (1L, "to be or not to be"),
      (2L, "to be is to do"),
      (3L, "do be do be do")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitterNgrams(d, "doc_id", "text", n = 2, k = 3)
      .select("ngram", "n_occurrences", "n_docs", "rank")
      .as[(String, Long, Long, Long)].collect().sortBy(_._4)
    // "to be" x3 (docs 1,2); "do be" x2 (doc 3); "be do" x2 (doc 3) —
    // ties broken by ngram string ascending
    assert(got.toSeq == Seq(
      ("to be", 3L, 2L, 1L), ("be do", 2L, 1L, 2L), ("do be", 2L, 1L, 3L)))
  }
}

class UnigramScoreSpec extends SparkTestBase {
  import spark.implicits._

  test("unigram score matches hand-computed counts and logprob") {
    // corpus: "a a b" and "a c" -> counts: a=3, b=1, c=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    val (d1, d2) = (out(0), out(1))
    assert(d1 == ((1L, 3L, 7L, 7.0 / 3, d1._5)) && d2 == ((2L, 2L, 4L, 2.0, d2._5)))
    // avg_logprob = mean(ln cnt) - ln total, checked with tolerance (libm)
    val exp1 = (math.log(3) + math.log(3) + math.log(1)) / 3 - math.log(5)
    val exp2 = (math.log(3) + math.log(1)) / 2 - math.log(5)
    assert(math.abs(d1._5 - exp1) < 1e-12 && math.abs(d2._5 - exp2) < 1e-12)
  }

  test("boilerplate scores higher avg token frequency than unique text") {
    val docs = (1L to 20L).map(i => (i, "lorem ipsum dolor sit amet")) :+
      (21L, "zyx wvu tsr qpo nml")
    val out = TextAnalysis.unigramScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "avg_token_freq").as[(Long, Double)].collect().toMap
    assert(out(1L) == 20.0 && out(21L) == 1.0)
  }
}

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunks tile the document with the requested overlap") {
    val text = (1 to 21).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 8, overlap = 2)
      .orderBy("chunk_id")
      .as[(Long, Long, String, Long)].collect()
    // stride 6: ceil((21-2)/6) = 4 chunks starting at tokens 1, 7, 13, 19
    assert(out.length == 4)
    assert(out(0)._3.startsWith("w1 ") && out(1)._3.startsWith("w7 ") &&
      out(2)._3.startsWith("w13 ") && out(3)._3 == "w19 w20 w21")
    assert(out.map(_._4).toSeq == Seq(8L, 8L, 8L, 3L))
    // consecutive chunks share exactly `overlap` tokens
    val t0 = out(0)._3.split(" ").toSeq
    val t1 = out(1)._3.split(" ").toSeq
    assert(t0.takeRight(2) == t1.take(2))
  }

  test("short documents yield one chunk; reconstruction covers every token") {
    val out = TextAnalysis.chunkDocuments(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 64, 8)
      .as[(Long, Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L, "a b c", 3L)))
  }

  test("mixture weights: sqrt temperature over exact token counts") {
    val docs = Seq(("web", "a b c d"), ("web", "e f"), ("code", "x y z")).toDF("source", "text")
    val out = TextAnalysis.mixtureWeights(docs, "source", "text")
      .orderBy("domain").as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("code", 1L, 3L, math.sqrt(3.0)), ("web", 2L, 6L, math.sqrt(6.0))))
  }

  test("temperature resample: largest domain keeps 1 copy, smaller upsample by sqrt ratio") {
    // web: 16 tokens, code: 4 tokens -> multiplier(code) = sqrt(16/4) = 2.0
    // exactly, so every code doc gets exactly 2 copies (no fractional part)
    val docs = Seq(
      (1L, "web", "a b c d e f g h"), (2L, "web", "i j k l m n o p"),
      (3L, "code", "x y"), (4L, "code", "z w")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.temperatureResample(docs, "doc_id", "source", "text", 7)
      .select("doc_id", "copy", "n_copies").as[(Long, Long, Long)].collect().toSeq
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(_._2).sorted == Seq(1L) && byDoc(2L).map(_._2).sorted == Seq(1L))
    assert(byDoc(3L).map(_._2).sorted == Seq(1L, 2L) && byDoc(4L).map(_._2).sorted == Seq(1L, 2L))
    // copy rows always agree with the declared n_copies
    assert(out.groupBy(r => (r._1, r._3)).forall { case ((_, n), rows) => rows.size == n })
  }

  test("hashed linear scorer: trained-weights path equals the stub formula") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dim = 256
    // materialize the stub's arithmetic weights as an explicit (bucket,
    // weight) table: the broadcast-join path must reproduce the stub
    // bit-for-bit on every document
    val weights = spark.range(dim).select(col("id").as("bucket"),
      (pmod(col("id") * 48271L, lit(2001L)) - 1000L).as("weight"))
    val stub = TextAnalysis.hashedLinearScore(docs, "doc_id", "text", dim)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    val trained = TextAnalysis
      .hashedLinearScore(docs, "doc_id", "text", dim, Some(weights))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(stub == trained)
    // every document is scored exactly once and n_tokens is never 0 here
    assert(stub.size == docs.count() && stub.forall(_._3 > 0))
    // the gate is the integer comparison on the exact sum
    assert(stub.forall { case (_, raw, _, keep) => keep == (raw > 0) })
  }

  test("hashed linear scorer: missing buckets in a sparse weight table score 0") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "weight")
    val out = TextAnalysis.hashedLinearScore(docs, "doc_id", "text", 64, Some(empty))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 0L, 2L, false), (2L, 0L, 1L, false)))
  }
}
