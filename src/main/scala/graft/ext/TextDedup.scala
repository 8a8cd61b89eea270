package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for large-scale training-data pipelines:
  * exact, n-gram Jaccard (brute candidate generation via a rare-shingle
  * inverted index), MinHash+LSH, and SimHash. All are declarative
  * DataFrame plans over built-in (codegen'd) functions — no UDFs — so the
  * shuffles are the only cost and every candidate-generation join is an
  * equi-join on a hash key.
  *
  * These extend the reference's dedup capability (Splink ER,
  * `/root/reference/03_aml_entity_resolution.py`) with the content-hash
  * family used for LLM corpus cleaning (MinHash/SimHash per Broder 1997 /
  * Charikar 2002 — public algorithms).
  */
object TextDedup {

  def words(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles ("a b c" strings). Empty array when the
    * document has fewer than n words (`sequence` would otherwise run
    * backwards). */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Every shingle occurrence as rows (id, sh) — multiplicity preserved,
    * for repetition statistics: posexplode words + window `lead` — fully
    * codegen'd, unlike the higher-order-function [[shingles]] (HOFs are
    * CodegenFallback). One shuffle (by id). */
  def shingleRowsAll(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "shingle width must be >= 1")
    // codegen'd in-row shingling ([[graft.functions.WordShingles]]) —
    // replaces the earlier lead()-window formulation, whose shuffle+sort of
    // the exploded token table dominated every shingle-based operator
    df.select(col(idCol).as("id"),
      explode(call_function("word_shingles", col(textCol), lit(n))).as("sh"))
  }

  /** Distinct shingles as rows (id, sh) — the dedup-pipeline form of
    * [[shingleRowsAll]]; same shingle strings as [[shingles]] (equivalence
    * asserted in DedupSpec). */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRowsAll(df, idCol, textCol, n).distinct()

  /** Exact dedup: canonical id = min id over identical text. One window,
    * partitioned on a FIXED-WIDTH content key — (xxhash64, md5) of the text,
    * 24 bytes — never the raw text: at document scale the window's shuffle
    * sort would otherwise compare multi-MB strings per row. Two documents
    * land in the same group iff both independent hashes agree; a false merge
    * needs a simultaneous 64-bit AND 128-bit collision (~2⁻¹⁹² per pair —
    * below hardware error rates at any corpus size), the standard
    * content-hash identity used by exact-dedup pipelines. The text itself
    * still travels as row payload (the output keeps every input column) but
    * never as a partition or sort key. */
  def exactCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("canonical_id",
        min(col(idCol)).over(
          Window.partitionBy(xxhash64(col(textCol)), md5(col(textCol)))))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Exact n-gram Jaccard pairs ≥ threshold, via a shingle inverted index:
    * explode shingles → self-join on the shingle → per-pair intersection
    * count → Jaccard from set sizes. Relational end-to-end (SQL-oracle
    * expressible). Use a shingle width that makes shingles near-unique
    * (n ≥ 5 for small vocabularies) so the inverted-index join cannot blow
    * up on hot keys.
    *
    * `maxDf` (off by default) bounds the inverted-index self-join on
    * adversarial corpora: the join is O(Σ df²) per shingle, so one
    * boilerplate shingle shared by 10⁶ documents goes quadratic. With a
    * cap, shingles whose document frequency exceeds `maxDf` are excluded
    * from candidate generation and intersection counting, but set sizes
    * stay uncapped — intersections can only shrink, so every reported
    * Jaccard is a lower bound on the true value and the capped result is
    * a strict subset of the uncapped one (never a false positive; the
    * trade is recall on pairs whose overlap lives entirely in hot
    * shingles — asserted in DedupSpec). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Option[Long] = None): DataFrame = {
    // localCheckpoint (not persist): the inverted index is read three times
    // (both join sides + the size table). A persist() here would pin cache
    // blocks until someone calls clearCache — localCheckpoint blocks are
    // released by the ContextCleaner as soon as the plan is unreferenced,
    // so long-lived sessions embedding this operator don't leak memory.
    val sh = shingleRows(df, idCol, textCol, n).localCheckpoint()
    jaccardPairsOn(sh, threshold, maxDf)
  }

  /** [[jaccardPairs]] over an existing (id, sh) shingle index — package-
    * private so composite queries (q91) run exact and LSH strategies
    * against ONE shared index instead of re-shingling per strategy. */
  private[graft] def jaccardPairsOn(sh: DataFrame, threshold: Double,
      maxDf: Option[Long] = None): DataFrame = {
    // one aggregate + equi-join (not a window): df is per-shingle, so a
    // broadcast-or-shuffle hash join beats sorting the whole index
    val joinSide = maxDf.fold(sh) { cap =>
      sh.join(
        sh.groupBy("sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("sh"),
        "sh")
    }
    val common = joinSide.as("a").join(joinSide.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_l"), col("b.id").as("id_r"))
      .agg(count(lit(1)).as("common"))
    jaccardFromCounts(sh, common, threshold)
  }

  /** Jaccard from per-pair intersection counts + per-doc set sizes. */
  private[graft] def jaccardFromCounts(sh: DataFrame, common: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    common
      .join(sizes.select(col("id").as("id_l"), col("sz").as("sz_l")), "id_l")
      .join(sizes.select(col("id").as("id_r"), col("sz").as("sz_r")), "id_r")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_l") + col("sz_r") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_l"), col("id_r"), col("jaccard"))
  }

  /** Exact intersection counts for an explicit candidate set: expand each
    * pair by the left side's shingles, then probe the index on the
    * composite (id, shingle) key — only candidate pairs are ever expanded,
    * so LSH keeps its no-O(n²) guarantee. Package-private so composite
    * verification queries (q91) can verify several candidate sets against
    * ONE shared shingle index. */
  private[graft] def candidateCommonCounts(sh: DataFrame, cands: DataFrame): DataFrame =
    cands
      .join(sh.select(col("id").as("id_l"), col("sh")), "id_l")
      .join(sh.select(col("id").as("id_r"), col("sh")), Seq("id_r", "sh"))
      .groupBy("id_l", "id_r").agg(count(lit(1)).as("common"))

  /** MinHash signature: numPerm permutations simulated with seeded xxhash64
    * (Broder's min-wise hashing). One-pass codegen-free tight loop
    * ([[graft.functions.MinHashSig]]); bit-identical to the declarative
    * `transform(sequence(…), s -> array_min(transform(sh, x -> xxhash64(x, s))))`
    * it replaces (MinHashSigSpec pins the equality). */
  def minhashSignature(shingleCol: Column, numPerm: Int): Column =
    // direct expression, not call_function: the helper then resolves in
    // sessions built WITHOUT GraftExtensions, as it did when declarative
    graft.functions.Cols.of(graft.functions.MinHashSig(
      graft.functions.Cols.expr(shingleCol),
      org.apache.spark.sql.catalyst.expressions.Literal(numPerm)))

  /** MinHash + LSH banding: signature → band hashes → bucket self-join for
    * candidates → exact-Jaccard verification of candidates only. The
    * verification join carries the shingle arrays, so no re-tokenization.
    * At 100 TB this is the scale path: candidate generation touches only
    * bucket-colliding pairs, never O(n²). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numPerm: Int, bands: Int, threshold: Double,
      mode: MinHashMode = XxMode): DataFrame = {
    val (sh, buckets) = minhashBuckets(df, idCol, textCol, n, numPerm, bands, mode)
    jaccardFromCounts(sh, candidateCommonCounts(sh, pairCandidates(buckets)), threshold)
  }

  /** Bucket self-join candidates: every colliding pair. O(c²) per c-member
    * bucket — the recall-complete shape; see [[chainCandidates]] for the
    * skew-safe linear alternative. */
  private[graft] def pairCandidates(buckets: DataFrame): DataFrame =
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_l"), col("b.id").as("id_r"))
      .dropDuplicates("id_l", "id_r")

  /** Consecutive-by-id candidates: c−1 rows per c-member bucket via one
    * window — linear in corpus size no matter how skewed the buckets. */
  private[graft] def chainCandidates(buckets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("band", "bucket").orderBy("id")
    buckets.withColumn("id_l", lag(col("id"), 1).over(w))
      .filter(col("id_l").isNotNull)
      .select(col("id_l"), col("id").as("id_r"))
      .dropDuplicates("id_l", "id_r")
  }

  /** Chain-contracted MinHash-LSH near-dup edges — the giant-cluster-safe
    * variant of [[minhashLshPairs]], the same trick as
    * [[Similarity.neardupEdgesChained]]: a bucket of c clones emits its
    * c−1 *consecutive-by-id* member pairs (one window) instead of the
    * self-join's c(c−1)/2, so candidate volume is linear in corpus size no
    * matter how skewed the buckets — a million-clone boilerplate cluster
    * produces 10⁶−1 chain candidates, not 10¹². Identical texts share all
    * shingles (Jaccard 1 between every consecutive pair), so connected
    * components over the verified chain edges equal the pairwise-edge
    * components on clone clusters; for merely-similar members a chain edge
    * can fail verification where a non-adjacent pair would have passed,
    * making the chained components a refinement (never a coarsening) of the
    * pairwise ones — the safe direction for dedup (asserted in DedupSpec). */
  def minhashLshEdgesChained(df: DataFrame, idCol: String, textCol: String,
      n: Int, numPerm: Int, bands: Int, threshold: Double,
      mode: MinHashMode = XxMode): DataFrame = {
    val (sh, buckets) = minhashBuckets(df, idCol, textCol, n, numPerm, bands, mode)
    jaccardFromCounts(sh, candidateCommonCounts(sh, chainCandidates(buckets)), threshold)
  }

  /** Hash family for the MinHash banding pipeline. [[XxMode]] (xxhash64
    * base/permutation/band hashes — full 64-bit dispersion, zero-cost
    * codegen'd) is the scale default. [[MirrorMode]] swaps every hash for
    * plain 64-bit integer arithmetic any ANSI engine reproduces
    * bit-for-bit — base hash = [[strHash]] polynomial char fold,
    * permutations = a Carter–Wegman affine family `(aᵢ·h + bᵢ) mod P`,
    * band hash = a seeded multiplicative fold — so an external auditor
    * (the DuckDB oracle, q188/q189/q181) can recompute SIGNATURES, BUCKET
    * IDS, candidate sets, and verified pairs value-for-value, not just
    * check invariants. Dispersion is weaker than xxhash64 (P ≈ 2³⁰ output
    * space vs 2⁶⁴) — at 100 TB corpus size use XxMode and audit a sampled
    * partition in MirrorMode. */
  sealed trait MinHashMode
  case object XxMode extends MinHashMode
  case object MirrorMode extends MinHashMode

  /** The Mersenne-ish prime bounding every MirrorMode hash value. All
    * intermediates stay below 2⁶³: `a·h ≤ (2654435761+2·numPerm)·(P−1)
    * ≈ 2.7·10¹⁸` and the band fold's `acc·2654435761 + s ≤ 2.7·10¹⁸`. */
  private[graft] val MirrorP = 1000000007L
  /** Per-permutation affine multipliers/offsets — fixed public constants
    * (Knuth's multiplier stepped by 2i keeps each aᵢ odd and nonzero mod
    * P, so every permutation map is a bijection of Z_P). */
  private[graft] def mirrorPermA(i: Int): Long = 2654435761L + 2L * i
  private[graft] def mirrorPermB(i: Int): Long = 1000003L * (i + 1)

  /** ANSI-mirrorable polynomial string hash: fold `acc·31 + codepoint`
    * mod [[MirrorP]] over the characters. Matches DuckDB's
    * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
    * c -> unicode(c))), (a,c) -> (a*31+c) % 1000000007)` bit-for-bit.
    * Computed by the codegen'd [[graft.functions.StrPolyHash]] — the
    * declarative `aggregate(filter(split(s,'')), …, pmod)` fold it
    * replaces is CodegenFallback (interpreted lambda dispatch plus a
    * per-character array per value), which dominated every MirrorMode
    * shingle/word hash; equality is pinned in ExtSpec. Still the
    * AUDIT-mode base hash; XxMode's xxhash64 is the scale path. */
  def strHash(s: Column): Column =
    // direct expression, not call_function: resolves in sessions built
    // without GraftExtensions (the [[minhashSignature]] rationale)
    graft.functions.Cols.of(
      graft.functions.StrPolyHash(graft.functions.Cols.expr(s)))

  /** The declarative higher-order-function formulation of [[strHash]] —
    * retained as the spec's equality witness (ExtSpec pins
    * `strHashHof(s) === strHash(s)` on the corpus and edge cases). */
  private[graft] def strHashHof(s: Column): Column =
    aggregate(
      org.apache.spark.sql.functions.filter(split(s, ""), c => c =!= ""),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c), lit(MirrorP)))

  /** Shared MinHash-banding front end: the localCheckpointed shingle index
    * plus (id, band, bucket) rows. Bucket rows carry only ids — shingle
    * arrays never ride the banding explode. Package-private so composite
    * queries comparing candidate strategies (q91) compute the banding once. */
  private[graft] def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
      n: Int, numPerm: Int, bands: Int,
      mode: MinHashMode = XxMode): (DataFrame, DataFrame) = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rowsPerBand = numPerm / bands
    // localCheckpoint the shingle index (read by the signature pass, the
    // size table, and both sides of candidate verification) — see the
    // leak rationale in [[jaccardPairs]]
    val sh = shingleRows(df, idCol, textCol, n).localCheckpoint()
    // Signature via numPerm codegen'd min(hash) aggregates — higher-order
    // functions are CodegenFallback, so the array-lambda formulation pays
    // interpreted dispatch per (shingle, perm); this is one shuffle on the
    // doc id instead. Permutation i = min over re-hashed base hashes of
    // the shingle (Broder); MirrorMode uses an affine family over strHash.
    val baseHash = mode match {
      case XxMode => xxhash64(col("sh"))
      case MirrorMode => strHash(col("sh"))
    }
    val tok = sh.select(col("id"), baseHash.as("h"))
    val sigCols = (0 until numPerm).map { i =>
      val permed = mode match {
        case XxMode => xxhash64(col("h"), lit(i))
        case MirrorMode =>
          pmod(col("h") * lit(mirrorPermA(i)) + lit(mirrorPermB(i)), lit(MirrorP))
      }
      min(permed).as(s"s$i")
    }
    val sig = tok.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    // bucket rows carry only (id, band, bucket)
    val bandCols = (0 until bands).map { b =>
      val sigsInBand = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"s$i"))
      mode match {
        case XxMode => xxhash64(sigsInBand :+ lit(b): _*)
        case MirrorMode =>
          // seeded multiplicative fold: acc = (acc·2654435761 + s) mod P
          sigsInBand.foldLeft(lit(b + 1L): Column)((acc, s) =>
            pmod(acc * lit(2654435761L) + s, lit(MirrorP)))
      }
    }
    val buckets = sig.select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    (sh, buckets)
  }

  /** End-to-end text cluster dedup — the document-side twin of
    * [[Similarity.semanticDedupClusters]]: chain-contracted MinHash-LSH
    * edges ([[minhashLshEdgesChained]] — linear in corpus size under clone
    * skew) → min-id connected components → exactly one best-quality keeper
    * per cluster (ties keep the lowest id). `quality` is (id, quality);
    * returns every quality row with its `cluster_id` (own id for
    * singletons) and an `is_dropped` verdict — the keep-list a curation
    * pipeline feeds to training. Nothing is quadratic in cluster size
    * anywhere ([[ClusterKeep]]). */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
      quality: DataFrame, n: Int, numPerm: Int, bands: Int, threshold: Double,
      checkpointDir: Option[String] = None): DataFrame = {
    val edges = minhashLshEdgesChained(df, idCol, textCol, n, numPerm, bands, threshold)
      .select(col("id_l").as("src"), col("id_r").as("dst"))
    // chain edges are dropDuplicates'd and id_l < id_r, so already distinct
    ClusterKeep.assignAndKeep(quality, edges, checkpointDir)
  }

  /** 64-bit SimHash (Charikar): per-bit majority vote over word hashes,
    * entirely with built-in higher-order functions (bit loops as
    * sequence/transform, majority via aggregate, assembly via bitwise OR). */
  def simhash(text: Column): Column = {
    val hashes = transform(words(text), w => xxhash64(w))
    val nWords = size(hashes)
    val bitCounts = aggregate(hashes,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)), i => call_function("shiftright", h, i).bitwiseAND(lit(1L))),
        (a, b) => a + b))
    val bits = zip_with(bitCounts, sequence(lit(0), lit(63)),
      (cnt, i) => when(cnt * 2 >= nWords, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** MirrorMode word hash for SimHash: an affine spread of [[strHash]]
    * masked to 61 bits, so the majority vote sees ~61 informative bit
    * positions instead of [[strHash]]'s bare ~30 (bits 61–63 are always
    * zero on both engines — a known-dead top chunk, not a divergence).
    * Every intermediate stays below 2⁶²: (P−1)·2654435761 + 1000003 ≈
    * 2.66·10¹⁸. */
  private[graft] def mirrorWordHash(w: Column): Column =
    (strHash(w) * lit(2654435761L) + lit(1000003L))
      .bitwiseAND(lit((1L << 61) - 1))

  /** SimHash fingerprints via explode + the native
    * [[graft.functions.SimHashAgg]] aggregate (`simhash_agg`): one shuffle
    * on the doc id, one 65-long buffer per group instead of 64 separate
    * `sum()` expressions plus a 64-branch assembly projection — same
    * single-shuffle partial/final combine shape, a fraction of the per-row
    * work. Results are identical to the per-word array-lambda formulation
    * of [[simhash]] (kept for scalar use; equality asserted in DedupSpec).
    * [[MirrorMode]] swaps the word hash for [[mirrorWordHash]] so DuckDB
    * can recompute every fingerprint bit-for-bit (q195/q196); XxMode is
    * the scale path. */
  def simhashAgg(df: DataFrame, idCol: String, textCol: String,
      mode: MinHashMode = XxMode): DataFrame = {
    val wordHash = mode match {
      case XxMode => xxhash64(col("w"))
      case MirrorMode => mirrorWordHash(col("w"))
    }
    val tok = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .select(col("id"), wordHash.as("h"))
    tok.groupBy("id")
      .agg(call_function("simhash_agg", col("h")).as("fp"))
  }

  /** SimHash near-dup pairs: block on fingerprint chunks, then verify with
    * bit_count(xor). The chunk count is derived from `maxDist` — splitting
    * the 64 bits into `maxDist + 1` chunks guarantees by pigeonhole that any
    * pair within Hamming distance `maxDist` agrees exactly on at least one
    * chunk, so blocking has recall 1 at the requested distance (for
    * maxDist = 3 this is the classic 4×16-bit scheme). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, mode: MinHashMode = XxMode): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, "maxDist must be in [0, 64)")
    val nChunks = maxDist + 1
    // chunk i covers bits [offsets(i), offsets(i+1)) — widths differ by at
    // most one bit when nChunks does not divide 64
    val offsets = (0 to nChunks).map(i => i * 64 / nChunks)
    val chunkExprs = (0 until nChunks).map { i =>
      val width = offsets(i + 1) - offsets(i)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      call_function("shiftright", col("fp"), lit(offsets(i))).bitwiseAND(lit(mask))
    }
    val fp = simhashAgg(df, idCol, textCol, mode)
    val chunks = fp.select(col("id"), col("fp"),
      posexplode(array(chunkExprs: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_l"), col("b.id").as("id_r"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      // verify BEFORE the pair dedup: hamming is a function of the pair, so
      // filtering first is semantically identical, but it shrinks the
      // dropDuplicates shuffle from every bucket-join candidate (hot buckets
      // on templated corpora make that the dominant cost) to true pairs only
      // — Catalyst cannot push this itself because it can't see the
      // functional dependency through dropDuplicates' arbitrary-row pick
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_l", "id_r")
  }

  /** Cross-document boilerplate removal — the CCNet/C4 paragraph-dedup
    * step (Wenzek et al. 2020 "CCNet" dedups normalized paragraph hashes
    * across shards; C4 drops any three-sentence span seen before) over a
    * corpus whose unit is a fixed-width word segment: split each document
    * into consecutive `segWords`-word segments (last one may be shorter),
    * count the per-segment DOCUMENT frequency, drop every occurrence of a
    * segment that appears in >= `minDocFreq` distinct documents (headers,
    * nav bars, license blocks — content repeated across documents rather
    * than within one), and reassemble the survivors in original order.
    * Documents whose every segment is boilerplate come back with empty
    * text, not dropped rows — the caller decides the document-level fate.
    *
    * Returns (id, clean_text, n_segments, n_dropped).
    *
    * Scale shape: the document frequency is an AGGREGATE on the segment
    * (map-side combine, one row per distinct segment — a hot boilerplate
    * segment is exactly one combiner key, never a join fan-out), the drop
    * is a left_anti against the heavy-segment set (tiny by construction —
    * boilerplate is the head of the frequency curve — so AQE broadcasts
    * it), and reassembly is one shuffle on the doc id. At 100 TB, key the
    * anti-join on (xxhash64, md5) of the segment instead of the raw string
    * — the [[exactCanonical]] fixed-width content-key rationale. */
  def stripCommonSegments(df: DataFrame, idCol: String, textCol: String,
      segWords: Int, minDocFreq: Long): DataFrame = {
    require(segWords >= 1, "segment width must be >= 1")
    val ws = words(col(textCol))
    // ceil(nWords / segWords) segments; size >= 1 always (split of "" is
    // [""]), so the sequence never runs backwards
    val nSeg = ceil(size(ws).cast("double") / segWords).cast("int")
    val segsCol = transform(sequence(lit(0), nSeg - 1),
      i => array_join(slice(ws, i * segWords + 1, lit(segWords)), " "))
    val seg = df.select(col(idCol).as("id"),
      posexplode(segsCol).as(Seq("pos", "seg")))
    val heavy = seg.groupBy("seg")
      .agg(countDistinct(col("id")).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select("seg")
    val kept = seg.join(heavy, Seq("seg"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          s => s("seg")), " ").as("clean_text"),
        count(lit(1)).as("__n_kept"))
    seg.groupBy("id").agg(count(lit(1)).as("n_segments"))
      .join(rebuilt, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_segments"),
        (col("n_segments") - coalesce(col("__n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Cross-document repeated-span measurement — the span-level signal
    * behind exact-substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — public): for each
    * document, how many of its word n-gram occurrences (n ≈ a span long
    * enough to be memorable, e.g. 20) also appear in at least one OTHER
    * document, plus the fraction of the document that is such duplicated
    * span material. Pipelines drop or trim documents above a threshold.
    *
    * Scale shape: one distinct pass to the per-shingle document frequency
    * (shuffle on the shingle, map-side combine), one equi-join back to the
    * occurrence rows, one per-document aggregate. As with
    * [[contamination]], join on `xxhash64(sh)` at 100 TB and cap
    * boilerplate shingles via a document-frequency ceiling if hot keys
    * appear. Documents shorter than n words report zero spans. */
  def spanDuplication(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val occ = shingleRowsAll(df, idCol, textCol, n)
    val docFreq = occ.distinct()
      .groupBy("sh").agg(count(lit(1)).as("__df"))
    val perDoc = occ.join(docFreq, "sh")
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("__df") > 1, 1)).as("n_shared_spans"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_shared_spans").cast("double") / col("n_spans"))
          .as("shared_span_fraction"))
  }

  /** Train→test contamination check (the GPT-3-style n-gram-overlap
    * decontamination pass an LLM training pipeline runs before evaluation):
    * a test document is contaminated when it shares at least `minOverlap`
    * distinct word n-grams with any training document. One shingle
    * inverted-index equi-join — never an all-pairs product — then a per-test
    * -doc aggregate. Use a shingle width that makes shingles near-unique
    * (GPT-3 used 13-grams); at 100 TB, join on `xxhash64(sh)` and drop
    * shingles whose train document frequency exceeds a cap to bound hot
    * keys (`maxTrainDf`). */
  def contamination(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, n: Int, minOverlap: Long = 1L,
      maxTrainDf: Option[Long] = None): DataFrame = {
    val tr0 = shingleRows(train, idCol, textCol, n)
      .select(col("id").as("train_id"), col("sh"))
    val tr = maxTrainDf.fold(tr0) { cap =>
      import org.apache.spark.sql.expressions.Window
      tr0.withColumn("__df", count(lit(1)).over(Window.partitionBy("sh")))
        .filter(col("__df") <= cap).drop("__df")
    }
    val hits = shingleRows(test, idCol, textCol, n)
      .join(tr, "sh")
      .groupBy(col("id"))
      .agg(countDistinct(col("sh")).as("n_overlap_shingles"),
        countDistinct(col("train_id")).as("n_train_docs"))
    test.select(col(idCol).as("id")).distinct()
      .join(hits, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("n_overlap_shingles"), lit(0L)).as("n_overlap_shingles"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        (coalesce(col("n_overlap_shingles"), lit(0L)) >= minOverlap)
          .as("contaminated"))
  }
}
