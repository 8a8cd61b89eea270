// Round-2 measurement script (repo tooling, not engine code): informs the
// oracle designs for q23/q26/q27/q29/q30/q40. Run: sbt console < tools/measure.sc
import org.apache.spark.sql.functions._
val s = org.apache.spark.sql.SparkSession.builder().master("local[16]").config("spark.sql.extensions","graft.GraftExtensions").config("spark.sql.shuffle.partitions","16").config("spark.ui.enabled","false").getOrCreate()
s.sparkContext.setLogLevel("ERROR")
import graft.ext.{TextDedup, Similarity, Ivf}
import graft.engine.Tables

for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  println(s"===== $sf =====")
  val docs = Tables.load(s, sf, "documents")
  // --- q26: minhash LSH vs exact jaccard set equality
  val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", 5, 0.5).select("id_l","id_r")
  val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text", 5, 16, 4, 0.5).select("id_l","id_r")
  val nExact = exact.count(); val nLsh = lsh.count()
  val missed = exact.except(lsh).count(); val extra = lsh.except(exact).count()
  println(s"q26: exact=$nExact lsh=$nLsh missed=$missed extra=$extra")
  // --- q27: simhash pairs' unigram jaccard distribution (current 4x16 blocking)
  val sim = TextDedup.simhashPairs(docs, "doc_id", "text", 6)
  val uni = docs.select(col("doc_id"), array_distinct(TextDedup.words(col("text"))).as("w"))
  val simJ = sim.join(uni.select(col("doc_id").as("id_l"), col("w").as("wl")), "id_l")
    .join(uni.select(col("doc_id").as("id_r"), col("w").as("wr")), "id_r")
    .withColumn("j", size(array_intersect(col("wl"),col("wr"))).cast("double") / size(array_union(col("wl"),col("wr"))))
  println("q27 pairs=" + sim.count())
  simJ.agg(min("j").as("min_j"), expr("percentile(j, 0.05)").as("p05"), avg("j")).show(false)
  simJ.groupBy(col("hamming")).agg(count(lit(1)), min("j")).orderBy("hamming").show(false)
  // --- q29: cosine distribution of embedding pairs (subset %20) near threshold
  val emb = Tables.load(s, sf, "embeddings")
  val sub = emb.filter(col("vec_id") % 20 === 0)
  val pairs = Similarity.neardupPairs(sub, "vec_id", "embedding", -1.0)
  println("q29 subset n=" + sub.count())
  pairs.filter(col("cosine") >= 0.2).orderBy(desc("cosine")).show(30, false)
  // full-corpus high-cosine pairs (for raising threshold / dropping subset)
  val allp = Similarity.neardupPairs(emb, "vec_id", "embedding", 0.6)
  println("full corpus pairs cos>=0.6: " + allp.count())
  allp.groupBy(floor(col("cosine")*10).as("bin")).count().orderBy("bin").show(false)
  // --- q30/q40: global BF rank of ANN results
  val qs = emb.filter(col("vec_id") < 8)
  val bf = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 60)
  val lshr = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, 8, 64)
  val lshrM = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, 8, 64, multiProbe = true)
  val ivf = Ivf.topK(emb, qs, "vec_id", "embedding", 5, 20, 4)
  def ranks(ann: org.apache.spark.sql.DataFrame, nm: String): Unit = {
    val j = ann.join(bf.select(col("query_id"), col("neighbor_id"), col("rank").as("bf_rank")), Seq("query_id","neighbor_id"), "left_outer")
    println(s"$nm: n=" + ann.count() + " perQuery:")
    ann.groupBy("query_id").count().orderBy("query_id").show(false)
    j.agg(max("bf_rank").as("max_bf_rank"), sum(when(col("bf_rank").isNull,1).otherwise(0)).as("outside_bf60")).show(false)
  }
  ranks(lshr, "q30-lsh"); ranks(lshrM, "q30-lsh-multiprobe"); ranks(ivf, "q40-ivf")
}
sys.exit(0)
