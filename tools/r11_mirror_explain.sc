// r11 evidence capture: MirrorMode hash-path plans (batch mirror queries +
// the minhashBuckets/simhashAgg operator frames q181 folds per micro-batch).
val s = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.extensions","graft.GraftExtensions").config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
s.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
val tag = sys.env.getOrElse("R11_TAG", "before")
val dir = "/root/testdata/sf0.01"
def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
  val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/root/repo/plans/r11/${name}_$tag.txt"), p)
  println(s"WROTE $name ${p.length}")
}
for (q <- Seq("q188_minhash_mirror_pairs", "q189_minhash_mirror_buckets", "q190_minhash_mirror_chained", "q195_simhash_mirror_fp", "q196_simhash_mirror_pairs"))
  dump(q, graft.SparkEntry.queries(q)(s, dir))
val docs = graft.engine.Tables.load(s, dir, "documents")
dump("op_minhash_buckets_mirror", graft.ext.TextDedup.minhashBuckets(docs, "doc_id", "text", 5, 16, 4, graft.ext.TextDedup.MirrorMode)._2)
sys.exit(0)
