package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BloomProbe, CosineSimilarity, DotProduct, DoubleMetaphoneExpr, JaroWinkler, MisraGriesAgg}

/** Session extensions registering the engine's custom Catalyst expressions
  * (SURVEY.md §4: JaroWinkler for ER fuzzy comparison; cosine/dot for the
  * embedding hot path, where Spark's higher-order functions would fall back
  * to interpreted evaluation).
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expr]) => JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expr]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expr]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("double_metaphone"),
      new ExpressionInfo(classOf[DoubleMetaphoneExpr].getName, "double_metaphone"),
      (children: Seq[Expr]) => DoubleMetaphoneExpr(children.head, alternate = false)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomProbe].getName, "bloom_might_contain"),
      (children: Seq[Expr]) => BloomProbe(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("double_metaphone_alt"),
      new ExpressionInfo(classOf[DoubleMetaphoneExpr].getName, "double_metaphone_alt"),
      (children: Seq[Expr]) => DoubleMetaphoneExpr(children.head, alternate = true)))
    ext.injectFunction((
      new FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[graft.functions.QuantizeI8].getName, "quantize_i8"),
      (children: Seq[Expr]) => graft.functions.QuantizeI8(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_i8"),
      new ExpressionInfo(classOf[graft.functions.CosineI8].getName, "cosine_i8"),
      (children: Seq[Expr]) => graft.functions.CosineI8(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("approx_top_k"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "approx_top_k"),
      (children: Seq[Expr]) => MisraGriesAgg.fromFunctionCall(children)))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[graft.functions.CmsAgg].getName, "cms_sketch"),
      (children: Seq[Expr]) => graft.functions.CmsAgg.fromFunctionCall(children)))
    ext.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[graft.functions.CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expr]) => graft.functions.CmsAgg.estimateFromFunctionCall(children)))
    ext.injectFunction((
      new FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[graft.functions.ZValue].getName, "z_value"),
      (children: Seq[Expr]) => graft.functions.ZValue(children)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[graft.functions.SimHashAgg].getName, "simhash_agg"),
      (children: Seq[Expr]) => graft.functions.SimHashAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expr]) => graft.functions.MinHashSig(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hll_init"),
      new ExpressionInfo(classOf[graft.functions.HllInit].getName, "hll_init"),
      (children: Seq[Expr]) => graft.functions.HllInit(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hll_count"),
      new ExpressionInfo(classOf[graft.functions.HllCount].getName, "hll_count"),
      (children: Seq[Expr]) => graft.functions.HllCount(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("hll_merge"),
      new ExpressionInfo(classOf[graft.functions.HllMergeAgg].getName, "hll_merge"),
      (children: Seq[Expr]) => graft.functions.HllMergeAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_sub"),
      new ExpressionInfo(classOf[graft.functions.VecSub].getName, "vec_sub"),
      (children: Seq[Expr]) => graft.functions.VecSub(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName, "pq_adc"),
      (children: Seq[Expr]) => graft.functions.PqAdc(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("str_poly_hash"),
      new ExpressionInfo(classOf[graft.functions.StrPolyHash].getName, "str_poly_hash"),
      (children: Seq[Expr]) => graft.functions.StrPolyHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShingles].getName, "word_shingles"),
      (children: Seq[Expr]) => graft.functions.WordShingles.fromFunctionCall(children)))
    // conf-gated: inert unless spark.graft.rangeJoin.bucketWidth is set
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
  }
}
