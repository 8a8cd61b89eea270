package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-pattern ("motif") matcher: compiles a GraphFrames-style pattern
  * string into a left-deep chain of equi-joins over the vertex/edge
  * DataFrames, producing one struct column per named vertex/edge — the exact
  * result shape the reference consumes downstream (`graph1.g.id`,
  * `graph1.e6.txn_amount` at `/root/reference/01_aml_network_analysis.py:
  * 318-319`; structuring motif `:308-311`, round-trip 4-cycle `:376-377`).
  *
  * Grammar (the subset the reference exercises, plus negation):
  * {{{
  *   pattern := term (';' term)*
  *   term    := '!'? '(' name? ')' ( '-[' name? ']->' '(' name? ')' )?
  * }}}
  * Names may repeat — a repeated vertex name is the SAME vertex (that is how
  * cycles bind: `(a)-[e1]->(b); (b)-[e2]->(a)`), expressed as an extra join
  * predicate, never a re-scan. No implicit distinctness between different
  * names (GraphFrames semantics). Negated terms (`!(a)-[]->(b)`) become
  * LEFT ANTI joins.
  *
  * Scale: the compiled plan is ordinary equi-joins, so Catalyst/AQE pick join
  * order, broadcast small sides, and handle skew — nothing here is
  * driver-side.
  */
object Motif {

  private final case class Term(
      negated: Boolean,
      src: Option[String],          // None = anonymous "()"
      edge: Option[Option[String]], // None = bare vertex term; Some(None) = anonymous edge
      dst: Option[String])

  private val edgeTermRe =
    """^(!?)\(([A-Za-z_][A-Za-z0-9_]*)?\)-\[([A-Za-z_][A-Za-z0-9_]*)?\]->\(([A-Za-z_][A-Za-z0-9_]*)?\)$""".r
  private val vertexTermRe = """^\(([A-Za-z_][A-Za-z0-9_]*)?\)$""".r

  private def parse(pattern: String): Seq[Term] =
    pattern.split(";").map(_.trim).filter(_.nonEmpty).map {
      case edgeTermRe(neg, a, e, b) =>
        Term(neg == "!", Option(a), Some(Option(e)), Option(b))
      case vertexTermRe(a) =>
        Term(negated = false, Option(a), None, None)
      case other =>
        throw new IllegalArgumentException(s"cannot parse motif term '$other'")
    }.toSeq

  def find(g: PropertyGraph, pattern: String): DataFrame = {
    val terms = parse(pattern)
    require(terms.nonEmpty, "empty motif pattern")
    require(terms.exists(!_.negated), "motif needs at least one positive term")

    val vCols = g.vertices.columns.toSeq
    val eCols = g.edges.columns.toSeq
    def vStruct(name: String): DataFrame =
      g.vertices.select(struct(vCols.map(col): _*).as(name))
    def eStruct(name: String): DataFrame =
      g.edges.select(struct(eCols.map(col): _*).as(name))

    var anonId = 0 // shared across bushy halves so anonymous names never collide
    def fresh(prefix: String): String = { anonId += 1; s"__${prefix}_$anonId" }

    val positive = terms.filterNot(_.negated)
    // user-visible output order = first appearance in the pattern (a, e, b, …)
    val order: Seq[String] = positive.flatMap {
      case Term(_, a, None, _) => a.toSeq
      case Term(_, a, Some(e), b) => a.toSeq ++ e.toSeq ++ b.toSeq
    }.distinct

    /** Compile a term run into a left-deep equi-join chain; returns the
      * DataFrame plus the set of names bound as struct columns. */
    def compile(run: Seq[Term], preBound: Set[String]): (DataFrame, Set[String]) = {
      var bound = preBound
      var df: DataFrame = null
      def remember(name: String): Unit = bound += name
      // Join a vertex struct for `name` constrained to endpoint
      // `edgeName.ep`, or add the equality predicate if already bound.
      def bindEndpoint(nameOpt: Option[String], edgeName: String, ep: String): Unit =
        nameOpt match {
          case None => () // anonymous endpoint: no struct, no constraint
          case Some(name) if bound(name) =>
            df = df.filter(col(s"$edgeName.$ep") === col(s"$name.id"))
          case Some(name) =>
            df = df.join(vStruct(name), col(s"$name.id") === col(s"$edgeName.$ep"))
            remember(name)
        }
      run.foreach {
        case Term(_, srcOpt, None, _) =>
          // bare vertex term "(a)": bind unconstrained (cartesian with the rest)
          srcOpt.foreach { name =>
            if (!bound(name)) {
              df = if (df == null) vStruct(name) else df.crossJoin(vStruct(name))
              remember(name)
            }
          }
        case Term(_, srcOpt, Some(edgeOpt), dstOpt) =>
          val eName = edgeOpt.getOrElse(fresh("e"))
          require(!bound(eName), s"edge name '$eName' used more than once")
          val ePart = eStruct(eName)
          // equi-join predicates available from already-bound vertices
          val conds = Seq(
            srcOpt.filter(bound).map(a => col(s"$eName.src") === col(s"$a.id")),
            dstOpt.filter(bound).map(b => col(s"$eName.dst") === col(s"$b.id"))
          ).flatten
          df =
            if (df == null) ePart
            else if (conds.isEmpty) df.crossJoin(ePart)
            else df.join(ePart, conds.reduce(_ && _))
          remember(eName)
          bindEndpoint(srcOpt, eName, "src")
          bindEndpoint(dstOpt, eName, "dst")
      }
      (df, bound)
    }

    // Bushy split for long cycles: a k-edge cycle compiled left-deep builds a
    // (k-1)-path intermediate, which grows with the k-1 power of the average
    // degree; compiling the two halves independently and joining them on
    // their ≥ 2 shared vertices keeps the largest intermediate at a
    // ⌈k/2⌉-path (2× wall clock on the 4-cycle q45 at sf0.1). Applied only
    // when it cannot make plans worse: every term must be an edge term, each
    // half must be internally chain-connected (no new cross joins), and the
    // halves must share at least two vertices (with one shared vertex —
    // plain paths — bushy ≈ left-deep, so keep the simpler plan).
    def termVars(t: Term): Set[String] = (t.src.toSeq ++ t.dst.toSeq).toSet
    def chainConnected(ts: Seq[Term]): Boolean =
      ts.drop(1).scanLeft(termVars(ts.head)) { (seen, t) => seen ++ termVars(t) }
        .zip(ts.drop(1))
        .forall { case (seen, t) => termVars(t).intersect(seen).nonEmpty }
    val bushy = positive.length >= 4 && positive.forall(_.edge.isDefined) && {
      val (h1, h2) = positive.splitAt(positive.length / 2)
      chainConnected(h1) && chainConnected(h2) &&
        h1.flatMap(termVars).toSet.intersect(h2.flatMap(termVars).toSet).size >= 2
    }

    var (df, bound) = if (bushy) {
      val (h1, h2) = positive.splitAt(positive.length / 2)
      val (d1, b1) = compile(h1, Set.empty)
      val (d2, b2) = compile(h2, Set.empty)
      val shared = b1.intersect(b2).toSeq.sorted // vertices only: edge names are unique
      val d2r = shared.foldLeft(d2)((d, v) => d.withColumnRenamed(v, s"__bushy_$v"))
      val cond = shared.map(v => col(s"$v.id") === col(s"__bushy_$v.id")).reduce(_ && _)
      (d1.join(d2r, cond).drop(shared.map(v => s"__bushy_$v"): _*), b1 ++ b2)
    } else compile(positive, Set.empty)

    // Negated terms: anti-join against the edge table on the bound endpoints.
    terms.filter(_.negated).foreach { t =>
      val (aOpt, bOpt) = (t.src, t.dst)
      require(t.edge.exists(_.isEmpty),
        "negated motif terms must use an anonymous edge: !(a)-[]->(b)")
      require(aOpt.forall(bound) && bOpt.forall(bound),
        "negated term endpoints must appear in a positive term")
      val neg = g.edges.select(col("src").as("__neg_src"), col("dst").as("__neg_dst"))
      val conds = Seq(
        aOpt.map(a => col("__neg_src") === col(s"$a.id")),
        bOpt.map(b => col("__neg_dst") === col(s"$b.id"))
      ).flatten
      require(conds.nonEmpty, "negated term must constrain at least one endpoint")
      df = df.join(neg, conds.reduce(_ && _), "left_anti")
    }

    df.select(order.map(col): _*)
  }

  /** Convenience: flatten one struct column into prefixed top-level columns
    * (`a` → `a_id, a_name, …`), for oracle-comparable flat outputs. */
  def flatten(df: DataFrame, names: String*): DataFrame = {
    val cols = names.flatMap { n =>
      df.schema(n).dataType match {
        case s: org.apache.spark.sql.types.StructType =>
          s.fieldNames.toSeq.map(f => col(s"$n.$f").as(s"${n}_$f"))
        case _ => Seq(col(n))
      }
    }
    df.select(cols: _*)
  }
}
