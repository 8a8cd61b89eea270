package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style column statistics — the profile (row count, null count,
  * distinct count, numeric min/max) a catalog keeps per column for
  * optimizer costing and data-quality monitoring. The reference's tables
  * are profiled implicitly by Spark's `saveAsTable`; this is the explicit,
  * engine-owned surface.
  *
  * Shape, per mode. `approxNdv = true` (the at-scale mode): ONE wide
  * aggregate — per-column count/HLL-NDV/min/max in a single
  * map-side-combinable pass, no Expand, O(sketch·columns) state
  * (measured 0.9 s on sf0.1 lineitem). `approxNdv = false` (exact NDV):
  * one single-DISTINCT aggregate PER COLUMN, unioned — round 11 re-shape:
  * the earlier one-wide-aggregate form planned the 11 DISTINCTs as a
  * single Expand (row count × columns through one hash aggregate keyed on
  * a 12-wide tuple); per-column branches instead each scan ONE
  * column-pruned column and dedup a narrow key (same total I/O under a
  * columnar format, same exchange volume after partial-distinct
  * compression, no 12× row materialization, cache-friendly narrow hash
  * keys) — measured 5.6→4.0 s warm best / 11.6→5.5 s cold on sf0.1
  * lineitem, values identical. The branches run inside one job (union),
  * so the scan-task count is the only scale cost (columns × scan tasks),
  * which the at-scale HLL mode avoids anyway.
  *
  * Mode choice, explicitly: `approxNdv = false` (exact NDV) exists for
  * ORACLE PARITY and small-table profiling — its Expand multiplies scan
  * rows by the column count and shuffles the full corpus, so it grows
  * superlinearly in practice (10× rows → see SCALE.md's q106 arm). At
  * scale, `approxNdv = true` IS the default mode of this operator: one
  * map-side-combinable pass, no Expand, O(sketch·columns) state — the
  * ANALYZE path every warehouse actually runs.
  */
object Stats {

  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  def columnStats(df: DataFrame, approxNdv: Boolean = false): DataFrame = {
    if (!approxNdv) return columnStatsExact(df)
    // one WIDE aggregate over native values (no per-value casts, no row
    // expansion before the agg): per column count/NDV/min/max. The single
    // result row is then unpivoted (11 rows, driver-free) into the
    // per-column profile.
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      // approxNdv is always true here (the exact path returned above)
      val ndv = approx_count_distinct(c)
      Seq(
        count(c).as(s"__cnt_${f.name}"),
        ndv.as(s"__ndv_${f.name}"),
        (if (isNumeric(f.dataType)) min(c).cast("double")
         else lit(null).cast("double")).as(s"__min_${f.name}"),
        (if (isNumeric(f.dataType)) max(c).cast("double")
         else lit(null).cast("double")).as(s"__max_${f.name}"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*)
    val branches = fields.map { f =>
      s"'${f.name}', `__cnt_${f.name}`, `__ndv_${f.name}`, `__min_${f.name}`, `__max_${f.name}`"
    }
    row.selectExpr("__n",
        s"stack(${fields.length}, ${branches.mkString(", ")}) as (col_name, __cnt, ndv, min_num, max_num)")
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__cnt")).as("n_nulls"), col("ndv"),
        col("min_num"), col("max_num"))
  }

  /** Exact-NDV profile as a union of per-column single-DISTINCT
    * aggregates (see the mode-shape rationale in the object doc): each
    * branch prunes the scan to its own column and plans a plain
    * two-phase distinct aggregate — no Expand, no wide composite hash
    * key. Output rows/values are identical to the wide-aggregate form
    * (StatsSpec + the q106 oracle pin both gates). */
  private def columnStatsExact(df: DataFrame): DataFrame =
    df.schema.fields.map { f =>
      val c = col(f.name)
      df.agg(count(lit(1)).as("__n"), count(c).as("__cnt"),
          countDistinct(c).as("ndv"),
          (if (isNumeric(f.dataType)) min(c).cast("double")
           else lit(null).cast("double")).as("min_num"),
          (if (isNumeric(f.dataType)) max(c).cast("double")
           else lit(null).cast("double")).as("max_num"))
        .select(lit(f.name).as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col("__cnt")).as("n_nulls"), col("ndv"),
          col("min_num"), col("max_num"))
    }.reduce(_ unionByName _)

  /** Pairwise Pearson correlation matrix over fixed-point numeric
    * columns, ONE pass: a single wide aggregate computes n, per-column
    * sums, and per-pair product sums, then the `stack` unpivot emits one
    * row per column pair — the profile step before feature selection /
    * multicollinearity pruning.
    *
    * Determinism: raw double sums are shuffle-order-dependent, so values
    * are first scaled to integer cents (`round(x·scale)` — exact for
    * fixed-point business data) and summed as DECIMAL(38,0) — EXACT,
    * order-independent sums (the same reason q70 quantizes centroid
    * sums). The correlation itself is then one fixed-shape double
    * expression per pair from those exact atoms, rounded — reproduced
    * verbatim by the SQL oracle. Decimal-to-double conversion of sums
    * beyond 2⁵³ rounds nearest identically on both engines.
    *
    * Shape: one map-side-combinable aggregate (k + k(k+1)/2 sums) over
    * the scan; the unpivot touches a single row. No per-pair passes. */
  def corrMatrix(df: DataFrame, cols: Seq[String],
      scale: Int = 100): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    def cents(c: String) = expr(s"CAST(round($c * $scale) AS DECIMAL(18,0))")
    val aggs =
      cols.flatMap { c =>
        Seq(sum(cents(c)).as(s"__s_$c"),
          sum(cents(c) * cents(c)).as(s"__q_$c"))
      } ++
      pairs.map { case (x, y) =>
        sum(cents(x) * cents(y)).as(s"__p_${x}__$y")
      }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val branches = pairs.map { case (x, y) =>
      s"'$x', '$y', CAST(`__s_$x` AS DOUBLE), CAST(`__q_$x` AS DOUBLE), " +
        s"CAST(`__s_$y` AS DOUBLE), CAST(`__q_$y` AS DOUBLE), " +
        s"CAST(`__p_${x}__$y` AS DOUBLE)"
    }
    row.selectExpr("CAST(__n AS DOUBLE) AS n",
        s"stack(${pairs.size}, ${branches.mkString(", ")}) " +
          "AS (col_x, col_y, sx, qx, sy, qy, pxy)")
      .select(col("col_x"), col("col_y"), col("n").cast("long").as("n"),
        round((col("n") * col("pxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("qx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("qy") - col("sy") * col("sy"))), 6)
          .as("corr"))
  }

  /** Group-wise ordinary-least-squares regression of `yCol` on `xCol` —
    * the per-segment trend fit (price elasticity per status, value drift
    * per cohort) analysts otherwise pull out of the warehouse row by row.
    * Returns per group: n, slope, intercept, r2.
    *
    * Shape: ONE keyed aggregate computing the five sufficient statistics
    * (Σx, Σy, Σx², Σy², Σxy) — map-side combinable, no second pass, no
    * window. The closed forms (slope = n·Σxy−Σx·Σy / n·Σx²−(Σx)², etc.)
    * are evaluated on the single row per group afterwards.
    *
    * Determinism: inputs are fixed-point values (`scale` decimal places),
    * so the statistics accumulate EXACTLY in DECIMAL — no
    * shuffle-order-dependent double sums; the closed forms then perform
    * identical IEEE double arithmetic in any engine (same trick as
    * [[corrMatrix]]). Fixed `scale` for both columns makes the slope
    * scale-free (the cent factors cancel); the intercept divides the cent
    * factor back out. */
  def groupRegression(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, scale: Int = 100): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    def cents(c: String) = expr(s"CAST(round($c * $scale) AS DECIMAL(18,0))")
    val g = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(cents(xCol)).as("__sx"), sum(cents(yCol)).as("__sy"),
      sum(cents(xCol) * cents(xCol)).as("__qx"),
      sum(cents(yCol) * cents(yCol)).as("__qy"),
      sum(cents(xCol) * cents(yCol)).as("__pxy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val qx = col("__qx").cast("double"); val qy = col("__qy").cast("double")
    val pxy = col("__pxy").cast("double")
    val slope = (n * pxy - sx * sy) / (n * qx - sx * sx)
    g.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / (n * lit(scale.toDouble)), 6).as("intercept"),
      round((n * pxy - sx * sy) * (n * pxy - sx * sy) /
        ((n * qx - sx * sx) * (n * qy - sy * sy)), 6).as("r2")): _*)
  }

  /** Chi-square independence cells between two categorical columns — the
    * contingency-table screen (is event mix independent of weekday? is
    * segment independent of region?) behind categorical feature selection
    * and drift monitoring. Per observed cell: the observed count, the
    * independence-expected count `rowTotal·colTotal/N`, and the cell's
    * chi-square contribution `(o−e)²/e` (sum them for the statistic;
    * cells absent from the data are not emitted, so strictly the sum is
    * the observed-cell statistic — identical when every combination
    * occurs).
    *
    * Shape: one keyed count over (x, y), then marginals as two aggregates
    * OF THE CELL TABLE (already tiny — |x|·|y| rows — so the marginal
    * joins broadcast; nothing row-sized is shuffled twice).
    * Determinism: counts are exact longs; expected/chi2 are fixed-shape
    * per-row double expressions — no order-dependent double sums. */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("observed"))
    val rowT = cells.groupBy(col(xCol)).agg(sum("observed").as("__rx"))
    val colT = cells.groupBy(col(yCol)).agg(sum("observed").as("__cy"))
    val tot = cells.agg(sum("observed").as("__n"))
    val e = col("__rx").cast("double") * col("__cy").cast("double") /
      col("__n").cast("double")
    val o = col("observed").cast("double")
    cells
      .join(broadcast(rowT), Seq(xCol))
      .join(broadcast(colT), Seq(yCol))
      .crossJoin(broadcast(tot))
      .select(col(xCol), col(yCol), col("observed"),
        round(e, 6).as("expected"),
        round((o - e) * (o - e) / e, 6).as("chi2"))
  }

  /** Two-proportion z-test per group — the A/B-experiment significance
    * readout (is variant B's conversion rate different from A's?).
    * Input: ONE ROW PER UNIT (user) with a 'A'/'B' variant column and a
    * boolean converted column. Output per group: exact unit/conversion
    * counts for both variants, the two rates, and the pooled-variance
    * z-statistic `(p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))` with
    * `p̂ = (x_a+x_b)/(n_a+n_b)` (the classical large-sample test).
    * Degenerate groups (pooled rate 0 or 1, or an empty variant arm)
    * emit NULL z rather than NaN/∞.
    *
    * Variant-domain contract: only rows with variant exactly 'A' or 'B'
    * enter the two arms; anything else (a 'C' arm, a typo, NULL) is
    * counted in the per-group `n_other` output column instead of being
    * silently folded into arm B — a 3-arm experiment fed to a 2-arm test
    * surfaces as a nonzero n_other, not as a plausible-but-wrong z.
    * The extra counter rides the SAME keyed aggregate (no second pass).
    *
    * Shape: one keyed aggregate over the unit table — five conditional
    * counters per group, no joins, no window. Determinism: counts are
    * exact longs; rates and z are fixed-shape per-row double expressions
    * (each op correctly rounded, same tree both engines), rounded to 6
    * decimals per the q146/q147 convention. */
  def twoProportionZ(units: DataFrame, groupCols: Seq[String],
      variantCol: String, convertedCol: String): DataFrame = {
    val isA = col(variantCol) === "A"
    val isB = col(variantCol) === "B"
    val conv = col(convertedCol).cast("boolean")
    val g = units.groupBy(groupCols.map(col): _*).agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA && conv, 1L).otherwise(0L)).as("x_a"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(isB && conv, 1L).otherwise(0L)).as("x_b"),
      sum(when(isA || isB, 0L).otherwise(1L)).as("n_other"))
    val na = col("n_a").cast("double"); val xa = col("x_a").cast("double")
    val nb = col("n_b").cast("double"); val xb = col("x_b").cast("double")
    val pooled = (xa + xb) / (na + nb)
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / na + lit(1.0) / nb))
    g.select(groupCols.map(col) ++ Seq(
      col("n_a"), col("x_a"), col("n_b"), col("x_b"), col("n_other"),
      when(col("n_a") > 0, round(xa / na, 6)).as("p_a"),
      when(col("n_b") > 0, round(xb / nb, 6)).as("p_b"),
      when(col("n_a") > 0 && col("n_b") > 0 &&
          col("x_a") + col("x_b") > 0 &&
          col("x_a") + col("x_b") < col("n_a") + col("n_b"),
        round((xa / na - xb / nb) / se, 6)).as("z")): _*)
  }

  /** Distribution-concentration profile per group: over the counts of a
    * categorical value within each group, the distinct-value count, the
    * Herfindahl–Hirschman concentration index `Σ (c_i/n)² = (Σc_i²)/n²`
    * and the Shannon entropy `−Σ (c_i/n)·ln(c_i/n) = ln n − (Σ c_i·ln c_i)/n`
    * — "is this segment's volume spread out or owned by a few entities",
    * the screen behind both market-concentration monitoring and
    * mule-account detection (one user generating a type's whole volume).
    *
    * Determinism: `Σc_i²` is summed as integer-VALUED doubles — each
    * c² < 2⁵³ is exact and sums of exact integers in doubles are
    * order-independent until 2⁵³ total (documented bound; beyond that,
    * pre-aggregate groups) — so HHI is a single exact division,
    * unrounded. `Σ c·ln c` is a genuinely order-dependent double sum →
    * rounded to 6 per the q43/q71 convention.
    *
    * Shape: two keyed aggregates ((group, value) counts, then per-group
    * reduction) — the same two-shuffle profile as any DISTINCT-count
    * rollup; nothing is collected or windowed. */
  def distributionStats(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val c = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val cd = col("__c").cast("double")
    val g = c.groupBy(groupCols.map(col): _*).agg(
      sum(col("__c")).as("n"),
      count(lit(1)).as("k"),
      sum(cd * cd).as("__sumsq"),
      sum(cd * log(cd)).as("__slnc"))
    val n = col("n").cast("double")
    g.select(groupCols.map(col) ++ Seq(
      col("n"), col("k"),
      (col("__sumsq") / (n * n)).as("hhi"),
      round(log(n) - col("__slnc") / n, 6).as("entropy")): _*)
  }

  /** Referential-integrity audit over declared foreign keys — the
    * data-quality gate a warehouse runs after every load. Per FK
    * `(name, child, childKey, parent, parentKey)`: the child row count,
    * NULL-key rows, and orphan rows (non-null keys with no parent row).
    *
    * Shape: one left-anti join plus one two-counter aggregate per FK,
    * reduced to a single row each before the union — nothing row-sized
    * crosses FK boundaries. The anti join is a plain keyed equi-join:
    * small parents broadcast automatically, big-big pairs (fact→fact)
    * shuffle on the key like any join; the parent side is pre-projected
    * to its distinct key column so only keys ride that shuffle. */
  def integrityAudit(
      fks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(fks.nonEmpty, "need at least one foreign key to audit")
    fks.map { case (fkName, child, ck, parent, pk) =>
      val orphans = child.where(col(ck).isNotNull)
        .join(parent.select(col(pk).as(ck)).distinct(), Seq(ck), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(ck).isNull, 1L).otherwise(0L)).as("n_null_keys"))
        .crossJoin(orphans) // both sides single-row aggregates
        .select(lit(fkName).as("fk"), col("n_rows"),
          col("n_null_keys").cast("long").as("n_null_keys"),
          col("n_orphans"))
    }.reduce(_ unionAll _)
  }
}
