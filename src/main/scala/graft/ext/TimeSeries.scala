package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over a (user, ts, value) log: ordered funnels,
  * rolling-window anomaly scores, and exponential smoothing. These are the
  * product-analytics twins of the reference's time-bucketed risk views
  * (`/root/reference/01_aml_network_analysis.py` aggregates transactions
  * per entity; these add the per-entity ORDERED semantics — step A before
  * step B, deviation from the entity's own recent history).
  *
  * Scale rules: every operator is either a per-key aggregate or a bounded
  * per-key window — the only shuffles are on `user_id` (or the step-join
  * key), frames are ROWS-bounded so state per key is O(frame), and no
  * global window or driver loop exists anywhere. All arithmetic follows
  * the repo determinism contract (fixed evaluation order, exact integer
  * counts, doubles only through identically-associating expressions) so
  * results are bit-stable across engines and partitionings.
  */
object TimeSeries {

  /** Ordered conversion funnel: for consecutive steps s1 → s2 → … the
    * per-step cohort is users whose step-k event happens strictly AFTER
    * their step-(k−1) entry time and within `windowHours` of it — the
    * standard product-analytics funnel (each step re-anchors the clock).
    * Output: one row per step with the surviving user count and the
    * conversion percent vs step 1 (exact integer ratio, rounded).
    *
    * Shape: one filtered min-aggregate per step plus an equi-join on
    * `user_id` to the previous step's anchor — k steps = k keyed shuffles
    * over an already-reduced (one row per user) frame, never over the raw
    * log twice. */
  def funnel(events: DataFrame, steps: Seq[String], windowHours: Int,
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol); val t = col(tsCol)
    // anchor of step 1: first occurrence per user
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(u.as("user")).agg(min(t).as("anchor"))
    val cohorts = steps.tail.scanLeft(first) { (prev, step) =>
      events.where(col(typeCol) === step).as("e")
        .join(prev.as("p"), col("e." + userCol) === col("p.user"))
        .where(t > col("p.anchor") &&
          t <= col("p.anchor") + expr(s"INTERVAL $windowHours HOURS"))
        .groupBy(col("p.user").as("user")).agg(min(t).as("anchor"))
    }
    val counts = cohorts.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).cast("long").as("step"), lit(step).as("event_type"),
          col("users").cast("long").as("users"))
    }
    val all = counts.reduce(_ unionAll _)
    val base = all.where(col("step") === 1)
      .select(col("users").as("base_users"))
    all.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("users"),
        round(col("users") * lit(100.0) / col("base_users"), 2).as("conv_pct"))
      .orderBy("step")
  }

  /** Rolling z-score anomaly detection: each event scored against the
    * mean/stddev of the SAME entity's previous `lookback` values (frame
    * excludes the current row, so the score is a true one-step-ahead
    * residual). Variance via the explicit sum-of-squares identity — NOT
    * `stddev_samp` — so both engines associate identically and the score
    * is bit-stable. Emits only rows with `|z| > threshold` after at least
    * `minObs` prior observations.
    *
    * One bounded window per entity; at 100 TB this is the cheapest possible
    * shape (single shuffle on the entity key, O(lookback) state). */
  def rollingZScore(events: DataFrame, lookback: Int = 16, minObs: Int = 8,
      threshold: Double = 2.5, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    val scored = events.select(col(userCol), col(idCol), col(tsCol), v,
      count(v).over(w).as("cnt"), sum(v).over(w).as("s"),
      sum(v * v).over(w).as("ss"))
    val varNum = col("ss") - col("s") * col("s") / col("cnt")
    scored.where(col("cnt") >= minObs && varNum > 0)
      .withColumn("z",
        (v - col("s") / col("cnt")) / sqrt(varNum / (col("cnt") - 1)))
      .where(abs(col("z")) > threshold)
      .select(col(userCol), col(idCol), v, round(col("z"), 3).as("z"))
  }

  /** First-order Markov transition matrix over each entity's event-type
    * sequence: consecutive (prev → next) pairs via one bounded lag window,
    * exact BIGINT transition counts, and the row-normalized probability
    * `cnt / Σ_next cnt` as a single division of exact integers
    * (bit-identical everywhere). The output is |types|² rows regardless of
    * corpus size — the log is reduced by one keyed window + one keyed
    * aggregate, nothing corpus-sized survives the first shuffle. */
  def transitionMatrix(events: DataFrame, typeCol: String = "event_type",
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("next_type"))
      .where(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("prev_type")
      .agg(sum(col("cnt")).as("total"))
    pairs.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"),
        col("cnt").cast("long").as("cnt"),
        (col("cnt") / col("total")).as("prob"))
  }

  /** EWMA smoothing with α = 1/2 over the last `terms` observations per
    * entity: `ewma = Σ_k 0.5^k · x_{n−k} / Σ_k 0.5^k` over the present
    * lags. α = 1/2 makes every weight an EXACT binary double, and the
    * fixed left-to-right sum of ≤ `terms` products is associated
    * identically by any engine — bit-stable without quantization. The lag
    * formulation (vs the recursive definition) keeps the operator a pure
    * bounded window: one shuffle on the entity key, no state carried
    * across rows beyond the frame. */
  def ewmaHalf(events: DataFrame, terms: Int = 8, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    require(terms >= 1 && terms <= 30, "terms must be in [1, 30]")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val lags: Seq[(Column, Double)] = (0 until terms).map { k =>
      (lag(col(valueCol), k).over(w), math.pow(0.5, k))
    }
    // fixed-order chains: (((w0·x0) + w1·x1) + …) on both engines
    val num = lags.map { case (x, wk) =>
      when(x.isNotNull, x * lit(wk)).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = lags.map { case (x, wk) =>
      when(x.isNotNull, lit(wk)).otherwise(lit(0.0))
    }.reduce(_ + _)
    events.select(col(userCol), col(idCol), col(tsCol), col(valueCol),
      round(num / den, 4).as("ewma"))
  }

  /** Top-k behavior paths (clickstream path analysis): each entity's full
    * time-ordered event-type sequence becomes one path string, exact path
    * counts, deterministic top-k by (count desc, path asc). `collect_list`
    * order is partition-dependent, so the list carries `(ms, event_id)`
    * and is `array_sort`ed in-row before projection — bit-deterministic
    * on any partitioning (the unique event id breaks ms ties).
    *
    * Shape: one keyed aggregate (list state bounded by per-entity event
    * count — cap sessions upstream via [[changeIntervals]]/sessionization
    * for unbounded actors), one keyed count, one top-k sort of the
    * already-tiny path table. */
  def topPaths(events: DataFrame, k: Int, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val paths = events
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(
        unix_millis(col(tsCol)).as("ms"), col(idCol).as("eid"),
        col(typeCol).as("t")))).as("__evs"))
      .select(concat_ws(">", expr("transform(__evs, x -> x.t)")).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path")).limit(k)
  }

  /** Sliding-window distinct actives (the DAU/WAU board): per observed
    * day, the exact count of distinct entities active that day and over
    * the trailing `windowDays` window. The window dedup never runs a
    * distinct-over-range join: the daily-distinct (day, entity) table is
    * unioned `windowDays` times with shifted day keys, so one keyed
    * `count(DISTINCT)` per target day does the rest — a `windowDays`×
    * blowup of the ALREADY-DEDUPED daily table (bounded by days×actives),
    * not of the raw events.
    *
    * The 100 TB alternative when exactness can yield: swap the distinct
    * for [[graft.functions]]' HLL sketch per day and merge 7 sketches —
    * same shifted-union shape, O(sketch) state (the q93 device). */
  def slidingDistinct(events: DataFrame, windowDays: Int,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val du = events.select(
        expr(s"unix_millis($tsCol) div 86400000").as("day"),
        col(userCol).as("__u"))
      .distinct()
    val days = du.select("day").distinct()
    val shifted = (0 until windowDays)
      .map(k => du.select((col("day") + lit(k.toLong)).as("day"), col("__u")))
      .reduce(_ unionAll _)
    val daily = du.groupBy("day").agg(countDistinct("__u").as("n_active_1d"))
    val windowed = shifted.join(days, Seq("day"))
      .groupBy("day")
      .agg(countDistinct("__u").as(s"n_active_${windowDays}d"))
    daily.join(windowed, Seq("day"))
  }

  /** The 100 TB form of [[slidingDistinct]]: per-day HyperLogLog sketches
    * (Apache DataSketches HLL via `hll_sketch_agg`) built ONCE from the
    * raw events — insertion dedups, so no daily-distinct table — then the
    * shifted union runs over SKETCH ROWS (`windowDays × |days|` rows of
    * O(2^lgK) bytes, independent of active count) and `hll_union_agg`
    * merges the window. Exactness yields ~1.6% rsd at the default
    * `lgK = 12`; state per (day, window) is the sketch, never the entity
    * set. Columns mirror [[slidingDistinct]] with an `_approx` suffix. */
  def slidingDistinctApprox(events: DataFrame, windowDays: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      lgK: Int = 12): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val daySk = events.select(
        expr(s"unix_millis($tsCol) div 86400000").as("day"),
        col(userCol).as("__u"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("__u"), lit(lgK)).as("__sk"))
    val days = daySk.select("day")
    val shifted = (0 until windowDays)
      .map(k => daySk.select((col("day") + lit(k.toLong)).as("day"), col("__sk")))
      .reduce(_ unionAll _)
    val merged = shifted.join(days, Seq("day"))
      .groupBy("day")
      .agg(hll_union_agg(col("__sk")).as("__skw"))
    daySk.join(merged, Seq("day"))
      .select(col("day"),
        hll_sketch_estimate(col("__sk")).as("n_active_1d_approx"),
        hll_sketch_estimate(col("__skw")).as(s"n_active_${windowDays}d_approx"))
  }

  /** SCD-2 change-interval collapse (gaps-and-islands): per entity, each
    * maximal run of consecutive events carrying the same attribute value
    * becomes one validity interval `[valid_from_ms, valid_to_ms)` with
    * `valid_to_ms` NULL on the open (current) interval — the change-data-
    * capture step that turns an append-only event log into a slowly-
    * changing dimension table (Kimball type 2).
    *
    * Shape: two windows over the same `(entity, time)` partitioning —
    * Catalyst evaluates them in one sort+exchange — then one keyed
    * aggregate and one more window over the already-collapsed runs (one
    * row per run, far smaller than the log). No self-join, no driver
    * state; per-key memory is O(1) (running sum + lag). The second
    * window orders by `run_id`, not `valid_from_ms`: run ids are strictly
    * increasing per entity by construction, while millisecond timestamps
    * can collide across runs and would make the `lead` nondeterministic. */
  def changeIntervals(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(typeCol), 1).over(w)
    val runs = events
      .withColumn("__ms", unix_millis(col(tsCol)))
      .withColumn("__chg",
        when(prev.isNotNull && prev === col(typeCol), 0L).otherwise(1L))
      .withColumn("__run", sum(col("__chg")).over(w))
    val iv = runs
      .groupBy(col(userCol), col("__run").cast("long").as("run_id"),
        col(typeCol))
      .agg(min("__ms").as("valid_from_ms"), max("__ms").as("last_seen_ms"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(userCol).orderBy("run_id")
    iv.withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(w2))
      .withColumn("is_current", col("valid_to_ms").isNull.cast("int"))
  }

  /** Gap-fill + linear interpolation: densify each key's daily series to
    * every day in its own [min, max] range and fill missing days by
    * linear interpolation between the nearest observed neighbors (edge
    * gaps take the nearest single neighbor — forward/backward fill). The
    * standard time-series regularization step before any fixed-step model
    * (forecasting, rolling windows that assume no holes).
    *
    * Determinism contract: the per-day observed value is `avg(value)`
    * ROUNDED to 6 decimals at the aggregate (shuffle-order-dependent
    * double sum — the q43/q71 convention), after which interpolation is a
    * pure scalar expression over identical inputs in a fixed evaluation
    * order, so filled values are bit-stable across engines/partitionings.
    *
    * Shape: one keyed daily aggregate; a per-key min/max + `sequence`
    * explode for the spine (rows bounded by the key's own date span,
    * never a global calendar cross-join); one left join back on
    * (key, day); two ROWS-frame windows (previous / next observed as
    * structs, ignoreNulls) sharing a single (key, day) sort+exchange.
    * No global window, no self-join, per-key window state O(1). */
  /** Kaplan–Meier survival estimate of user lifetime (Kaplan & Meier
    * 1958): per user, lifetime = days between first and last event;
    * a user whose last event is more than `churnGapDays` before the
    * global study horizon (max observed day) has churned (event
    * observed, d=1), otherwise the lifetime is right-CENSORED — still
    * active at cutoff, so the duration is a lower bound. The estimator
    * is the product over ordered durations t_i of (1 − d_i/n_i) with
    * n_i = users still at risk (duration ≥ t_i); censored users leave
    * the risk set without contributing a death — the standard
    * correction naive "avg churn time" gets wrong.
    *
    * Determinism contract: risk/death/censor counts are exact integers;
    * each factor 1 − d/n is one correctly-rounded double division; the
    * cumulative product runs as exp(Σ ln) in ascending-duration order —
    * the same sequential order in both engines — and is rounded to 6
    * decimals to absorb ln/exp ulp noise. A factor of exactly 0 (all
    * remaining at-risk users die at once) short-circuits to 0 rather
    * than passing through ln(0).
    *
    * Shape: one keyed per-user aggregate (the only data-sized shuffle),
    * a single-row horizon/total broadcast (the q71 pattern), then a
    * per-duration aggregate whose row count is bounded by the CALENDAR
    * SPAN in days — the two cumulative windows over it are
    * calendar-bounded, not data-bounded, so the unpartitioned window is
    * 100 TB-safe the same way q153's day-keyed frame is. */
  def kaplanMeier(events: DataFrame, churnGapDays: Int = 14,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val perUser = events
      .select(col(userCol).as("u"),
        expr(s"unix_millis($tsCol) div 86400000").as("day"))
      .groupBy("u").agg(min("day").as("d0"), max("day").as("d1"))
    val horizon = perUser.agg(max(col("d1")).as("__h"),
      count(lit(1)).as("__n"))
    val spans = perUser.crossJoin(broadcast(horizon))
      .select((col("d1") - col("d0")).as("duration"),
        (col("d1") <= col("__h") - churnGapDays).cast("long").as("__evt"),
        col("__n"))
    val byDur = spans.groupBy("duration", "__n")
      .agg(sum("__evt").as("n_event"),
        (count(lit(1)) - sum("__evt")).as("n_censor"))
    val w = Window.orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, 0)
    val t = lit(1.0) -
      col("n_event").cast("double") / col("n_risk").cast("double")
    byDur
      .withColumn("n_risk",
        col("__n") - sum(col("n_event") + col("n_censor")).over(w) +
          col("n_event") + col("n_censor"))
      .withColumn("__lnsum", sum(when(t > 0.0, log(t))).over(w))
      .withColumn("__zeros", sum((t === 0.0).cast("long")).over(w))
      .select(col("duration"), col("n_risk"), col("n_event"), col("n_censor"),
        round(when(col("__zeros") > 0, 0.0).otherwise(exp(col("__lnsum"))), 6)
          .as("survival"))
  }

  def gapFillInterpolate(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val daily = events
      .select(col(keyCol).as("k"),
        expr(s"unix_millis($tsCol) div 86400000").as("day"),
        col(valCol).as("__x"))
      .groupBy("k", "day")
      .agg(round(avg(col("__x")), 6).as("__v"))
    val spine = daily.groupBy("k")
      .agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(col("k"),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy("k").orderBy("day")
    val obs = struct(col("day").as("d"), col("__v").as("v"))
    val joined = spine.join(daily, Seq("k", "day"), "left_outer")
      .withColumn("__prev", last(when(col("__v").isNotNull, obs),
        ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__next", first(when(col("__v").isNotNull, obs),
        ignoreNulls = true).over(w.rowsBetween(0, Window.unboundedFollowing)))
    joined.select(col("k").as(keyCol), col("day"),
      col("__v").isNotNull.as("observed"),
      when(col("__v").isNotNull, col("__v"))
        .when(col("__prev").isNull, col("__next.v"))
        .when(col("__next").isNull, col("__prev.v"))
        .otherwise(col("__prev.v") +
          (col("__next.v") - col("__prev.v")) *
            ((col("day") - col("__prev.d")).cast("double") /
              (col("__next.d") - col("__prev.d")).cast("double")))
        .as("value"))
  }
}
