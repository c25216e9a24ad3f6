package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an append-only event log: ordered
  * funnels, cohort retention, and calendar gap-fill/resample.
  *
  * The reference pipeline ingests user-facing content; the event log
  * around such a product ("viewed", "clicked", "purchased") is the
  * other table every analytics engine is asked about, and its three
  * canonical questions are sequence-shaped rather than relational:
  * did each user do A then B then C (funnel), do users who arrived in
  * week W come back in week W+k (retention), and what does a per-key
  * metric look like on a gap-free calendar (resample + forward fill).
  *
  * All three are built from windows and aggregations keyed by user —
  * ONE hash exchange on the user column per stage, no self-joins over
  * the raw log, no per-user collect — so they scale to an event log
  * whose per-user history is large: window state per user is O(steps)
  * for the funnel and O(1) for the fill, never O(events).
  *
  * Timestamps are handled as epoch MICROSECONDS (long) internally:
  * integer arithmetic is bit-identical across engines, so the DuckDB
  * oracle replays each operator exactly (interval/timezone arithmetic
  * would not be).
  */
object Events {

  /** Ordered funnel: for each user, the earliest completion time of
    * each step, where step k must occur strictly AFTER the user's
    * step-(k-1) time and within `spanMicros` of the user's FIRST
    * step-1 event (the standard first-touch-anchored conversion
    * window). Returns one row per user with `t1..tK` epoch-micros
    * columns, null from the first step not reached.
    *
    * Plan shape: K chained `min(when(...)) over (partition by user)`
    * windows. They share one partition key and need no ordering, so
    * Catalyst plans ONE Exchange + Sort feeding a stack of Window
    * nodes — a single shuffle of (user, type, ts) triples regardless
    * of K. Per-user window state is one running min per step. At
    * 100 TB the shuffle carries only the three columns; project
    * before calling if the log is wide.
    *
    * Semantics note (document, don't guess): anchoring the span at the
    * first step-1 event is the common product-analytics contract; a
    * user whose only complete sequence starts at a LATER step-1 event
    * counts as not converted. That choice is what makes the operator a
    * pure chain of mins — and lets the oracle replay it with the same
    * chain. */
  def funnelUsers(events: DataFrame, userCol: String, typeCol: String,
      tsMicrosCol: String, steps: Seq[String], spanMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(spanMicros > 0, "spanMicros must be positive")
    val w = Window.partitionBy(col(userCol))
    val base = events.select(col(userCol), col(typeCol), col(tsMicrosCol))
    val withTimes = steps.zipWithIndex.foldLeft(base) {
      case (df, (step, 0)) =>
        df.withColumn("t1",
          min(when(col(typeCol) === step, col(tsMicrosCol))).over(w))
      case (df, (step, i)) =>
        val k = i + 1
        df.withColumn(s"t$k",
          min(when(col(typeCol) === step &&
                col(tsMicrosCol) > col(s"t$i") &&
                col(tsMicrosCol) <= col("t1") + lit(spanMicros),
              col(tsMicrosCol))).over(w))
    }
    // t1..tK are per-user constants; reduce to one row per user.
    val tCols = steps.indices.map(i => s"t${i + 1}")
    withTimes.groupBy(col(userCol))
      .agg(tCols.map(c => min(col(c)).as(c)).head,
           tCols.map(c => min(col(c)).as(c)).tail: _*)
  }

  /** Funnel summary: (step_idx, step, users reaching it). Monotone
    * non-increasing in step_idx by construction. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsMicrosCol: String, steps: Seq[String], spanMicros: Long): DataFrame = {
    val users = funnelUsers(events, userCol, typeCol, tsMicrosCol, steps,
      spanMicros)
    val counts = users.agg(
      steps.indices.map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}")).head,
      steps.indices.map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}")).tail: _*)
    // K step rows from a 1-row aggregate: a Column-API unpivot, no
    // joins — and no selectExpr interpolation, so a step NAME with a
    // quote or backslash can't mangle the generated SQL.
    val pairs = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
        col(s"c${i + 1}").as("users"))
    }
    counts.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.step_idx").as("step_idx"), col("kv.step").as("step"),
        col("kv.users").as("users"))
  }

  /** Cohort retention: users are assigned to the week (Monday-start,
    * `date_trunc('week')` in both engines) of their FIRST `cohortType`
    * event; for each (cohort week, week offset k >= 0) count the
    * distinct cohort users with ANY event in cohort-week + k.
    *
    * Plan shape: the cohort table is an aggregation of the log down to
    * one row per user; activity is a (user, week)-distinct of the log.
    * Both shuffle once on user-keyed groupings, the join is user-to-
    * user (the cohort side is |users| rows — sortmerge at scale, and
    * AQE broadcasts it when the user dimension fits), and the final
    * count-distinct re-aggregates (cohort, offset, user) triples.
    * Nothing touches event payloads and no stage is O(events^2). */
  def retention(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, cohortType: String): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(min(date_trunc("week", col(tsCol))).cast("date").as("cohort_week"))
    val activity = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    cohorts.join(activity, userCol)
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int"))
      .filter(col("week_offset") >= 0)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }

  /** Time-weighted average (TWAP): each observation's value holds
    * until the key's next observation (piecewise-constant,
    * left-continuous), so the mean weights each value by its holding
    * duration — the metric/finance aggregate a plain avg() silently
    * gets wrong on irregular samples. The last observation per key has
    * no duration and is excluded (the standard open-interval choice).
    *
    * Exactness across engines, twice over: (a) products and sums run
    * in DECIMAL, never a double sum (order-dependent, engine-
    * divergent), with widths sized so no engine's 38-digit cap trips
    * a silent double fallback (DuckDB's does past it); (b) durations
    * are floored to MILLISECONDS (exact integer division) so the
    * summed numerator stays below 2^53 at month-long spans — a
    * decimal whose scaled integer exceeds 2^53 double-rounds
    * differently between engines on the final cast (measured: 1e-15
    * twap drift at microsecond weights). Only the final ratio is a
    * double division of two exactly-representable quantities.
    * One lead window + one aggregate, both on the key exchange. */
  def twap(events: DataFrame, keyCol: String, tsMicrosCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsMicrosCol), col(tieCol))
    events
      .withColumn("_wtu", lead(col(tsMicrosCol), 1).over(w) - col(tsMicrosCol))
      .withColumn("_wt", expr("_wtu div 1000"))
      .filter(col("_wt").isNotNull)
      // DECIMAL(9,2) is deliberately narrow (the product-sum must stay
      // under every engine's 38-digit cap — widening here would trip
      // DuckDB's silent double fallback), so in non-ANSI mode a value
      // >= 10^7 would cast to NULL and silently drop from the numerator
      // while its duration still counted in _tw, biasing the average.
      // Fail loudly instead: out-of-range input is a caller error.
      .withColumn("_v", {
        val v = col(valueCol).cast("decimal(9,2)")
        when(col(valueCol).isNotNull && v.isNull,
          raise_error(concat(lit(s"twap: $valueCol out of DECIMAL(9,2) range: "),
            col(valueCol).cast("string")))).otherwise(v)
      })
      .groupBy(col(keyCol))
      .agg(sum(col("_v") * col("_wt").cast("decimal(18,0)")).as("_wv"),
        sum(col("_wt")).as("_tw"))
      .select(col(keyCol),
        (col("_wv").cast("double") / col("_tw").cast("double")).as("twap"),
        col("_tw").cast("long").as("span_millis"))
  }

  /** Event-type TRANSITION MATRIX (the "user journey" aggregate):
    * count (previous type -> type) bigrams over each user's
    * time-ordered stream; a user's first event transitions from the
    * synthetic `_START_` state. `tieCol` makes equal-timestamp order
    * deterministic (the event-id contract).
    *
    * Plan shape: one lag window over a user-keyed exchange, then a
    * (src, dst)-keyed partial+final count — the only data crossing the
    * second shuffle is the |types|² count grid. Per-user window state
    * is one row. */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("src", coalesce(lag(col(typeCol), 1).over(w), lit("_START_")))
      .groupBy(col("src"), col(typeCol).as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** Calendar resample + forward fill: bucket each row to
    * `floor(tsMicros / stepMicros) * stepMicros`, aggregate per
    * (key, bucket) — `n_obs` (count) and `v` (MAX of `valueCol`:
    * max selects one input value bit-identically in every engine,
    * where a floating sum would be order-dependent) — then join onto
    * each key's gap-free bucket spine and forward-fill `v` from the
    * last observed bucket. `was_gap` marks synthesized rows.
    *
    * Plan shape: the observation aggregate shuffles once on
    * (key, bucket). The spine is built from a per-key (min, max)
    * aggregate — |keys| rows — exploded with `sequence()`, so spine
    * size is keys x periods and is metadata until the join. The join
    * is keyed (key, bucket) on both sides (co-partitioned, no extra
    * exchange beyond the spine's own), and the fill is one ordered
    * window per key with O(1) state (`last(v, ignoreNulls)` over rows
    * unbounded preceding). A 100 TB log reduces to its bucket grid in
    * the first aggregate; everything after is grid-sized. */
  def resampleFfill(df: DataFrame, keyCol: String, tsMicrosCol: String,
      valueCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    // pure long arithmetic (ts - ts mod step): Column./ is a DOUBLE
    // division, which at epoch-microsecond magnitudes can land 1 ulp
    // under an integer and misfloor; integer mod cannot
    val bucket = col(tsMicrosCol) - pmod(col(tsMicrosCol), lit(stepMicros))
    val obs = df
      .groupBy(col(keyCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_obs"), max(col(valueCol)).as("v"))
    val spine = obs.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), lit(stepMicros))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        col("v").isNull.as("was_gap"))
  }
}
