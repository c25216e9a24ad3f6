package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling: per-column completeness, cardinality, and range
  * in ONE aggregation pass over the table.
  *
  * The first question against an unfamiliar 100 TB table is a profile
  * — row count, null counts, distinct cardinalities, min/max per
  * column — and the naive loop (`for c in cols: df.select(...)`)
  * scans the table once PER COLUMN. Both modes here are a single
  * `df.agg(...)` job: one scan, partial aggregation map-side, a
  * 1-row result exploded to one row per column with `stack`
  * (no joins, no driver loop).
  *
  * Two cardinality modes, because exact-distinct is the one metric
  * that does not partial-aggregate for free:
  *  - [[profile]] uses exact `count(distinct c)` per column. Catalyst
  *    plans N distinct aggregates over one input as an Expand
  *    (each row replicated N times, tagged per aggregate) — still one
  *    scan, but shuffle volume is N x rows. The correctness-grade
  *    mode, and the DuckDB oracle replays it exactly.
  *  - [[profileApprox]] swaps in HLL `approx_count_distinct(rsd)`:
  *    no Expand (spec-asserted), constant sketch state per column —
  *    the 100 TB default, within rsd of exact.
  *
  * min/max aggregate on the column's NATIVE type and cast to string
  * only in the final 1-row projection, so numeric ordering is never
  * string ordering. (Rendering doubles to string is engine-specific;
  * profile numeric-heavy tables with the approx mode, or grade on
  * long/string columns as q149 does.)
  */
object DataProfile {

  /** Exact profile: (col_name, n_rows, n_nulls, n_distinct, min_val,
    * max_val), one row per requested column, one table scan. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** HLL profile for wide/huge tables: identical shape, `n_distinct`
    * approximate within `rsd`, and NO Expand in the plan — shuffle
    * state is one sketch per column instead of N x rows. */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Mergeable per-batch profile SIDECAR: one row per column with all
    * aggregate state either trivially mergeable (counts, typed
    * min/max) or a Datasketches HLL sketch (distinct). Persist the
    * rows per ingest batch; [[mergeProfileSketches]] of all batches
    * equals a whole-table [[profileApprox]] WITHOUT rescanning old
    * data — the incremental-profile shape for an append-only 100 TB
    * corpus (the q136 HLL-rollup pattern, generalized to the full
    * profile).
    *
    * min/max are kept NATIVE-typed per class — numeric columns in
    * `min_num`/`max_num` (doubles; long columns are exact to 2^53),
    * everything else in `min_str`/`max_str` — because a min merged on
    * the string rendering would order "10" < "9". The type class is
    * decided from the SCHEMA at plan time, never per row. HLL sketches
    * are built over the value's STRING rendering for every type, so
    * sketches of the same column stay union-compatible across batches
    * whatever the writer's column type evolution did (rendering is
    * injective per type, so distinct counts are preserved). */
  def profileSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    import org.apache.spark.sql.types._
    def numeric(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"nn_$i"),
        hll_sketch_agg(col(c).cast("string")).as(s"sk_$i"),
        (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"mnn_$i"),
        (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"mxn_$i"),
        (if (numeric(c)) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"mns_$i"),
        (if (numeric(c)) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"mxs_$i"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // Column-API unpivot (typed literals), not selectExpr interpolation:
    // a column NAME containing ' or \ would mangle the generated SQL.
    val pairs = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"nn_$i").as("n_nonnull"),
        col(s"sk_$i").as("sketch"), col(s"mnn_$i").as("min_num"),
        col(s"mxn_$i").as("max_num"), col(s"mns_$i").as("min_str"),
        col(s"mxs_$i").as("max_str"))
    }
    row.select(col("n_rows"), explode(array(pairs: _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("n_rows"),
        col("kv.n_nonnull").as("n_nonnull"), col("kv.sketch").as("sketch"),
        col("kv.min_num").as("min_num"), col("kv.max_num").as("max_num"),
        col("kv.min_str").as("min_str"), col("kv.max_str").as("max_str"))
  }

  /** Equi-depth (quantile) binning — EXACT: `ntile(nBins)` over the
    * (value, tie) total order, summarized as one row per bin with
    * count and [lo, hi]. Every engine replays ntile identically, so
    * the whole binning hash-matches an oracle. The total-order window
    * funnels through one task — use this as the gate/fixture form and
    * [[equiDepthEdgesApprox]] at corpus scale. */
  def equiDepthBins(df: DataFrame, valueCol: String, tieCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(valueCol), col(tieCol))
    df.filter(col(valueCol).isNotNull)
      .withColumn("bin", ntile(nBins).over(w))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Scale path for equi-depth edges: `approx_percentile` boundary
    * estimation — one pass, mergeable sketch state, no global sort.
    * Returns the nBins-1 inner edges (monotone by construction). */
  def equiDepthEdgesApprox(df: DataFrame, valueCol: String, nBins: Int,
      accuracy: Int = 10000): Array[Double] = {
    require(nBins >= 2, "nBins must be >= 2")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    df.select(percentile_approx(col(valueCol).cast("double"),
        typedLit(ps), lit(accuracy)).as("e"))
      .head().getSeq[Double](0).toArray
  }

  /** POPULATION STABILITY INDEX between a REFERENCE batch and a
    * CURRENT batch — the standard drift metric over equi-depth
    * reference bins ("did this week's crawl shift against last
    * week's"). Bin edges come from the reference's EXACT [[
    * equiDepthBins]] (the deterministic gate tool; [[psiFromKll]] is
    * the sketch-sidecar scale path), current rows are assigned by the
    * shared `v > edge` counting rule, and each bin contributes
    * (pa - pb) * ln(pa / pb) with add-one smoothing — so empty bins
    * are finite and the whole per-bin relation replays in SQL (the
    * q117 precedent: ln agreed across engines there; the micro-unit
    * floor in the gate absorbs any residual ulp).
    *
    * Output: one row per bin (bin, n_ref, n_cur, psi_term double);
    * PSI = sum(psi_term). Rule of thumb: < 0.1 stable, > 0.25 shifted. */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      tieCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val binned = equiDepthBins(ref, valueCol, tieCol, nBins)
      .select(col("bin"), col("n").as("n_ref"), col("hi"))
      .localCheckpoint(true)
    val rows = binned.orderBy(col("bin")).collect()
    require(rows.length == nBins,
      s"reference too small for $nBins bins (got ${rows.length})")
    val edges = rows.dropRight(1)
      .map(r => r.get(r.fieldIndex("hi")).toString.toDouble)
    // bin(v) = 1 + |{edges < v}| — identical counting in the SQL replay
    val assign = edges.foldLeft(lit(1)) { (acc, e) =>
      acc + when(col(valueCol).cast("double") > lit(e), 1).otherwise(0)
    }
    val curCounts = cur.filter(col(valueCol).isNotNull)
      .withColumn("bin", assign)
      .groupBy(col("bin")).agg(count(lit(1)).as("n_cur"))
    val nRef = rows.map(_.getLong(1)).sum
    val nCurTotal = cur.filter(col(valueCol).isNotNull).count()
    binned.select(col("bin"), col("n_ref"))
      .join(curCounts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_cur"))
      .withColumn("_pa", (col("n_ref").cast("double") + lit(1.0)) /
        lit(nRef.toDouble + nBins))
      .withColumn("_pb", (col("n_cur").cast("double") + lit(1.0)) /
        lit(nCurTotal.toDouble + nBins))
      .withColumn("psi_term", (col("_pa") - col("_pb")) * log(col("_pa") / col("_pb")))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("psi_term"))
  }

  /** PSI from two persisted KLL sketch sidecars — the at-scale drift
    * check: "this batch vs the whole corpus so far" costs two KB blobs
    * and no scan of either side. Edges are the reference sketch's
    * quantiles; each side's bin mass comes from its own rank function;
    * the same add-one-style smoothing keeps empty bins finite. Within
    * the sketches' published rank error of the exact [[psiBins]]. */
  def psiFromKll(refSketch: Array[Byte], curSketch: Array[Byte],
      nBins: Int): Double = {
    require(nBins >= 2, "nBins must be >= 2")
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val r = KllDoublesSketch.wrap(Memory.wrap(refSketch))
    val c = KllDoublesSketch.wrap(Memory.wrap(curSketch))
    val edges = (1 until nBins).map(i =>
      r.getQuantile(i.toDouble / nBins, QuantileSearchCriteria.INCLUSIVE))
    def masses(s: KllDoublesSketch): Seq[Double] = {
      val n = s.getN.toDouble
      val cum = edges.map(e =>
        s.getRank(e, QuantileSearchCriteria.INCLUSIVE) * n) :+ n
      val raw = cum.zip(0.0 +: cum.dropRight(1)).map { case (hi2, lo2) => hi2 - lo2 }
      raw.map(m => (m + 1.0) / (n + nBins))
    }
    masses(r).zip(masses(c))
      .map { case (pa, pb) => (pa - pb) * math.log(pa / pb) }.sum
  }

  /** Union per-batch [[profileSketch]] rows into the whole-corpus
    * profile: counts sum, typed min/max fold, HLL sketches union —
    * no old batch is ever rescanned. Output shape matches
    * [[profileApprox]] plus the typed min/max split. */
  def mergeProfileSketches(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        (sum(col("n_rows")) - sum(col("n_nonnull"))).as("n_nulls"),
        expr("hll_sketch_estimate(hll_union_agg(sketch))").as("n_distinct"),
        min(col("min_num")).as("min_num"), max(col("max_num")).as("max_num"),
        min(col("min_str")).as("min_str"), max(col("max_str")).as("max_str"))

  private def profileWith(df: DataFrame, cols: Seq[String],
      distinct: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"nn_$i"),
        distinct(c).as(s"nd_$i"),
        min(col(c)).cast("string").as(s"mn_$i"),
        max(col(c)).cast("string").as(s"mx_$i"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // Column-API unpivot for the same injection-safety reason as
    // [[profileSketch]].
    val pairs = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$i")).as("n_nulls"),
        col(s"nd_$i").as("n_distinct"), col(s"mn_$i").as("min_val"),
        col(s"mx_$i").as("max_val"))
    }
    row.select(col("n_rows"), explode(array(pairs: _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("n_rows"),
        col("kv.n_nulls").as("n_nulls"), col("kv.n_distinct").as("n_distinct"),
        col("kv.min_val").as("min_val"), col("kv.max_val").as("max_val"))
  }
  /** Robust per-group outliers: rows where |v − median| > k·MAD (the
    * median-absolute-deviation rule — the observability detector that
    * survives the outliers it hunts, unlike mean/stddev z-scores
    * which the outliers themselves inflate). Medians are EXACT and
    * rank-deterministic: the LOWER median — the value at rank
    * ⌊(n+1)/2⌋ under ascending (value, id) — not an interpolating
    * percentile, so any engine replays it bit-for-bit from the same
    * rank rule (interpolation semantics differ across engines; rank
    * selection doesn't). Two window passes over one group-hash
    * partitioning, no collect. MAD = 0 (over half the group tied at
    * the median) flags every strictly-deviating row — the documented
    * degenerate case; callers wanting laxer behavior pre-filter. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Double = 5.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byG = Window.partitionBy(col(groupCol))
    val medRank = floor((col("_n") + lit(1)) / lit(2.0)).cast("long")
    val ranked = df
      .withColumn("_rn", row_number().over(
        byG.orderBy(col(valueCol).asc, col(idCol).asc)))
      .withColumn("_n", count(lit(1)).over(byG))
    val med = ranked.filter(col("_rn") === medRank)
      .select(col(groupCol), col(valueCol).cast("double").as("_med"))
    val dev = df.join(med, groupCol)
      .withColumn("_dev", abs(col(valueCol).cast("double") - col("_med")))
    val devRanked = dev
      .withColumn("_rn", row_number().over(
        byG.orderBy(col("_dev").asc, col(idCol).asc)))
      .withColumn("_n", count(lit(1)).over(byG))
    val mad = devRanked.filter(col("_rn") === medRank)
      .select(col(groupCol), col("_dev").as("_mad"))
    dev.join(mad, groupCol)
      .filter(col("_dev") > lit(k) * col("_mad"))
      .select(col(groupCol), col(idCol), col(valueCol).cast("double").as("v"),
        col("_med").as("med"), col("_dev").as("deviation"))
  }

  /** Per-source DATA CARD — the release-documentation table every
    * published corpus ships (datasheets-for-datasets): one row per
    * source with the exact censuses a consumer checks first — doc
    * count, distinct-content count (1 − distinct/docs IS the exact-dup
    * rate), token totals and range, language spread, and the EXACT
    * median document length (rank-based — (n+1)/2-th smallest with id
    * tiebreak, a per-source window, so the number is reproducible
    * anywhere, unlike an approximate percentile). All integers: the
    * whole card hash-replays in any engine. */
  def dataCard(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, langCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("_g"), col(idCol).as("_id"),
      col(textCol).as("_t"), col(langCol).as("_l"),
      size(filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= ""))
        .cast("long").as("_ntok"))
      .localCheckpoint(true)
    val agg = base.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_t")).as("n_distinct_texts"),
        sum(col("_ntok")).as("total_tokens"),
        countDistinct(col("_l")).as("n_langs"),
        min(col("_ntok")).as("min_tokens"),
        max(col("_ntok")).as("max_tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    val med = base
      .withColumn("_rn", row_number().over(
        w.orderBy(col("_ntok"), col("_id"))))
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_rn") === ((col("_n") + 1) / 2).cast("long"))
      .select(col("_g"), col("_ntok").as("median_tokens"))
    agg.join(med, "_g").withColumnRenamed("_g", groupCol)
  }

  /** Key-skew report — the numbers that PICK the salting/bucketing
    * parameters before a 100-TB join or aggregation, without
    * rescanning anything afterwards: per-key counts roll into
    * (n_rows, n_keys, max_count), the heavy-key census at 2× and 10×
    * the mean (compared in INTEGER cross-multiplied form,
    * cnt·n_keys > m·n_rows — no doubles, no rounding), the topK
    * heaviest keys themselves, and the suggested salt factor
    * ⌈max_count / targetRowsPerKey⌉. Output is one (kind, key, n)
    * frame: kind='stat' rows carry the scalars, kind='top' rows the
    * heavy keys. The per-key counts checkpoint once and feed all
    * three passes — each is keys-sized, never rows-sized. */
  def keySkew(df: DataFrame, keyCol: String, topK: Int,
      targetRowsPerKey: Long): DataFrame = {
    require(topK >= 1 && targetRowsPerKey >= 1, "bad keySkew parameters")
    val counts = df.groupBy(col(keyCol).cast("string").as("_k"))
      .agg(count(lit(1)).as("_c")).localCheckpoint(true)
    val t = counts.agg(sum(col("_c")).as("nr"), count(lit(1)).as("nk"),
      max(col("_c")).as("mx")).head()
    val (nr, nk, mx) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val over = counts.agg(
      count(when(col("_c") * lit(nk) > lit(2L) * lit(nr), 1)).as("o2"),
      count(when(col("_c") * lit(nk) > lit(10L) * lit(nr), 1)).as("o10"))
      .head()
    val spark = df.sparkSession
    import spark.implicits._
    val stats = Seq(
      ("stat", "n_rows", nr), ("stat", "n_keys", nk),
      ("stat", "max_count", mx),
      ("stat", "keys_over_2x", over.getLong(0)),
      ("stat", "keys_over_10x", over.getLong(1)),
      ("stat", "salt_factor", (mx + targetRowsPerKey - 1) / targetRowsPerKey))
      .toDF("kind", "key", "n")
    val top = counts.orderBy(col("_c").desc, col("_k"))
      .limit(topK)
      .select(lit("top").as("kind"), col("_k").as("key"), col("_c").as("n"))
    stats.unionByName(top)
  }

  /** Per-group closed-form OLS trend (y = intercept + slope·x) — the
    * drift DIRECTION for a metric the profile/PSI stages only snapshot
    * (is quality score drifting down per source? is doc length
    * creeping up per crawl?). One aggregation computes the five
    * sufficient statistics (n, Σx, Σx², Σy, Σxy); slope and intercept
    * derive from them in a FIXED double-arithmetic shape, so results
    * are engine-replayable when the inputs keep the cross-engine
    * discipline: `x` integer-valued (its sums stay exact longs) and
    * `y` DECIMAL (its sums stay exact, cast to double once) — the
    * same q01 rule that keeps every aggregate gate hash-stable. A
    * degenerate group (all x equal) yields NULL slope/intercept
    * rather than a division blow-up. One shuffle, mergeable partials,
    * no second pass at any scale. */
  def groupOls(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupOls needs group columns")
    val base = df.select(
      groupCols.map(col) ++ Seq(x.cast("long").as("_x"), y.as("_y")): _*)
    val agg = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("_sx"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y")).cast("double").as("_sy"),
        sum(col("_x") * col("_y")).cast("double").as("_sxy"))
    val nd = col("n").cast("double")
    val sxd = col("_sx").cast("double")
    val denom = nd * col("_sxx").cast("double") - sxd * sxd
    agg
      .withColumn("slope",
        when(denom =!= lit(0.0),
          (nd * col("_sxy") - sxd * col("_sy")) / denom))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          (col("_sy") - col("slope") * sxd) / nd))
      .select(groupCols.map(col) ++
        Seq(col("n"), col("slope"), col("intercept")): _*)
  }

  /** WINSORIZE (r18) — clamp each group's values into its own exact
    * rank-based [lo, hi] percentile band (default 5th/95th): the
    * outlier treatment that keeps rows (unlike a filter) and bounds
    * influence (unlike trusting the tail) — what a feature pipeline
    * runs before aggregating heavy-tailed signals. Ranks are EXACT
    * integers (basis-point arithmetic with integer DIV — no double
    * percentile estimate, no engine wiggle): loRank = n·loBp DIV 10⁴
    * + 1, hiRank = (n·hiBp + 10⁴−1) DIV 10⁴, over the (value, id)
    * total order. One window shuffle on the group key; the bound table
    * is groups-sized and broadcast back, so the clamp is a narrow map.
    * Clamped values are ORIGINAL values (comparison-replace, zero new
    * arithmetic), so downstream exact-decimal sums stay exact.
    *
    * NULL handling ("keeps rows" means ALL rows, r19): bounds are
    * computed over non-NULL values only; a NULL-group partition gets
    * its own bounds (null-safe join, not silently dropped); a NULL
    * value, or a row in a group with no non-NULL values, passes
    * through with `_wins` = the original (NULL) value — never clamped
    * to a bound, never dropped.
    *
    * @return input plus `_wins` (the clamped value) */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, loBp: Int = 500, hiBp: Int = 9500): DataFrame = {
    require(loBp >= 0 && hiBp <= 10000 && loBp < hiBp,
      s"basis points out of order: [$loBp, $hiBp]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
      .withColumn("_lor", expr(s"_n * $loBp DIV 10000") + lit(1L))
      .withColumn("_hir", expr(s"(_n * $hiBp + 9999) DIV 10000"))
    // one pass over the two bound-rank rows per group (lo==hi rank in
    // tiny groups serves both), groupBy keeps a NULL group key
    val bounds = ranked
      .filter(col("_rn") === col("_lor") || col("_rn") === col("_hir"))
      .groupBy(col(groupCol).as("_gk"))
      .agg(min(when(col("_rn") === col("_lor"), col(valueCol))).as("_lo"),
        max(when(col("_rn") === col("_hir"), col(valueCol))).as("_hi"))
    df.join(broadcast(bounds), col(groupCol) <=> col("_gk"), "left")
      .withColumn("_wins",
        when(col(valueCol).isNull || col("_lo").isNull, col(valueCol))
          .otherwise(least(greatest(col(valueCol), col("_lo")), col("_hi"))))
      .drop("_gk", "_lo", "_hi")
  }
}
