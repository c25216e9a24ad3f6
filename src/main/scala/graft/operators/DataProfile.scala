package graft.operators

import org.apache.spark.sql.DataFrame
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
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', n_rows - nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    row.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
