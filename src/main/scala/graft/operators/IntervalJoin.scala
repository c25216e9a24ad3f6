package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — pairs of half-open intervals [start, end)
  * that intersect, optionally within equality keys.
  *
  * The naive plan is a theta join (`a.start < b.end && b.start <
  * a.end`) — a broadcast-nested-loop or cartesian that dies at scale.
  * The Spark-native shape is GRID BUCKETING (the band-join trick every
  * streaming engine's interval join uses): each interval explodes to
  * the fixed-width grid cells it covers, the join becomes an EQUIJOIN
  * on (cell, keys) — a plain shuffled hash join — and the overlap
  * predicate rides the equijoin as a residual filter.
  *
  * Two intervals can co-occupy several cells; instead of a global
  * `distinct` (a second full shuffle of the pair stream), each pair is
  * emitted ONLY in the responsibility cell — the cell containing
  * `max(a.start, b.start)`. Overlapping intervals both cover the later
  * start's cell by construction, so the pair appears there and nowhere
  * else: exactly-once without deduplication.
  *
  * `cellWidth` trades shuffle fan-out (span/width cells per row)
  * against cell population; size it near the typical interval span.
  * `maxCellsPerRow` is the skew valve: one year-long interval in a
  * minute-wide grid would explode to half a million rows — the guard
  * fails loudly instead of silently assembling a mega-shuffle (split
  * pathological intervals upstream, or widen the grid).
  */
object IntervalJoin {

  /** Pairs (left, right) with `lStart < rEnd && rStart < lEnd`
    * (half-open overlap; touching endpoints do NOT match), both sides
    * equal on `keys`. Bounds are integral (epoch days/seconds/micros —
    * the caller picks the resolution and `cellWidth` in the same
    * unit). Output: key columns, then left columns, then right
    * columns (caller-selected via the two frames). */
  def overlapJoin(left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      keys: Seq[String], cellWidth: Long,
      maxCellsPerRow: Int = 4096): DataFrame = {
    require(cellWidth >= 1, "cellWidth must be >= 1")
    // exact integer floor division (pmod keeps it right for negative
    // epochs) — float division would misplace cell-boundary values
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(cellWidth))) / lit(cellWidth)).cast("long")
    def cells(df: DataFrame, s: Column, e: Column, side: String) = {
      val s0 = s.cast("long")
      val e0 = e.cast("long")
      val first = fdiv(s0)
      val last = fdiv(e0 - 1)
      df.withColumn(s"_${side}s", s0).withColumn(s"_${side}e", e0)
        .withColumn("_nc", last - first + 1)
        // fail loudly on the mega-explode — raise_error evaluates per
        // row, so only a genuinely pathological interval trips it
        .withColumn("_cell", explode(when(col("_nc") <= maxCellsPerRow,
          sequence(first, last)).otherwise(raise_error(concat(
            lit(s"overlapJoin: interval spans > $maxCellsPerRow cells "
              + s"(cellWidth=$cellWidth); split it or widen the grid: "),
            col("_nc").cast("string"))))))
        .drop("_nc")
    }
    val l = cells(left, lStart, lEnd, "l")
    val r = cells(right, rStart, rEnd, "r")
    val joined = l.join(r, keys :+ "_cell")
      .filter(col("_ls") < col("_re") && col("_rs") < col("_le"))
      // responsibility cell: exactly-once emission, no distinct
      .filter(col("_cell") === fdiv(greatest(col("_ls"), col("_rs"))))
    joined.drop("_cell", "_ls", "_le", "_rs", "_re")
  }
}
