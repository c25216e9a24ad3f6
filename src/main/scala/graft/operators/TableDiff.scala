package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed table diff — the regression test for data pipelines.
  *
  * Re-running a curation pipeline after ANY change (new dedup
  * threshold, upgraded parser, bumped model) produces a new corpus
  * version; the operational question is always the same: what
  * actually changed? `tableDiff` answers it as one co-partitioned
  * full-outer join: every key is classified `added` / `removed` /
  * `changed` / `unchanged`, and changed rows carry the exact column
  * list that moved (null-safe `<=>` comparison, so NULL→value and
  * value→NULL both count as changes and NULL==NULL does not).
  *
  * At 100 TB the plan is ONE shuffle of each side on the key columns
  * (or zero, when both sides were written bucketed by the key —
  * [[Layout]]'s bucketed-write path — since Spark then co-locates the
  * join Exchange-free; the same contract BucketingSpec asserts for
  * fact/fact joins). Presence is tracked with explicit marker columns
  * rather than key-nullness, so all-null value rows and null-valued
  * keys never misclassify. Nothing is collected to the driver; the
  * diff is itself a DataFrame to aggregate, sample, or write.
  */
object TableDiff {

  /** Row-level diff of `after` vs `before` keyed by `keys`. Output:
    * the key columns, `status` (added/removed/changed/unchanged),
    * `changed_cols` (value columns that differ, in schema order —
    * empty for non-changed rows), and the before/after value columns
    * as `_b_<col>` / `_a_<col>` for downstream inspection. Both
    * inputs must share the schema (same columns, any order). */
  def tableDiff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "tableDiff needs at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    keys.foreach(k => require(before.columns.contains(k), s"missing key $k"))
    val valCols = before.columns.filterNot(keys.contains).toSeq
    val b = before
      .select(keys.map(col) ++ valCols.map(c => col(c).as(s"_b_$c")): _*)
      .withColumn("_in_b", lit(true))
    val a = after
      .select(keys.map(col) ++ valCols.map(c => col(c).as(s"_a_$c")): _*)
      .withColumn("_in_a", lit(true))
    val changedList: Column =
      if (valCols.isEmpty) array()
      else filter(
        array(valCols.map(c =>
          when(!(col(s"_b_$c") <=> col(s"_a_$c")), lit(c))): _*),
        x => x.isNotNull)
    b.join(a, keys, "full_outer")
      .withColumn("status",
        when(col("_in_b").isNull, lit("added"))
          .when(col("_in_a").isNull, lit("removed"))
          .when(size(changedList) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("_in_b").isNull || col("_in_a").isNull,
          array().cast("array<string>"))
          .otherwise(changedList))
      .drop("_in_b", "_in_a")
  }

  /** The diff rolled up to the numbers a pipeline gate wants: one row
    * per status (`kind='status'`) plus one row per value column that
    * changed anywhere (`kind='col'`, counting rows where it moved).
    * Two aggregations over the diff — no extra scan of either input. */
  def diffSummary(diff: DataFrame): DataFrame = {
    val byStatus = diff.groupBy(col("status").as("name"))
      .agg(count(lit(1)).as("n"))
      .select(lit("status").as("kind"), col("name"), col("n"))
    val byCol = diff.select(explode(col("changed_cols")).as("name"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .select(lit("col").as("kind"), col("name"), col("n"))
    byStatus.unionByName(byCol)
  }
}
