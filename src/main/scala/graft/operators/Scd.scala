package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) history building from a
  * change log.
  *
  * Given an append-only log of (key, ts, attributes) observations,
  * produce the versioned dimension: one row per key per CHANGE POINT,
  * with `[valid_from, valid_to)` validity and an `is_current` flag —
  * the standard warehouse shape an as-of join then serves ("what was
  * this user's tier when the order was placed" — [[AsOfJoin]] is the
  * read side of exactly this table).
  *
  * Two ordered windows over ONE key-hash exchange: a lag pass marks
  * rows whose attributes differ from the previous observation
  * (null-safe `<=>` per attribute, so a no-op re-observation never
  * mints a version), a lead pass over the surviving change points
  * closes each interval at the next change. Both windows share the
  * same partitioning and ordering, so Catalyst plans one Exchange +
  * one Sort. Per-key state is O(1); nothing is O(events) per key and
  * nothing joins the log to itself.
  *
  * `tieCol` breaks equal-timestamp order deterministically (the event
  * id contract) — without it, reruns could version-flip concurrent
  * updates.
  */
object Scd {

  /** Collapse a change log to SCD2 intervals: one row per (key,
    * version) with `valid_from` (inclusive), `valid_to` (exclusive,
    * null while current), `is_current`. */
  def intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "need at least one key and one attribute column")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val changed = df
      .withColumn("_prev", lag(attrs, 1).over(byKey))
      // first observation (lag null struct) always opens a version;
      // <=> makes per-attribute nulls compare stably
      .filter(col("_prev").isNull || !(attrs <=> col("_prev")))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
