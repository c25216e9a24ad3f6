package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.G streaming row).
  *
  * The reference is batch-only; these are the streaming extensions the
  * BASELINE north star mandates for the `events` table. Every operator
  * is defined on a DataFrame so the SAME definition runs in batch mode
  * (what the DuckDB oracle checks) and under `readStream` (what
  * StreamingSpec replays) — Structured Streaming's core guarantee that
  * a streaming query is semantically a repeated batch query over a
  * growing log.
  *
  * Scale notes: watermarks bound state (late events beyond the
  * watermark are dropped); state lives in the state store keyed by
  * (window/session, keys) — partitioned by key hash across executors.
  */
object StreamOps {

  /** Tumbling/sliding event-time windows with a watermark. */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "10 minutes",
      slide: Option[String] = None): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), windowLen, s)
      case None => window(col("ts"), windowLen)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Event-time session windows (5-minute inactivity gap by default). */
  def sessionCounts(
      events: DataFrame,
      gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
        col("n_events"))

  /** Streaming dedup bounded by the watermark (exactly-once per id
    * within the watermark horizon). */
  def dedupWithinWatermark(
      events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
