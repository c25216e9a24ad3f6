package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, type, tsMicros)
  private def log(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "etype", "tsu")

  test("funnelUsers: ordered completion within a first-touch-anchored span") {
    val ev = log(
      // u1: clean A -> B -> C inside span
      (1L, "A", 100L), (1L, "B", 200L), (1L, "C", 300L),
      // u2: A then C then B — B counts (after A) but no C after B
      (2L, "A", 100L), (2L, "C", 150L), (2L, "B", 200L),
      // u3: B outside the span anchored at first A
      (3L, "A", 100L), (3L, "B", 5000L),
      // u4: never does A — every step null
      (4L, "B", 100L), (4L, "C", 200L),
      // u5: C lands exactly at t1 + span (inclusive boundary)
      (5L, "A", 100L), (5L, "B", 200L), (5L, "C", 1100L),
      // u6: B at the same instant as A — "strictly after" rejects it
      (6L, "A", 100L), (6L, "B", 100L))
    val out = Events.funnelUsers(ev, "user_id", "etype", "tsu",
        Seq("A", "B", "C"), spanMicros = 1000L)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == ((Some(100L), Some(200L), Some(300L))))
    assert(out(2L) == ((Some(100L), Some(200L), None)))
    assert(out(3L) == ((Some(100L), None, None)))
    assert(out(4L) == ((None, None, None)))
    assert(out(5L) == ((Some(100L), Some(200L), Some(1100L))))
    assert(out(6L) == ((Some(100L), None, None)))
  }

  test("funnel summary counts are the per-step user counts, monotone") {
    val ev = log(
      (1L, "A", 100L), (1L, "B", 200L), (1L, "C", 300L),
      (2L, "A", 100L), (2L, "B", 200L),
      (3L, "A", 100L),
      (4L, "B", 100L))
    val out = Events.funnel(ev, "user_id", "etype", "tsu",
        Seq("A", "B", "C"), spanMicros = 1000L)
      .orderBy($"step_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "A", 3L), (2, "B", 2L), (3, "C", 1L)))
  }

  test("funnelUsers plans ONE exchange for windows + final per-user reduce") {
    val ev = log((1L, "A", 100L), (1L, "B", 200L), (2L, "A", 50L))
    val df = Events.funnelUsers(ev, "user_id", "etype", "tsu",
      Seq("A", "B"), spanMicros = 1000L)
    df.collect()
    // under AQE the plan string repeats a reused stage's Exchange line;
    // count DISTINCT exchange plan-ids in the final plan section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_)).map(_.group(1))
      .toSet
    // the K window nodes and the groupBy share the user-hash partitioning
    assert(exchanges.size == 1,
      s"expected a single user-keyed exchange in:\n$plan")
  }

  test("retention: Monday-week cohorts by first signup, distinct active users") {
    def ts(day: Int, hour: Int = 0) = // 2024-01-01 is a Monday
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")
    val ev = Seq(
      // u1 signs up in week0, active week0 and week1
      (1L, "signup", ts(1)), (1L, "view", ts(3)), (1L, "view", ts(9)),
      // u2 signs up in week0 (second signup in week1 must not re-cohort),
      // active in week2 only (besides signup week)
      (2L, "signup", ts(2)), (2L, "signup", ts(8)), (2L, "click", ts(16)),
      // u3 signs up week1, active week1 twice (distinct must collapse)
      (3L, "signup", ts(8)), (3L, "view", ts(9)), (3L, "view", ts(10)),
      // u4 never signs up — excluded entirely
      (4L, "view", ts(5))).toDF("user_id", "etype", "ts")
    val out = Events.retention(ev, "user_id", "etype", "ts", "signup")
      .select(date_format($"cohort_week", "yyyy-MM-dd").as("cw"),
        $"week_offset", $"active_users")
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L),  // u1+u2 active in their signup week
      ("2024-01-01", 1, 2L),  // u1 viewed day9; u2's week1 signup is activity
      ("2024-01-01", 2, 1L),  // u2 clicked day16
      ("2024-01-08", 0, 1L))) // u3, both views collapse to one user
  }

  test("resampleFfill: gap-free spine, forward fill, bucket max, gap flags") {
    val df = Seq(
      (1L, 5L, 10.0), (1L, 7L, 99.0),   // bucket 0: two obs, max = 99
      (1L, 35L, 7.0),                   // bucket 30; buckets 10,20 are gaps
      (2L, 10L, 1.0))                   // single-bucket key: 1-row spine
      .toDF("k", "tsu", "value")
    val out = Events.resampleFfill(df, "k", "tsu", "value", stepMicros = 10L)
      .orderBy($"k", $"bucket")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2L, 99.0, false),
      (1L, 10L, 0L, 99.0, true),
      (1L, 20L, 0L, 99.0, true),
      (1L, 30L, 1L, 7.0, false),
      (2L, 10L, 1L, 1.0, false)))
  }

  test("transitions: time-ordered bigrams per user, synthetic start state") {
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "B", 30L, 3L),
      // u2: equal timestamps — the event-id tiebreak orders A before B
      (2L, "A", 10L, 4L), (2L, "B", 10L, 5L))
      .toDF("user_id", "etype", "tsu", "eid")
    val out = Events.transitions(ev, "user_id", "etype", "tsu", "eid")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("_START_", "A", 2L), ("A", "B", 2L), ("B", "B", 1L)))
  }

  test("twap weights each value by its holding duration, excludes the last obs") {
    val df = Seq( // micros; weights floor to 10 and 20 MILLIS
      (1L, 0L, 1L, 10.0), (1L, 10000L, 2L, 20.0), (1L, 30000L, 3L, 99.0),
      (2L, 5L, 4L, 7.0)) // single observation: no duration, no row
      .toDF("k", "tsu", "eid", "value")
    val out = Events.twap(df, "k", "tsu", "eid", "value")
      .as[(Long, Double, Long)].collect()
      .map { case (k, v, w) => k -> ((v, w)) }.toMap
    // (10*10 + 20*20) / 30 — the 99.0 tail never enters
    assert(out == Map(1L -> ((500.0 / 30.0, 30L))))
  }

  test("resampleFfill spine never starts with a gap (lo is observed)") {
    val df = Seq((9L, 100L, 3.5)).toDF("k", "tsu", "value")
    val out = Events.resampleFfill(df, "k", "tsu", "value", 7L)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq((9L, 98L, 1L, 3.5, false))) // floor(100/7)*7 = 98
  }
}
