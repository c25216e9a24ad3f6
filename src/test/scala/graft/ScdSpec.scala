package graft

import graft.operators.Scd
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, ts, eventId, tier)
  private def log(rows: (Long, Long, Long, String)*) =
    rows.toDF("k", "ts", "eid", "tier")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Scd.intervals(df, Seq("k"), "ts", "eid", Seq("tier"))
      .orderBy($"k", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSeq

  test("change points version; no-op re-observations never mint a version") {
    val out = run(log(
      (1L, 10L, 1L, "free"),
      (1L, 20L, 2L, "free"),   // re-observed, unchanged -> no version
      (1L, 30L, 3L, "pro"),
      (1L, 40L, 4L, "pro"),
      (1L, 50L, 5L, "free")))
    assert(out == Seq(
      (1L, "free", 10L, Some(30L), false),
      (1L, "pro", 30L, Some(50L), false),
      (1L, "free", 50L, None, true)))
  }

  test("intervals chain: each valid_to is the next valid_from; last is current") {
    val out = run(log((7L, 1L, 1L, "a"), (7L, 2L, 2L, "b"), (7L, 3L, 3L, "c")))
    assert(out.map(_._3) == Seq(1L, 2L, 3L))
    assert(out.map(_._4) == Seq(Some(2L), Some(3L), None))
    assert(out.map(_._5) == Seq(false, false, true))
  }

  test("null attributes version null-safely (null -> value -> null)") {
    val rows = Seq((1L, 10L, 1L, null), (1L, 20L, 2L, "x"),
      (1L, 30L, 3L, null), (1L, 40L, 4L, null))
      .asInstanceOf[Seq[(Long, Long, Long, String)]]
    val out = run(rows.toDF("k", "ts", "eid", "tier"))
    assert(out.map(t => (t._2, t._3)) ==
      Seq((null, 10L), ("x", 20L), (null, 30L)))
  }

  test("equal timestamps order by the tie column, keys are independent") {
    val out = run(log(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"),   // same ts: eid orders a then b
      (2L, 10L, 3L, "z")))
    assert(out == Seq(
      (1L, "a", 10L, Some(10L), false),
      (1L, "b", 10L, None, true),
      (2L, "z", 10L, None, true)))
  }

  test("both windows and the filter share one key-hash exchange") {
    val df = Scd.intervals(log((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b")),
      Seq("k"), "ts", "eid", Seq("tier"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_)).map(_.group(1))
      .toSet
    assert(exchanges.size == 1, s"expected one key exchange in:\n$plan")
  }
}
