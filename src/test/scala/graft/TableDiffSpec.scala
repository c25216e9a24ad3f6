package graft

import graft.operators.TableDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, null: String, 40.0))
    .toDF("k", "s", "v")

  test("added/removed/changed/unchanged classified; changed_cols exact") {
    val after = Seq(
      (1L, "a", 10.0),          // unchanged
      (2L, "B", 20.0),          // changed: s
      (3L, "c", 99.0),          // changed: v
      (5L, "e", 50.0))          // added; 4 removed
      .toDF("k", "s", "v")
    val d = TableDiff.tableDiff(base, after, Seq("k"))
      .select($"k", $"status", $"changed_cols")
      .as[(Long, String, Seq[String])].collect().toSeq
      .map { case (k, s, c) => k -> ((s, c)) }.toMap
    assert(d(1L) == (("unchanged", Seq())))
    assert(d(2L) == (("changed", Seq("s"))))
    assert(d(3L) == (("changed", Seq("v"))))
    assert(d(4L) == (("removed", Seq())))
    assert(d(5L) == (("added", Seq())))
  }

  test("null semantics: NULL==NULL is unchanged, NULL<->value is a change") {
    val after = Seq(
      (1L, null: String, 10.0), // a -> NULL: changed
      (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null: String, 40.0)) // NULL -> NULL: unchanged
      .toDF("k", "s", "v")
    val d = TableDiff.tableDiff(base, after, Seq("k"))
      .select($"k", $"status").as[(Long, String)].collect().toMap
    assert(d(1L) == "changed" && d(4L) == "unchanged")
  }

  test("summary counts statuses and per-column movers; composite keys work") {
    val before2 = base.withColumn("k2", lit("x"))
    val after2 = before2
      .withColumn("v", when($"k" === 2L, 21.0).otherwise($"v"))
      .withColumn("s", when($"k" === 2L, "bb").otherwise($"s"))
      .filter($"k" =!= 3L)
    val d = TableDiff.tableDiff(before2, after2, Seq("k", "k2"))
    val sm = TableDiff.diffSummary(d)
      .as[(String, String, Long)].collect()
      .map { case (kind, n, c) => (kind, n) -> c }.toMap
    assert(sm(("status", "changed")) == 1L)
    assert(sm(("status", "removed")) == 1L)
    assert(sm(("status", "unchanged")) == 2L)
    assert(sm.get(("status", "added")).isEmpty)
    assert(sm(("col", "v")) == 1L && sm(("col", "s")) == 1L)
  }

  test("schema mismatch and missing key refuse loudly") {
    intercept[IllegalArgumentException] {
      TableDiff.tableDiff(base, base.drop("v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TableDiff.tableDiff(base, base, Seq("nope"))
    }
  }
}
