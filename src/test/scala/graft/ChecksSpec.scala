package graft

import graft.operators.Checks
import graft.operators.Checks._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = Seq(
    (Some(1L), Some(10.0), Some("a")),
    (Some(2L), Some(150.0), Some("b")),   // out of range
    (Some(2L), None, Some("c")),          // duplicate id, null v
    (None, Some(5.0), None))              // null id and s
    .toDF("id", "v", "s")

  test("all declared checks verify in one pass with exact violation counts") {
    val report = Checks.run(fixture, Seq(
      NotNull("id"), NotNull("s"), Unique(Seq("id")),
      InRange("v", 0.0, 100.0),
      Satisfies("v_lt_200", $"v" < 200.0)))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(report == Seq(
      ("not_null(id)", 1L, false),
      ("not_null(s)", 1L, false),
      ("unique(id)", 1L, false),        // one extra row beyond distinct
      ("in_range(v,0.0,100.0)", 2L, false), // 150.0 and the null
      ("satisfies(v_lt_200)", 1L, false)))  // null v is unknown -> violation
  }

  test("passing checks report zero violations") {
    val clean = Seq((1L, 5.0), (2L, 7.0)).toDF("id", "v")
    val report = Checks.run(clean, Seq(
      NotNull("id"), Unique(Seq("id")), InRange("v", 0.0, 10.0)))
      .as[(String, Long, Boolean)].collect()
    assert(report.forall(r => r._2 == 0L && r._3))
  }

  test("single aggregation: the report plans exactly one scan of the table") {
    val df = Checks.run(fixture, Seq(NotNull("id"), InRange("v", 0, 100),
      Satisfies("p", $"v" > 0)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) == 1,
      s"expected one scan in:\n$plan")
  }

  test("foreignKey: orphans and null child keys violate; clean FK passes") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val bad = Checks.foreignKey(child, Seq("fk"), parent, Seq("pk"))
      .as[(String, Long, Boolean)].collect().head
    assert(bad == (("foreign_key(fk)", 2L, false)))
    val good = Checks.foreignKey(parent.select($"pk".as("fk")), Seq("fk"),
        parent, Seq("pk"))
      .as[(String, Long, Boolean)].collect().head
    assert(good._2 == 0L && good._3)
  }
}
