package graft

import graft.operators.StringJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StringJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ai, as) <- rows; (bi, bs) <- rows if ai < bi
      dist = lev(as, bs) if dist <= d
    } yield (ai, bi, dist)).toSet
  }

  private def joined(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    StringJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", d)
      .as[(Long, Long, Int)].collect().toSet

  test("matches brute force on a mixed corpus incl. near pairs") {
    val rows = Seq(
      1L -> "spark analytics engine", 2L -> "spark analytic engine",
      3L -> "spark analytics enginX", 4L -> "totally different text",
      5L -> "spark analytics", 6L -> "sparc analytics engine",
      7L -> "park analytics engine")
    assert(joined(rows, 2) == bruteForce(rows, 2))
  }

  test("degenerate strings (short / repetitive) are exact — the prefix-filter hole") {
    val rows = Seq(
      1L -> "", 2L -> "x", 3L -> "xy", 4L -> "y",
      5L -> "aaaaaaaaaaaaaaaaaaaa", 6L -> "aaaaaaaaaaaaaaaaaaab",
      7L -> "aaaaaaaaaaaaaaaaaab", 8L -> "a", 9L -> "aa")
    // empty vs "x" shares NO padded gram: only the length-bucket keys
    // can produce this pair
    assert(joined(rows, 2) == bruteForce(rows, 2))
    assert(joined(rows, 1) == bruteForce(rows, 1))
  }

  test("exact at distance 0 (pure duplicate detection) and with unicode") {
    val rows = Seq(1L -> "café", 2L -> "café", 3L -> "cafe",
      4L -> "cafés")
    assert(joined(rows, 0) == bruteForce(rows, 0))
    assert(joined(rows, 1) == bruteForce(rows, 1))
  }

  test("null strings pair with nothing") {
    val rows = Seq((1L, "abc"), (2L, null.asInstanceOf[String]), (3L, "abd"))
      .toDF("id", "s")
    val out = StringJoin.editDistanceJoin(rows, "id", "s", 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 3L, 1)))
  }

  test("randomized adversarial corpus matches brute force") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc" // tiny alphabet -> many real near pairs
    val rows = (1L to 60L).map { i =>
      val len = rnd.nextInt(8)
      i -> (0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString
    }
    assert(joined(rows, 1) == bruteForce(rows, 1))
    assert(joined(rows, 2) == bruteForce(rows, 2))
  }

  test("candidate plan is equijoin-based — no cartesian product") {
    val rows = (1L to 30L).map(i => i -> s"prefix shared text $i")
    val df = StringJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"edit-distance join must never plan a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"edit-distance join must never plan a nested loop:\n$plan")
  }
}
