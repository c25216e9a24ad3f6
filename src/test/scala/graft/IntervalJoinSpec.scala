package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def intervals(seed: Int, n: Int, keyCard: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, (i % keyCard).toLong, s, s + 1 + rnd.nextInt(50))
    }.toDF("id", "k", "s", "e")
  }

  test("grid-bucketed overlap join equals the brute-force theta join at every cell width") {
    val a = intervals(1, 300, 5)
    val b = intervals(2, 300, 5)
      .select($"id".as("id2"), $"k", $"s".as("s2"), $"e".as("e2"))
    val brute = a.join(b, Seq("k"))
      .filter($"s" < $"e2" && $"s2" < $"e")
      .select($"id", $"id2").as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(1L, 7L, 64L, 1000L, 10000L)) {
      val got = IntervalJoin.overlapJoin(a, $"s", $"e", b, $"s2", $"e2",
          keys = Seq("k"), cellWidth = w)
        .select($"id", $"id2").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at width $w")
      assert(got.sorted.toSeq == brute, s"pair set mismatch at width $w")
    }
  }

  test("half-open semantics: touching endpoints do not match; containment does") {
    val l = Seq((1L, 0L, 10L, 20L)).toDF("id", "k", "s", "e")
    val r = Seq(
      (10L, 0L, 20L, 30L), // touches at 20 -> no
      (11L, 0L, 0L, 10L),  // touches at 10 -> no
      (12L, 0L, 12L, 14L), // contained -> yes
      (13L, 0L, 0L, 100L), // contains -> yes
      (14L, 1L, 12L, 14L)  // wrong key -> no
    ).toDF("id2", "k", "s2", "e2")
    val got = IntervalJoin.overlapJoin(l, $"s", $"e", r, $"s2", $"e2",
        Seq("k"), cellWidth = 8)
      .select($"id2").as[Long].collect().toSet
    assert(got == Set(12L, 13L))
  }

  test("negative epochs bucket correctly (floor division, not truncation)") {
    val l = Seq((1L, 0L, -15L, -5L)).toDF("id", "k", "s", "e")
    val r = Seq((2L, 0L, -7L, 3L), (3L, 0L, -30L, -15L)).toDF("id2", "k", "s2", "e2")
    val got = IntervalJoin.overlapJoin(l, $"s", $"e", r, $"s2", $"e2",
        Seq("k"), cellWidth = 10)
      .select($"id2").as[Long].collect().toSet
    assert(got == Set(2L)) // id 3 touches at -15, half-open excludes
  }

  test("the mega-interval skew valve fails loudly instead of exploding") {
    val l = Seq((1L, 0L, 0L, 10000000L)).toDF("id", "k", "s", "e")
    val r = Seq((2L, 0L, 5L, 6L)).toDF("id2", "k", "s2", "e2")
    val ex = intercept[Exception] {
      IntervalJoin.overlapJoin(l, $"s", $"e", r, $"s2", $"e2",
        Seq("k"), cellWidth = 10, maxCellsPerRow = 100).collect()
    }
    assert(ex.getMessage != null)
  }
}
