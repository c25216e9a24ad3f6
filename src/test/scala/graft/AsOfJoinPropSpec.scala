package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the windowed as-of join equals the naive per-row
  * definition on arbitrary data (random keys, times, duplicate
  * timestamps). Matched TIME is compared — among equal right
  * timestamps the surviving row is tie-broken arbitrarily but the
  * matched time is uniquely defined. */
class AsOfJoinPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic generator driver (same pattern as ChunkerSpec)
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(0xA50FL + i)))

  private val rows = Gen.listOfN(40,
    Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L)))

  test("backward/forward == naive per-row reference on random inputs") {
    samples(Gen.zip(rows, rows), 8).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "rid")
      val rTime = rs.zipWithIndex.map { case ((_, t), i) => i.toLong -> t }.toMap

      val bw = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rid"))
        .select($"lid", $"rid_asof").as[(Long, Option[Long])].collect().toMap
      val fw = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("rid"))
        .select($"lid", $"rid_asof").as[(Long, Option[Long])].collect().toMap

      ls.zipWithIndex.foreach { case ((k, t), i) =>
        val before = rs.filter(r => r._1 == k && r._2 <= t)
        val expectBwT = if (before.isEmpty) None else Some(before.map(_._2).max)
        assert(bw(i.toLong).map(rTime) == expectBwT,
          s"backward k=$k t=$t")

        val after = rs.filter(r => r._1 == k && r._2 >= t)
        val expectFwT = if (after.isEmpty) None else Some(after.map(_._2).min)
        assert(fw(i.toLong).map(rTime) == expectFwT,
          s"forward k=$k t=$t")
      }
    }
  }

  test("null event times: right nulls never match, left nulls keep the row unmatched") {
    val left = Seq((1L, Some(10L), 0L), (1L, None, 1L), (2L, Some(5L), 2L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, None, 100L), (1L, Some(4L), 101L), (2L, None, 102L))
      .toDF("k", "t", "rid")
    val bw = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select($"lid", $"rid_asof").as[(Long, Option[Long])].collect().toMap
    // k=1 t=10: only real earlier right row is rid=101 (t=4); the null-time
    // rid=100 must NOT be carried forward as a spurious "latest"
    assert(bw(0L).contains(101L))
    // left null time: row survives, no match
    assert(bw(1L).isEmpty)
    // k=2: the only right row has null time -> no match (not rid=102)
    assert(bw(2L).isEmpty)
    val fw = AsOfJoin.forward(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select($"lid", $"rid_asof").as[(Long, Option[Long])].collect().toMap
    assert(fw(1L).isEmpty, "desc traversal sorts nulls last - must be masked")
    assert(fw(2L).isEmpty)
  }
}
