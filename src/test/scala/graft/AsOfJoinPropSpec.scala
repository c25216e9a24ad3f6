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
}
