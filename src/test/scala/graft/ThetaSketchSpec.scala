package graft

import graft.operators.ThetaSketch
import org.scalatest.funsuite.AnyFunSuite

class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(values: Seq[Long], key: String = "g") = {
    val df = values.map(v => (key, v)).toDF("k", "v")
    ThetaSketch.sketch(df, "k", "v").collect().head.getAs[Array[Byte]]("sketch")
  }

  test("exact mode: distinct estimate is exact below nominal entries") {
    val s = sketchOf((1L to 500L) ++ (1L to 500L)) // duplicates collapse
    assert(ThetaSketch.estimate(s) == 500.0)
  }

  test("set operations: union, intersection, a-not-b on known overlaps") {
    val a = sketchOf(1L to 300L)
    val b = sketchOf(200L to 400L)
    assert(ThetaSketch.unionEstimate(a, b) == 400.0)
    assert(ThetaSketch.intersectionEstimate(a, b) == 101.0) // 200..300
    assert(ThetaSketch.aNotBEstimate(a, b) == 199.0)        // 1..199
  }

  test("merge of per-batch sidecars equals the whole-corpus sketch") {
    val dir = java.nio.file.Files.createTempDirectory("theta").toString
    val h1 = (1L to 2000L).filter(_ % 2 == 0).map(("g", _)).toDF("k", "v")
    val h2 = (1L to 2000L).filter(_ % 2 == 1).map(("g", _)).toDF("k", "v")
    ThetaSketch.sketch(h1, "k", "v").write.parquet(dir + "/b0")
    ThetaSketch.sketch(h2, "k", "v").write.parquet(dir + "/b1")
    val merged = ThetaSketch.merge(spark.read.parquet(dir + "/b*"), "k")
      .collect().head.getAs[Array[Byte]]("sketch")
    assert(ThetaSketch.estimate(merged) == 2000.0)
  }

  test("estimation mode: accuracy within the published bounds past 2^lgK") {
    val s = sketchOf(1L to 200000L) // far above nominal 4096
    val est = ThetaSketch.estimate(s)
    // rse ~ 1/sqrt(4096) ≈ 1.6%; allow 3 sigma
    assert(math.abs(est - 200000.0) / 200000.0 < 0.05, s"estimate $est")
  }

  test("per-key sketches stay independent") {
    val df = ((1L to 100L).map(("a", _)) ++ (1L to 7L).map(("b", _)))
      .toDF("k", "v")
    val out = ThetaSketch.sketch(df, "k", "v").collect()
      .map(r => r.getString(0) ->
        ThetaSketch.estimate(r.getAs[Array[Byte]]("sketch"))).toMap
    assert(out == Map("a" -> 100.0, "b" -> 7.0))
  }
}
