package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (closed forms)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (0L, 2L), (3L, 5L), (65535L, 65535L)).toDF("x", "y")
    val out = df.select(Layout.zValue($"x", $"y").as("z"))
      .as[Long].collect().toSeq
    // interleave(x,y): x bits at even positions, y at odd
    // 3=0b11, 5=0b101 -> z = 1|2? : x bits 1,1 -> pos0,2 = 5; y bits 1,0,1 -> pos1,5 = 34 -> 39
    assert(out == Seq(0L, 1L, 2L, 3L, 4L, 8L, 39L, (1L << 32) - 1))
  }

  test("zValueSql replays zValue through Spark SQL itself") {
    val df = Seq((12L, 345L), (999L, 1L), (65535L, 0L)).toDF("x", "y")
    val both = df.select(Layout.zValue($"x", $"y").as("a"),
      expr(Layout.zValueSql("x", "y")).as("b"))
    assert(both.filter($"a" =!= $"b").count() == 0)
  }

  test("z-order layout prunes a box query that a linear sort cannot") {
    // 64x64 grid of points; box query on an 8x8 corner
    val pts = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, (x * 64 + y).toLong))).toDF("x", "y", "id")
    val nFiles = 16
    val z = Layout.zorderBucketsExact(pts, "x", "y", "id", nFiles, bits = 6)
    val linear = pts.withColumn("_file",
      ntile(nFiles).over(org.apache.spark.sql.expressions.Window
        .orderBy($"x", $"id")))
    val ranges = Seq(("x", 0L, 7L), ("y", 0L, 7L))
    val zCand = Layout.candidateFiles(
      Layout.bucketStats(z, "_file", Seq("x", "y")), ranges).count()
    val linCand = Layout.candidateFiles(
      Layout.bucketStats(linear, "_file", Seq("x", "y")), ranges).count()
    // linear layout: x-range prunes to 2/16 files but each spans ALL y;
    // z-order: the 8x8 corner is one curve segment -> 1 file
    assert(zCand < linCand, s"z $zCand vs linear $linCand")
    assert(zCand <= 2)
  }

  test("zorderWrite round-trips rows and a box filter reads correctly") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val pts = (0 until 32).flatMap(x => (0 until 32).map(y =>
      (x.toLong, y.toLong, (x * 32 + y).toLong))).toDF("x", "y", "id")
    Layout.zorderWrite(pts, "x", "y", "id", dir + "/t", nFiles = 8, bits = 5)
    val back = spark.read.parquet(dir + "/t")
    assert(back.count() == 32 * 32)
    val box = back.filter($"x" >= 4 && $"x" <= 6 && $"y" >= 10 && $"y" <= 12)
      .select($"id").as[Long].collect().toSet
    val expected = (for (x <- 4 to 6; y <- 10 to 12) yield (x * 32 + y).toLong).toSet
    assert(box == expected)
  }
}
