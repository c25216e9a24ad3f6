package graft

import graft.operators.{Dedup, Pca}
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 10-dim vectors whose signal lives entirely in dims 0 and 1; the
    * other 8 dims carry tiny deterministic hash noise. */
  private def planted(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val a = math.cos(i * 0.37) * 5.0
      val b = math.sin(i * 0.53) * 3.0
      val v = new Array[Float](10)
      v(0) = a.toFloat; v(1) = b.toFloat
      var j = 2
      while (j < 10) {
        val h = Dedup.splitmix64(i * 1000L + j)
        v(j) = (((h >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 0.01).toFloat
        j += 1
      }
      (i.toLong, v)
    }

  test("basis is orthonormal and captures the planted 2-dim subspace") {
    val df = planted(200).toDF("id", "v")
    val m = Pca.fit(df, "v", targetDim = 2)
    assert(m.dim == 10 && m.targetDim == 2)
    // orthonormal rows
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    assert(math.abs(dot(m.basis(0), m.basis(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.basis(1), m.basis(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.basis(0), m.basis(1))) < 1e-9)
    // the two axes live (almost) entirely in dims 0,1
    val mass01 = m.basis.map(b => b(0) * b(0) + b(1) * b(1)).sum
    assert(mass01 > 1.99, s"expected planted subspace, got mass $mass01")
  }

  test("projection preserves pairwise distances on the planted data") {
    val data = planted(80)
    val df = data.toDF("id", "v")
    val m = Pca.fit(df, "v", targetDim = 2)
    val red = Pca.transform(df, "v", m, "r")
      .select($"id", $"r").as[(Long, Array[Float])].collect().toMap
    def d2(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    // distances in the reduced space match full-space distances to
    // within the planted noise scale
    for (i <- 0L until 20L; j <- (i + 1) to 20L) {
      val full = d2(data(i.toInt)._2, data(j.toInt)._2)
      val reduced = d2(red(i), red(j))
      assert(math.abs(full - reduced) < 0.01 + full * 0.01,
        s"pair ($i,$j): full $full reduced $reduced")
    }
  }

  test("null vectors project to null; dim mismatch fails fast") {
    val df = Seq((1L, Array(1f, 2f, 3f)), (3L, Array(2f, 1f, 0f)),
      (4L, Array(0f, 0f, 1f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val m = Pca.fit(df, "v", 1)
    val out = Pca.transform(df, "v", m, "r")
      .select($"id", $"r").as[(Long, Option[Array[Float]])].collect().toMap
    assert(out(2L).isEmpty && out(1L).exists(_.length == 1))
    val bad = Seq((9L, Array(1f, 2f))).toDF("id", "v")
    val e = intercept[Exception] {
      Pca.transform(bad, "v", m, "r").collect()
    }
    assert(e.getMessage != null)
  }

  test("fit is deterministic across reruns") {
    val df = planted(100).toDF("id", "v")
    val m1 = Pca.fit(df, "v", 3)
    val m2 = Pca.fit(df, "v", 3)
    assert(m1.mean.sameElements(m2.mean))
    assert(m1.basis.zip(m2.basis).forall { case (a, b) => a.sameElements(b) })
  }
}
