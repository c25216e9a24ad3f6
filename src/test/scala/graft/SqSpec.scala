package graft

import graft.operators.Sq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))).toDF("id", "vec")
  }

  test("quantize→dequantize round-trip error is bounded by (hi-lo)/510 per dim") {
    val df = corpus(200).localCheckpoint(true)
    val (lo, hi) = Sq.collectBounds(Sq.train(df, "vec"))
    assert(lo.length == dim && hi.length == dim)
    val worst = df
      .withColumn("dq", Sq.dequantizeCol(Sq.quantizeCol($"vec", lo, hi), lo, hi))
      .select(aggregate(
        zip_with($"vec".cast("array<double>"), $"dq", (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("err"))
      .agg(max($"err")).head().getDouble(0)
    val bound = (0 until dim).map(i => (hi(i) - lo(i)) / 510.0).max
    assert(worst <= bound + 1e-12, s"round-trip err $worst > bound $bound")
  }

  test("codes are 0..255; corpus min/max hit the edge codes; degenerate dim codes to 0") {
    val df = corpus(100)
      .withColumn("vec", concat($"vec", array(lit(3.5)))) // constant extra dim
      .localCheckpoint(true)
    val (lo, hi) = Sq.collectBounds(Sq.train(df, "vec"))
    assert(lo(dim) == 3.5 && hi(dim) == 3.5)
    val codes = df.withColumn("code", Sq.quantizeCol($"vec", lo, hi))
    val mm = codes.select(
      aggregate($"code", lit(255), (a, x) => least(a, x)).as("cmin"),
      aggregate($"code", lit(0), (a, x) => greatest(a, x)).as("cmax"),
      element_at($"code", dim + 1).as("cdeg"))
    val agg = mm.agg(min($"cmin"), max($"cmax"), max($"cdeg")).head()
    assert(agg.getInt(0) == 0 && agg.getInt(1) == 255)
    assert(agg.getInt(2) == 0, "lo==hi dimension must code to 0")
    // out-of-range query clamps instead of wrapping
    val q = Sq.collectBounds(Sq.train(df, "vec")) match { case (l, h) =>
      spark.range(1).select(typedLit((0 to dim).map(i =>
          if (i % 2 == 0) -1e9 else 1e9).toSeq).as("vec"))
        .select(Sq.quantizeCol($"vec".cast("array<double>"), l, h))
        .head().getSeq[Int](0)
    }
    assert(q.init.zipWithIndex.forall { case (c, i) =>
      c == (if (i % 2 == 0) 0 else 255) })
  }

  test("code-space top-k closely tracks exact float cosine top-k") {
    val df = corpus(400).localCheckpoint(true)
    val (lo, hi) = Sq.collectBounds(Sq.train(df, "vec"))
    val codes = df.select($"id", Sq.quantizeCol($"vec", lo, hi).as("code"))
      .localCheckpoint(true)
    val qvec = df.filter($"id" === 0).select($"vec").head().getSeq[Double](0)
    val qcode = spark.range(1)
      .select(Sq.quantizeCol(typedLit(qvec), lo, hi)).head()
      .getSeq[Int](0).toArray
    val approx = Sq.topKCodes(codes, "id", "code", qcode, 10)
      .select($"id").as[Long].collect().toSet
    val exact = df
      .withColumn("s", graft.functions.vectors.cosine(
        $"vec".cast("array<double>"), typedLit(qvec)))
      .orderBy($"s".desc, $"id").limit(10)
      .select($"id").as[Long].collect().toSet
    // 8-bit codes on 16-dim gaussians: top-10 overlap is high but not
    // exact — the quantifiable approximation contract
    assert((approx & exact).size >= 7,
      s"recall too low: ${(approx & exact).size}/10")
    assert(approx.contains(0L), "query's own vector must rank top")
  }

  test("integer code scoring is deterministic and order-free") {
    val df = corpus(50).localCheckpoint(true)
    val (lo, hi) = Sq.collectBounds(Sq.train(df, "vec"))
    val codes = df.select($"id", Sq.quantizeCol($"vec", lo, hi).as("code"))
    val qcode = codes.filter($"id" === 1).select($"code").head()
      .getSeq[Int](0).toArray
    val a = Sq.topKCodes(codes, "id", "code", qcode, 5)
      .as[(Long, Double)].collect().toSeq
    val b = Sq.topKCodes(codes.repartition(13), "id", "code", qcode, 5)
      .as[(Long, Double)].collect().toSeq
    assert(a == b) // bit-identical across partitionings
  }
}
