package graft

import graft.operators.DataProfile
import org.scalatest.funsuite.AnyFunSuite

class DataProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = Seq(
    (Some(1L), Some("b"), Some(2.5)),
    (Some(2L), Some("a"), None),
    (Some(2L), None, Some(-1.0)),
    (None, Some("a"), Some(7.25)))
    .toDF("k", "s", "v")

  test("exact profile: counts, nulls, distincts, native-type min/max") {
    val out = DataProfile.profile(fixture, Seq("k", "s", "v"))
      .orderBy($"col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 3L, "-1.0", "7.25")))
  }

  test("min/max order on the native type, not the string rendering") {
    // string-cast ordering would put "10" < "9"
    val df = Seq(9L, 10L, 2L).toDF("n")
    val row = DataProfile.profile(df, Seq("n")).collect().head
    assert(row.getAs[String]("min_val") == "2")
    assert(row.getAs[String]("max_val") == "10")
  }

  test("profile sketches: disjoint halves round-trip parquet and merge to the whole") {
    val dir = java.nio.file.Files.createTempDirectory("profile_sk").toString
    val df = spark.range(0, 4000)
      .selectExpr("id AS k", "CAST(id % 7 AS STRING) AS s",
        "CAST(CASE WHEN id % 5 = 0 THEN NULL ELSE id % 211 END AS DOUBLE) AS v")
    val a = df.filter($"k" < 1500)   // uneven halves
    val b = df.filter($"k" >= 1500)
    val cols = Seq("k", "s", "v")
    // per-batch sidecars persist; merging NEVER rescans the batches
    DataProfile.profileSketch(a, cols).write.parquet(dir + "/b0")
    DataProfile.profileSketch(b, cols).write.parquet(dir + "/b1")
    val merged = DataProfile.mergeProfileSketches(spark.read.parquet(dir + "/b*"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap

    assert(cols.forall(c => merged(c).getAs[Long]("n_rows") == 4000L))
    assert(merged("k").getAs[Long]("n_nulls") == 0L)
    assert(merged("v").getAs[Long]("n_nulls") == 800L)
    // typed min/max fold natively: numeric columns never string-order
    assert(merged("k").getAs[Double]("min_num") == 0.0)
    assert(merged("k").getAs[Double]("max_num") == 3999.0)
    assert(merged("v").getAs[Double]("max_num") == 210.0)
    assert(merged("s").getAs[String]("min_str") == "0")
    assert(merged("s").getAs[String]("max_str") == "6")
    // HLL union across batches lands within 5% of exact distinct
    def within(est: Long, exact: Long) =
      math.abs(est - exact) <= math.max(1.0, exact * 0.05)
    assert(within(merged("k").getAs[Long]("n_distinct"), 4000L))
    assert(within(merged("s").getAs[Long]("n_distinct"), 7L))
    assert(within(merged("v").getAs[Long]("n_distinct"), 211L))
  }

  test("equiDepthBins: exact ntile bins with counts and ranges") {
    val df = (1 to 10).map(i => (i.toDouble * 10, i.toLong)).toDF("v", "id")
    val out = DataProfile.equiDepthBins(df, "v", "id", 3)
      .orderBy($"bin").as[(Int, Long, Double, Double)].collect().toSeq
    // ntile puts the remainder in the first bins: 4,3,3
    assert(out == Seq((1, 4L, 10.0, 40.0), (2, 3L, 50.0, 70.0),
      (3, 3L, 80.0, 100.0)))
  }

  test("equiDepthEdgesApprox: monotone edges that balance a uniform column") {
    val df = spark.range(0, 10000).selectExpr("CAST(id AS DOUBLE) AS v")
    val edges = DataProfile.equiDepthEdgesApprox(df, "v", 4)
    assert(edges.length == 3 && edges.sameElements(edges.sorted))
    edges.zip(Seq(2500.0, 5000.0, 7500.0)).foreach { case (e, want) =>
      assert(math.abs(e - want) < 250, s"edge $e vs $want")
    }
  }

  test("approx profile: same shape, n_distinct within rsd, NO Expand in plan") {
    val df = spark.range(0, 5000).selectExpr("id", "id % 37 AS m")
    val out = DataProfile.profileApprox(df, Seq("id", "m"), rsd = 0.05)
    val rows = out.collect().map(r =>
      r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(math.abs(rows("m") - 37L) <= 4)
    assert(math.abs(rows("id") - 5000L) <= 500)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"approx profile must not multiply rows via Expand:\n$plan")
    // the exact mode is the one that pays Expand (documented trade)
    val exactPlan = DataProfile.profile(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
  }

  test("psiBins: ~0 on identical distributions, large on a shift, finite on empty bins") {
    import org.apache.spark.sql.functions._
    val ref = spark.range(0, 4000)
      .select(($"id" % 1000).cast("double").as("v"), $"id".as("tie"))
    def psi(cur: org.apache.spark.sql.DataFrame): Double =
      DataProfile.psiBins(ref, cur, "v", "tie", 10)
        .agg(sum($"psi_term")).head().getDouble(0)
    // same generator, different ids -> same distribution
    val same = spark.range(4000, 8000)
      .select(($"id" % 1000).cast("double").as("v"), $"id".as("tie"))
    assert(math.abs(psi(same)) < 0.01, s"identical dist drifted: ${psi(same)}")
    // hard shift: all mass in the top fifth of the reference range
    val shifted = spark.range(0, 4000)
      .select((lit(800.0) + ($"id" % 200).cast("double")).as("v"), $"id".as("tie"))
    assert(psi(shifted) > 0.25, s"shift not detected: ${psi(shifted)}")
    // empty current bins stay finite (add-one smoothing), one row/bin
    val terms = DataProfile.psiBins(ref, shifted, "v", "tie", 10)
      .select($"bin", $"psi_term").collect()
    assert(terms.length == 10 && terms.forall(r => !r.getDouble(1).isNaN &&
      !r.getDouble(1).isInfinite))
  }

  test("psiFromKll tracks the exact PSI within sketch rank error") {
    import org.apache.spark.sql.functions._
    val ref = spark.range(0, 20000)
      .select(($"id" % 1000).cast("double").as("v"), $"id".as("tie"),
        lit("g").as("k"))
    val shifted = spark.range(0, 20000)
      .select((($"id" % 1000) * lit(2)).cast("double").as("v"), $"id".as("tie"),
        lit("g").as("k"))
    def sk(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      graft.operators.KllQuantiles.sketch(df, "k", "v")
        .collect().head.getAs[Array[Byte]]("sketch")
    val refSk = sk(ref)
    // identical sketches -> PSI ~ 0
    assert(math.abs(DataProfile.psiFromKll(refSk, sk(ref), 10)) < 0.01)
    val approx = DataProfile.psiFromKll(refSk, sk(shifted), 10)
    val exact = DataProfile.psiBins(ref, shifted, "v", "tie", 10)
      .agg(sum($"psi_term")).head().getDouble(0)
    assert(math.abs(approx - exact) < 0.08,
      s"sketch PSI $approx too far from exact $exact")
    assert(approx > 0.25, "sketch path must still flag the shift")
  }
  test("MAD outliers: exact lower-median ranks, tie determinism, zero-MAD degenerate") {
    import graft.operators.DataProfile
    val df = Seq(
      // group a: values 1..9 plus a wild 1000 -> n=10, lower median at
      // rank 5 = 5.0; deviations 0..4,995 -> MAD at rank 5 = 2 -> only
      // 1000 exceeds 5*2
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 5.0), ("a", 6L, 6.0), ("a", 7L, 7.0), ("a", 8L, 8.0),
      ("a", 9L, 9.0), ("a", 10L, 1000.0),
      // group b: over half tied at 7 -> MAD 0 -> every deviator flags
      ("b", 21L, 7.0), ("b", 22L, 7.0), ("b", 23L, 7.0), ("b", 24L, 7.1),
      ("b", 25L, 6.9)
    ).toDF("g", "id", "v")
    val got = DataProfile.madOutliers(df, "g", "v", "id", k = 5.0)
      .select($"g", $"id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 10L), ("b", 24L), ("b", 25L)))
    // median rank rule is the LOWER median: even group of 4 -> rank 2
    val even = Seq(("c", 1L, 10.0), ("c", 2L, 20.0), ("c", 3L, 30.0),
      ("c", 4L, 1000.0)).toDF("g", "id", "v")
    val gotEven = DataProfile.madOutliers(even, "g", "v", "id", k = 5.0)
      .select($"id").as[Long].collect().toSet
    // med = 20 (rank 2), deviations (10,0,10,980) sorted -> MAD at
    // rank 2 = 10 -> threshold 50 -> only 1000 flags
    assert(gotEven == Set(4L))
  }

  test("winsorize: exact rank bounds clamp tails, original values untouched in-band, degenerate group, refusal") {
    val sp = TestSpark.spark
    import sp.implicits._
    // group g: values 1..20 -> loRank = 20*500 div 10000 + 1 = 2,
    // hiRank = (20*9500+9999) div 10000 = 19 -> clamp into [2, 19]
    val df = (1L to 20L).map(i => ("g", i, i.toDouble)).toDF("k", "id", "v")
      .unionByName(Seq(("h", 1L, 42.0)).toDF("k", "id", "v"))
    val got = graft.operators.DataProfile.winsorize(df, "k", "v", "id")
      .select($"k", $"id", $"_wins").as[(String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("g", 1L)) == 2.0 && got(("g", 20L)) == 19.0,
      "tails must clamp to the exact rank bounds")
    assert((2L to 19L).forall(i => got(("g", i)) == i.toDouble),
      "in-band values must pass through untouched")
    // single-row group: loRank = 1, hiRank = 1 -> value clamps to itself
    assert(got(("h", 1L)) == 42.0)
    intercept[IllegalArgumentException] {
      graft.operators.DataProfile.winsorize(df, "k", "v", "id", 9500, 500)
    }
  }

  test("winsorize: NULL group gets its own bounds, NULL values pass through, no row ever dropped") {
    val sp = TestSpark.spark
    import sp.implicits._
    // NULL-group partition 1..20 (same shape as the named group), plus
    // a NULL value inside a real group, plus a group of only NULLs
    val rows = (1L to 20L).map(i => (Option.empty[String], i, Option(i.toDouble))) ++
      (1L to 20L).map(i => (Option("g"), 100 + i, Option(i.toDouble))) :+
      ((Option("g"), 199L, Option.empty[Double])) :+
      ((Option("z"), 300L, Option.empty[Double]))
    val df = rows.toDF("k", "id", "v")
    val out = graft.operators.DataProfile.winsorize(df, "k", "v", "id")
    assert(out.count() == df.count(), "winsorize must keep every row")
    val got = out.select($"id", $"_wins").as[(Long, Option[Double])]
      .collect().toMap
    // the NULL group is winsorized like any other group, not dropped
    assert(got(1L).contains(2.0) && got(20L).contains(19.0))
    assert(got(101L).contains(2.0) && got(120L).contains(19.0))
    // NULL values pass through untouched (never clamped to a bound)
    assert(got(199L).isEmpty && got(300L).isEmpty)
  }
}
