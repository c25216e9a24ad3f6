package graft

import graft.operators.Ivm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_ivm").toString + "/view"

  private def batch(rows: (String, Long, java.math.BigDecimal)*) =
    rows.toDF("k", "v", "amt")
      .select($"k", $"v", $"amt".cast("decimal(18,2)").as("amt"))

  private def bd(s: String) = new java.math.BigDecimal(s)

  test("incremental == one-shot recompute across batches, including key overlap") {
    val store = tmp()
    val b1 = batch(("a", 1L, bd("1.10")), ("a", 2L, bd("2.20")),
      ("b", 10L, bd("0.50")))
    val b2 = batch(("a", 3L, bd("0.70")), ("c", 5L, bd("9.99")))
    val b3 = batch(("b", 1L, bd("0.01")), ("c", 1L, bd("0.01")),
      ("c", 2L, bd("0.01")))
    Ivm.applyBatch(b1, store, Seq("k"), Seq("v", "amt"), nBuckets = 4)
    Ivm.applyBatch(b2, store, Seq("k"), Seq("v", "amt"))
    Ivm.applyBatch(b3, store, Seq("k"), Seq("v", "amt"))
    val got = Ivm.read(spark, store)
      .select($"k", $"cnt", $"sum_v", $"sum_amt".cast("string"))
      .as[(String, Long, Long, String)].collect().toSet
    val full = b1.unionByName(b2).unionByName(b3)
      .groupBy($"k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"),
        sum($"amt").as("sum_amt"))
      .select($"k", $"cnt", $"sum_v", $"sum_amt".cast("string"))
      .as[(String, Long, Long, String)].collect().toSet
    assert(got == full)
    assert(got.map(_._1) == Set("a", "b", "c"))
  }

  test("only the touched buckets rewrite") {
    val store = tmp()
    Ivm.applyBatch(batch(("a", 1L, bd("1.00")), ("b", 1L, bd("1.00")),
      ("c", 1L, bd("1.00")), ("d", 1L, bd("1.00"))), store,
      Seq("k"), Seq("v", "amt"), nBuckets = 8)
    val root = new java.io.File(store)
    def mtimes() = root.listFiles().filter(_.getName.startsWith("bucket_"))
      .map(d => d.getName -> d.listFiles().map(_.lastModified).max).toMap
    val before = mtimes()
    Thread.sleep(1100)
    // one key -> one bucket touched
    Ivm.applyBatch(batch(("a", 9L, bd("9.00"))), store, Seq("k"), Seq("v", "amt"))
    val after = mtimes()
    val changed = after.filter { case (d, t) => before.get(d).exists(_ != t) }.keySet
    assert(changed.size == 1, s"expected exactly one bucket rewrite, got $changed")
  }

  test("double sum columns are refused loudly; wrong bucket guess throws") {
    val store = tmp()
    val dbl = Seq(("a", 1.5)).toDF("k", "x")
    val ex = intercept[IllegalArgumentException] {
      Ivm.applyBatch(dbl, store, Seq("k"), Seq("x"), nBuckets = 4)
    }
    assert(ex.getMessage.contains("DECIMAL"))
    Ivm.applyBatch(batch(("a", 1L, bd("1.00"))), store, Seq("k"),
      Seq("v", "amt"), nBuckets = 4)
    intercept[IllegalArgumentException] {
      Ivm.read(spark, store, nBuckets = 16)
    }
  }

  test("tagged replay is a per-bucket no-op, including after a simulated partial crash") {
    import org.apache.commons.io.FileUtils
    val store = tmp()
    val b1 = batch(("a", 1L, bd("1.00")), ("b", 2L, bd("2.00")),
      ("c", 3L, bd("3.00")), ("d", 4L, bd("4.00")))
    Ivm.applyBatch(b1, store, Seq("k"), Seq("v", "amt"), nBuckets = 8,
      batchTag = Some(("writer1", 0L)))
    val snap = java.nio.file.Files.createTempDirectory("ivm_snap").toFile
    FileUtils.copyDirectory(new java.io.File(store), snap)
    val b2 = batch(("a", 10L, bd("0.10")), ("b", 20L, bd("0.20")))
    Ivm.applyBatch(b2, store, Seq("k"), Seq("v", "amt"),
      batchTag = Some(("writer1", 1L)))
    def view() = Ivm.read(spark, store)
      .select($"k", $"cnt", $"sum_v").as[(String, Long, Long)].collect().toSet
    val applied = view()
    assert(applied == Set(("a", 2L, 11L), ("b", 2L, 22L), ("c", 1L, 3L),
      ("d", 1L, 4L)))
    // full replay of batch 1: every bucket's tag already covers it
    Ivm.applyBatch(b1, store, Seq("k"), Seq("v", "amt"),
      batchTag = Some(("writer1", 0L)))
    assert(view() == applied, "replayed batch must not double-count")
    // partial-crash sim: restore ONE key's bucket to its pre-batch-2
    // state (as if the crash hit before that bucket's swap), replay
    // batch 2 — only the restored bucket applies, the rest skip
    val aBucketDirs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("bucket_"))
    val aDir = aBucketDirs.find { d =>
      spark.read.parquet(d.toString).filter($"k" === "a").count() > 0
    }.get
    FileUtils.deleteDirectory(aDir)
    FileUtils.copyDirectory(new java.io.File(snap, aDir.getName), aDir)
    // sanity: view regressed for a only
    assert(view() == Set(("a", 1L, 1L), ("b", 2L, 22L), ("c", 1L, 3L),
      ("d", 1L, 4L)))
    Ivm.applyBatch(b2, store, Seq("k"), Seq("v", "amt"),
      batchTag = Some(("writer1", 1L)))
    assert(view() == applied, "replay after partial crash must converge")
    // a DIFFERENT writer's batch 0 is not confused with writer1's
    Ivm.applyBatch(batch(("c", 100L, bd("1.00"))), store, Seq("k"),
      Seq("v", "amt"), batchTag = Some(("writer2", 0L)))
    assert(view().contains(("c", 2L, 103L)))
  }

  test("min/max/HLL columns: three-batch build equals one-shot; crash-replay converges on the extended schema") {
    import org.apache.commons.io.FileUtils
    val store = tmp()
    val b1 = batch(("a", 5L, bd("1.00")), ("a", 3L, bd("2.00")),
      ("b", 7L, bd("3.00")))
    val b2 = batch(("a", 9L, bd("0.10")), ("b", 1L, bd("0.20")),
      ("c", 4L, bd("0.30")))
    val b3 = batch(("a", 5L, bd("0.01")), ("c", 2L, bd("0.02")))
    def apply1(b: org.apache.spark.sql.DataFrame, tag: (String, Long)) =
      Ivm.applyBatch(b, store, Seq("k"), Seq("v"), nBuckets = 4,
        batchTag = Some(tag), minCols = Seq("v"), maxCols = Seq("v"),
        hllCols = Seq("v"))
    apply1(b1, ("w", 0L))
    val snap = java.nio.file.Files.createTempDirectory("ivm_snap2").toFile
    FileUtils.copyDirectory(new java.io.File(store), snap)
    apply1(b2, ("w", 1L))
    apply1(b3, ("w", 2L))
    def view() = Ivm.readDerived(spark, store, avgOf = Seq("v"),
        distinctOf = Seq("v"))
      .select($"k", $"cnt", $"sum_v", $"min_v", $"max_v", $"avg_v",
        $"distinct_v")
      .as[(String, Long, Long, Long, Long, Double, Long)].collect().toSet
    val got = view()
    val full = b1.unionByName(b2).unionByName(b3)
      .groupBy($"k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"),
        (sum($"v").cast("double") / count(lit(1)).cast("double")).as("avg_v"),
        countDistinct($"v").as("exact_d"))
      .select($"k", $"cnt", $"sum_v", $"min_v", $"max_v", $"avg_v", $"exact_d")
      .as[(String, Long, Long, Long, Long, Double, Long)].collect().toSet
    // count/sum/min/max/avg exact; the HLL estimate is exact too at
    // these cardinalities (<= 4 distinct values per key — registers
    // don't collide), so the whole tuple compares equal
    assert(got == full, s"got $got\nfull $full")
    // crash-replay on the extended schema: regress one key's bucket to
    // its pre-batch-2 state, replay batches 2 and 3 — min/max and the
    // HLL registers must converge, not double-merge
    val aDir = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("bucket_")).find { d =>
        spark.read.parquet(d.toString).filter($"k" === "a").count() > 0
      }.get
    FileUtils.deleteDirectory(aDir)
    FileUtils.copyDirectory(new java.io.File(snap, aDir.getName), aDir)
    apply1(b2, ("w", 1L))
    apply1(b3, ("w", 2L))
    assert(view() == full, "replay after partial crash must converge")
  }

  test("count-only views (no sum columns) maintain") {
    val store = tmp()
    Ivm.applyBatch(batch(("a", 1L, bd("0")), ("a", 2L, bd("0"))), store,
      Seq("k"), Seq.empty, nBuckets = 2)
    Ivm.applyBatch(batch(("a", 3L, bd("0"))), store, Seq("k"), Seq.empty)
    assert(Ivm.read(spark, store).select($"k", $"cnt")
      .as[(String, Long)].collect().toSeq == Seq(("a", 3L)))
  }
}
