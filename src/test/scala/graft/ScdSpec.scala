package graft

import graft.operators.Scd
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, ts, eventId, tier)
  private def log(rows: (Long, Long, Long, String)*) =
    rows.toDF("k", "ts", "eid", "tier")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Scd.intervals(df, Seq("k"), "ts", "eid", Seq("tier"))
      .orderBy($"k", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSeq

  test("change points version; no-op re-observations never mint a version") {
    val out = run(log(
      (1L, 10L, 1L, "free"),
      (1L, 20L, 2L, "free"),   // re-observed, unchanged -> no version
      (1L, 30L, 3L, "pro"),
      (1L, 40L, 4L, "pro"),
      (1L, 50L, 5L, "free")))
    assert(out == Seq(
      (1L, "free", 10L, Some(30L), false),
      (1L, "pro", 30L, Some(50L), false),
      (1L, "free", 50L, None, true)))
  }

  test("intervals chain: each valid_to is the next valid_from; last is current") {
    val out = run(log((7L, 1L, 1L, "a"), (7L, 2L, 2L, "b"), (7L, 3L, 3L, "c")))
    assert(out.map(_._3) == Seq(1L, 2L, 3L))
    assert(out.map(_._4) == Seq(Some(2L), Some(3L), None))
    assert(out.map(_._5) == Seq(false, false, true))
  }

  test("null attributes version null-safely (null -> value -> null)") {
    val rows = Seq((1L, 10L, 1L, null), (1L, 20L, 2L, "x"),
      (1L, 30L, 3L, null), (1L, 40L, 4L, null))
      .asInstanceOf[Seq[(Long, Long, Long, String)]]
    val out = run(rows.toDF("k", "ts", "eid", "tier"))
    assert(out.map(t => (t._2, t._3)) ==
      Seq((null, 10L), ("x", 20L), (null, 30L)))
  }

  test("equal timestamps order by the tie column, keys are independent") {
    val out = run(log(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"),   // same ts: eid orders a then b
      (2L, 10L, 3L, "z")))
    assert(out == Seq(
      (1L, "a", 10L, Some(10L), false),
      (1L, "b", 10L, None, true),
      (2L, "z", 10L, None, true)))
  }

  test("applyBatch folds in-order batches into the same history as a full rebuild") {
    val store = java.nio.file.Files.createTempDirectory("scd_store").toString + "/v"
    val batches = Seq(
      log((1L, 10L, 1L, "free"), (2L, 11L, 2L, "free")),
      log((1L, 20L, 3L, "pro"), (1L, 25L, 4L, "pro"),   // 25 is a no-op
        (3L, 21L, 5L, "trial")),                          // new key mid-stream
      log((2L, 30L, 6L, "pro"), (1L, 31L, 7L, "free")))
    batches.foreach(b =>
      Scd.applyBatch(b, store, Seq("k"), "ts", "eid", Seq("tier")))
    val incr = Scd.readVersions(spark, store)
      .select($"k", $"tier", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"k", $"valid_from").collect().toSeq
    val full = Scd.intervals(
        batches.reduce(_ unionByName _), Seq("k"), "ts", "eid", Seq("tier"))
      .orderBy($"k", $"valid_from").collect().toSeq
    assert(incr == full)
  }

  test("applyBatch replay and crash-retry are idempotent no-ops") {
    val store = java.nio.file.Files.createTempDirectory("scd_replay").toString + "/v"
    val b1 = log((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"))
    val b2 = log((1L, 30L, 3L, "c"), (2L, 30L, 4L, "x"))
    Scd.applyBatch(b1, store, Seq("k"), "ts", "eid", Seq("tier"))
    Scd.applyBatch(b2, store, Seq("k"), "ts", "eid", Seq("tier"))
    val before = Scd.readVersions(spark, store)
      .orderBy($"k", $"valid_from").collect().toSeq
    // a fully-replayed batch (crash after swap, retry from the source)
    // drops every row as already-applied — history unchanged
    Scd.applyBatch(b2, store, Seq("k"), "ts", "eid", Seq("tier"))
    Scd.applyBatch(b1, store, Seq("k"), "ts", "eid", Seq("tier"))
    val after = Scd.readVersions(spark, store)
      .orderBy($"k", $"valid_from").collect().toSeq
    assert(after == before)
  }

  test("applyBatch rewrites only the buckets the batch touches") {
    val store = java.nio.file.Files.createTempDirectory("scd_buckets").toString + "/v"
    // seed many keys across buckets
    val seed = log((1L to 32L).map(k => (k, 10L, k, "a")): _*)
    Scd.applyBatch(seed, store, Seq("k"), "ts", "eid", Seq("tier"), nBuckets = 8)
    def mtimes(): Map[String, Long] = {
      val root = new java.io.File(store)
      root.listFiles().filter(_.getName.startsWith("bucket_"))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(_.lastModified()).max).toMap
    }
    val before = mtimes()
    Thread.sleep(1100)
    // one key -> one bucket touched
    Scd.applyBatch(log((1L, 20L, 100L, "b")), store,
      Seq("k"), "ts", "eid", Seq("tier"), nBuckets = 8)
    val after = mtimes()
    val changed = after.keySet.filter(k => after(k) != before.getOrElse(k, -1L))
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
  }

  test("applyLate folds a row older than a closed version; incremental == rebuild") {
    val store = java.nio.file.Files.createTempDirectory("scd_late").toString + "/v"
    val b1 = log((1L, 10L, 1L, "free"), (2L, 10L, 2L, "free"))
    val b2 = log((1L, 30L, 4L, "pro"), (2L, 40L, 5L, "gold"))
    Scd.applyBatch(b1, store, Seq("k"), "ts", "eid", Seq("tier"))
    Scd.applyBatch(b2, store, Seq("k"), "ts", "eid", Seq("tier"))
    // a genuinely late row INSIDE key 1's now-closed [10, 30) version:
    // applyBatch's ordering contract would drop it as a replay
    val late = log((1L, 20L, 3L, "trial"))
    Scd.applyBatch(late, store, Seq("k"), "ts", "eid", Seq("tier"))
    val dropped = Scd.readVersions(spark, store)
      .filter($"tier" === "trial").count()
    assert(dropped == 0L, "late row should have been dropped by applyBatch")
    // the repair path: complete log (with the late row) + bounded rebuild
    val fullLog = b1.unionByName(b2).unionByName(late)
    Scd.applyLate(late, fullLog, store, Seq("k"), "ts", "eid", Seq("tier"))
    val incr = Scd.readVersions(spark, store)
      .select($"k", $"tier", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"k", $"valid_from").collect().toSeq
    val full = Scd.intervals(fullLog, Seq("k"), "ts", "eid", Seq("tier"))
      .orderBy($"k", $"valid_from").collect().toSeq
    assert(incr == full)
    // and in-order maintenance resumes cleanly after the repair
    Scd.applyBatch(log((1L, 50L, 6L, "free")), store,
      Seq("k"), "ts", "eid", Seq("tier"))
    val resumed = Scd.readVersions(spark, store)
      .filter($"k" === 1L && $"is_current").select($"tier").collect()
    assert(resumed.map(_.getString(0)).toSeq == Seq("free"))
  }

  test("applyLate rewrites only the buckets holding the late keys") {
    val store = java.nio.file.Files.createTempDirectory("scd_late_b").toString + "/v"
    val seed = log((1L to 32L).map(k => (k, 10L, k, "a")): _*)
    val closer = log((1L to 32L).map(k => (k, 30L, 100L + k, "b")): _*)
    Scd.applyBatch(seed, store, Seq("k"), "ts", "eid", Seq("tier"), nBuckets = 8)
    Scd.applyBatch(closer, store, Seq("k"), "ts", "eid", Seq("tier"))
    def mtimes(): Map[String, Long] = {
      val root = new java.io.File(store)
      root.listFiles().filter(_.getName.startsWith("bucket_"))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(_.lastModified()).max).toMap
    }
    val before = mtimes()
    Thread.sleep(1100)
    val late = log((1L, 20L, 999L, "mid"))
    val fullLog = seed.unionByName(closer).unionByName(late)
    Scd.applyLate(late, fullLog, store, Seq("k"), "ts", "eid", Seq("tier"))
    val after = mtimes()
    val changed = after.keySet.filter(k => after(k) != before.getOrElse(k, -1L))
    assert(changed.size == 1, s"expected 1 rewritten bucket, got $changed")
  }

  test("readVersions enumerates bucket dirs; a mismatched explicit nBuckets throws") {
    val store = java.nio.file.Files.createTempDirectory("scd_meta").toString + "/v"
    val seed = log((1L to 32L).map(k => (k, 10L, k, "a")): _*)
    Scd.applyBatch(seed, store, Seq("k"), "ts", "eid", Seq("tier"), nBuckets = 16)
    // default read sees ALL 32 keys even though the old default was 8
    assert(Scd.readVersions(spark, store).count() == 32L)
    // an explicitly wrong layout guess fails loudly instead of
    // silently returning partial history
    intercept[IllegalArgumentException] {
      Scd.readVersions(spark, store, nBuckets = 8)
    }
    intercept[IllegalArgumentException] {
      Scd.applyBatch(log((1L, 20L, 99L, "b")), store,
        Seq("k"), "ts", "eid", Seq("tier"), nBuckets = 8)
    }
  }

  test("streamed change log maintains the SCD2 store via foreachBatch") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("scd_stream_src")
    val store = Files.createTempDirectory("scd_stream").toString + "/v"
    val all = log(
      (1L, 10L, 1L, "free"), (2L, 10L, 2L, "free"),
      (1L, 20L, 3L, "pro"), (2L, 25L, 4L, "free"), // no-op for 2
      (1L, 30L, 5L, "free"), (3L, 30L, 6L, "trial"))
    // two in-order file drops — staged to a side dir and landed as ONE
    // complete part file each (the StreamingSpec idiom): writing a
    // multi-part parquet DIRECTORY straight into the streamed glob let
    // a processAllAvailable under suite load snapshot the source while
    // only some of the commit's part files were listed, applying a
    // partial micro-batch (observed once in-suite; isolation-green)
    val schema = all.schema
    def land(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = Files.createTempDirectory("scd_stream_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, src.resolve(name))
    }
    land("b1.parquet", all.filter($"eid" <= 2))
    val stream = spark.readStream.schema(schema)
      .parquet(src.toString + "/*.parquet")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Scd.applyBatch(batch, store, Seq("k"), "ts", "eid", Seq("tier"))
      }.start()
    try {
      q.processAllAvailable()
      land("b2.parquet", all.filter($"eid" > 2))
      q.processAllAvailable()
      val streamed = Scd.readVersions(spark, store)
        .select($"k", $"tier", $"valid_from", $"valid_to", $"is_current")
        .orderBy($"k", $"valid_from").collect().toSeq
      val batch = Scd.intervals(all, Seq("k"), "ts", "eid", Seq("tier"))
        .orderBy($"k", $"valid_from").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("both windows and the filter share one key-hash exchange") {
    val df = Scd.intervals(log((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b")),
      Seq("k"), "ts", "eid", Seq("tier"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_)).map(_.group(1))
      .toSet
    assert(exchanges.size == 1, s"expected one key exchange in:\n$plan")
  }
}
