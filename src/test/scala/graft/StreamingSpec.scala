package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** SURVEY.md §5 item 6: events replayed as a file stream; streaming
  * results must equal the same operator run in batch (Structured
  * Streaming's repeated-batch semantics). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Older testdata stamped ts TIMESTAMP(NANOS) (surfacing as
    * LongType nanos under nanosAsLong); the regenerated data stamps
    * timestamp[us] (TimestampType under the session's
    * inferTimestampNTZ=false). Detect once, normalize either shape to
    * TimestampType. */
  private lazy val tsIsLong: Boolean =
    spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .schema("ts").dataType == LongType

  private def normTs(df: DataFrame): DataFrame =
    if (tsIsLong) df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df

  private def eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", if (tsIsLong) LongType else TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** events with ts normalized to TimestampType. */
  private def batchEvents: DataFrame =
    normTs(spark.read.parquet(s"${TestSpark.sf0001}/events.parquet"))

  /** The same table as a file-source stream (schema must be explicit). */
  private def streamEvents: DataFrame = {
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    normTs(spark.readStream.schema(eventsSchema).parquet(dir.toString))
  }

  private def runToBatch(stream: DataFrame, mode: String, name: String): DataFrame = {
    val q = stream.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("windowed counts: stream == batch") {
    val streamed = runToBatch(
      StreamOps.windowedCounts(streamEvents), "complete", "win_out")
    val batch = StreamOps.windowedCounts(batchEvents)
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() > 0)
  }

  test("sliding windows: stream == batch") {
    val streamed = runToBatch(
      StreamOps.windowedCounts(streamEvents, slide = Some("5 minutes")),
      "complete", "slide_out")
    val batch = StreamOps.windowedCounts(batchEvents, slide = Some("5 minutes"))
    assert(sortedRows(streamed) == sortedRows(batch))
    // sliding windows roughly double tumbling output
    assert(streamed.count() > StreamOps.windowedCounts(batchEvents).count())
  }

  test("session windows: stream == batch") {
    val streamed = runToBatch(
      StreamOps.sessionCounts(streamEvents), "complete", "sess_out")
    val batch = StreamOps.sessionCounts(batchEvents)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("session windows agree with gaps-and-islands sessionization") {
    // total sessions per user from session_window == lag/cumsum islands
    val viaSessionWindow = StreamOps.sessionCounts(batchEvents)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val viaIslands = batchEvents
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" >= 300000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id").agg(sum($"new_sess").as("n_sessions"))
    assert(sortedRows(viaSessionWindow) == sortedRows(viaIslands))
  }

  test("streaming funnel: multi-batch progress equals the batch funnel") {
    import graft.operators.Events
    val steps = Seq("view", "click", "purchase")
    val span = 7L * 86400000000L
    val ev = batchEvents.select($"user_id", $"event_type".as("etype"),
      unix_micros($"ts").as("ts_us"))
    // two in-order file drops split at the global ts median
    val cut = ev.agg(expr("percentile_approx(ts_us, 0.5)")).head().getLong(0)
    val src = Files.createTempDirectory("graft_funnel")
    val schema = ev.schema
    ev.filter($"ts_us" < cut).write.parquet(src.resolve("b1.parquet").toString)
    val stream = spark.readStream.schema(schema)
      .parquet(src.toString + "/*.parquet")
    val q = StreamOps.streamingFunnel(stream, steps, span)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      ev.filter($"ts_us" >= cut).write.parquet(src.resolve("b2.parquet").toString)
      q.processAllAvailable()
    } finally q.stop()
    val progress = spark.table("funnel_out")
    // per-user progress rows only ever advance
    val perUser = progress.groupBy($"user_id")
      .agg(count(lit(1)).as("rows"), max($"steps_done").as("max_done"),
        countDistinct($"steps_done").as("distinct_done"))
    assert(perUser.filter($"rows" =!= $"distinct_done").count() == 0,
      "a user must never re-emit the same steps_done")
    // final reached-step counts equal the batch funnel over the full log
    val streamedCounts = (1 to steps.size).map(k =>
      perUser.filter($"max_done" >= k).count())
    val batchUsers = Events.funnelUsers(ev, "user_id", "etype", "ts_us",
      steps, span)
    val batchCounts = (1 to steps.size).map(k =>
      batchUsers.filter(col(s"t$k").isNotNull).count())
    assert(streamedCounts == batchCounts)
    assert(streamedCounts.head > 0 && streamedCounts.last > 0,
      "fixture must exercise full conversions")
  }

  test("flatMapGroupsWithState sessionization: stream == batch == islands") {
    val streamed = runToBatch(
      StreamOps.statefulSessionsReplay(streamEvents).toDF(), "append", "fmgs_out")
    val batch = StreamOps.statefulSessionsReplay(batchEvents).toDF()
    assert(sortedRows(streamed) == sortedRows(batch))
    // per-user session counts equal the gaps-and-islands formulation
    // with the same strict-gap close (gap > 5 min)
    val viaState = batch.groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val viaIslands = batchEvents
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 300000000L, 1L)
          .otherwise(0L))
      .groupBy($"user_id").agg(sum($"new_sess").as("n_sessions"))
    assert(sortedRows(viaState) == sortedRows(viaIslands))
  }

  test("incremental statefulSessions: cross-batch session emitted once, tail flushed by timeout") {
    // Three micro-batches; user 7's first session spans nothing (both
    // events in batch 1), but it must NOT be re-emitted per batch (the
    // replay variant would emit an evolving tail every batch).
    val dir = Files.createTempDirectory("graft_incr_sess")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType)))
    def writeBatch(name: String, rows: Seq[(Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_incr_tmp")
      rows.toDF("user_id", "ts_us").repartition(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros($"ts_us"))
    val out = StreamOps.statefulSessions(stream, gapMin = 5).toDF()
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("incr_sess_out").start()
    try {
      val S = 1000000L // seconds -> micros
      // Fixtures start at OFF, not epoch 0: Spark's initial watermark is
      // 0, and an event AT the watermark is dropped as late — an
      // epoch-0 first event never reaches the stateful operator. That
      // boundary is Spark's documented late-data semantics, not a
      // sessionization property, so the fixture stays strictly above it.
      val OFF = 1000 * S
      writeBatch("b1.parquet", Seq((7L, OFF), (7L, OFF + 60 * S)))
      q.processAllAvailable()
      assert(spark.table("incr_sess_out").count() == 0,
        "open tail must stay in state, not be emitted eagerly")
      // +3600s: gap > 5 min closes session 1 (emitted once, final)
      writeBatch("b2.parquet", Seq((7L, OFF + 3600 * S)))
      q.processAllAvailable()
      val afterB2 = spark.table("incr_sess_out").collect()
      assert(afterB2.map(_.toString).toSeq ==
        Seq(s"[7,$OFF,${OFF + 60 * S},2]"), s"got ${afterB2.mkString(",")}")
      // push the watermark (10 min delay) past OFF+3600s + 5 min gap so
      // the EventTimeTimeout flushes user 7's tail exactly once
      writeBatch("b3.parquet", Seq((8L, OFF + 9999 * S)))
      q.processAllAvailable()
      val fin = spark.table("incr_sess_out").collect().map(_.toString).sorted.toSeq
      assert(fin == Seq(
        s"[7,$OFF,${OFF + 60 * S},2]",
        s"[7,${OFF + 3600 * S},${OFF + 3600 * S},1]"),
        s"got $fin")
    } finally q.stop()
  }

  test("stream-stream interval join == batch range join") {
    // views joined to this user's clicks within the preceding 6 hours
    // (sf0.001 events are sparse; 10-minute windows have zero matches)
    def joinIt(views: DataFrame, clicks: DataFrame): DataFrame = {
      val v = views.select($"user_id", $"ts".as("v_ts"), $"event_id".as("view_event"))
      val c = clicks.select($"user_id".as("c_user"), $"ts".as("c_ts"),
        $"event_id".as("click_event"))
      v.join(c, $"user_id" === $"c_user" &&
        $"c_ts" >= $"v_ts" - expr("INTERVAL 6 HOURS") && $"c_ts" <= $"v_ts")
        .select($"user_id", $"view_event", $"click_event")
    }
    val sv = streamEvents.filter($"event_type" === "view").withWatermark("ts", "6 hours")
    val sc = streamEvents.filter($"event_type" === "click").withWatermark("ts", "6 hours")
    val streamed = runToBatch(joinIt(sv, sc), "append", "ssj_out")
    val batch = joinIt(batchEvents.filter($"event_type" === "view"),
      batchEvents.filter($"event_type" === "click"))
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() > 0)
  }

  test("stream-stream LEFT OUTER interval join: matches == batch; null rows emit below watermark") {
    // left-outer stream-stream joins are the semantics trap: a
    // null-extended row can only emit once the WATERMARK proves no
    // match can still arrive, so views newer than (max ts - delay)
    // legitimately never surface their null row in a bounded run —
    // the comparison must respect that, not paper over it
    def joinIt(views: DataFrame, clicks: DataFrame): DataFrame = {
      val v = views.select($"user_id", $"ts".as("v_ts"), $"event_id".as("view_event"))
      val c = clicks.select($"user_id".as("c_user"), $"ts".as("c_ts"),
        $"event_id".as("click_event"))
      v.join(c, $"user_id" === $"c_user" &&
        $"c_ts" >= $"v_ts" - expr("INTERVAL 6 HOURS") && $"c_ts" <= $"v_ts",
        "left_outer")
        .select($"user_id", $"v_ts", $"view_event", $"click_event")
    }
    val sv = streamEvents.filter($"event_type" === "view").withWatermark("ts", "1 hour")
    val sc = streamEvents.filter($"event_type" === "click").withWatermark("ts", "1 hour")
    val streamed = runToBatch(joinIt(sv, sc), "append", "ssloj_out")
    val batch = joinIt(batchEvents.filter($"event_type" === "view"),
      batchEvents.filter($"event_type" === "click"))
    // inner part: exactly the batch matches (no loss, no duplication)
    assert(sortedRows(streamed.filter($"click_event".isNotNull)) ==
      sortedRows(batch.filter($"click_event".isNotNull)))
    // outer part: every batch null-row old enough for the final
    // watermark emitted, and nothing else
    import java.sql.Timestamp
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0).getTime
    val horizon = new Timestamp(maxTs - 7L * 3600 * 1000) // 6h window + 1h delay
    val gotNull = sortedRows(streamed.filter($"click_event".isNull))
    val wantNull = sortedRows(batch.filter($"click_event".isNull && $"v_ts" < horizon))
    val lateNull = sortedRows(batch.filter($"click_event".isNull))
    assert(gotNull.toSet.subsetOf(lateNull.toSet),
      "streamed null rows must be genuine batch null rows")
    assert(wantNull.toSet.subsetOf(gotNull.toSet),
      "every sufficiently-old unmatched view must emit its null row")
    assert(gotNull.nonEmpty && streamed.filter($"click_event".isNotNull).count() > 0,
      "fixture must exercise both match and null paths")
  }

  test("streaming ingestion into the vector index via foreachBatch is upsert-idempotent") {
    import graft.core.HashingEmbedder
    import graft.operators.{Ingest, VectorIndex}
    val src = Files.createTempDirectory("graft_singest")
    val idx = VectorIndex.ensure(spark,
      Files.createTempDirectory("graft_sidx").toString + "/idx", 64)
    val embedder = new HashingEmbedder(dimension = 64, seed = 42L)
    val docsPath = s"${TestSpark.sf0001}/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)
      .select($"doc_id", $"text")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          idx.upsert(Ingest.pipeline(batch, embedder,
            Ingest.Config(expectedDim = Some(64))))
      }.start()
    try {
      Files.copy(Paths.get(docsPath), src.resolve("b1.parquet"))
      q.processAllAvailable()
      assert(idx.scan().count() == 500)
      // re-deliver the same docs in a later batch: upsert-by-id keeps 500
      Files.copy(Paths.get(docsPath), src.resolve("b2.parquet"))
      q.processAllAvailable()
      assert(idx.scan().count() == 500)
      assert(idx.snapshots().size >= 2)
    } finally q.stop()
  }

  test("streaming restart from checkpoint resumes exactly-once (no re-emitted windows)") {
    // the recovery contract a long-running pipeline leans on: stop the
    // query, add data, restart with the SAME checkpoint — state and
    // source offsets resume; nothing from before the restart is
    // re-emitted. File sink is exactly-once via its own commit log.
    val src = Files.createTempDirectory("graft_ckpt_src")
    val ckpt = Files.createTempDirectory("graft_ckpt_state").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString + "/out"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType)))
    def writeBatch(name: String, rows: Seq[(Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_ckpt_tmp")
      rows.toDF("user_id", "ts_us").repartition(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, src.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }
    def startQuery() = StreamOps.windowedCounts(
        spark.readStream.schema(schema).parquet(src.toString)
          .withColumn("ts", timestamp_micros($"ts_us"))
          .withColumn("event_type", lit("e")).withColumn("value", lit(1.0)),
        watermark = "10 minutes")
      .selectExpr("unix_micros(win_start) AS win_us", "event_type", "n", "sum_value")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).format("parquet").start(out)
    val M = 60L * 1000000L
    writeBatch("b1.parquet", Seq((1L, 0 * M), (1L, 5 * M)))
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      // push the watermark past window [0,10): it finalizes and lands in the sink
      writeBatch("b2.parquet", Seq((1L, 30 * M)))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterStop = spark.read.parquet(out).collect()
    assert(afterStop.map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((0L, 2L)),
      s"window [0,10) must be final before restart, got ${afterStop.mkString(",")}")
    // restart with the same checkpoint; finalize the [30,40) window
    writeBatch("b3.parquet", Seq((1L, 60 * M)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val fin = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(fin == Seq((0L, 2L), (30 * M, 1L)),
      s"resume must emit [30,40) once and never re-emit [0,10): $fin")
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    // at production state sizes the in-memory HDFS-backed store OOMs;
    // RocksDB spills state to local disk. Same query, same results —
    // asserted by running the watermarked session-window aggregation
    // under the RocksDB provider and comparing with batch execution.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = runToBatch(
        StreamOps.sessionCounts(streamEvents), "complete", "rocksdb_sess_out")
      val batch = StreamOps.sessionCounts(batchEvents)
      assert(sortedRows(streamed) == sortedRows(batch))
      assert(streamed.count() > 0)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming dedup-on-ingest: within-batch and against-corpus dups dropped across batches") {
    val src = Files.createTempDirectory("graft_sdedup_src")
    val corpus = Files.createTempDirectory("graft_sdedup_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val b = "catalyst rewrites logical plans into physical operators using cost based and rule based passes"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    // one flat FILE per micro-batch (file source batches by new files)
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_sdedup_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    writeBatch("b1", Seq((1L, a), (2L, "a " + a), (3L, b)))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try {
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(after1.toSeq == Seq(1L, 3L), "within-batch near-dup 2 dropped")
      // batch 2: near-dup of already-ingested doc 1 + a fresh doc
      writeBatch("b2", Seq((4L, a + " now"), (5L, c)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(after2.toSeq == Seq(1L, 3L, 5L), "cross-batch dup 4 dropped, fresh 5 kept")
      // batch 3: accepted ids are immutable — re-delivering id 3 with
      // different text is dropped as a duplicate (idempotent re-delivery)
      writeBatch("b3", Seq((3L, c + " reworded beyond recognition")))
      q.processAllAvailable()
      val after3 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(after3.toSeq == Seq(1L, 3L, 5L), "re-used id 3 dropped")
      // signature sidecar tracks the corpus exactly
      val sig = spark.read.parquet(corpus + "_sig").select("_id").as[Long].collect().sorted
      assert(sig.toSeq == Seq(1L, 3L, 5L), "sidecar ids == corpus ids")
    } finally q.stop()
  }

  test("streaming IVM: the maintained view equals the batch aggregation after every micro-batch") {
    val src = Files.createTempDirectory("graft_sivm_src")
    val store = Files.createTempDirectory("graft_sivm").toString + "/view"
    def writeBatch(name: String, rows: Seq[(String, Long)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_sivm_$name")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    writeBatch("b1", Seq(("a", 1L), ("a", 2L), ("b", 10L)))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("k", StringType), StructField("v", LongType))))
      .parquet(src.toString)
    val q = StreamOps.ivmIngest(stream, store, Seq("k"), Seq("v"), nBuckets = 4)
      .start()
    try {
      q.processAllAvailable()
      def view() = graft.operators.Ivm.read(spark, store)
        .select(col("k"), col("cnt"), col("sum_v"))
        .as[(String, Long, Long)].collect().toSet
      assert(view() == Set(("a", 2L, 3L), ("b", 1L, 10L)))
      writeBatch("b2", Seq(("a", 4L), ("c", 7L)))
      q.processAllAvailable()
      assert(view() == Set(("a", 3L, 7L), ("b", 1L, 10L), ("c", 1L, 7L)))
    } finally q.stop()
  }

  test("streaming WARC ingest: shards stream through warcRecords -> Html -> dedupedIngest") {
    import graft.sources.{Html, Warc}
    val src = Files.createTempDirectory("graft_swarc_src")
    val corpus = Files.createTempDirectory("graft_swarc_corpus").toString + "/webcorpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val b = "catalyst rewrites logical plans into physical operators using cost based and rule based passes"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    def page(body: String) =
      s"<html><head><title>t</title><script>var x=1;</script></head><body><p>$body</p></body></html>"
    def shard(name: String, pages: Seq[(Long, String)], gz: Boolean): Unit = {
      val recs = pages.map { case (id, body) =>
        Warc.httpResponseRecord(s"http://ex.com/p/$id", page(body).getBytes("UTF-8"))
      }
      Files.write(Paths.get(s"$src/$name"), Warc.archive(recs, gzipPerRecord = gz))
    }
    // batch 1: a page, its near-dup (one extra word), an unrelated page
    shard("s1.warc.gz", Seq((1L, a), (2L, "a " + a), (3L, b)), gz = true)
    // the streaming binaryFile source wants its (fixed) schema stated
    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    val stream = graft.operators.Ingest.warcRecords(
      spark.readStream.format("binaryFile").schema(binSchema).load(src.toString))
    val textOf = udf((block: Array[Byte]) =>
      Html.toText(new String(Warc.httpBody(block), "UTF-8")))
    val docs = stream.filter($"warc_type" === "response")
      .select(regexp_extract($"target_uri", "(\\d+)$", 1).cast("long").as("doc_id"),
        textOf($"content").as("text"))
    val q = StreamOps.dedupedIngest(docs, corpus).start()
    try {
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(after1.toSeq == Seq(1L, 3L), "near-dup page 2 dropped within the batch")
      // the stored text is the EXTRACTED text (title + body line), not markup
      val stored = spark.read.parquet(corpus).filter($"doc_id" === 1L)
        .select("text").as[String].head()
      assert(stored == s"t\n$a", stored)
      // batch 2 (PLAIN warc this time): cross-batch near-dup + fresh page
      shard("s2.warc", Seq((4L, a + " now"), (5L, c)), gz = false)
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(after2.toSeq == Seq(1L, 3L, 5L), "cross-batch dup 4 dropped, fresh 5 kept")
    } finally q.stop()
  }

  test("streaming IMAGE dedup-on-ingest: dHash near-dups dropped, undecodable accepted") {
    import graft.operators.{Dedup, Multimodal}
    val src = Files.createTempDirectory("graft_simg_src")
    val corpus = Files.createTempDirectory("graft_simg_corpus").toString + "/imgcorpus"
    def blocky(seed: Long, flip: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (Dedup.splitmix64(seed ^ (x / 8 * 31 + y / 8).toLong) >>> 56).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      for (i <- 0 until flip) img.setRGB(i % 64, (i * 7) % 64, 0xFFFFFF)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    def writeBatch(name: String, rows: Seq[(Long, Array[Byte])]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_simg_$name")
      rows.toDF("img_id", "blob").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    // batch 1: A, near-copy of A (within-batch drop), unrelated B
    writeBatch("b1", Seq((1L, blocky(1L, 0)), (2L, blocky(1L, 12)), (3L, blocky(50L, 0))))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("img_id", LongType), StructField("blob", BinaryType))))
      .parquet(src.toString)
    val q = StreamOps.imageDedupedIngest(stream, corpus).start()
    try {
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
      assert(after1.toSeq == Seq(1L, 3L), "within-batch perceptual dup 2 dropped")
      // batch 2: near-copy of accepted A (drop), fresh C, undecodable D (accept)
      writeBatch("b2", Seq((4L, blocky(1L, 10)), (5L, blocky(99L, 0)),
        (6L, "not an image".getBytes)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
      assert(after2.toSeq == Seq(1L, 3L, 5L, 6L),
        "cross-batch dup 4 dropped; fresh 5 and undecodable 6 accepted")
      // batch 3: re-delivered accepted id drops regardless of content
      writeBatch("b3", Seq((3L, blocky(777L, 0))))
      q.processAllAvailable()
      val after3 = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
      assert(after3.toSeq == Seq(1L, 3L, 5L, 6L), "re-used id 3 dropped")
      // the signature column IS the sidecar: stored sigs match recomputed
      val stored = spark.read.parquet(corpus)
        .select($"img_id", $"_sig", Multimodal.dHashCol($"blob").as("_re"))
        .collect()
      stored.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2) &&
          (r.isNullAt(1) || r.getLong(1) == r.getLong(2)),
          s"stored sig diverged for id ${r.getLong(0)}")
      }
    } finally q.stop()
  }

  test("streaming IMAGE dedup via persisted Hamming index: same accept/drop sets, pruned probes") {
    import graft.operators.{Ann, Dedup, Multimodal}
    val src = Files.createTempDirectory("graft_simgidx_src")
    val corpus = Files.createTempDirectory("graft_simgidx_corpus").toString + "/imgcorpus"
    val index = corpus + "_hidx"
    def blocky(seed: Long, flip: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (Dedup.splitmix64(seed ^ (x / 8 * 31 + y / 8).toLong) >>> 56).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      for (i <- 0 until flip) img.setRGB(i % 64, (i * 7) % 64, 0xFFFFFF)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    def writeBatch(name: String, rows: Seq[(Long, Array[Byte])]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_simgidx_$name")
      rows.toDF("img_id", "blob").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    // the same three batches as the corpus-scan variant's test — the
    // indexed op must produce the IDENTICAL accept/drop sets
    writeBatch("b1", Seq((1L, blocky(1L, 0)), (2L, blocky(1L, 12)), (3L, blocky(50L, 0))))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("img_id", LongType), StructField("blob", BinaryType))))
      .parquet(src.toString)
    val q = StreamOps.imageDedupedIngestIndexed(stream, corpus, index).start()
    try {
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
      assert(after1.toSeq == Seq(1L, 3L), "within-batch perceptual dup 2 dropped")
      writeBatch("b2", Seq((4L, blocky(1L, 10)), (5L, blocky(99L, 0)),
        (6L, "not an image".getBytes)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
      assert(after2.toSeq == Seq(1L, 3L, 5L, 6L),
        "cross-batch dup 4 dropped; fresh 5 and undecodable 6 accepted")
      writeBatch("b3", Seq((3L, blocky(777L, 0))))
      q.processAllAvailable()
      val after3 = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
      assert(after3.toSeq == Seq(1L, 3L, 5L, 6L), "re-used id 3 dropped")
    } finally q.stop()
    // the signature probe must reach the index scan as a PARTITION
    // filter (static pruning), and find the accepted near-neighbour
    val probeBatch = Seq((100L, blocky(1L, 10))).toDF("img_id", "blob")
      .select($"img_id", Multimodal.dHashCol($"blob").as("_sig"))
    val matches = Ann.probeHammingIndex(spark, index, probeBatch, "_sig", "img_id",
      maxDist = 8)
    val plan = matches.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_band".r.findFirstIn(plan).isDefined,
      s"probe did not prune partitions:\n$plan")
    assert(matches.select($"_hid").as[Long].collect().toSet == Set(1L))
    // id probe prunes the same way and sees exactly the accepted ids
    val idProbe = Ann.probeHammingIndexIds(spark, index,
      Seq(1L, 6L, 999L).toDF("img_id"), "img_id")
    assert("PartitionFilters: \\[[^\\]]*_band".r
      .findFirstIn(idProbe.queryExecution.executedPlan.toString).isDefined)
    assert(idProbe.as[Long].collect().sorted.toSeq == Seq(1L, 6L),
      "undecodable id 6 present via its id row; unknown 999 absent")
    // BOOTSTRAP: an existing corpus without an index (built by the
    // corpus-scan variant) gets one on first batch, then behaves the same
    val src2 = Files.createTempDirectory("graft_simgidx_src2")
    val corpus2 = Files.createTempDirectory("graft_simgidx_c2").toString + "/imgcorpus"
    val index2 = corpus2 + "_hidx"
    def writeBatch2(name: String, rows: Seq[(Long, Array[Byte])]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_simgidx2_$name")
      rows.toDF("img_id", "blob").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src2/$name.parquet"))
    }
    // corpus2 seeded by the UNINDEXED op
    writeBatch2("b1", Seq((1L, blocky(1L, 0)), (3L, blocky(50L, 0))))
    val stream2a = spark.readStream
      .schema(StructType(Seq(StructField("img_id", LongType), StructField("blob", BinaryType))))
      .parquet(src2.toString)
    val qa = StreamOps.imageDedupedIngest(stream2a, corpus2).start()
    try qa.processAllAvailable() finally qa.stop()
    assert(!new java.io.File(index2).exists())
    // switch to the indexed op: batch 2 must bootstrap the index and
    // still drop the near-copy of accepted id 1
    writeBatch2("b2", Seq((4L, blocky(1L, 10)), (5L, blocky(99L, 0))))
    val stream2b = spark.readStream
      .schema(StructType(Seq(StructField("img_id", LongType), StructField("blob", BinaryType))))
      .parquet(src2.toString)
    val qb = StreamOps.imageDedupedIngestIndexed(stream2b, corpus2, index2).start()
    try qb.processAllAvailable() finally qb.stop()
    val after2b = spark.read.parquet(corpus2).select("img_id").as[Long].collect().sorted
    assert(after2b.toSeq == Seq(1L, 3L, 5L), "bootstrap: dup 4 dropped, fresh 5 kept")
    assert(new java.io.File(index2).exists(), "index bootstrapped from corpus")
  }

  test("Hamming index compaction: small files merge, rows and probes unchanged") {
    import graft.operators.Ann
    import scala.jdk.CollectionConverters._
    val path = Files.createTempDirectory("graft_hidx_compact").toString + "/hidx"
    // six micro-batch-style appends: small-int signatures put every
    // high band's value at 0, so those (band, bucket=0) directories
    // accumulate one parquet file PER APPEND — the exact streaming
    // small-file shape compaction exists for
    (0 until 6).foreach { b =>
      val rows = Seq((b * 10L, b.toLong), (b * 10L + 1L, b.toLong + 100L))
      Ann.appendHammingIndexWithIds(rows.toDF("img_id", "_sig"),
        "_sig", "img_id", path, maxDist = 8)
    }
    def partFiles(): Seq[java.nio.file.Path] =
      java.nio.file.Files.walk(Paths.get(path)).iterator.asScala.filter { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      }.toSeq
    def indexRows(): Seq[(Long, Long, Long, Int, Int)] =
      spark.read.parquet(path)
        .select($"_hid", $"_hsig", $"_bv", $"_band", $"_bkt")
        .as[(Long, Long, Long, Int, Int)].collect().sorted.toSeq
    def probeRows(): Seq[(Long, Long, Int)] =
      Ann.probeHammingIndex(spark, path,
          Seq((1000L, 0L), (1001L, 103L)).toDF("img_id", "_sig"),
          "_sig", "img_id", maxDist = 8)
        .as[(Long, Long, Int)].collect().sorted.toSeq
    val (filesBefore, rowsBefore, probeBefore) = (partFiles().size, indexRows(), probeRows())
    assert(filesBefore > 20, s"fixture must actually fragment (got $filesBefore files)")
    val compacted = Ann.compactHammingIndex(spark, path, minFiles = 1)
    assert(compacted > 0, "multi-file directories must be detected")
    assert(partFiles().size < filesBefore,
      s"file count must drop (was $filesBefore, now ${partFiles().size})")
    assert(indexRows() == rowsBefore, "compaction must preserve rows exactly")
    assert(probeRows() == probeBefore, "probe results must be byte-identical")
    // idempotent: a second pass at the same threshold finds single-file
    // directories only
    assert(Ann.compactHammingIndex(spark, path, minFiles = 1) == 0)
  }

  test("Hamming index compaction: a directory of zero-row files neither aborts nor loses data") {
    import graft.operators.Ann
    import scala.jdk.CollectionConverters._
    val path = Files.createTempDirectory("graft_hidx_zero").toString + "/hidx"
    (0 until 4).foreach { b =>
      val rows = Seq((b * 10L, b.toLong), (b * 10L + 1L, b.toLong + 100L))
      Ann.appendHammingIndexWithIds(rows.toDF("img_id", "_sig"),
        "_sig", "img_id", path, maxDist = 8)
    }
    // fabricate a flagged directory whose part files all hold ZERO rows
    // (a shape real streams can produce via empty micro-batch appends):
    // the compaction job emits no tmp output for it, which used to
    // FileNotFoundException out of the swap loop mid-compaction
    val leaf = java.nio.file.Files.walk(Paths.get(path)).iterator.asScala
      .find { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) && n.endsWith(".parquet") && !n.startsWith(".")
      }.get
    val emptyDir = Files.createTempDirectory("graft_hidx_emptyleaf").toString
    spark.read.parquet(leaf.toString).limit(0).coalesce(1)
      .write.mode("overwrite").parquet(emptyDir)
    val emptyLeaf = java.nio.file.Files.walk(Paths.get(emptyDir)).iterator.asScala
      .find(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).get
    val fakeDir = Paths.get(path, "_band=63", "_bkt=0")
    java.nio.file.Files.createDirectories(fakeDir)
    (0 until 4).foreach { i =>
      java.nio.file.Files.copy(emptyLeaf, fakeDir.resolve(s"part-zero-$i.parquet"))
    }
    def rows(): Seq[(Long, Long)] =
      spark.read.parquet(path).select($"_hid", $"_bv")
        .as[(Long, Long)].collect().sorted.toSeq
    val before = rows()
    // must complete the WHOLE loop (real dirs compacted), keep the
    // zero-row dir's files (no landed replacement => no deletes), and
    // preserve every row
    val compacted = Ann.compactHammingIndex(spark, path, minFiles = 1)
    assert(compacted > 0)
    assert(java.nio.file.Files.list(fakeDir).iterator.asScala.size == 4,
      "zero-row directory files must be kept, not deleted without a replacement")
    assert(rows() == before, "compaction with a zero-row directory must preserve rows")
  }

  test("Hamming index compaction: failed move-in renames keep the originals (no row loss)") {
    import graft.operators.Ann
    import scala.jdk.CollectionConverters._
    val path = Files.createTempDirectory("graft_hidx_renfail").toString + "/hidx"
    (0 until 4).foreach { b =>
      val rows = Seq((b * 10L, b.toLong), (b * 10L + 1L, b.toLong + 100L))
      Ann.appendHammingIndexWithIds(rows.toDF("img_id", "_sig"),
        "_sig", "img_id", path, maxDist = 8)
    }
    def files(): Set[String] =
      java.nio.file.Files.walk(Paths.get(path)).iterator.asScala.filter { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.toString).toSet
    def rows(): Seq[(Long, Long, Long, Int, Int)] =
      spark.read.parquet(path)
        .select($"_hid", $"_hsig", $"_bv", $"_band", $"_bkt")
        .as[(Long, Long, Long, Int, Int)].collect().sorted.toSeq
    val (filesBefore, rowsBefore) = (files(), rows())
    // run the compaction through a filesystem that fails every move-in
    // rename (the object-store dest-exists/race shape): the guard must
    // then KEEP the original files — deleting them anyway would lose
    // every flagged directory's rows
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.${CompactRenameBlockingFs.Scheme}.impl",
      classOf[CompactRenameBlockingFs].getName)
    val compacted = Ann.compactHammingIndex(spark,
      s"${CompactRenameBlockingFs.Scheme}:$path", minFiles = 1)
    assert(compacted == 0, "no directory may count as compacted when no move landed")
    assert(files() == filesBefore,
      "failed renames must leave the original files exactly in place")
    assert(rows() == rowsBefore, "rows must survive a fully-failed swap")
    // the same backlog then compacts fine on a working filesystem
    assert(Ann.compactHammingIndex(spark, path, minFiles = 1) > 0)
    assert(rows() == rowsBefore)
  }

  test("AtomicSwap: every crash state recovers without row loss (incl. mid-copy partial live)") {
    import graft.operators.AtomicSwap
    val hconf = spark.sparkContext.hadoopConfiguration
    def rows(p: String): Seq[(Long, String)] =
      spark.read.parquet(p).as[(Long, String)].collect().sorted.toSeq
    def mkState(tag: String): (String, String, Seq[(Long, String)]) = {
      val root = Files.createTempDirectory(s"graft_aswap_$tag").toString
      val live = s"$root/corpus"
      val staged = s"$root/corpus__heal"
      Seq((1L, "old row one"), (1L, "old row one"), (2L, "old row two"))
        .toDF("doc_id", "text").write.parquet(live)
      val healed = Seq((1L, "old row one"), (2L, "old row two"))
      healed.toDF("doc_id", "text").write.parquet(staged)
      (live, staged, healed)
    }
    // happy path: swapIn replaces live, sweeps staged + journal
    val (l1, s1, healed1) = mkState("ok")
    AtomicSwap.swapIn(hconf, l1, s1)
    assert(rows(l1) == healed1)
    assert(!Files.exists(Paths.get(s1)) &&
      !Files.exists(Paths.get(l1 + "__swapjournal")))
    // crash after the journal commit, before the live delete
    val (l2, s2, healed2) = mkState("j")
    Files.write(Paths.get(l2 + "__swapjournal"), "corpus__heal".getBytes("UTF-8"))
    AtomicSwap.recover(hconf, l2)
    assert(rows(l2) == healed2, "journal + complete staged: staged must win")
    assert(!Files.exists(Paths.get(s2)))
    // the OBJECT-STORE crash shape: live is a partial mid-copy remnant
    // (some files gone, no _SUCCESS trust possible) — exactly the state
    // the old exists(live) check misread as a complete corpus
    val (l3, s3, healed3) = mkState("partial")
    import scala.jdk.CollectionConverters._
    val dataFiles = Files.list(Paths.get(l3)).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    dataFiles.drop(1).foreach(Files.delete(_)) // partial delete/copy remnant
    Files.write(Paths.get(l3 + "__swapjournal"), "corpus__heal".getBytes("UTF-8"))
    AtomicSwap.recover(hconf, l3)
    assert(rows(l3) == healed3, "partial live must be replaced by staged, not trusted")
    assert(!Files.exists(Paths.get(s3)))
    // staged INCOMPLETE (no _SUCCESS) -> the promote already finished or
    // the journal is debris: live is authoritative, leftovers swept
    val (l4, s4, _) = mkState("done")
    val liveRows = rows(l4)
    Files.delete(Paths.get(s"$s4/_SUCCESS"))
    Files.write(Paths.get(l4 + "__swapjournal"), "corpus__heal".getBytes("UTF-8"))
    AtomicSwap.recover(hconf, l4)
    assert(rows(l4) == liveRows, "incomplete staged must never replace live")
    assert(!Files.exists(Paths.get(s4)) &&
      !Files.exists(Paths.get(l4 + "__swapjournal")))
    // recover with no journal is a no-op
    AtomicSwap.recover(hconf, l4)
    assert(rows(l4) == liveRows)
  }

  test("AtomicSwap: promote lands by copy where the directory rename is refused (object-store shape)") {
    import graft.operators.AtomicSwap
    val root = Files.createTempDirectory("graft_aswap_norename").toString + "/d"
    Files.createDirectories(Paths.get(root))
    val live = s"$root/corpus"
    val staged = s"$root/corpus__heal"
    Seq((1L, "old")).toDF("doc_id", "text").write.parquet(live)
    Seq((1L, "old"), (2L, "new")).toDF("doc_id", "text").write.parquet(staged)
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.${DirRenameBlockingFs.Scheme}.impl", classOf[DirRenameBlockingFs].getName)
    try {
      DirRenameBlockingFs.failDstName.set("corpus")
      AtomicSwap.swapIn(spark.sparkContext.hadoopConfiguration,
        s"${DirRenameBlockingFs.Scheme}:$live", s"${DirRenameBlockingFs.Scheme}:$staged")
      assert(spark.read.parquet(live).as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "old"), (2L, "new")), "copy-path promote must preserve every row")
      assert(!Files.exists(Paths.get(staged)) &&
        !Files.exists(Paths.get(live + "__swapjournal")))
    } finally {
      DirRenameBlockingFs.failDstName.set("")
      spark.sparkContext.hadoopConfiguration.unset(s"fs.${DirRenameBlockingFs.Scheme}.impl")
    }
  }

  test("interrupted heal swap (journal committed, corpus partially gone) recovers on ingest restart") {
    val src = Files.createTempDirectory("graft_healrec_src")
    val root = Files.createTempDirectory("graft_healrec")
    val corpus = s"$root/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    // crash state mid-heal-swap: journal committed, staged heal complete,
    // live corpus already deleted (the most destructive interleaving)
    Seq((1L, a), (2L, c)).toDF("doc_id", "text").write.parquet(corpus + "__heal")
    Files.write(Paths.get(corpus + "__swapjournal"), "corpus__heal".getBytes("UTF-8"))
    // next writer lifetime: one fresh batch through dedupedIngest — its
    // open-time recovery must land the healed corpus BEFORE dedup runs,
    // so the batch's near-duplicate of doc 1 is dropped against it
    val b = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn now"
    val tmp = Files.createTempDirectory("graft_healrec_b1")
    Seq((7L, b)).toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L), "recovered corpus must hold the healed rows and drop the near-dup batch doc")
    assert(!Files.exists(Paths.get(corpus + "__swapjournal")) &&
      !Files.exists(Paths.get(corpus + "__heal")))
  }

  test("interrupted MinhashIndex rebucket swap is finished before any probe") {
    import graft.operators.{Dedup, LayoutMeta, MinhashIndex}
    val root = Files.createTempDirectory("graft_mhrebrec").toString
    val path = s"$root/mh"
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (11L, "one two three four five six seven eight nine ten eleven twelve"),
      (12L, "red orange yellow green blue indigo violet cyan magenta teal maroon navy"))
      .toDF("doc_id", "text")
    val prep = Dedup.prepareMinhash(docs, "doc_id", "text").localCheckpoint(true)
    MinhashIndex.append(prep, path) // live layout: default 64 buckets
    // staged NEW layout (8 buckets) lands as a complete sibling, then the
    // writer dies right after the journal commit — before any promote
    MinhashIndex.append(prep, path + "__rebucket", buckets = 8)
    Files.write(Paths.get(path + "__swapjournal"), "mh__rebucket".getBytes("UTF-8"))
    // first probe of the next maintenance cycle must finish the swap,
    // then answer from the NEW layout — identical membership
    val got = MinhashIndex.probeIds(spark, path,
        Seq(10L, 11L, 99L).toDF("_id"))
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 11L), s"probe after recovery: $got")
    assert(LayoutMeta.read(spark, path).get("buckets") == 8,
      "the promoted index must carry the staged layout's _META")
    assert(!Files.exists(Paths.get(path + "__swapjournal")) &&
      !Files.exists(Paths.get(path + "__rebucket")))
    assert(MinhashIndex.payloadCount(spark, path) == 3L)
  }

  test("ensureIds: null-id docs get content-hash ids, and the replay residual closes (zero duplicates)") {
    import scala.jdk.CollectionConverters._
    val src = Files.createTempDirectory("graft_ensureids_src")
    val corpus = Files.createTempDirectory("graft_ensureids").toString + "/corpus"
    val n1 = "first untitled scratch note about mountain weather patterns near the northern ridge"
    val n2 = "second untitled scratch note regarding tidal measurements along the eastern shore"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val tmp = Files.createTempDirectory("graft_ensureids_b1")
    Seq((Option(1L), a), (None: Option[Long], n1), (None: Option[Long], n2))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus, ensureIds = true).start()
    try q.processAllAvailable() finally q.stop()
    val c1 = spark.read.parquet(corpus)
    assert(c1.count() == 3 && c1.where($"doc_id".isNull).count() == 0,
      "every accepted row must carry a (possibly synthesized) id")
    val synthIds = c1.where($"text".isin(n1, n2)).select("doc_id").as[Long]
      .collect().toSet
    assert(synthIds.size == 2, "distinct contents must synthesize distinct ids")
    // the at-least-once replay state the old null-id residual leaked
    // through: corpus AND sidecar double-appended (crash between the
    // sink writes and the ledger commit, batch re-delivered). With
    // synthesized ids the heal's id-uniqueness invariant now covers the
    // former null-id rows too — the restart collapses them.
    def dataFiles(p: String): Seq[java.nio.file.Path] =
      Files.list(Paths.get(p)).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    dataFiles(corpus).foreach(f =>
      Files.copy(f, f.resolveSibling("replay-" + f.getFileName)))
    dataFiles(corpus + "_sig").foreach(f =>
      Files.copy(f, f.resolveSibling("replay-" + f.getFileName)))
    assert(spark.read.parquet(corpus).count() == 6) // the damage is real
    // fresh writer lifetime (restart): first batch verifies + heals
    val b = "entirely fresh prose concerning barometric drift across alpine passes this season"
    val tmp2 = Files.createTempDirectory("graft_ensureids_b2")
    Seq((Option(9L), b)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = Files.list(tmp2).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part2, Paths.get(s"$src/b2.parquet"))
    val q2 = StreamOps.dedupedIngest(stream, corpus, ensureIds = true).start()
    try q2.processAllAvailable() finally q2.stop()
    val c2 = spark.read.parquet(corpus)
    assert(c2.count() == 4, s"zero duplicates after heal: ${c2.count()}")
    assert(c2.select("doc_id").distinct().count() == 4)
    assert(c2.where($"doc_id".isNull).count() == 0)
    // re-delivering one of the formerly-null docs later is id reuse ->
    // dropped (content-hash identity is stable across batches)
    val tmp3 = Files.createTempDirectory("graft_ensureids_b3")
    Seq((None: Option[Long], n1)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp3.toString)
    val part3 = Files.list(tmp3).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part3, Paths.get(s"$src/b3.parquet"))
    val q3 = StreamOps.dedupedIngest(stream, corpus, ensureIds = true).start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(corpus).count() == 4,
      "same-content null-id redelivery must be dropped as id reuse")
  }

  test("heal preserves several legitimate null-id docs and keeps the census in sync") {
    val src = Files.createTempDirectory("graft_snullheal_src")
    val corpus = Files.createTempDirectory("graft_snullheal_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    // corpus state an at-least-once retry leaves behind: doc 1 double-
    // appended, PLUS two legitimate null-id docs (every dedup anti-join
    // deliberately accepts null ids, so several can coexist)
    val dup = Seq((Option(1L), a)).toDF("doc_id", "text")
    dup.write.mode("append").parquet(corpus)
    dup.write.mode("append").parquet(corpus)
    val nulls = Seq((None: Option[Long], "first untitled scratch note about mountain weather"),
        (None: Option[Long], "second untitled scratch note regarding tidal measurements"))
      .toDF("doc_id", "text")
    nulls.write.mode("append").parquet(corpus)
    val sig = graft.operators.Dedup.prepareMinhash(dup, "doc_id", "text")
    sig.write.mode("append").parquet(corpus + "_sig")
    sig.write.mode("append").parquet(corpus + "_sig")
    graft.operators.Dedup.prepareMinhash(nulls, "doc_id", "text")
      .write.mode("append").parquet(corpus + "_sig")
    val tmp = Files.createTempDirectory("graft_snullheal_b1")
    Seq((5L, c)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try q.processAllAvailable() finally q.stop()
    // the heal collapsed the duplicate id but EVERY null-id doc survived
    val after = spark.read.parquet(corpus)
    assert(after.where($"doc_id".isNotNull).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 5L))
    assert(after.where($"doc_id".isNull).select("text").as[String]
      .collect().sorted.toSeq == Seq(
        "first untitled scratch note about mountain weather",
        "second untitled scratch note regarding tidal measurements"),
      "heal must not collapse or drop accepted null-id docs")
    // sidecar census in sync: one sig row per corpus row incl. nulls
    val sigAfter = spark.read.parquet(corpus + "_sig")
    assert(sigAfter.where($"_id".isNull).count() == 2)
    assert(sigAfter.where($"_id".isNotNull).select("_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 5L))
    // a RESTART (fresh writer => fresh verification) over the now-clean
    // state must neither heal nor rebuild: corpus and sidecar files stay
    // byte-identical in place
    import scala.jdk.CollectionConverters._
    def listing(p: String): Set[String] =
      java.nio.file.Files.walk(Paths.get(p)).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_)).map(_.toString).toSet
    val (cBefore, sBefore) = (listing(corpus), listing(corpus + "_sig"))
    val tmp2 = Files.createTempDirectory("graft_snullheal_b2")
    Seq((6L, "entirely fresh prose concerning barometric drift across alpine passes"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = Files.list(tmp2).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part2, Paths.get(s"$src/b2.parquet"))
    val q2 = StreamOps.dedupedIngest(stream, corpus).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(cBefore.subsetOf(listing(corpus)) && sBefore.subsetOf(listing(corpus + "_sig")),
      "a clean restart with null-id docs present must append, never rewrite")
    assert(spark.read.parquet(corpus).where($"doc_id".isNull).count() == 2)
  }

  test("batch-id ledger: a replayed fully-committed micro-batch is a no-op (no re-append, no heal)") {
    import scala.jdk.CollectionConverters._
    val src = Files.createTempDirectory("graft_ledger_src")
    val ckpt = Files.createTempDirectory("graft_ledger_ckpt").toString
    val corpus = Files.createTempDirectory("graft_ledger_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    val tmp = Files.createTempDirectory("graft_ledger_b1")
    Seq((1L, a), (2L, c)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    def stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    def listing(p: String): Map[String, Long] =
      java.nio.file.Files.walk(Paths.get(p)).iterator.asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
        .toMap
    assert(spark.read.parquet(corpus).count() == 2)
    val (cBefore, sBefore) = (listing(corpus), listing(corpus + "_sig"))
    // simulate the crash window: the sink writes landed (and the batch
    // ledger committed) but the CHECKPOINT commit for the batch did
    // not — dropping the newest commits/ entry makes the restarted
    // query re-deliver the same micro-batch with the same batchId
    val commits = Paths.get(ckpt, "commits")
    val newest = Files.list(commits).iterator.asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(newest)
    // drop the local-FS checksum sidecar too, or the restarted query's
    // re-commit rename fails on the stale .crc
    Files.deleteIfExists(newest.resolveSibling("." + newest.getFileName + ".crc"))
    val q2 = StreamOps.dedupedIngest(stream, corpus)
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    // the replay must be a detected NO-OP: corpus and sidecar files
    // unchanged in place (no re-append, no heal rewrite), counts flat
    assert(listing(corpus) == cBefore,
      "replayed committed batch must not append or rewrite the corpus")
    assert(listing(corpus + "_sig") == sBefore,
      "replayed committed batch must not touch the sidecar")
    assert(spark.read.parquet(corpus).count() == 2)
    // and a genuinely NEW batch still flows through the same query
    val tmp2 = Files.createTempDirectory("graft_ledger_b2")
    Seq((3L, "entirely fresh prose concerning barometric drift across alpine passes"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = Files.list(tmp2).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part2, Paths.get(s"$src/b2.parquet"))
    val q3 = StreamOps.dedupedIngest(stream, corpus)
      .option("checkpointLocation", ckpt).start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("indexed image dedup heals an index that missed a corpus append (crash between jobs)") {
    import graft.operators.{Dedup, Multimodal}
    val src = Files.createTempDirectory("graft_simgheal_src")
    val corpus = Files.createTempDirectory("graft_simgheal_corpus").toString + "/imgcorpus"
    val index = corpus + "_hidx"
    def blocky(seed: Long, flip: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (Dedup.splitmix64(seed ^ (x / 8 * 31 + y / 8).toLong) >>> 56).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      for (i <- 0 until flip) img.setRGB(i % 64, (i * 7) % 64, 0xFFFFFF)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    def writeBatch(name: String, rows: Seq[(Long, Array[Byte])]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_simgheal_$name")
      rows.toDF("img_id", "blob").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    writeBatch("b1", Seq((1L, blocky(1L, 0))))
    val mkStream = () => spark.readStream
      .schema(StructType(Seq(StructField("img_id", LongType), StructField("blob", BinaryType))))
      .parquet(src.toString)
    val q1 = StreamOps.imageDedupedIngestIndexed(mkStream(), corpus, index).start()
    try q1.processAllAvailable() finally q1.stop()
    // simulate the crash window the ADVICE flagged: a corpus append that
    // completed whose index append did not — row 7 exists in the corpus
    // only, so its signature bands are missing from the index
    Seq((7L, blocky(500L, 0))).toDF("img_id", "blob")
      .select($"img_id", $"blob", Multimodal.dHashCol($"blob").as("_sig"))
      .write.mode("append").parquet(corpus)
    // next run: batch starts by reconciling corpus count (2) vs the
    // index's id-band count (1) -> index rebuilt -> the near-copy of
    // orphaned row 7 is DROPPED and 7's id is immutable again
    writeBatch("b2", Seq((8L, blocky(500L, 10)), (9L, blocky(900L, 0))))
    val q2 = StreamOps.imageDedupedIngestIndexed(mkStream(), corpus, index).start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(corpus).select("img_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 7L, 9L),
      "near-dup 8 of the orphaned corpus row must drop after the heal")
    val idBandN = spark.read.parquet(index).filter($"_band" === -1)
      .select("_hid").distinct().count()
    assert(idBandN == 3L, "healed index covers every corpus row's id")
  }

  test("dedup-on-ingest heals a double-appended corpus (at-least-once retry)") {
    val src = Files.createTempDirectory("graft_sheal_src")
    val corpus = Files.createTempDirectory("graft_sheal_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    // simulate a retried foreachBatch that appended the same accepted
    // rows to BOTH corpus and sidecar twice: raw counts stay equal, so
    // a count-based freshness check would accept the corrupt state
    val rows = Seq((1L, a)).toDF("doc_id", "text")
    rows.write.mode("append").parquet(corpus)
    rows.write.mode("append").parquet(corpus)
    val sig = graft.operators.Dedup.prepareMinhash(rows, "doc_id", "text")
    sig.write.mode("append").parquet(corpus + "_sig")
    sig.write.mode("append").parquet(corpus + "_sig")
    assert(spark.read.parquet(corpus).count() == 2)
    val tmp = Files.createTempDirectory("graft_sheal_b1")
    Seq((2L, a + " again"), (3L, c)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L), "dup rows healed, near-dup 2 dropped, fresh 3 kept")
      val sigIds = spark.read.parquet(corpus + "_sig").select("_id").as[Long].collect().sorted
      assert(sigIds.toSeq == Seq(1L, 3L), "sidecar healed to unique ids matching corpus")
    } finally q.stop()
  }

  test("dedup-on-ingest rebuilds a sidecar whose id SET diverged at equal cardinality") {
    val src = Files.createTempDirectory("graft_sset_src")
    val corpus = Files.createTempDirectory("graft_sset_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    Seq((1L, a), (3L, c)).toDF("doc_id", "text").write.mode("append").parquet(corpus)
    // diverged sidecar with the SAME cardinality (2): holds ids {1, 4}
    // instead of {1, 3} — a count-based freshness check accepts it, and
    // then (a) corpus doc 3 is never deduped against and (b) batch id 4
    // is wrongly treated as already-accepted
    graft.operators.Dedup.prepareMinhash(
      Seq((1L, a), (4L, "completely unrelated placeholder signature row")).toDF("doc_id", "text"),
      "doc_id", "text").write.mode("overwrite").parquet(corpus + "_sig")
    val tmp = Files.createTempDirectory("graft_sset_b1")
    Seq((4L, "fresh genuinely novel prose about alpine weather patterns and barometric drift"),
        (5L, c + " again"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L, 4L),
        "sidecar rebuilt: near-dup of 3 dropped, non-member id 4 kept")
      val sigIds = spark.read.parquet(corpus + "_sig").select("_id").as[Long].collect().sorted
      assert(sigIds.toSeq == Seq(1L, 3L, 4L), "sidecar ids == corpus ids after rebuild")
    } finally q.stop()
  }

  test("dedup-on-ingest finishes an interrupted heal swap (corpus absent, heal dir complete)") {
    val src = Files.createTempDirectory("graft_sswap_src")
    val corpus = Files.createTempDirectory("graft_sswap_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    // simulate a crash between the heal swap's two renames: the corpus
    // dir is gone, the completed healed copy (with _SUCCESS) remains
    val rows = Seq((1L, a)).toDF("doc_id", "text")
    rows.coalesce(1).write.mode("overwrite").parquet(corpus + "__heal")
    assert(Files.exists(Paths.get(corpus + "__heal/_SUCCESS")))
    graft.operators.Dedup.prepareMinhash(rows, "doc_id", "text")
      .write.mode("overwrite").parquet(corpus + "_sig")
    val tmp = Files.createTempDirectory("graft_sswap_b1")
    Seq((2L, a + " again"), (3L, c)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L),
        "recovered corpus gates dedup: near-dup 2 dropped, fresh 3 kept")
      assert(!Files.exists(Paths.get(corpus + "__heal")), "heal dir cleaned up")
    } finally q.stop()
  }

  test("dedup-on-ingest recovers a swap interrupted BETWEEN the two renames (trash present)") {
    val src = Files.createTempDirectory("graft_strash_src")
    val corpus = Files.createTempDirectory("graft_strash_corpus").toString + "/corpus"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    // crash window: corpus was renamed to __trash (rename #1 done), the
    // healed copy was NOT yet renamed into place (rename #2 pending) —
    // both sibling dirs exist, the corpus dir itself is absent
    val dupRows = Seq((1L, a), (1L, a)).toDF("doc_id", "text")
    dupRows.coalesce(1).write.mode("overwrite").parquet(corpus + "__trash")
    val healed = Seq((1L, a)).toDF("doc_id", "text")
    healed.coalesce(1).write.mode("overwrite").parquet(corpus + "__heal")
    assert(Files.exists(Paths.get(corpus + "__heal/_SUCCESS")))
    graft.operators.Dedup.prepareMinhash(healed, "doc_id", "text")
      .write.mode("overwrite").parquet(corpus + "_sig")
    val tmp = Files.createTempDirectory("graft_strash_b1")
    Seq((2L, a + " again"), (3L, c)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.copy(part, Paths.get(s"$src/b1.parquet"))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    val q = StreamOps.dedupedIngest(stream, corpus).start()
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L),
        "healed corpus swapped in and gates dedup: near-dup 2 dropped, fresh 3 kept")
      assert(!Files.exists(Paths.get(corpus + "__trash")), "trash dir cleaned up")
      assert(!Files.exists(Paths.get(corpus + "__heal")), "heal dir cleaned up")
    } finally q.stop()
  }

  test("streaming TEXT dedup via persisted MinHash index: accept sets equal the sidecar variant, probes prune") {
    import graft.operators.{Dedup, MinhashIndex}
    val srcI = Files.createTempDirectory("graft_stidx_srcI")
    val srcS = Files.createTempDirectory("graft_stidx_srcS")
    val corpusI = Files.createTempDirectory("graft_stidx_cI").toString + "/corpus"
    val corpusS = Files.createTempDirectory("graft_stidx_cS").toString + "/corpus"
    val index = corpusI + "_midx"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val b = "catalyst rewrites logical plans into physical operators using cost based and rule based passes"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    val d = "structured streaming treats a stream as an unbounded table processed by repeated incremental batch queries"
    def writeBatch(src: java.nio.file.Path, name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_stidx_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    def mkStream(src: java.nio.file.Path) = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    // within-batch dup 2; cross-batch dup 4; null-text 6 always accepts;
    // re-used id 3 drops; 7 near-dups accepted 3; 8 fresh
    val batches = Seq(
      ("b1", Seq((1L, a), (2L, "a " + a), (3L, b))),
      ("b2", Seq((4L, a + " now"), (5L, c), (6L, null: String))),
      ("b3", Seq((3L, c + " reworded beyond recognition"), (7L, "b " + b), (8L, d))))
    for ((name, rows) <- batches) {
      writeBatch(srcI, name, rows); writeBatch(srcS, name, rows)
      val qi = StreamOps.dedupedIngestIndexed(mkStream(srcI), corpusI, index).start()
      try qi.processAllAvailable() finally qi.stop()
      val qs = StreamOps.dedupedIngest(mkStream(srcS), corpusS).start()
      try qs.processAllAvailable() finally qs.stop()
      val idsI = spark.read.parquet(corpusI).select("doc_id").as[Long].collect().sorted.toSeq
      val idsS = spark.read.parquet(corpusS).select("doc_id").as[Long].collect().sorted.toSeq
      assert(idsI == idsS, s"after $name: indexed=$idsI sidecar=$idsS must be identical")
    }
    val finalIds = spark.read.parquet(corpusI).select("doc_id").as[Long].collect().sorted.toSeq
    assert(finalIds == Seq(1L, 3L, 5L, 6L, 8L))
    // one payload row per corpus row (the reconciliation census)
    assert(MinhashIndex.payloadCount(spark, index) == 5L)
    // the band probe must reach the index scans as PARTITION filters
    // (static pruning) and find the accepted near-neighbour of doc 1
    val prep = Dedup.prepareMinhash(
      Seq((100L, a + " probe")).toDF("doc_id", "text"), "doc_id", "text")
    val dr = MinhashIndex.drops(spark, index, prep)
    val plan = dr.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_band".r.findFirstIn(plan).isDefined,
      s"band probe did not prune partitions:\n$plan")
    assert(dr.select($"_drop").as[Long].collect().toSeq == Seq(100L))
    // id probe prunes the same way and sees exactly the accepted ids
    val idProbe = MinhashIndex.probeIds(spark, index,
      Seq(1L, 6L, 999L).toDF("_id"))
    assert("PartitionFilters: \\[[^\\]]*_band".r
      .findFirstIn(idProbe.queryExecution.executedPlan.toString).isDefined)
    assert(idProbe.as[Long].collect().sorted.toSeq == Seq(1L, 6L),
      "null-text id 6 present via its payload row; unknown 999 absent")
  }

  test("MinhashIndex rebucket: probes and payload census identical across the rewrite") {
    import graft.operators.{Dedup, MinhashIndex}
    val path = Files.createTempDirectory("graft_mi_rebucket").toString + "/idx"
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"),
      (2L, "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"),
      (3L, "completely different prose about alpine barometric drift and seasonal wind patterns"))
      .toDF("doc_id", "text")
    MinhashIndex.append(Dedup.prepareMinhash(docs, "doc_id", "text"), path, buckets = 8)
    // a batch holding a near-dup of doc 1 and a fresh doc
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn"),
      (11L, "novel content regarding tidal measurement instrumentation calibration"))
      .toDF("doc_id", "text")
    val prep = Dedup.prepareMinhash(batch, "doc_id", "text")
    def dropsNow(): Seq[Long] = MinhashIndex.drops(spark, path, prep)
      .select("_drop").as[Long].collect().sorted.toSeq
    def takenNow(): Seq[Long] = MinhashIndex.probeIds(spark, path,
      Seq(1L, 2L, 3L, 99L).toDF("_id")).as[Long].collect().sorted.toSeq
    val (dropsBefore, takenBefore, censusBefore) =
      (dropsNow(), takenNow(), MinhashIndex.payloadCount(spark, path))
    assert(dropsBefore == Seq(10L) && takenBefore == Seq(1L, 2L, 3L))
    MinhashIndex.rebucket(spark, path, 32)
    // probes resolve the NEW layout from _META and answer identically
    assert(dropsNow() == dropsBefore, "drop set must survive the rebucket")
    assert(takenNow() == takenBefore, "id census must survive the rebucket")
    assert(MinhashIndex.payloadCount(spark, path) == censusBefore,
      "reconciliation census must be unaffected")
    // the old bucket count is now an explicit mismatch
    intercept[IllegalArgumentException] {
      MinhashIndex.probeIds(spark, path, Seq(1L).toDF("_id"), buckets = 8)
    }
    // appends continue against the new layout; probes see both eras
    MinhashIndex.append(Dedup.prepareMinhash(
      Seq((4L, "yet more unrelated text about harbor logistics throughput")).toDF("doc_id", "text"),
      "doc_id", "text"), path)
    assert(MinhashIndex.probeIds(spark, path, Seq(1L, 4L).toDF("_id"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // no-op shortcut: same count leaves the index untouched
    MinhashIndex.rebucket(spark, path, 32)
    assert(MinhashIndex.payloadCount(spark, path) == censusBefore + 1)
  }

  test("MinhashIndex.drops tolerates crash-duplicated index rows (census not inflated)") {
    import graft.operators.{Dedup, MinhashIndex}
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val b = "catalyst rewrites logical plans into physical operators using cost based and rule based passes"
    val dir = Files.createTempDirectory("graft_midx_dup").toString + "/midx"
    val prep = Dedup.prepareMinhash(Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      "doc_id", "text")
    MinhashIndex.append(prep, dir)
    MinhashIndex.append(prep, dir) // double append == compact-crash duplicates
    val batchPrep = Dedup.prepareMinhash(
      Seq((100L, "a " + a)).toDF("doc_id", "text"), "doc_id", "text")
    // maxBucketSize = 2: an inflated census (1 batch + 2 corpus copies)
    // would read 3 > 2 and silently valve the real near-dup bucket out
    val drops = MinhashIndex.drops(spark, dir, batchPrep, maxBucketSize = 2)
    assert(drops.select($"_drop").as[Long].collect().toSeq == Seq(100L),
      "near-dup must still be caught against a row-duplicated index")
  }

  test("indexed text dedup bootstraps from a sidecar corpus and heals a missed index append") {
    import graft.operators.{Dedup, MinhashIndex}
    val src = Files.createTempDirectory("graft_stheal_src")
    val corpus = Files.createTempDirectory("graft_stheal_corpus").toString + "/corpus"
    val index = corpus + "_midx"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    val b = "catalyst rewrites logical plans into physical operators using cost based and rule based passes"
    val c = "vector indexes bucket embeddings by locality sensitive hashes for sublinear similarity search"
    val d = "structured streaming treats a stream as an unbounded table processed by repeated incremental batch queries"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_stheal_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    def mkStream() = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    // corpus seeded by the UNINDEXED op — no index exists yet
    writeBatch("b1", Seq((1L, a), (3L, b)))
    val q1 = StreamOps.dedupedIngest(mkStream(), corpus).start()
    try q1.processAllAvailable() finally q1.stop()
    assert(!new java.io.File(index).exists())
    // switch to the indexed op: bootstrap the index from the corpus,
    // still drop the near-copy of accepted doc 1
    writeBatch("b2", Seq((4L, a + " now"), (5L, c)))
    val q2 = StreamOps.dedupedIngestIndexed(mkStream(), corpus, index).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L, 5L), "bootstrap: dup 4 dropped, fresh 5 kept")
    assert(new java.io.File(index).exists(), "index bootstrapped from corpus")
    // crash window: a corpus append that completed whose index append
    // did not — doc 7 exists in the corpus only
    Seq((7L, d)).toDF("doc_id", "text").write.mode("append").parquet(corpus)
    // next batch reconciles corpus count (4) vs payload census (3),
    // rebuilds, and the near-copy of orphaned doc 7 is DROPPED while
    // 7's id is immutable again
    writeBatch("b3", Seq((8L, d + " now"), (9L, "entirely fresh words about nothing else at all here")))
    val q3 = StreamOps.dedupedIngestIndexed(mkStream(), corpus, index).start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L, 5L, 7L, 9L),
      "near-dup 8 of the orphaned corpus row must drop after the heal")
    assert(MinhashIndex.payloadCount(spark, index) == 5L,
      "healed index covers every corpus row")
  }

  test("corpus compaction: files fold, rows and subsequent dedup unchanged") {
    val src = Files.createTempDirectory("graft_scomp_src")
    val corpus = Files.createTempDirectory("graft_scomp_corpus").toString + "/corpus"
    val index = corpus + "_midx"
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank at dawn today"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_scomp_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    def mkStream() = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    def corpusFiles(): Seq[String] =
      Files.list(Paths.get(corpus)).toArray.map(_.toString).toSeq
        .filter(p => p.endsWith(".parquet"))
    // four 1-row batches -> four corpus part files
    for ((name, i) <- Seq("b1", "b2", "b3", "b4").zipWithIndex) {
      writeBatch(name, Seq((i.toLong + 1L,
        s"completely distinct document number $i about topic ${"xyz" * (i + 1)} and more")))
      val q = StreamOps.dedupedIngestIndexed(mkStream(), corpus, index).start()
      try q.processAllAvailable() finally q.stop()
    }
    val before = spark.read.parquet(corpus).collect().map(_.toString).sorted.toSeq
    val nBefore = corpusFiles().size
    assert(nBefore >= 4, s"expected one file per batch, saw $nBefore")
    assert(StreamOps.compactCorpus(spark, corpus, minFiles = 2), "compaction ran")
    assert(corpusFiles().size < nBefore, "file count dropped")
    assert(spark.read.parquet(corpus).collect().map(_.toString).sorted.toSeq == before,
      "rows preserved exactly")
    assert(!StreamOps.compactCorpus(spark, corpus, minFiles = 2),
      "already compact: no rewrite")
    // row counts unchanged => reconcile sees no divergence, and the
    // compacted corpus still gates dedup: near-dup of doc 1 drops
    writeBatch("b5", Seq((50L, "a " + a), (51L, a)))
    val q5 = StreamOps.dedupedIngestIndexed(mkStream(), corpus, index).start()
    try q5.processAllAvailable() finally q5.stop()
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 50L),
      "within-batch dup 51 dropped; 50 fresh vs compacted corpus")
    // the MinHash index's (_band,_bkt) layout shares the Hamming
    // compaction: folding its per-batch files must leave probes and a
    // further ingest unchanged (payload census survives -> no rebuild)
    import graft.operators.MinhashIndex
    val censusBefore = MinhashIndex.payloadCount(spark, index)
    assert(MinhashIndex.compact(spark, index, minFiles = 1) > 0,
      "index directories compacted")
    assert(MinhashIndex.payloadCount(spark, index) == censusBefore,
      "payload census unchanged by compaction")
    writeBatch("b6", Seq((60L, a + " appended words"), (61L,
      "genuinely new content that resembles nothing accepted so far in any way")))
    val q6 = StreamOps.dedupedIngestIndexed(mkStream(), corpus, index).start()
    try q6.processAllAvailable() finally q6.stop()
    val ids6 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids6 == Seq(1L, 2L, 3L, 4L, 50L, 61L),
      "near-dup 60 of accepted 50 dropped via the compacted index; fresh 61 kept")
  }

  test("auto-compaction: indexed text ingest bounds its own corpus file count across batches") {
    val src = Files.createTempDirectory("graft_sauto_src")
    val corpus = Files.createTempDirectory("graft_sauto_corpus").toString + "/corpus"
    val index = corpus + "_midx"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_sauto_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    def mkStream() = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)
    def corpusFileCount(): Int =
      Files.list(Paths.get(corpus)).toArray.map(_.toString).count(_.endsWith(".parquet"))
    for (i <- 1 to 6) {
      writeBatch(s"b$i", Seq((i.toLong,
        s"unique document number $i discussing subject ${"zq" * i} and only that")))
      val q = StreamOps.dedupedIngestIndexed(mkStream(), corpus, index,
        autoCompactMinFiles = 2).start()
      try q.processAllAvailable() finally q.stop()
      // batch-start folding keeps the tail at <= minFiles, so after the
      // append the count never exceeds minFiles + 1
      assert(corpusFileCount() <= 3, s"after batch $i: ${corpusFileCount()} files")
    }
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
      == (1L to 6L), "every distinct doc accepted through the compactions")
  }

  test("streaming vector-index ingest: micro-batch upserts serve the head; a replayed batch is content-idempotent") {
    import graft.operators.VectorIndex
    val base = Files.createTempDirectory("graft_stream_vidx")
    val src = base.resolve("src"); Files.createDirectories(src)
    val ipath = s"$base/vidx"
    def recs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(concat(lit("v-"), $"id").as("id"),
        array($"id".cast("float"), ($"id" % 7).cast("float"),
          lit(1f), lit(2f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    def land(name: String, df: DataFrame): Unit = {
      val tmp = base.resolve(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, src.resolve(s"$name.parquet"))
    }
    land("b1", recs(0, 20))
    val stream = spark.readStream.schema(recs(0, 1).schema).parquet(src.toString)
    val q = StreamOps.vectorIndexIngest(stream, ipath, dim = 4).start()
    q.processAllAvailable()
    land("b2", recs(20, 40))
    q.processAllAvailable()
    q.stop()
    val idx = VectorIndex.open(spark, ipath)
    assert(idx.scan().count() == 40L)
    val qv = Array(31f, 3f, 1f, 2f)
    val head = idx.query(qv, 7).select("id").as[String].collect().toSeq
    assert(head.head == "v-31", s"nearest must be the exact match: $head")
    // REPLAY: a restart re-delivers batch 2 — the upsert path a replay
    // takes is by construction the same id-keyed last-write-wins
    // commit, so content is idempotent (a new version, no drift)
    val vBefore = idx.snapshots().max
    idx.upsert(recs(20, 40))
    val after = VectorIndex.open(spark, ipath)
    assert(after.scan().count() == 40L, "replay must not duplicate rows")
    assert(after.query(qv, 7).select("id").as[String].collect().toSeq == head,
      "replay must not change the served answer")
    assert(after.snapshots().max == vBefore + 1)
  }

  test("streaming vector dedup-ingest: within-batch keep-first, against-index first-seen-wins, replay drops itself") {
    import graft.operators.VectorIndex
    val base = Files.createTempDirectory("graft_stream_vdedup")
    val src = base.resolve("src"); Files.createDirectories(src)
    val ipath = s"$base/vidx"
    // toy 4-dim vectors are pairwise <= ~0.9995 cosine; exact copies
    // are ~1.0 — threshold 0.9999 flags ONLY planted copies
    def recs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(concat(lit("v-"), $"id").as("id"),
        array($"id".cast("float"), ($"id" % 7).cast("float"),
          lit(1f), lit(2f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    def copyOf(newId: String, srcId: Long) = recs(srcId, srcId + 1)
      .withColumn("id", lit(newId))
    def land(name: String, df: DataFrame): Unit = {
      val tmp = base.resolve(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, src.resolve(s"$name.parquet"))
    }
    // b1: 20 fresh + a within-batch twin pair (both copy v-100's
    // vector, absent elsewhere) — keep-first keeps w-1, drops w-2
    land("b1", recs(0, 20)
      .unionByName(copyOf("w-1", 100)).unionByName(copyOf("w-2", 100)))
    val stream = spark.readStream.schema(recs(0, 1).schema).parquet(src.toString)
    val q = StreamOps.vectorDedupIngest(stream, ipath, dim = 4,
      threshold = 0.9999, shortlist = 1 << 20).start()
    q.processAllAvailable()
    // b2: 10 fresh + an exact copy of accepted v-5 under a NEW id
    // (first-seen-wins: drops) + a re-send of v-5 itself (self-flags)
    land("b2", recs(20, 30)
      .unionByName(copyOf("dup-5", 5)).unionByName(recs(5, 6)))
    q.processAllAvailable()
    // b3: a full replay of b2's content — every row now self-flags
    land("b3", recs(20, 30)
      .unionByName(copyOf("dup-5", 5)).unionByName(recs(5, 6)))
    q.processAllAvailable()
    q.stop()
    val idx = VectorIndex.open(spark, ipath)
    val ids = idx.scan().select("id").as[String].collect().toSet
    assert(ids.size == 31, s"expected 31 accepted, got ${ids.size}")
    assert(ids == ((0 until 30).map(i => s"v-$i").toSet + "w-1"),
      s"survivor set wrong: ${ids -- (0 until 30).map(i => s"v-$i").toSet}")
    assert(!ids.contains("w-2") && !ids.contains("dup-5"))
  }

  test("vectorDedupIngestEpoch: dedup spans frozen epochs, frozen shards never written, survivors land in the active epoch only (r20)") {
    import graft.operators.VectorIndex
    val base = Files.createTempDirectory("graft_stream_vepoch")
    val src = base.resolve("src"); Files.createDirectories(src)
    def recs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(concat(lit("v-"), $"id").as("id"),
        array($"id".cast("float"), ($"id" % 7).cast("float"),
          lit(1f), lit(2f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    def copyOf(newId: String, srcId: Long) = recs(srcId, srcId + 1)
      .withColumn("id", lit(newId))
    def land(name: String, df: DataFrame): Unit = {
      val tmp = base.resolve(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, src.resolve(s"$name.parquet"))
    }
    // two FROZEN epochs: v-100..119 and v-120..139
    VectorIndex.ensure(spark, s"$base/f1", 4).upsert(recs(100, 120))
    VectorIndex.ensure(spark, s"$base/f2", 4).upsert(recs(120, 140))
    val frozenSnaps = Seq(s"$base/f1", s"$base/f2")
      .map(p => VectorIndex.open(spark, p).snapshots().max)
    // b1: 10 fresh + a copy of FROZEN epoch-1 v-110 (cross-epoch drop)
    // + a within-batch twin pair on a direction orthogonal to the
    // ray family (the v-i rays converge as i grows — a v-300 copy
    // would legitimately drop against a frozen v-107-class vector at
    // this threshold)
    def twin(newId: String) = spark.range(0, 1)
      .select(lit(newId).as("id"),
        array(lit(0f), lit(9f), lit(0f), lit(0f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    land("b1", recs(0, 10).unionByName(copyOf("dup-f1", 110))
      .unionByName(twin("w-1")).unionByName(twin("w-2")))
    val stream = spark.readStream.schema(recs(0, 1).schema).parquet(src.toString)
    val q = StreamOps.vectorDedupIngestEpoch(stream,
      Seq(s"$base/f1", s"$base/f2"), s"$base/active", dim = 4,
      threshold = 0.9999, shortlist = 1 << 20).start()
    q.processAllAvailable()
    // b2: 5 fresh + a copy of FROZEN epoch-2 v-130 + a re-send of
    // accepted v-5 (self-flags against the ACTIVE epoch)
    land("b2", recs(10, 15).unionByName(copyOf("dup-f2", 130))
      .unionByName(recs(5, 6)))
    q.processAllAvailable()
    q.stop()
    val ids = VectorIndex.open(spark, s"$base/active").scan()
      .select("id").as[String].collect().toSet
    assert(ids == ((0 until 15).map(i => s"v-$i").toSet + "w-1"),
      s"survivor set wrong: $ids")
    assert(!ids.contains("dup-f1") && !ids.contains("dup-f2") &&
      !ids.contains("w-2"))
    // frozen epochs were PROBED, never written: snapshot heads unchanged
    assert(Seq(s"$base/f1", s"$base/f2")
      .map(p => VectorIndex.open(spark, p).snapshots().max) == frozenSnaps,
      "the frozen epochs must not gain a snapshot")
    // a frozen epoch with the wrong dimension refuses at WRITER
    // CONSTRUCTION — before .start(), before any micro-batch work,
    // and even if the source would never deliver a batch
    VectorIndex.ensure(spark, s"$base/f8", 8)
      .upsert(spark.range(0, 2)
        .select(concat(lit("x-"), $"id").as("id"),
          array((0 until 8).map(j => ($"id" + j).cast("float")): _*)
            .as("values"),
          struct(lit(0).as("chunk_index"), lit("t").as("source"))
            .as("metadata")))
    val ex = intercept[IllegalArgumentException] {
      StreamOps.vectorDedupIngestEpoch(
        spark.readStream.schema(recs(0, 1).schema).parquet(src.toString),
        Seq(s"$base/f8"), s"$base/active2", dim = 4,
        threshold = 0.9999, shortlist = 1 << 20)
    }
    assert(ex.getMessage.contains("frozen epoch"), ex.getMessage)
  }

  test("vectorDedupIngest r20 pre-pass: banded candidate pairs << batch^2, twins still drop") {
    import graft.operators.VectorIndex
    val base = Files.createTempDirectory("graft_vdedup_band")
    val src = base.resolve("src"); Files.createDirectories(src)
    val ipath = s"$base/vidx"
    // 200 spread 16-dim vectors (integer-mixed coordinates, so the
    // 64-bit signatures spread too) + one planted twin pair
    def recs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(concat(lit("v-"), $"id").as("id"),
        array((0 until 16).map(j =>
          ((($"id" + 1) * lit(j * 2654435761L + 97)) % 1000)
            .cast("float")): _*).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    def copyOf(newId: String, srcId: Long) = recs(srcId, srcId + 1)
      .withColumn("id", lit(newId))
    def land(name: String, df: DataFrame): Unit = {
      val tmp = base.resolve(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, src.resolve(s"$name.parquet"))
    }
    land("b1", recs(0, 200)
      .unionByName(copyOf("w-1", 300)).unionByName(copyOf("w-2", 300)))
    val stream = spark.readStream.schema(recs(0, 1).schema).parquet(src.toString)
    val q = StreamOps.vectorDedupIngest(stream, ipath, dim = 16,
      threshold = 0.9999, shortlist = 1 << 20).start()
    q.processAllAvailable()
    q.stop()
    val n = StreamOps.lastWithinBatchRows
    val allPairs = n * (n - 1) / 2
    assert(n == 202L, s"batch rows $n")
    assert(StreamOps.lastWithinCandidatePairs < allPairs / 10,
      s"banding must cut the exact-cosine pass: " +
        s"${StreamOps.lastWithinCandidatePairs} candidates vs " +
        s"$allPairs all-pairs")
    val ids = VectorIndex.open(spark, ipath).scan()
      .select("id").as[String].collect().toSet
    assert(ids.contains("w-1") && !ids.contains("w-2"),
      "keep-first must still drop the planted twin through the pre-pass")
    // the integer-mixed fixture lands one coincidental near-dup pair
    // (v-66 against a smaller id at >= 0.9999 cosine) — the exact
    // verify may legitimately drop a handful of such rows; the planted
    // twin assertions above carry the semantics
    assert(ids.size >= 195 && ids.size <= 201,
      s"expected ~201 survivors, got ${ids.size}")
  }

  test("vectorDedupIngest r20 semantics: drops compare against ALL smaller-id rows, kept or not") {
    import graft.operators.VectorIndex
    val base = Files.createTempDirectory("graft_vdedup_chain")
    val src = base.resolve("src"); Files.createDirectories(src)
    val ipath = s"$base/vidx"
    // chain fixture: a-0 at angle 0, b-1 at 1.5deg, c-2 at 3deg —
    // cos(a,b) = cos(b,c) = cos(1.5deg) ~ 0.99966 >= 0.999;
    // cos(a,c) = cos(3deg) ~ 0.99863 < 0.999. The documented rule
    // drops BOTH b-1 (near kept a-0) and c-2 (near DROPPED b-1, which
    // still counts), even though c-2 is not near any KEPT row.
    def vecAt(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    val rows = Seq(("a-0", vecAt(0)), ("b-1", vecAt(1.5)), ("c-2", vecAt(3)))
      .toDF("id", "values")
      .select($"id", $"values",
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    val tmp = base.resolve("stage_b1")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, src.resolve("b1.parquet"))
    val stream = spark.readStream.schema(rows.schema).parquet(src.toString)
    val q = StreamOps.vectorDedupIngest(stream, ipath, dim = 4,
      threshold = 0.999, shortlist = 1 << 20).start()
    q.processAllAvailable()
    q.stop()
    val ids = VectorIndex.open(spark, ipath).scan()
      .select("id").as[String].collect().toSet
    assert(ids == Set("a-0"),
      s"transitive chain must drop b-1 AND c-2 (drops compare against " +
        s"all smaller-id rows, kept or not): $ids")
  }

  test("vectorDedupIngest valve: a micro-batch over maxBatchRows fails loudly") {
    val base = Files.createTempDirectory("graft_vdedup_valve")
    val src = base.resolve("src"); Files.createDirectories(src)
    def recs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(concat(lit("v-"), $"id").as("id"),
        array($"id".cast("float"), lit(1f), lit(2f), lit(3f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    val tmp = base.resolve("stage_b1")
    recs(0, 50).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, src.resolve("b1.parquet"))
    val stream = spark.readStream.schema(recs(0, 1).schema).parquet(src.toString)
    val q = StreamOps.vectorDedupIngest(stream, s"$base/vidx", dim = 4,
      threshold = 0.9999, maxBatchRows = 10L).start()
    val ex = intercept[Exception] { q.processAllAvailable() }
    q.stop()
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("maxBatchRows"))),
      s"valve must name maxBatchRows: ${ex.getMessage}")
  }

  test("tokenBudgetIngest: transformWithState enforces per-group token budgets across micro-batches") {
    val base = Files.createTempDirectory("graft_stream_tbi")
    val src = base.resolve("src"); Files.createDirectories(src)
    def land(name: String, rows: Seq[(String, Long, Long)]): Unit = {
      val tmp = base.resolve(s"stage_$name")
      rows.toDF("lang", "doc_id", "n_tok")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, src.resolve(s"$name.parquet"))
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      land("b1", Seq(("en", 1L, 4L), ("en", 2L, 4L), ("fr", 1L, 6L)))
      val stream = spark.readStream
        .schema("lang STRING, doc_id LONG, n_tok LONG").parquet(src.toString)
      val admitted = StreamOps.tokenBudgetIngest(stream, "lang", "doc_id",
        "n_tok", Map("en" -> 10L, "fr" -> 5L))
      val q = admitted.toDF("lang", "doc_id", "n_tok", "cum")
        .writeStream.format("memory").queryName("tbi_out")
        .outputMode("append")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .start()
      q.processAllAvailable()
      // b1: en under budget twice (4, 8); fr's first doc CROSSES the
      // budget of 5 and is admitted (the q177 crossing rule)
      val afterB1 = spark.table("tbi_out")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(afterB1 == Set(("en", 1L, 4L, 4L), ("en", 2L, 4L, 8L),
        ("fr", 1L, 6L, 6L)), s"b1 admissions wrong: $afterB1")
      // b2: en doc 3 crosses (8 < 10 -> admit at cum 12); en doc 4 and
      // fr doc 2 arrive over-budget and drop — the state REMEMBERED
      // b1's totals across the batch boundary. "de" has NO budget
      // entry: the documented zero-default admits nothing (an
      // unanticipated group must not flood the recipe)
      land("b2", Seq(("en", 3L, 4L), ("en", 4L, 1L), ("fr", 2L, 1L),
        ("de", 1L, 5L)))
      q.processAllAvailable()
      q.stop()
      val afterB2 = spark.table("tbi_out")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(afterB2 == afterB1 + (("en", 3L, 4L, 12L)),
        s"b2 admissions wrong: ${afterB2 -- afterB1}")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup within watermark drops duplicate event ids") {
    // duplicate the stream source file => every event appears twice
    val dir = Files.createTempDirectory("graft_stream_dup")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("b.parquet"))
    val stream = normTs(spark.readStream.schema(eventsSchema).parquet(dir.toString))
    val deduped = runToBatch(
      StreamOps.dedupWithinWatermark(stream), "append", "dedup_out")
    val n = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet").count()
    assert(deduped.count() == n) // not 2n
  }
}

/** Local filesystem whose move-in renames (`compact-*` destinations)
  * always FAIL — the object-store dest-exists/race shape
  * `Ann.compactHammingIndex` must survive by keeping the original
  * files. Registered per-test via `fs.<scheme>.impl`. */
class CompactRenameBlockingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = CompactRenameBlockingFs.Scheme
  override def getUri: java.net.URI =
    java.net.URI.create(s"${CompactRenameBlockingFs.Scheme}:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (dst.getName.startsWith("compact-")) false else super.rename(src, dst)
}
object CompactRenameBlockingFs { val Scheme = "blockcompact" }

/** Local filesystem that refuses the PROMOTE rename of an AtomicSwap
  * (directory renames onto the configured destination name) while
  * letting every other rename — including the single-file journal
  * commit and Spark's committer renames — pass. The selective
  * object-store shape: small-object PUTs are atomic, directory
  * "rename" is not honored. */
class DirRenameBlockingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = DirRenameBlockingFs.Scheme
  override def getUri: java.net.URI =
    java.net.URI.create(s"${DirRenameBlockingFs.Scheme}:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    val isDir = try getFileStatus(src).isDirectory catch { case _: Exception => false }
    if (isDir && dst.getName == DirRenameBlockingFs.failDstName.get()) false
    else super.rename(src, dst)
  }
}
object DirRenameBlockingFs {
  val Scheme = "blockdirrename"
  val failDstName = new java.util.concurrent.atomic.AtomicReference[String]("")
}
