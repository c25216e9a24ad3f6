package graft

import graft.operators.{InvertedIndex, KllQuantiles}
import org.scalatest.funsuite.AnyFunSuite

class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def search(df: org.apache.spark.sql.DataFrame, phrase: String*) =
    InvertedIndex.phraseSearch(
        InvertedIndex.postings(df, "doc_id", "text"), phrase)
      .as[(Long, Long)].collect().toMap

  test("phrase search finds consecutive tokens only, counts overlaps") {
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "cat the sat",                 // tokens present, order wrong
      3L -> "the dog; the cat! sat down",  // punctuation splits tokens
      4L -> "the cat the cat sat",         // phrase once, prefix twice
      5L -> "nothing relevant")
    assert(search(d, "the", "cat", "sat") ==
      Map(1L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(search(d, "the", "cat") == Map(1L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("single-token phrase is a posting-list count; case-insensitive") {
    val d = docs(1L -> "Spark SPARK spark!", 2L -> "no match here")
    assert(search(d, "Spark") == Map(1L -> 3L))
  }

  test("adjacent repeats: overlapping self-phrase counts each start") {
    val d = docs(1L -> "go go go go")
    assert(search(d, "go", "go") == Map(1L -> 3L))
  }

  test("persisted index: pruned probe matches in-memory search; PartitionFilters engage; census reconciles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_postidx").toString + "/p"
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "cat the sat",
      3L -> "the dog; the cat! sat down",
      4L -> "the cat the cat sat",
      5L -> "nothing relevant at all today")
    // incremental build: two appends must serve identically to one write
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 2), "doc_id", "text",
      dir, buckets = 16)
    InvertedIndex.appendIndex(d.filter($"doc_id" > 2), "doc_id", "text", dir)
    val got = InvertedIndex.phraseSearchIndexed(spark, dir, Seq("the", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 2L))
    assert(got == search(d, "the", "cat"))
    // the probe's scan is PARTITION-pruned to the phrase tokens'
    // bucket dirs (never a full-directory listing-and-filter)
    val probe = InvertedIndex.readPostings(spark, dir, Seq("the", "cat"))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_tbkt".r.findFirstIn(plan).isDefined,
      s"expected _tbkt partition filter in:\n$plan")
    // and the pruned read returns exactly those tokens' postings
    assert(probe.select("token").distinct().as[String].collect().toSet ==
      Set("the", "cat"))
    // census reconciliation: bucket counts sum to the corpus' postings
    val censusTotal = InvertedIndex.censusByBucket(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"n_postings")).head().getLong(0)
    val direct = InvertedIndex.postings(d, "doc_id", "text").count()
    assert(censusTotal == direct, s"census $censusTotal != corpus $direct")
    // a conflicting explicit layout guess throws instead of mispruning
    intercept[IllegalArgumentException] {
      InvertedIndex.readPostings(spark, dir, Seq("the"), buckets = 8)
    }
  }

  test("index lifecycle: compaction merges files without changing answers; erasure removes a doc's postings") {
    import org.apache.spark.sql.functions.sum
    val dir = java.nio.file.Files.createTempDirectory("graft_postlc").toString + "/p"
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "cat the sat the cat here",
      3L -> "the dog; the cat! sat down",
      4L -> "the cat the cat sat",
      5L -> "unrelated filler text")
    // many small appends -> many files per hot bucket
    InvertedIndex.writeIndex(d.filter($"doc_id" === 1), "doc_id", "text",
      dir, buckets = 4)
    (2L to 5L).foreach(i =>
      InvertedIndex.appendIndex(d.filter($"doc_id" === i), "doc_id", "text", dir))
    val before = InvertedIndex.phraseSearchIndexed(spark, dir, Seq("the", "cat"))
      .as[(Long, Long)].collect().toMap
    def files(): Int = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_tbkt=")).flatMap(_.listFiles())
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val nBefore = files()
    assert(InvertedIndex.compactIndex(spark, dir, minFiles = 1) > 0)
    assert(files() < nBefore, s"compaction must shrink file count from $nBefore")
    val after = InvertedIndex.phraseSearchIndexed(spark, dir, Seq("the", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(after == before)
    // a replayed append (crash-retry shape) cannot inflate match counts:
    // probes dedupe on the natural key
    InvertedIndex.appendIndex(d.filter($"doc_id" === 4), "doc_id", "text", dir)
    assert(InvertedIndex.phraseSearchIndexed(spark, dir, Seq("the", "cat"))
      .as[(Long, Long)].collect().toMap == before)
    // ...and the NEXT compaction removes the duplicate debris for good:
    // the census (raw row counts — its job is to see what probes hide)
    // reconciles back to exactly the corpus' postings
    InvertedIndex.compactIndex(spark, dir, minFiles = 0)
    def censusTotal(): Long = InvertedIndex.censusByBucket(spark, dir)
      .agg(sum($"n_postings")).head().getLong(0)
    assert(censusTotal() == InvertedIndex.postings(d, "doc_id", "text").count())
    // erasure: doc 4's postings vanish; the other docs are untouched
    val removed = InvertedIndex.deleteDocs(d.filter($"doc_id" === 4),
      "doc_id", "text", dir)
    assert(removed == InvertedIndex.postings(d.filter($"doc_id" === 4),
      "doc_id", "text").count())
    val erased = InvertedIndex.phraseSearchIndexed(spark, dir, Seq("the", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(erased == before - 4L)
    assert(censusTotal() == InvertedIndex.postings(
      d.filter($"doc_id" =!= 4), "doc_id", "text").count())
    // rerun is a no-op: victims are already gone
    assert(InvertedIndex.deleteDocs(d.filter($"doc_id" === 4),
      "doc_id", "text", dir) == 0L)
  }

  test("bm25 from the persisted index is bit-identical to the in-memory scorer") {
    import graft.operators.TextAnalytics
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString + "/p"
    val d = docs(
      1L -> "vector join hash vector",
      2L -> "hash hash hash join",
      3L -> "join the vector space",
      4L -> "nothing relevant here",
      5L -> "!!!", // tokenless: dl=0 must still count in N/avgdl
      6L -> "vector vector vector vector vector join")
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 3), "doc_id", "text",
      dir, buckets = 8)
    InvertedIndex.appendIndex(d.filter($"doc_id" > 3), "doc_id", "text", dir)
    def direct(df: org.apache.spark.sql.DataFrame) =
      TextAnalytics.bm25TopK(df, "doc_id", "text",
        Seq("vector", "join", "hash"), k = 10)
        .as[(Long, Double)].collect().toSeq
    def indexed() =
      InvertedIndex.bm25Search(spark, dir, Seq("vector", "join", "hash"), k = 10)
        .as[(Long, Double)].collect().toSeq
    assert(indexed() == direct(d)) // same docs, same ranks, same DOUBLES
    // a replayed append cannot skew tf, df, N or avgdl
    InvertedIndex.appendIndex(d.filter($"doc_id" === 6), "doc_id", "text", dir)
    assert(indexed() == direct(d))
    // erasure updates the sidecar too: post-delete scores match the
    // in-memory scorer over the surviving corpus (N, avgdl shrink)
    InvertedIndex.deleteDocs(d.filter($"doc_id" === 6), "doc_id", "text", dir)
    assert(indexed() == direct(d.filter($"doc_id" =!= 6)))
    // TF-IDF parity from the same index state
    assert(InvertedIndex.tfidfSearch(spark, dir,
        Seq("vector", "join", "hash"), 10).as[(Long, Double)].collect().toSeq ==
      TextAnalytics.tfidfTopK(d.filter($"doc_id" =!= 6), "doc_id", "text",
        Seq("vector", "join", "hash"), 10).as[(Long, Double)].collect().toSeq)
  }

  test("driver-side token buckets match the written layout's hash exactly") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val toks = Seq("the", "cat", "Vector", "naïve", "0", "a" * 300, "日本語")
      .map(_.toLowerCase)
    for (bk <- Seq(1, 4, 64, 1013)) {
      val viaSpark = toks.map { t =>
        spark.range(1)
          .select(pmod(xxhash64(lit(t)), lit(bk.toLong)).cast("int"))
          .head().getInt(0)
      }.distinct
      assert(InvertedIndex.tokenBuckets(toks, bk) == viaSpark,
        s"bucket mismatch at buckets=$bk")
    }
  }

  test("erasing a tokenless (dl=0) doc shrinks the sidecar: N/avgdl forget it") {
    import graft.operators.TextAnalytics
    val dir = java.nio.file.Files.createTempDirectory("graft_dl0").toString + "/p"
    val d = docs(
      1L -> "vector join hash",
      2L -> "join join vector",
      3L -> "!!!") // tokenless: no postings bucket is ever touched
    InvertedIndex.writeIndex(d, "doc_id", "text", dir, buckets = 8)
    // removing doc 3 erases ZERO postings (it has none) yet MUST still
    // rewrite the doc-length sidecar — otherwise the id leaks past a
    // right-to-be-forgotten call and indexed BM25's N keeps counting it
    assert(InvertedIndex.deleteDocs(d.filter($"doc_id" === 3),
      "doc_id", "text", dir) == 0L)
    val sidecarDocs = spark.read.parquet(dir + "/_doclens")
      .select("doc").as[Long].collect().toSet
    assert(sidecarDocs == Set(1L, 2L), s"sidecar still holds: $sidecarDocs")
    // and the indexed scorer now agrees with the in-memory scorer over
    // the SURVIVING corpus (N shrank from 3 to 2)
    assert(InvertedIndex.bm25Search(spark, dir, Seq("vector", "join"), 10)
        .as[(Long, Double)].collect().toSeq ==
      TextAnalytics.bm25TopK(d.filter($"doc_id" =!= 3), "doc_id", "text",
        Seq("vector", "join"), 10).as[(Long, Double)].collect().toSeq)
  }

  test("more-like-this: tf-idf-weighted overlap ranking, query doc excluded, brute-force equal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mlt").toString + "/p"
    val d = docs(
      1L -> "vector join hash vector index",
      2L -> "hash hash join tables",
      3L -> "join the vector space search",
      4L -> "nothing in common here at all",
      5L -> "vector vector hash join index search")
    InvertedIndex.writeIndex(d, "doc_id", "text", dir, buckets = 8)
    val q = "vector join hash vector" // qtf: vector 2, join 1, hash 1
    val got = InvertedIndex.moreLikeThis(spark, dir, q, k = 10,
      excludeDoc = Some(1L)).as[(Long, Double)].collect().toSeq
    assert(!got.exists(_._1 == 1L), "query doc must be excluded")
    // brute force: score(d) = sum_t tf_d * qtf * N/df over the query's
    // terms, summed in sorted-term order (hash, join, vector)
    val n = 5.0
    val corpus = Map(
      2L -> Map("hash" -> 2L, "join" -> 1L),
      3L -> Map("join" -> 1L, "vector" -> 1L),
      4L -> Map.empty[String, Long],
      5L -> Map("vector" -> 2L, "hash" -> 1L, "join" -> 1L))
    val dfm = Map("hash" -> 3.0, "join" -> 4.0, "vector" -> 3.0)
    val qtf = Map("hash" -> 1L, "join" -> 1L, "vector" -> 2L)
    val expect = corpus.map { case (id, tfs) =>
      id -> Seq("hash", "join", "vector").foldLeft(0.0) { (acc, t) =>
        tfs.get(t).map(tf => acc + (tf * qtf(t)).toDouble * n / dfm(t))
          .getOrElse(acc)
      }
    }.filter(_._2 > 0).toSeq.sortBy { case (id, s) => (-s, id) }
    assert(got == expect, s"got $got expected $expect")
    // determinism: a rerun returns the identical ranking and doubles
    assert(got == InvertedIndex.moreLikeThis(spark, dir, q, k = 10,
      excludeDoc = Some(1L)).as[(Long, Double)].collect().toSeq)
    intercept[IllegalArgumentException] {
      InvertedIndex.moreLikeThis(spark, dir, "!!!", 5)
    }
  }

  test("corpus-stats rollup equals the full sidecar aggregate through the whole lifecycle; compaction heals drift; fallback is exact") {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString + "/p"
    val a = docs(1L -> "alpha beta gamma", 2L -> "beta beta", 3L -> "!!!")
    val b = docs(4L -> "gamma delta epsilon zeta", 5L -> "eta")
    def stats(): (Long, Long) = {
      val r = InvertedIndex.corpusStats(spark, dir).head()
      (r.getLong(0), r.getLong(1))
    }
    def fullAgg(): (Long, Long) = {
      val r = spark.read.parquet(dir + "/_doclens").dropDuplicates("doc", "dl")
        .agg(count(lit(1)),
          coalesce(sum(col("dl").cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def statRows(): Long = spark.read.parquet(dir + "/_stats").count()
    InvertedIndex.writeIndex(a, "doc_id", "text", dir, buckets = 8)
    assert(stats() == ((3L, 5L)) && stats() == fullAgg())
    InvertedIndex.appendIndex(b, "doc_id", "text", dir)
    assert(stats() == ((5L, 10L)) && stats() == fullAgg())
    // a caller-replayed append lands a bit-identical stat row that the
    // read-side dedupe collapses — exactly as the full aggregate's
    // global (doc, dl) dedupe absorbs the replayed sidecar rows
    InvertedIndex.appendIndex(b, "doc_id", "text", dir)
    assert(stats() == ((5L, 10L)) && stats() == fullAgg())
    // erasure (incl. a dl=0 victim that touches no postings bucket)
    // nets the rollup to one consolidated row
    InvertedIndex.deleteDocs(a.filter($"doc_id".isin(2L, 3L)),
      "doc_id", "text", dir)
    assert(stats() == ((3L, 8L)) && stats() == fullAgg())
    // delete-then-re-append of IDENTICAL content: consolidation keeps
    // the fresh batch row from deduping against pre-delete history
    InvertedIndex.deleteDocs(b, "doc_id", "text", dir)
    assert(stats() == ((1L, 3L)) && stats() == fullAgg())
    InvertedIndex.appendIndex(b, "doc_id", "text", dir)
    assert(stats() == ((3L, 8L)) && stats() == fullAgg())
    // the per-query merge is O(stat rows), not O(docs)
    assert(statRows() <= 2L, s"rollup should be consolidated, ${statRows()} rows")
    // drift heal: a planted bogus row (a simulated crash-window leak)
    // is swept by the compaction-cadence rebuild from the sidecar
    Seq((123L, 100L, 1000L)).toDF("fp", "n_docs", "sum_dl")
      .write.mode("append").parquet(dir + "/_stats")
    assert(stats() != ((3L, 8L)))
    InvertedIndex.compactIndex(spark, dir, minFiles = 0)
    assert(stats() == ((3L, 8L)) && stats() == fullAgg())
    // fallback: no rollup at all → the exact full aggregate serves
    val sd = new org.apache.hadoop.fs.Path(dir + "/_stats")
    sd.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sd, true)
    assert(stats() == ((3L, 8L)))
  }

  test("an append attempted mid-compaction is refused by the writer lease, then lands cleanly after") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race").toString + "/p"
    val d = docs(
      1L -> "the cat sat",
      2L -> "the cat ran",
      3L -> "the cat hid")
    InvertedIndex.writeIndex(d.filter($"doc_id" === 1), "doc_id", "text",
      dir, buckets = 2)
    (2L to 3L).foreach(i =>
      InvertedIndex.appendIndex(d.filter($"doc_id" === i), "doc_id", "text", dir))
    val late = docs(9L -> "the cat pounced")
    // the seam fires between the staging read and the delete loop —
    // the widest window of the pre-r18 lost-file race. Through r17 the
    // snapshot-based file lists made the interleaving SURVIVABLE; the
    // r18 writer lease makes it IMPOSSIBLE: the mid-compaction append
    // is refused loudly (WriterConflict), which is the coordination
    // contract — the caller retries once the compaction releases.
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    val n = InvertedIndex.compactIndex(spark, dir, minFiles = 1,
      onAfterStage = () =>
        try InvertedIndex.appendIndex(late, "doc_id", "text", dir)
        catch { case _: graft.operators.WriterLock.WriterConflict =>
          refused.incrementAndGet(): Unit
        })
    assert(n > 0)
    assert(refused.get() > 0, "mid-compaction append must hit the lease")
    // the retry after the compaction returned (lease released) lands
    InvertedIndex.appendIndex(late, "doc_id", "text", dir)
    val all = d.union(late)
    assert(InvertedIndex.phraseSearchIndexed(spark, dir, Seq("the", "cat"))
        .as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L))
    // census (raw rows) reconciles: nothing lost, nothing doubled
    val censusTotal = InvertedIndex.censusByBucket(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"n_postings")).head().getLong(0)
    assert(censusTotal == InvertedIndex.postings(all, "doc_id", "text").count())
  }

  test("mergeIndexes: file-transport merge probes bit-identically to a full rebuild; layout/target refusals") {
    val base = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "a dog ran past the cat",
      3L -> "the mat was red",
      4L -> "cat and dog and mat")
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 2), "doc_id", "text",
      s"$base/a", buckets = 4)
    InvertedIndex.writeIndex(d.filter($"doc_id" > 2), "doc_id", "text",
      s"$base/b", buckets = 4)
    InvertedIndex.mergeIndexes(spark, s"$base/a", s"$base/b", s"$base/m")
    InvertedIndex.writeIndex(d, "doc_id", "text", s"$base/full", buckets = 4)
    // merged == full rebuild: BM25 scores (stats rollup summed right),
    // phrase counts (positions intact), corpus stats
    def bm(p: String) = InvertedIndex.bm25Search(spark, p,
        Seq("cat", "mat"), k = 10)
      .as[(Long, Double)].collect().toSet
    assert(bm(s"$base/m") == bm(s"$base/full"),
      "merged index must score bit-identically to the full rebuild")
    assert(InvertedIndex.phraseSearchIndexed(spark, s"$base/m",
        Seq("the", "cat")).as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L))
    val st = InvertedIndex.corpusStats(spark, s"$base/m")
      .as[(Long, Long)].head()
    val stFull = InvertedIndex.corpusStats(spark, s"$base/full")
      .as[(Long, Long)].head()
    assert(st == stFull, s"merged stats $st != full $stFull")
    // mismatched bucket layouts refuse loudly
    InvertedIndex.writeIndex(d.filter($"doc_id" > 2), "doc_id", "text",
      s"$base/b8", buckets = 8)
    val mism = intercept[IllegalArgumentException] {
      InvertedIndex.mergeIndexes(spark, s"$base/a", s"$base/b8", s"$base/m2")
    }
    assert(mism.getMessage.contains("layout"), mism.getMessage)
    // non-empty target refuses (merge is a create, not an append)
    intercept[IllegalArgumentException] {
      InvertedIndex.mergeIndexes(spark, s"$base/a", s"$base/b", s"$base/m")
    }
    // N-WAY merge in one pass: three single-doc shards == full rebuild
    (1 to 3).foreach { i =>
      InvertedIndex.writeIndex(d.filter($"doc_id" === i), "doc_id", "text",
        s"$base/s$i", buckets = 4)
    }
    InvertedIndex.mergeIndexes(spark,
      Seq(s"$base/s1", s"$base/s2", s"$base/s3"), s"$base/m3")
    val full3 = java.nio.file.Files.createTempDirectory("graft_m3ref")
      .toString + "/f"
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 3), "doc_id", "text",
      full3, buckets = 4)
    assert(bm(s"$base/m3") == bm(full3),
      "3-way merge must score bit-identically to the full rebuild")
    intercept[IllegalArgumentException] {
      InvertedIndex.mergeIndexes(spark, Seq(s"$base/s1"), s"$base/m4")
    }
    // OVERLAPPING doc sets refuse loudly BEFORE any byte moves, naming
    // the colliding ids (a shared doc would double-count N/avgdl in
    // the summed stats rollup and drift every merged BM25 score)
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 3), "doc_id", "text",
      s"$base/ov1", buckets = 4)
    InvertedIndex.writeIndex(d.filter($"doc_id" >= 3), "doc_id", "text",
      s"$base/ov2", buckets = 4)
    val ov = intercept[InvertedIndex.OverlappingSources] {
      InvertedIndex.mergeIndexes(spark, s"$base/ov1", s"$base/ov2",
        s"$base/mov")
    }
    assert(ov.getMessage.contains("3"), s"must name colliding id: ${ov.getMessage}")
    assert(!new java.io.File(s"$base/mov").exists() ||
      new java.io.File(s"$base/mov").listFiles().isEmpty,
      "refusal must land before any byte moves")
  }

  test("mergeIndexes transport runs as a distributed Spark job (no driver byte funnel) and holds source leases") {
    val base = java.nio.file.Files.createTempDirectory("graft_mdist").toString
    val d = docs((1L to 40L).map(i =>
      i -> s"doc$i common alpha beta token$i"): _*)
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 20), "doc_id", "text",
      s"$base/a", buckets = 4)
    InvertedIndex.writeIndex(d.filter($"doc_id" > 20), "doc_id", "text",
      s"$base/b", buckets = 4)
    // observe the transport job via its job description
    val copyTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val tracked =
        java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(j.properties.getProperty("spark.job.description"))
            .exists(_.contains("mergeIndexes transport")))
          j.stageIds.foreach(s => tracked.add(s): Unit)
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (tracked.contains(s.stageInfo.stageId))
          copyTasks.addAndGet(s.stageInfo.numTasks): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      InvertedIndex.mergeIndexes(spark, s"$base/a", s"$base/b", s"$base/m")
      // listener events are async — poll until the stage lands
      val deadline = System.nanoTime() + 30e9.toLong
      while (copyTasks.get() <= 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(copyTasks.get() > 1,
      s"transport must fan out over executors, saw ${copyTasks.get()} tasks")
    // transported index serves identically to a full rebuild
    InvertedIndex.writeIndex(d, "doc_id", "text", s"$base/full", buckets = 4)
    def bm(p: String) = InvertedIndex.bm25Search(spark, p,
      Seq("common", "alpha"), k = 50).as[(Long, Double)].collect().toSet
    assert(bm(s"$base/m") == bm(s"$base/full"))
    // SCATTER-GATHER BM25 over the unmerged shards: bit-identical
    // doubles to the merged index — global N/avgdl/df gathered from
    // the shard rollups and term-pruned probes, scoring stays local
    val sg = InvertedIndex.bm25SearchSharded(spark,
        Seq(s"$base/a", s"$base/b"), Seq("common", "alpha"), k = 50)
      .as[(Long, Double)].collect().toSet
    assert(sg == bm(s"$base/m"),
      "sharded scatter-gather must score bit-identically to the merge")
    // degenerate single shard == plain bm25Search on it
    assert(InvertedIndex.bm25SearchSharded(spark, Seq(s"$base/a"),
        Seq("common", "alpha"), k = 50).as[(Long, Double)].collect().toSet
      == bm(s"$base/a"))
    // k smaller than any shard's hit count: per-shard top-k + k-row
    // merge still equals the merged index's global top-k
    val sgK = InvertedIndex.bm25SearchSharded(spark,
        Seq(s"$base/a", s"$base/b"), Seq("common", "alpha"), k = 7)
      .as[(Long, Double)].collect().toSeq
    val mK = InvertedIndex.bm25Search(spark, s"$base/m",
        Seq("common", "alpha"), k = 7).as[(Long, Double)].collect().toSeq
    assert(sgK == mK, s"top-7 order must match: $sgK vs $mK")
    // a busy SOURCE fails the merge fast (sources must be quiescent —
    // a concurrent append mid-transport could tear the copy)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      graft.operators.WriterLock.withLock(spark, s"$base/a", "src-writer") {
        entered.countDown(); gate.await()
      })
    holder.start(); entered.await()
    try intercept[graft.operators.WriterLock.WriterConflict] {
      InvertedIndex.mergeIndexes(spark, s"$base/a", s"$base/b", s"$base/m5")
    } finally { gate.countDown(); holder.join() }
  }

  test("sharded phrase/proximity/boolean probes equal the merged index; validateShards certifies and refuses overlap") {
    val base = java.nio.file.Files.createTempDirectory("graft_shlex").toString
    val d = docs((1L to 30L).map { i =>
      val tail = if (i % 3 == 0) "hash value alpha hash value"
        else if (i % 3 == 1) "vector x join y hash end"
        else "vector join other hash words"
      i -> s"doc$i common $tail token$i"
    }: _*)
    InvertedIndex.writeIndex(d.filter($"doc_id" % 2 === 0), "doc_id", "text",
      s"$base/a", buckets = 4)
    InvertedIndex.writeIndex(d.filter($"doc_id" % 2 === 1), "doc_id", "text",
      s"$base/b", buckets = 4)
    InvertedIndex.mergeIndexes(spark, s"$base/a", s"$base/b", s"$base/m")
    val shards = Seq(s"$base/a", s"$base/b")
    // certification: disjoint set passes and returns the total census
    assert(InvertedIndex.validateShards(spark, shards) == 30L)
    // phrase: sharded == merged, bit for bit
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc").collect().toSeq
    assert(rows(InvertedIndex.phraseSearchSharded(spark, shards,
        Seq("hash", "value")))
      == rows(InvertedIndex.phraseSearchIndexed(spark, s"$base/m",
        Seq("hash", "value"))))
    // proximity: ordered within slop, across the shard boundary
    assert(rows(InvertedIndex.proximitySearchSharded(spark, shards,
        Seq("vector", "join", "hash"), slop = 2))
      == rows(InvertedIndex.proximitySearchIndexed(spark, s"$base/m",
        Seq("vector", "join", "hash"), slop = 2)))
    // boolean: AND + NOT, the exclusion leg also shard-served
    assert(rows(InvertedIndex.booleanSearchSharded(spark, shards,
        must = Seq("vector", "join"), mustNot = Seq("hash")))
      == rows(InvertedIndex.booleanSearchIndexed(spark, s"$base/m",
        must = Seq("vector", "join"), mustNot = Seq("hash"))))
    // boolean sanity on the fixture: i%3==1 docs have vector+join+hash
    // (excluded); i%3==2 docs have vector+join+hash too — so only docs
    // where 'hash' is absent survive; none here. Use a NOT-free probe
    // to prove non-emptiness of the conjunction leg itself.
    assert(InvertedIndex.booleanSearchSharded(spark, shards,
      must = Seq("vector", "join")).count() == 20L)
    // tf-idf: gathered N/df + scattered scoring == merged, bit for bit
    assert(rows(InvertedIndex.tfidfSearchSharded(spark, shards,
        Seq("vector", "hash"), k = 30))
      == rows(InvertedIndex.tfidfSearch(spark, s"$base/m",
        Seq("vector", "hash"), k = 30)))
    // more-like-this: driver-tokenized query doc, gathered constants
    val qText = "vector join hash common doc3"
    assert(rows(InvertedIndex.moreLikeThisSharded(spark, shards, qText,
        k = 10, excludeDoc = Some(3L)))
      == rows(InvertedIndex.moreLikeThis(spark, s"$base/m", qText,
        k = 10, excludeDoc = Some(3L))))
    // snippets: per-doc window selection over the unioned probes
    assert(rows(InvertedIndex.snippetsSharded(spark, shards,
        Seq("vector", "join", "hash"), window = 4))
      == rows(InvertedIndex.snippetsIndexed(spark, s"$base/m",
        Seq("vector", "join", "hash"), window = 4)))
    // overlap refusal: a shard set sharing a doc is not servable
    InvertedIndex.writeIndex(d.filter($"doc_id" <= 10), "doc_id", "text",
      s"$base/c", buckets = 4)
    val ex = intercept[InvertedIndex.OverlappingSources] {
      InvertedIndex.validateShards(spark, Seq(s"$base/a", s"$base/c"))
    }
    assert(ex.getMessage.contains("shard set shares doc ids"))
  }

  test("prfSearchSharded: both retrieval rounds sharded equal the in-memory PRF operator bit-for-bit (r20)") {
    import graft.operators.TextAnalytics
    val base = java.nio.file.Files.createTempDirectory("graft_shprf").toString
    // expansion-friendly fixture: seed terms co-occur with 'alpha' and
    // 'beta' in the high-scoring docs, so the mined expansion terms
    // actually change the final ranking vs the seed-only one
    val d = docs((1L to 24L).map { i =>
      val body = if (i % 4 == 0) "vector join alpha beta rare"
        else if (i % 4 == 1) "vector join alpha common word"
        else if (i % 4 == 2) "vector beta other words here"
        else "plain filler text nothing shared"
      i -> s"doc$i $body token$i"
    }: _*)
    InvertedIndex.writeIndex(d.filter($"doc_id" % 2 === 0), "doc_id", "text",
      s"$base/a", buckets = 4)
    InvertedIndex.writeIndex(d.filter($"doc_id" % 2 === 1), "doc_id", "text",
      s"$base/b", buckets = 4)
    val shards = Seq(s"$base/a", s"$base/b")
    val sharded = InvertedIndex.prfSearchSharded(spark, shards, d,
        "doc_id", "text", Seq("vector", "join"), fbDocs = 5, expand = 2,
        k = 8, pool = 100)
      .as[(Long, Double)].collect().toSeq
    val mem = TextAnalytics.prfExpandTopK(d, "doc_id", "text",
        Seq("vector", "join"), fbDocs = 5, expand = 2, k = 8)
      .as[(Long, Double)].collect().toSeq
    // same selection, same order, bit-identical doubles: the sharded
    // rounds' scores ARE the whole-corpus scorer's
    assert(sharded == mem, s"sharded PRF must equal in-memory: $sharded vs $mem")
    // the expansion did work on this fixture: the seed-only head differs
    val seedOnly = InvertedIndex.bm25SearchSharded(spark, shards,
        Seq("join", "vector"), k = 8).as[(Long, Double)].collect().toSeq
    assert(seedOnly.map(_._1) != mem.map(_._1),
      "fixture must make expansion change the ranking, or the test is vacuous")
    // a pool that cannot cover fbDocs/k refuses loudly
    intercept[IllegalArgumentException] {
      InvertedIndex.prfSearchSharded(spark, shards, d, "doc_id", "text",
        Seq("vector"), fbDocs = 5, expand = 1, k = 8, pool = 3)
    }
  }

  test("snippets: best window by distinct-term coverage, earliest-start tiebreak, indexed == in-memory") {
    val d = docs(
      1L -> "cat x x x mat x cat mat",  // window 3: starts 5 and 7 both
                                        // cover 2 terms -> earliest (5)
      2L -> "x cat x x x x mat x",      // no window covers both: tie on
                                        // coverage 1 -> earliest (pos 2)
      3L -> "mat cat x",                // start 1 covers both
      4L -> "x x x")                    // no match: absent from output
    def snip(w: Int) = InvertedIndex.snippets(
        InvertedIndex.postings(d, "doc_id", "text"), Seq("cat", "mat"), w)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(snip(3) == Map(1L -> ((5L, 2L)), 2L -> ((2L, 1L)), 3L -> ((1L, 2L))))
    // window 1: every doc degenerates to its earliest match, coverage 1
    assert(snip(1) == Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L)), 3L -> ((1L, 1L))))
    // indexed form equals the in-memory plan
    val dir = java.nio.file.Files.createTempDirectory("graft_snip").toString + "/p"
    InvertedIndex.writeIndex(d, "doc_id", "text", dir, buckets = 2)
    assert(InvertedIndex.snippetsIndexed(spark, dir, Seq("cat", "mat"), 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap == snip(3))
    intercept[IllegalArgumentException] {
      InvertedIndex.snippets(InvertedIndex.postings(d, "doc_id", "text"),
        Seq.empty, 3)
    }
  }

  test("proximity search: ordered within slop; slop 0 degenerates to the phrase") {
    val d = docs(
      1L -> "the big cat",          // gap 1 between the..cat
      2L -> "the cat",              // adjacent
      3L -> "cat the",              // wrong order
      4L -> "the very big old cat", // gap 3
      5L -> "the cat the cat")      // multiple tuples
    def prox(slop: Int) = InvertedIndex.proximitySearch(
        InvertedIndex.postings(d, "doc_id", "text"), Seq("the", "cat"), slop)
      .as[(Long, Long)].collect().toMap
    assert(prox(0) == search(d, "the", "cat")) // phrase equivalence
    assert(prox(1) == Map(1L -> 1L, 2L -> 1L, 5L -> 2L))
    // slop 3 admits doc 4 (gap 3) and doc 5's long-range (1,4) tuple
    assert(prox(3) == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 3L))
    assert(prox(10) == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 3L))
  }

  test("boolean search: AND conjunction + NOT exclusion, index-served and pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bool").toString + "/p"
    val d = docs(
      1L -> "vector join hash",
      2L -> "vector join tree",
      3L -> "vector scan",
      4L -> "join vector merge",
      5L -> "irrelevant words")
    InvertedIndex.writeIndex(d, "doc_id", "text", dir, buckets = 8)
    def ids(must: Seq[String], not: Seq[String]) =
      InvertedIndex.booleanSearchIndexed(spark, dir, must, not)
        .as[Long].collect().toSet
    assert(ids(Seq("vector", "join"), Nil) == Set(1L, 2L, 4L))
    assert(ids(Seq("vector", "join"), Seq("hash")) == Set(2L, 4L))
    assert(ids(Seq("vector"), Seq("join", "scan")) == Set.empty[Long])
    // the NOT leg reads from the index too — the probe plan stays
    // partition-pruned, no corpus scan
    val probe = InvertedIndex.booleanSearchIndexed(spark, dir,
      Seq("vector"), Seq("hash"))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*_tbkt".r.findFirstIn(plan).isDefined)
  }

  test("kll sidecars: per-batch sketches merge to whole-corpus quantiles within rank error") {
    val dir = java.nio.file.Files.createTempDirectory("kll").toString
    val n = 20000
    val df = spark.range(0, n).selectExpr("'g' AS k", "CAST(id AS DOUBLE) AS v")
    KllQuantiles.sketch(df.filter($"v" < n / 3), "k", "v")
      .write.parquet(dir + "/b0")
    KllQuantiles.sketch(df.filter($"v" >= n / 3), "k", "v")
      .write.parquet(dir + "/b1")
    val merged = KllQuantiles.merge(spark.read.parquet(dir + "/b*"), "k")
      .collect().head.getAs[Array[Byte]]("sketch")
    assert(KllQuantiles.count(merged) == n)
    val eps = KllQuantiles.rankError(merged)
    assert(eps < 0.02) // k=200 published bound ~1.65%
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val q = KllQuantiles.quantile(merged, p)
      // the returned value's TRUE rank must be within eps of p —
      // the rank-error contract, not value closeness
      val trueRank = (q + 1) / n // values are 0..n-1, rank of <= q
      assert(math.abs(trueRank - p) <= eps + 1.0 / n,
        s"p=$p got $q (rank $trueRank, eps $eps)")
    }
  }
}
