package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Right-to-be-forgotten: after StreamOps.forget, the documents are
  * gone from corpus + sidecar + index, and re-ingesting the same text
  * is ACCEPTED again — erased means "as if never seen". */
class ForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(seed: Int): String =
    (0 until 60).map(i => s"w${graft.operators.Dedup.splitmix64(seed * 100L + i) % 50}")
      .mkString(" ")

  private def driver(src: java.nio.file.Path) = {
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_forget_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    writeBatch _
  }

  private def stream(src: java.nio.file.Path) =
    spark.readStream.schema(StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)

  test("forget erases from corpus + sidecar; re-ingest of erased text is accepted") {
    val src = Files.createTempDirectory("graft_forget_src")
    val corpus = Files.createTempDirectory("graft_forget_c").toString + "/corpus"
    val writeBatch = driver(src)
    val cp = Files.createTempDirectory("graft_forget_cp").toString
    writeBatch("b1", Seq((1L, text(1)), (2L, text(2)), (3L, text(3))))
    val q = StreamOps.dedupedIngest(stream(src), corpus)
      .option("checkpointLocation", cp).start()
    try { q.processAllAvailable() } finally q.stop()

    val removed = StreamOps.forget(spark, corpus, Seq(2L))
    assert(removed == 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    assert(spark.read.parquet(corpus + "_sig").select("_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    // rerun is a no-op (idempotent erasure)
    assert(StreamOps.forget(spark, corpus, Seq(2L)) == 0L)

    // the same text, new id, arrives later: without forget it would be
    // dropped as a near-dup of doc 2 — erased means it is ACCEPTED
    writeBatch("b2", Seq((9L, text(2))))
    val q2 = StreamOps.dedupedIngest(stream(src), corpus)
      .option("checkpointLocation", cp).start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 9L))
  }

  test("index delete: the documented crash window (old files not yet removed) heals on rerun") {
    import graft.operators.{Dedup, MinhashIndex}
    val root = Files.createTempDirectory("graft_delcrash").toString
    val idx = root + "/idx"
    val docs = (1L to 10L).map(i => (i, text(i.toInt))).toDF("doc_id", "text")
    MinhashIndex.append(Dedup.prepareMinhash(docs, "doc_id", "text"), idx,
      buckets = 4)
    // find victim 3's payload dir and back up its current files —
    // restoring them after the delete reproduces EXACTLY the crash
    // state "survivors moved in, old files not yet deleted"
    val bkt = spark.sql(
      "SELECT CAST(pmod(xxhash64(CAST(3 AS BIGINT)), 4) AS INT)").head().getInt(0)
    val dir = java.nio.file.Paths.get(s"$idx/_band=-1/_bkt=$bkt")
    val backup = Files.createTempDirectory("graft_delbak")
    Files.list(dir).filter(_.getFileName.toString.endsWith(".parquet"))
      .forEach(f => Files.copy(f, backup.resolve(f.getFileName)))

    assert(MinhashIndex.delete(spark, idx,
      Seq(3L).toDF("_id")) == 1L)
    Files.list(backup).forEach(f =>
      Files.copy(f, dir.resolve("old-" + f.getFileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING))
    // crash state: victim 3 visible again, survivors duplicated —
    // probes must still answer correctly for OTHER ids (distinct)
    val others = MinhashIndex.probeIds(spark, idx,
      (1L to 10L).filter(_ != 3L).toDF("_id")).count()
    assert(others == 9L, "duplicate survivor rows must distinct away")
    assert(MinhashIndex.probeIds(spark, idx, Seq(3L).toDF("_id")).count() == 1L,
      "the crash window legitimately re-exposes the victim")
    // rerun completes the delete; everything is consistent again
    assert(MinhashIndex.delete(spark, idx, Seq(3L).toDF("_id")) == 1L)
    assert(MinhashIndex.probeIds(spark, idx, Seq(3L).toDF("_id")).count() == 0L)
    assert(MinhashIndex.payloadCount(spark, idx) == 9L)
  }

  test("streaming ingest maintains the postings index; dropped near-dups are never indexed") {
    import graft.operators.InvertedIndex
    val src = Files.createTempDirectory("graft_pidx_src")
    val corpus = Files.createTempDirectory("graft_pidx_c").toString + "/corpus"
    val pidx = Files.createTempDirectory("graft_pidx_i").toString + "/pidx"
    val writeBatch = driver(src)
    val cp = Files.createTempDirectory("graft_pidx_cp").toString
    writeBatch("b1", Seq((1L, text(1)), (2L, text(2))))
    val q = StreamOps.dedupedIngest(stream(src), corpus,
      postingsPath = Some(pidx)).option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      // batch 2: one genuinely new doc + one near-dup of doc 1 (drops)
      writeBatch("b2", Seq((7L, text(7)), (9L, text(1))))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 7L))
    // accepted docs are searchable; the dropped near-dup never indexed
    def firstPhrase(id: Long): Seq[String] =
      InvertedIndex.postings(spark.read.parquet(corpus)
          .filter($"doc_id" === id), "doc_id", "text")
        .orderBy($"pos").limit(2).select("token").as[String].collect().toSeq
    assert(InvertedIndex.phraseSearchIndexed(spark, pidx, firstPhrase(7L))
      .select("doc").as[Long].collect().toSet.contains(7L))
    assert(spark.read.parquet(pidx).select("doc").distinct().as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 7L))
    // census reconciles to exactly the accepted corpus' postings
    val censusTotal = InvertedIndex.censusByBucket(spark, pidx)
      .agg(sum($"n_postings")).head().getLong(0)
    assert(censusTotal == InvertedIndex.postings(
      spark.read.parquet(corpus), "doc_id", "text").count())
    // bm25 over the streamed index matches the in-memory scorer
    val terms = firstPhrase(2L)
    assert(InvertedIndex.bm25Search(spark, pidx, terms.distinct, 5)
        .as[(Long, Double)].collect().toSeq ==
      graft.operators.TextAnalytics.bm25TopK(spark.read.parquet(corpus),
        "doc_id", "text", terms.distinct, 5).as[(Long, Double)].collect().toSeq)
  }

  test("forget reaches the postings index: erased doc unsearchable, census reconciles") {
    import graft.operators.InvertedIndex
    val src = Files.createTempDirectory("graft_forgetp_src")
    val corpus = Files.createTempDirectory("graft_forgetp_c").toString + "/corpus"
    val pidx = Files.createTempDirectory("graft_forgetp_i").toString + "/pidx"
    val writeBatch = driver(src)
    val cp = Files.createTempDirectory("graft_forgetp_cp").toString
    writeBatch("b1", Seq((1L, text(1)), (2L, text(2)), (3L, text(3))))
    val q = StreamOps.dedupedIngest(stream(src), corpus)
      .option("checkpointLocation", cp).start()
    try { q.processAllAvailable() } finally q.stop()
    // index the accepted corpus (the serving artifact forget must reach)
    InvertedIndex.writeIndex(spark.read.parquet(corpus), "doc_id", "text",
      pidx, buckets = 8)
    // doc 2's first two tokens as a phrase — present pre-forget (taken
    // through the ENGINE's tokenizer: the fixture's "w-23" words split
    // at the minus sign)
    val phrase = InvertedIndex.postings(
        spark.read.parquet(corpus).filter($"doc_id" === 2L), "doc_id", "text")
      .orderBy($"pos").limit(2).select("token").as[String].collect().toSeq
    def hits(): Set[Long] =
      InvertedIndex.phraseSearchIndexed(spark, pidx, phrase)
        .select("doc").as[Long].collect().toSet
    assert(hits().contains(2L))
    assert(StreamOps.forget(spark, corpus, Seq(2L),
      postingsPath = Some(pidx)) == 1L)
    // erased everywhere: corpus, and the searchable surface
    assert(!hits().contains(2L))
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    // the postings census reconciles to the surviving corpus exactly
    val censusTotal = InvertedIndex.censusByBucket(spark, pidx)
      .agg(sum($"n_postings")).head().getLong(0)
    assert(censusTotal == InvertedIndex.postings(
      spark.read.parquet(corpus), "doc_id", "text").count())
    // rerun of the same forget is a no-op end to end
    assert(StreamOps.forget(spark, corpus, Seq(2L),
      postingsPath = Some(pidx)) == 0L)
    assert(!hits().contains(2L))
  }

  test("index delete: CROSS-dir crash (bands committed, payload not) completes on rerun") {
    import graft.operators.{Dedup, MinhashIndex}
    // delete commits band dirs FIRST and payload dirs LAST, so the only
    // reachable cross-dir crash state is "band rows gone, payload rows
    // still present". A rerun must still find the victim (the probe
    // reads payload rows), re-derive its band dirs (idempotent rewrite
    // of already-clean dirs), and finish the payload removal. The
    // REVERSE state — payload gone, band rows stranded with no _sh to
    // re-derive their dirs from — was the pre-fix ordering's
    // permanent-leak window and is unreachable now.
    val root = Files.createTempDirectory("graft_delcrash2").toString
    val idx = root + "/idx"
    val docs = (1L to 10L).map(i => (i, text(i.toInt))).toDF("doc_id", "text")
    MinhashIndex.append(Dedup.prepareMinhash(docs, "doc_id", "text"), idx,
      buckets = 4)
    val bkt = spark.sql(
      "SELECT CAST(pmod(xxhash64(CAST(3 AS BIGINT)), 4) AS INT)").head().getInt(0)
    val dir = java.nio.file.Paths.get(s"$idx/_band=-1/_bkt=$bkt")
    val backup = Files.createTempDirectory("graft_delbak2")
    Files.list(dir).filter(_.getFileName.toString.endsWith(".parquet"))
      .forEach(f => Files.copy(f, backup.resolve(f.getFileName)))
    assert(MinhashIndex.delete(spark, idx, Seq(3L).toDF("_id")) == 1L)
    // crash state: band dirs are committed (delete finished), but the
    // payload dir reverts WHOLLY to its pre-delete content — victim's
    // payload row back, survivors' new files removed
    Files.list(dir).forEach(Files.delete _)
    Files.list(backup).forEach(f => Files.copy(f, dir.resolve(f.getFileName)))
    assert(MinhashIndex.probeIds(spark, idx, Seq(3L).toDF("_id")).count() == 1L,
      "payload row must re-expose the victim to the rerun probe")
    // rerun finds the victim via its payload row and completes
    assert(MinhashIndex.delete(spark, idx, Seq(3L).toDF("_id")) == 1L)
    assert(MinhashIndex.probeIds(spark, idx, Seq(3L).toDF("_id")).count() == 0L)
    assert(MinhashIndex.payloadCount(spark, idx) == 9L)
    // and no band rows remain for the victim anywhere
    val bandRows = spark.read.parquet(idx)
      .filter(col("_band") >= 0 && col("_id") === 3L).count()
    assert(bandRows == 0L, "victim band rows must be fully re-derived and removed")
  }

  test("scd applyBatch: a bucket reverted to its pre-batch state (partial crash) retries clean") {
    import graft.operators.Scd
    val store = Files.createTempDirectory("graft_scdcrash").toString + "/v"
    def log(rows: (Long, Long, Long, String)*) =
      rows.toDF("k", "ts", "eid", "tier")
    // keys 1 and 2 land in different buckets (nBuckets=8)
    Scd.applyBatch(log((1L, 10L, 1L, "a"), (2L, 10L, 2L, "x")), store,
      Seq("k"), "ts", "eid", Seq("tier"))
    // back up every bucket dir before batch 2
    val root = java.nio.file.Paths.get(store)
    val backup = Files.createTempDirectory("graft_scdbak")
    Files.list(root).filter(_.getFileName.toString.startsWith("bucket_"))
      .forEach { d =>
        val tgt = backup.resolve(d.getFileName)
        Files.createDirectories(tgt)
        Files.list(d).forEach(f => Files.copy(f, tgt.resolve(f.getFileName)))
      }
    val b2 = log((1L, 20L, 3L, "b"), (2L, 20L, 4L, "y"))
    Scd.applyBatch(b2, store, Seq("k"), "ts", "eid", Seq("tier"))
    // simulate a crash that only committed SOME buckets: revert ONE
    // bucket dir to its pre-batch files
    val reverted = Files.list(root)
      .filter(_.getFileName.toString.startsWith("bucket_"))
      .findFirst.get
    Files.list(reverted).forEach(Files.delete)
    Files.list(backup.resolve(reverted.getFileName))
      .forEach(f => Files.copy(f, reverted.resolve(f.getFileName)))
    // retry the whole batch: already-committed buckets drop it as
    // at-or-before-open, the reverted bucket applies it fresh
    Scd.applyBatch(b2, store, Seq("k"), "ts", "eid", Seq("tier"))
    val out = Scd.readVersions(spark, store)
      .select($"k", $"tier", $"valid_from", $"is_current")
      .orderBy($"k", $"valid_from")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10L, false), (1L, "b", 20L, true),
      (2L, "x", 10L, false), (2L, "y", 20L, true)))
  }

  test("forget erases from the persisted MinHash index; census stays reconciled") {
    val src = Files.createTempDirectory("graft_forgeti_src")
    val root = Files.createTempDirectory("graft_forgeti_c").toString
    val corpus = root + "/corpus"
    val index = root + "/index"
    val writeBatch = driver(src)
    val cp = Files.createTempDirectory("graft_forgeti_cp").toString
    writeBatch("b1", (1L to 6L).map(i => (i, text(i.toInt))))
    val q = StreamOps.dedupedIngestIndexed(stream(src), corpus, index)
      .option("checkpointLocation", cp).start()
    try { q.processAllAvailable() } finally q.stop()
    assert(graft.operators.MinhashIndex.payloadCount(spark, index) == 6L)

    val removed = StreamOps.forget(spark, corpus, Seq(2L, 5L),
      indexPath = Some(index))
    assert(removed == 2L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 4L, 6L))
    // index census matches the corpus again (the ingest's invariant)
    assert(graft.operators.MinhashIndex.payloadCount(spark, index) == 4L)
    // no band rows survive for the erased ids anywhere in the index
    val leftover = spark.read.parquet(index)
      .filter(col("_id").isin(2L, 5L)).count()
    assert(leftover == 0L, "erased ids must leave no index rows")

    // near-dup of an erased doc ingests cleanly; near-dup of a kept
    // doc still drops — the index keeps working after the rewrite
    writeBatch("b2", Seq((11L, text(2)), (12L, text(3))))
    val q2 = StreamOps.dedupedIngestIndexed(stream(src), corpus, index)
      .option("checkpointLocation", cp).start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 4L, 6L, 11L))
  }

  test("minhash mergeIndexes: merged drop set equals the union-built index's; refusals loud (r20)") {
    import graft.operators.{Dedup, MinhashIndex}
    val root = Files.createTempDirectory("graft_mh_merge").toString
    // epoch shards: docs 1-6 and 7-12; batch 20-23 contains a
    // near-dup of doc 2 (shard a), a near-dup of doc 9 (shard b) and
    // two fresh docs — the merged index must catch BOTH epochs' dups
    def prep(rows: Seq[(Long, String)]) = Dedup.prepareMinhash(
      rows.toDF("doc_id", "text"), "doc_id", "text")
    val epochA = (1L to 6L).map(i => (i, text(i.toInt)))
    val epochB = (7L to 12L).map(i => (i, text(i.toInt)))
    MinhashIndex.append(prep(epochA), s"$root/a", buckets = 4)
    MinhashIndex.append(prep(epochB), s"$root/b", buckets = 4)
    MinhashIndex.mergeIndexes(spark, Seq(s"$root/a", s"$root/b"), s"$root/m")
    // union-built reference index (one append of both epochs)
    MinhashIndex.append(prep(epochA ++ epochB), s"$root/u", buckets = 4)
    assert(MinhashIndex.payloadCount(spark, s"$root/m") == 12L)
    val batch = Seq((20L, text(2) + " tail"), (21L, text(9) + " tail"),
      (22L, text(40)), (23L, text(41)))
    def drops(idx: String) = MinhashIndex.drops(spark, idx, prep(batch))
      .as[Long].collect().toSet
    val m = drops(s"$root/m")
    assert(m == drops(s"$root/u"),
      "merged index must flag exactly what the union-built index flags")
    assert(m == Set(20L, 21L),
      s"both epochs' near-dups must drop, fresh docs survive: $m")
    // merged index stays fully writable: append lands, delete works
    MinhashIndex.append(prep(Seq((30L, text(50)))), s"$root/m")
    assert(MinhashIndex.payloadCount(spark, s"$root/m") == 13L)
    assert(MinhashIndex.delete(spark, s"$root/m", Seq(30L).toDF("_id")) == 1L)
    // overlap refusal: shard a shares every id with the union index
    val ex = intercept[MinhashIndex.OverlappingSources] {
      MinhashIndex.mergeIndexes(spark, Seq(s"$root/a", s"$root/u"),
        s"$root/m2")
    }
    assert(ex.getMessage.contains("share doc ids"))
    // non-empty target refusal
    intercept[IllegalArgumentException] {
      MinhashIndex.mergeIndexes(spark, Seq(s"$root/a", s"$root/b"),
        s"$root/m")
    }
    // layout refusal: a rebucketed source cannot merge with an
    // un-rebucketed one
    MinhashIndex.rebucket(spark, s"$root/a", 8)
    val ex2 = intercept[IllegalArgumentException] {
      MinhashIndex.mergeIndexes(spark, Seq(s"$root/a", s"$root/b"),
        s"$root/m3")
    }
    assert(ex2.getMessage.contains("bucket layouts differ"))
  }

  test("minhash dropsSharded: scatter drops equal the merged index's; validateShards certifies and refuses overlap (r20)") {
    import graft.operators.{Dedup, MinhashIndex}
    val root = Files.createTempDirectory("graft_mh_scatter").toString
    def prep(rows: Seq[(Long, String)]) = Dedup.prepareMinhash(
      rows.toDF("doc_id", "text"), "doc_id", "text")
    val epochA = (1L to 6L).map(i => (i, text(i.toInt)))
    val epochB = (7L to 12L).map(i => (i, text(i.toInt)))
    MinhashIndex.append(prep(epochA), s"$root/a", buckets = 4)
    MinhashIndex.append(prep(epochB), s"$root/b", buckets = 4)
    // certify once: 12 distinct docs, no overlap across the set
    assert(MinhashIndex.validateShards(spark,
      Seq(s"$root/a", s"$root/b")) == 12L)
    MinhashIndex.mergeIndexes(spark, Seq(s"$root/a", s"$root/b"), s"$root/m")
    // batch: a near-dup of each epoch plus two fresh docs — the
    // scatter must catch BOTH epochs' dups without the physical merge
    val batch = Seq((20L, text(2) + " tail"), (21L, text(9) + " tail"),
      (22L, text(40)), (23L, text(41)))
    val scatter = MinhashIndex.dropsSharded(spark,
        Seq(s"$root/a", s"$root/b"), prep(batch))
      .as[Long].collect().toSet
    assert(scatter == MinhashIndex.drops(spark, s"$root/m", prep(batch))
      .as[Long].collect().toSet,
      "sharded drops must equal the merged index's")
    assert(scatter == Set(20L, 21L), s"both epochs' near-dups drop: $scatter")
    // degenerate single shard: only that epoch's dup flags
    assert(MinhashIndex.dropsSharded(spark, Seq(s"$root/a"), prep(batch))
      .as[Long].collect().toSet == Set(20L))
    // overlap refusal: shard a shares every id with the merged index
    val ex = intercept[MinhashIndex.OverlappingSources] {
      MinhashIndex.validateShards(spark, Seq(s"$root/a", s"$root/m"))
    }
    assert(ex.getMessage.contains("shares doc ids"))
    // a freshly rolled-over (empty) epoch shard censuses as zero docs
    // instead of failing parquet schema inference
    new java.io.File(s"$root/fresh").mkdirs()
    assert(MinhashIndex.validateShards(spark,
      Seq(s"$root/a", s"$root/fresh")) == 6L)
  }
}
