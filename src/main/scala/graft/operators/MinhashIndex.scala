package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, bucket-partitioned MinHash signature index — the text
  * twin of [[Ann]]'s Hamming index (`Ann.appendHammingIndexWithIds`):
  * the structure that lets streaming dedup-on-ingest
  * ([[graft.streaming.StreamOps.dedupedIngestIndexed]]) replace its
  * per-batch O(corpus) signature-sidecar scan with reads of exactly
  * the directories the batch hashes into.
  *
  * Layout under `path`, partitioned by (`_band`, `_bkt`):
  *
  *  - BAND rows (`_band=0`): one (doc `_id`, band-bucket key `_bk`) row
  *    per band of [[Dedup.prepareMinhash]]'s `_bks` (the band ordinal
  *    is already mixed into `_bk`, so a single band partition value
  *    suffices — unlike the Hamming layout, whose band VALUES need the
  *    ordinal to disambiguate). `_bkt = pmod(_bk, buckets)`.
  *  - PAYLOAD rows (reserved `_band=-1`): one (doc `_id`, sorted
  *    shingle hashes `_sh`) row per doc, `_bkt = pmod(xxhash64(_id),
  *    buckets)` — the verification payloads AND the id-existence
  *    census (exactly one payload row per corpus doc, which is what
  *    the ingest's crash reconciliation counts).
  *
  * Probes collect only distinct partition-key VALUES to the driver
  * (bounded by `buckets`, never by batch or corpus size) and push them
  * as partition-column-only predicates, so scans statically prune to
  * the touched directories; exact keys then equijoin away modulo
  * collisions. Per-probe I/O is O(probed directories), independent of
  * corpus size.
  *
  * Same small-file discipline as the Hamming index: each append lands
  * one file per touched directory, and [[compact]] (the shared
  * `Ann.compactHammingIndex` rewrite — the layouts are
  * interchangeable for maintenance) folds the per-batch backlog. The
  * ref's stack keeps signatures in a serving store
  * (`streamlit_app.py:96-104`, Pinecone upsert); this is the
  * lake-native equivalent a 100 TB corpus needs.
  */
object MinhashIndex {

  /** Append a prepared signature batch ([[Dedup.prepareMinhash]]
    * shape: `_id` long, `_sh` array<long>, `_bks` array<long>) to the
    * index at `path`, creating it if absent. One narrow shuffle on the
    * partition columns buys ONE file per touched directory per append
    * (not tasks x directories — what keeps [[compact]]'s backlog
    * linear in batches). Docs whose `_bks` is null (null text) land a
    * payload row only, matching [[Dedup.minhashAgainstPrepared]]'s
    * explode semantics.
    *
    * `buckets` defaults to [[LayoutMeta.Unspecified]]: the index's
    * `_META` record wins (64 on first creation); an explicitly passed
    * value that conflicts with the record throws. */
  def append(prep: DataFrame, path: String,
      buckets: Int = LayoutMeta.Unspecified): Unit =
      WriterLock.withLock(prep.sparkSession, path, "minhash append") {
    val bk = resolveBuckets(prep.sparkSession, path, buckets)
    val bandRows = prep.select(col("_id"), explode(col("_bks")).as("_bk"))
      .withColumn("_sh", lit(null).cast("array<long>"))
      .withColumn("_band", lit(0))
      .withColumn("_bkt", pmod(col("_bk"), lit(bk.toLong)).cast("int"))
    val payloadRows = prep.select(col("_id"), col("_sh"))
      .withColumn("_bk", lit(null).cast("long"))
      .withColumn("_band", lit(-1))
      .withColumn("_bkt", pmod(xxhash64(col("_id")), lit(bk.toLong)).cast("int"))
    bandRows.select("_id", "_bk", "_sh", "_band", "_bkt")
      .unionByName(payloadRows.select("_id", "_bk", "_sh", "_band", "_bkt"))
      // partition count pinned to the directory count (band=0 and
      // band=-1 each span `bk` buckets): an unpinned repartition(col)
      // lets AQE coalesce a small append to ONE task that writes every
      // directory's file serially (r21, guide §2.4); one file per
      // touched dir holds under any count
      .repartition(2 * bk, col("_band"), col("_bkt"))
      .write.mode("append").partitionBy("_band", "_bkt").parquet(path)
    // record the layout AFTER data lands (a crash here leaves a
    // pre-META index, which probes tolerate exactly as before)
    LayoutMeta.commit(prep.sparkSession, path, Map("buckets" -> bk))
  }

  /** The one layout parameter, resolved from / validated against the
    * index's `_META` ([[LayoutMeta.resolve]] semantics). Every entry
    * point resolves through here, so this is also where an interrupted
    * [[rebucket]] swap gets finished before any directory is read — a
    * partially-promoted index must never be probed (one journal
    * exists-check when nothing is pending). */
  private def resolveBuckets(spark: SparkSession, path: String, buckets: Int): Int = {
    AtomicSwap.recover(spark.sparkContext.hadoopConfiguration, path)
    val bk = LayoutMeta.resolve(spark, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    require(bk > 0, s"buckets $bk must be positive")
    bk
  }

  /** Which of `ids`' values are already indexed — the id-immutability
    * probe. `ids` must be a single LONG `_id` column (the hash must
    * match the one [[append]] bucketed payload rows by, and xxhash64
    * is type-sensitive). Reads only the `_band=-1` bucket directories
    * the probe ids hash to. */
  def probeIds(spark: SparkSession, path: String, ids: DataFrame,
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    val bk = resolveBuckets(spark, path, buckets)
    val hashed = ids.select(col("_id")).filter(col("_id").isNotNull)
      .withColumn("_bkt", pmod(xxhash64(col("_id")), lit(bk.toLong)).cast("int"))
      .localCheckpoint(true) // reused: key collect + membership join
    val keys = hashed.select(col("_bkt")).distinct().collect().map(_.getInt(0))
    // partition probe stays PURE over partition columns so pruning
    // actually fires; an empty batch reads zero partitions
    val probe =
      if (keys.isEmpty) lit(false)
      else col("_band") === -1 && col("_bkt").isin(keys.map(Integer.valueOf): _*)
    spark.read.parquet(path).filter(probe)
      .select(col("_id"), col("_bkt"))
      .join(hashed, Seq("_id", "_bkt"))
      .select(col("_id")).distinct()
  }

  /** Batch-vs-index near-duplicate drops: every batch doc with a
    * verified (exact-Jaccard >= `threshold`) near-duplicate in the
    * index, as a single `_drop` column — [[Dedup
    * .minhashAgainstPrepared]]'s contract over the persisted layout.
    * The batch's distinct band buckets pick the `_band=0` directories
    * to read (partition-pruned; exact `_bk` equijoin drops modulo
    * collisions) and the surviving candidates' corpus ids pick the
    * `_band=-1` payload directories the same way; everything after
    * that — bucket census, `maxBucketSize` valve, in-bucket verify —
    * is [[Dedup.againstCore]], the SAME core the sidecar carrier runs,
    * so accept/drop sets are identical by construction.
    * `buckets` resolves from / validates against the index `_META`. */
  def drops(spark: SparkSession, path: String, batchPrep: DataFrame,
      threshold: Double = 0.5, maxBucketSize: Int = 10000,
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    val bk = resolveBuckets(spark, path, buckets)
    val bp = batchPrep.localCheckpoint(true)
    val bandedB = bp.select(col("_id"), explode(col("_bks")).as("_bk"))
      .withColumn("_side", lit(1))
    val batchBuckets = bandedB.select("_bk").distinct().localCheckpoint(true)
    val keys = batchBuckets
      .select(pmod(col("_bk"), lit(bk.toLong)).cast("int").as("_bkt"))
      .distinct().collect().map(_.getInt(0))
    val probe =
      if (keys.isEmpty) lit(false)
      else col("_band") === 0 && col("_bkt").isin(keys.map(Integer.valueOf): _*)
    val bandedC = spark.read.parquet(path).filter(probe)
      .select(col("_id"), col("_bk"))
      .join(broadcast(batchBuckets), "_bk") // exact keys: drop modulo collisions
      // a compact() crash or an at-least-once double append leaves
      // duplicate index rows; without this they would inflate the
      // bucket census and could valve out (silently skip) a real
      // near-dup bucket — the distinct runs on the already-pruned,
      // batch-bucket-restricted slice, never the index
      .distinct()
    Dedup.againstCore(bandedB, bandedC, candIds => {
      val pinned = candIds.localCheckpoint(true) // key collect + slice joins
      val corpIds = pinned.filter(col("_side") === 0).select("_id")
      val payloadKeys = corpIds
        .select(pmod(xxhash64(col("_id")), lit(bk.toLong)).cast("int").as("_bkt"))
        .distinct().collect().map(_.getInt(0))
      val payloadProbe =
        if (payloadKeys.isEmpty) lit(false)
        else col("_band") === -1 &&
          col("_bkt").isin(payloadKeys.map(Integer.valueOf): _*)
      spark.read.parquet(path).filter(payloadProbe)
        .select(col("_id"), col("_sh"))
        .join(broadcast(corpIds), "_id")
        .dropDuplicates("_id") // crash-duplicated payload rows are identical
        .unionByName(bp.select(col("_id"), col("_sh"))
          .join(broadcast(pinned.filter(col("_side") === 1).select("_id")), "_id"))
    }, threshold, maxBucketSize)
  }

  /** One payload row exists per indexed doc, so this is the index's
    * doc census — partition-pruned to the `buckets` many `_band=-1`
    * directories and answered from parquet footers (O(#files), not
    * O(rows)). The ingest reconciles it against the corpus row count
    * every batch. */
  def payloadCount(spark: SparkSession, path: String): Long = {
    AtomicSwap.recover(spark.sparkContext.hadoopConfiguration, path)
    spark.read.parquet(path).filter(col("_band") === -1).count()
  }

  /** In-place small-file compaction — the (`_band`, `_bkt`) layout is
    * maintenance-compatible with the Hamming index's, so this IS
    * [[Ann.compactHammingIndex]] (move-then-delete; a crash leaves
    * duplicate rows, which every probe distincts away). Run between
    * batches. */
  def compact(spark: SparkSession, path: String, minFiles: Int = 8): Int =
    WriterLock.withLock(spark, path, "minhash compact") {
      Ann.compactHammingIndex(spark, path, minFiles)
    }

  /** DELETE docs from the index — the right-to-be-forgotten half of
    * the maintenance story ([[compact]]/[[rebucket]] being the other
    * two). Only the directories the target docs actually live in are
    * rewritten: payload dirs come from the id hash (the [[probeIds]]
    * probe), band dirs from RE-banding the stored shingle payloads —
    * the index is self-describing, so no corpus access and no O(index)
    * scan is needed. Survivor rows stage in ONE partitioned write,
    * then per touched dir: old files are LISTED, staged survivor files
    * move in, listed files delete — the same move-then-delete
    * discipline as [[compact]]. A crash mid-commit leaves the targets
    * still present (the delete has simply not finished) plus duplicate
    * survivor rows every probe distincts away; RERUNNING the delete
    * with the same ids completes it idempotently (and a finished
    * delete reruns as a 0-doc no-op). Returns the number of indexed
    * docs removed.
    *
    * `numHashes`/`bands`/`seed` must match the ingest-time
    * [[Dedup.prepareMinhash]] parameters (the streaming ingest uses
    * the defaults); a mismatch would re-band to the WRONG dirs and
    * leave orphan band rows — harmless for correctness (probes verify
    * by exact id + payload) but a leak, so pass what you ingested
    * with. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      buckets: Int = LayoutMeta.Unspecified, numHashes: Int = 192,
      bands: Int = 64, seed: Long = 42L): Long =
      WriterLock.withLock(spark, path, "minhash delete") {
    val bk = resolveBuckets(spark, path, buckets)
    val hconf = spark.sparkContext.hadoopConfiguration
    def hp(p: String) = new org.apache.hadoop.fs.Path(p)
    val fs = hp(path).getFileSystem(hconf)
    val target = ids.select(col("_id").cast("long").as("_id"))
      .filter(col("_id").isNotNull).distinct().localCheckpoint(true)
    // payload rows of the targets (partition-pruned by id hash)
    val payloadKeys = target
      .select(pmod(xxhash64(col("_id")), lit(bk.toLong)).cast("int").as("_bkt"))
      .distinct().collect().map(_.getInt(0))
    if (payloadKeys.isEmpty) return 0L
    val payloadProbe = col("_band") === -1 &&
      col("_bkt").isin(payloadKeys.map(Integer.valueOf): _*)
    val victims = spark.read.parquet(path).filter(payloadProbe)
      .select(col("_id"), col("_sh"))
      .join(broadcast(target), "_id")
      .dropDuplicates("_id")
      .localCheckpoint(true)
    val nDeleted = victims.count()
    if (nDeleted == 0L) return 0L
    // band dirs from re-banding the stored payloads (null _sh = null
    // text = payload-only doc, no band rows to chase)
    val bandKeys = victims.filter(col("_sh").isNotNull)
      .select(explode(Dedup.bandedMinhashCol(col("_sh"), numHashes, bands,
        seed)).as("_bk"))
      .select(pmod(col("_bk"), lit(bk.toLong)).cast("int").as("_bkt"))
      .distinct().collect().map(_.getInt(0))
    // Band dirs commit FIRST, payload dirs LAST: the rerun probe finds
    // victims through their PAYLOAD rows, so payload removal must be
    // the final commit point. The old order (payload first) had a
    // cross-dir crash window — payload dir committed, band dirs not —
    // where a rerun saw zero victims, returned 0 early, and the band
    // rows were stranded forever (the _sh payloads needed to re-derive
    // their dirs were already gone). With band-first ordering, a crash
    // anywhere before the last payload dir still leaves the victims
    // probeable and the band dirs re-derivable; rewriting an
    // already-clean band dir on the rerun is an idempotent no-op.
    val touched: Seq[(Int, Int)] =
      bandKeys.map(b => (0, b)).toSeq ++ payloadKeys.map(b => (-1, b)).toSeq
    val touchedProbe = touched.map { case (band, bkt) =>
      col("_band") === band && col("_bkt") === bkt
    }.reduce(_ || _)
    val survivors = spark.read.parquet(path).filter(touchedProbe)
      .join(broadcast(target), Seq("_id"), "left_anti")
      .select(col("_id"), col("_bk"), col("_sh"), col("_band"), col("_bkt"))
      // crash-duplicated rows (an interrupted earlier delete/append)
      // are bit-identical by construction; deduping here makes every
      // delete pass self-cleaning for the dirs it touches, so the
      // payload CENSUS stays honest, not just the distinct-ing probes
      .dropDuplicates()
    val stage = path + "__delstage"
    if (fs.exists(hp(stage))) fs.delete(hp(stage), true)
    survivors.write.mode("overwrite").partitionBy("_band", "_bkt")
      .parquet(stage)
    try {
      touched.foreach { case (band, bkt) =>
        val live = hp(s"$path/_band=$band/_bkt=$bkt")
        // only rewrite dirs that exist (a probe key may map to a dir
        // the index never created)
        if (fs.exists(live)) {
          // list BEFORE moving survivors in: everything listed is
          // pre-delete state (incl. earlier deletes' survivor files)
          // and gets removed; the moves below land under fresh names
          // so they are never in this listing
          val old = fs.listStatus(live).map(_.getPath)
          val part = hp(s"$stage/_band=$band/_bkt=$bkt")
          if (fs.exists(part)) {
            fs.listStatus(part).map(_.getPath)
              .filter(_.getName.startsWith("part-"))
              .zipWithIndex.foreach { case (f, i) =>
                require(fs.rename(f,
                  new org.apache.hadoop.fs.Path(live,
                    s"del-${java.util.UUID.randomUUID().toString.take(8)}-$i-${f.getName}")),
                  s"survivor move failed: $f")
              }
          }
          old.foreach(fs.delete(_, false))
        }
      }
    } finally fs.delete(hp(stage), true)
    nDeleted
  }

  /** Two MinHash shard indexes of a merge share a doc id — the
    * [[InvertedIndex.OverlappingSources]] analogue for the dedup-index
    * family. A shared id would double its band rows in every probed
    * bucket and make the payload census ambiguous. Thrown BEFORE any
    * byte moves. */
  final class OverlappingSources(msg: String)
    extends IllegalArgumentException(msg)

  /** CERTIFY a MinHash shard set's doc-disjointness (r20) — the
    * [[InvertedIndex.validateShards]] contract for the dedup-index
    * family: one [[MergeCensus.requireDisjoint]] pass over the shards'
    * payload (`_band=-1`) dirs — the same census [[mergeIndexes]] runs
    * before moving bytes, WITHOUT the merge. Returns the certified
    * total distinct doc count across the set. Run once when a shard
    * set is ASSEMBLED (a new epoch's dedup index joins the serving
    * set); after that [[dropsSharded]] trusts the certificate instead
    * of paying a cross-shard census per batch. Cost: a column-pruned,
    * partition-pruned distinct-id scan per shard — O(total docs) once,
    * not per batch. Throws [[OverlappingSources]] naming the first
    * colliders. */
  def validateShards(spark: SparkSession, paths: Seq[String]): Long = {
    require(paths.size >= 2, "a shard set needs at least two shards")
    require(paths.distinct.size == paths.size,
      s"duplicate shard paths: ${paths.mkString(", ")}")
    val hconf = spark.sparkContext.hadoopConfiguration
    def shardIds(p: String): DataFrame = {
      AtomicSwap.recover(hconf, p)
      // a freshly rolled-over epoch shard may exist with no data yet
      // (append never ran): census it as zero docs instead of failing
      // parquet schema inference — the InvertedIndex.validateShards
      // missing-store tolerance (r20 review)
      val pp = new org.apache.hadoop.fs.Path(p)
      val fs = pp.getFileSystem(hconf)
      val hasData = fs.exists(pp) &&
        fs.listStatus(pp).exists(_.getPath.getName.startsWith("_band="))
      if (hasData)
        spark.read.parquet(p).filter(col("_band") === -1)
          .select(col("_id")).distinct()
      else spark.range(0).select(col("id").as("_id"))
    }
    val censuses = paths.zipWithIndex.map { case (p, i) =>
      s"m$i" -> shardIds(p).localCheckpoint(true)
    }
    MergeCensus.requireDisjoint(censuses, "_id", colliding =>
      throw new OverlappingSources(
        s"shard set shares doc ids (first ${colliding.length}: " +
          s"${colliding.mkString(", ")}): a shared doc would verify " +
          "against itself in every shard it lives in and double its " +
          "band rows in the probed buckets; delete it from all but " +
          "one shard before serving the set"))
  }

  /** Batch-vs-SHARD-SET near-duplicate drops (r20, [[drops]] across N
    * unmerged shard indexes — the [[InvertedIndex.bm25SearchSharded]]
    * serving shape for the dedup family): per-epoch MinHash indexes
    * keep serving in place, and an ingest batch deduplicates against
    * their UNION without a physical merge. The verify is PAIRWISE
    * (exact Jaccard between one batch doc and one corpus doc — no
    * cross-doc statistics), so a batch doc near-duplicates the union
    * iff it near-duplicates SOME shard: the sharded answer is the
    * union of the per-shard drop sets, and with doc-disjoint shards
    * ([[validateShards]], certified once) it equals [[drops]] against
    * the [[mergeIndexes]]-merged index (spec-asserted; gate q261).
    *
    * Per-shard work is untouched — each shard's band-bucket partition
    * pruning, bucket census, and payload probes apply shard-locally;
    * cross-shard traffic is the drop-id sets only. The batch PIPELINE
    * materializes once (the eager pin below); each per-shard [[drops]]
    * call re-pins from those cached blocks — N cheap block re-reads,
    * never N recomputations of the prep. Shard probes overlap on the
    * [[Par]] pool (max(shard), not Σ(shards), wall
    * time). One deliberate asymmetry vs the merged index: the
    * `maxBucketSize` valve censuses each shard's buckets SEPARATELY,
    * so a hot bucket split across shards valves LATER than merged —
    * the sharded form can only surface MORE verified candidate pairs,
    * never fewer (the safe direction for dedup). */
  def dropsSharded(spark: SparkSession, paths: Seq[String],
      batchPrep: DataFrame, threshold: Double = 0.5,
      maxBucketSize: Int = 10000): DataFrame = {
    require(paths.nonEmpty, "at least one shard index required")
    val bp = batchPrep.localCheckpoint(true)
    Par.inParallel(paths) { p =>
      drops(spark, p, bp, threshold, maxBucketSize).localCheckpoint(true)
    }.reduce(_ unionByName _).distinct()
  }

  /** MERGE N disjoint MinHash shard indexes into ONE new index at
    * `out` (r20, the third index family's merge — the r19 verdict's
    * ask): per-epoch dedup indexes fold into one serving index without
    * re-ingest, exactly the [[InvertedIndex.mergeIndexes]] /
    * [[VectorIndex.mergeIndexes]] discipline.
    *
    * Pure FILE TRANSPORT, no rewrite: index rows are keyed by
    * (`_band`, `_bkt`) partition dirs whose values depend only on the
    * shared bucket layout (band keys hash band contents; payload
    * buckets hash ids), so a file of source dir (b, k) is verbatim a
    * file of merged dir (b, k). Bytes move executor-side via
    * [[DistCopy]] (the driver walks file NAMES only); per-file tag
    * prefixes keep equal part names from colliding.
    *
    * Contracts, enforced loudly BEFORE any byte moves: sources must
    * share the bucket layout (their `_META`, after finishing any
    * interrupted rebucket swap — a mismatched layout would misfile
    * every probe); `out` must be empty (a merge is a create, not an
    * append); doc id sets must be DISJOINT, verified by a
    * column-pruned, partition-pruned distinct-id census over the
    * payload (`_band=-1`) dirs — [[OverlappingSources]] names the
    * first colliders. After transport the merged payload census must
    * equal the sum of the source censuses or the merge throws instead
    * of serving a torn index. The merge holds the [[WriterLock]]
    * lease on the output and on every source for the duration
    * (sources must be quiescent; a concurrent append would simply
    * miss the merge but could tear a mid-copy file set — the lease
    * makes that loud). Probes against the merged index are equal to
    * probes against the union by construction: band rows, payloads
    * and the bucket hash space all carry over verbatim (spec-asserted
    * drop-set equality; gate q251). */
  def mergeIndexes(spark: SparkSession, srcPaths: Seq[String],
      out: String): Unit = {
    require(srcPaths.size >= 2, "merge needs at least two source indexes")
    require(srcPaths.distinct.size == srcPaths.size,
      s"duplicate source paths: ${srcPaths.mkString(", ")}")
    def locked[T](ps: List[String])(body: => T): T = ps match {
      case Nil => body
      case h :: t =>
        WriterLock.withLock(spark, h, "minhash mergeIndexes")(locked(t)(body))
    }
    locked((out +: srcPaths).toList) {
      val hconf = spark.sparkContext.hadoopConfiguration
      def hp(p: String) = new org.apache.hadoop.fs.Path(p)
      val fs = hp(out).getFileSystem(hconf)
      // resolveBuckets finishes any interrupted rebucket swap first,
      // so each source is judged by its CURRENT committed layout
      val bks = srcPaths.map(p =>
        resolveBuckets(spark, p, LayoutMeta.Unspecified))
      require(bks.distinct.size == 1,
        s"bucket layouts differ (${bks.mkString(",")}): a merged probe " +
          "would prune the wrong directories and silently miss " +
          "near-dups; rebucket the outliers onto one layout first")
      require(!fs.exists(hp(out)) || fs.listStatus(hp(out)).isEmpty,
        s"merge target $out must be empty (merge is a create, not an append)")
      // id-disjointness census: payload dirs only (partition-pruned),
      // _id column only, distinct per source (crash-duplicated payload
      // rows within a source are legitimate and identical)
      def srcIds(p: String): DataFrame =
        spark.read.parquet(p).filter(col("_band") === -1)
          .select(col("_id")).distinct()
      val censuses = srcPaths.zipWithIndex.map { case (p, i) =>
        s"m$i" -> srcIds(p).localCheckpoint(true)
      }
      val censusSum = MergeCensus.requireDisjoint(censuses, "_id", colliding =>
        throw new OverlappingSources(
          s"source indexes share doc ids (first ${colliding.length}: " +
            s"${colliding.mkString(", ")}): a shared doc would double " +
            "its band rows in every probed bucket and break the payload " +
            "census; delete it from all but one source first"))
      // file transport: driver walks names, DistCopy moves bytes
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      def walk(from: org.apache.hadoop.fs.Path, toRel: String,
          tag: String): Unit = {
        val sfs = from.getFileSystem(hconf)
        if (!sfs.exists(from)) return
        sfs.listStatus(from).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory) {
            if (!n.startsWith(".") && !n.endsWith("__delstage") &&
                !n.endsWith("__rebucket") && !n.endsWith("__trash"))
              walk(st.getPath, s"$toRel/$n", tag)
          } else if (!n.startsWith("_") && !n.startsWith("."))
            pairs += ((st.getPath.toString, s"$toRel/$tag-$n"))
        }
      }
      srcPaths.zipWithIndex.foreach { case (p, i) =>
        walk(hp(p), out, s"m$i")
      }
      DistCopy.copyFiles(spark, pairs.toSeq,
        "graft minhash mergeIndexes transport")
      // transport reconcile BEFORE the layout commit: a lost or
      // truncated payload file fails here, not in served drop sets
      val mergedCensus =
        if (pairs.isEmpty) 0L
        else spark.read.parquet(out).filter(col("_band") === -1)
          .select(col("_id")).distinct().count()
      if (mergedCensus != censusSum)
        throw new IllegalStateException(
          s"merge transport reconcile failed at $out: merged payload " +
            s"census $mergedCensus != sum of source censuses $censusSum " +
            "— the copy was torn; delete the target and re-run")
      LayoutMeta.overwrite(spark, out, Map("buckets" -> bks.head))
    }
  }

  /** GROW (or shrink) the index's bucket count — the explicit growth
    * path for an index whose per-directory row counts outgrew the
    * count fixed at first append. ONE O(index) partition-column
    * rewrite (the same deliberate whole-index discipline as
    * VectorIndex.rebucket): every row keeps its band/key/payload and
    * only `_bkt` is recomputed, so probe results are IDENTICAL before
    * and after — only the directory fan-out changes. The rewrite lands
    * in a sibling dir and swaps in via [[AtomicSwap]]'s journaled
    * pointer-commit (object-store-safe: no atomic-directory-rename
    * assumption); `_META` is written into the sibling BEFORE the swap,
    * so the live index always carries the record matching its layout.
    * Run between batches (single writer, like [[compact]]); a crash
    * mid-swap is finished by [[AtomicSwap.recover]], which every probe
    * and append runs first ([[resolveBuckets]]) — the staged dir stays
    * authoritative until the promote lands, so no interleaving loses
    * rows. */
  def rebucket(spark: SparkSession, path: String, newBuckets: Int): Unit =
      WriterLock.withLock(spark, path, "minhash rebucket") {
    require(newBuckets > 0, s"newBuckets $newBuckets must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    AtomicSwap.recover(hconf, path)
    val cur = LayoutMeta.resolve(spark, path, Map.empty, Map("buckets" -> 64))("buckets")
    if (cur == newBuckets) return
    def hp(p: String) = new org.apache.hadoop.fs.Path(p)
    val fs = hp(path).getFileSystem(hconf)
    val tmpPath = path + "__rebucket"
    val trashPath = path + "__trash"
    if (fs.exists(hp(tmpPath))) fs.delete(hp(tmpPath), true) // stale attempt
    if (fs.exists(hp(trashPath))) fs.delete(hp(trashPath), true) // pre-journal debris
    spark.read.parquet(path)
      .select(col("_id"), col("_bk"), col("_sh"), col("_band"))
      .withColumn("_bkt",
        when(col("_band") === -1, pmod(xxhash64(col("_id")), lit(newBuckets.toLong)))
          .otherwise(pmod(col("_bk"), lit(newBuckets.toLong))).cast("int"))
      // one file per directory, same discipline as append/compact;
      // count pinned — see append (r21)
      .repartition(2 * newBuckets, col("_band"), col("_bkt"))
      .write.partitionBy("_band", "_bkt").parquet(tmpPath)
    LayoutMeta.overwrite(spark, tmpPath, Map("buckets" -> newBuckets))
    AtomicSwap.swapIn(hconf, path, tmpPath)
  }
}
