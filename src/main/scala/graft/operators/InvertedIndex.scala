package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase search.
  *
  * BM25/TF-IDF ([[TextAnalytics]]) rank by bag-of-words; an exact
  * PHRASE query ("data processing", quoted search) needs token
  * POSITIONS. The naive plan — `text LIKE '%phrase%'` — scans every
  * byte of a 100 TB corpus per query; the index plan touches only the
  * phrase's own tokens' postings: filter the postings to the K phrase
  * tokens (predicate pushdown into the postings scan — at scale the
  * postings persist partitioned by token hash so this prunes
  * partitions), then K-1 equijoins on (doc, position) check
  * adjacency. Work is proportional to the RAREST token's posting list,
  * not the corpus.
  *
  * Tokenization is the engine's standard one (lowercase,
  * `[^a-z0-9]+` splits, empties dropped) so phrase semantics line up
  * with BM25/dedup — and the DuckDB oracle replays it token-for-token.
  */
object InvertedIndex {

  /** One row per token occurrence: (doc, pos, token), pos 1-based in
    * the filtered token stream. */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "")))
      .select(col("doc"), (col("pos") + 1).as("pos"), col("col").as("token"))

  // ---------- persisted index (the at-scale layout) ----------
  //
  // q161's per-query postings build reads the whole corpus once per
  // phrase; the PERSISTED index pays that scan once at build time and
  // then serves every phrase query from the token-hash-bucketed layout
  // below: postings partition by `_tbkt = xxhash64(token) % buckets`,
  // so a probe's `isin` over its tokens' buckets is a PARTITION filter
  // — directories that hold none of the phrase's tokens are never
  // opened, and within the surviving buckets the token equality pushes
  // into the parquet scan. Query I/O is proportional to the phrase
  // tokens' bucket shares of the corpus, never the corpus. The bucket
  // count is part of the layout, so it persists in `_META`
  // ([[LayoutMeta]], the Hamming-index discipline): probes resolve it
  // from the written record and an explicitly conflicting value throws
  // instead of pruning the wrong directories.

  private def bucketCol(buckets: Int) =
    pmod(xxhash64(col("token")), lit(buckets.toLong)).cast("int").as("_tbkt")

  /** Doc-length sidecar dir: one (doc, dl) row per INPUT doc per batch
    * — dl from the same tokenization, INCLUDING tokenless docs (dl=0),
    * so [[bm25Search]]'s corpus stats (N, avgdl) match
    * [[TextAnalytics.bm25TopK]]'s exactly. Bucketed by doc hash so
    * erasure rewrites only the victims' buckets; the leading
    * underscore keeps the subtree invisible to the root postings
    * scan. Doc-count-sized, never postings-sized. */
  private def doclensDir(path: String) = s"$path/_doclens"

  private def doclens(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol).as("doc"),
        size(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "")).as("dl"))
      .withColumn("_dbkt",
        pmod(xxhash64(col("doc")), lit(buckets.toLong)).cast("int"))

  // ---------- corpus-stats rollup (the N/avgdl sidecar's sidecar) ----
  //
  // [[bm25Search]]/[[tfidfSearch]] need only TWO numbers from the
  // corpus — N (doc count, incl. dl=0 docs) and sum(dl) — yet
  // aggregating the doc-count-sized `_doclens` sidecar per query is
  // still an O(docs) job at 10^10 docs. The rollup is the KLL/HLL
  // sidecar discipline applied to those two numbers: each
  // write/append lands ONE (fp, n_docs, sum_dl) stat row, merged (a
  // two-long sum over a handful of rows) at query time — per-query
  // corpus-stats cost becomes O(batches since last compaction),
  // independent of doc count. `fp` is a content fingerprint
  // (bit_xor of xxhash64(doc, dl) over the batch's deduped rows):
  // a caller-replayed append lands a bit-identical stat row that the
  // read-side full-row dedupe collapses, mirroring exactly how the
  // full aggregate's global (doc, dl) dedupe absorbs the replayed
  // sidecar rows themselves. [[deleteDocs]] nets the rows minus its
  // victims into one consolidated row (commit order: stage → delete
  // olds → move in, so the only crash-visible intermediate state is
  // an EMPTY stats dir — and an empty/missing rollup falls back to
  // the exact full aggregate). [[compactIndex]] rebuilds the rollup
  // from the sidecar itself on the compaction cadence, healing the
  // one drift window that survives a crash (sidecar rewritten, stats
  // not yet committed). Scores stay bit-identical to the full
  // aggregate: same two longs in, same double arithmetic out. One
  // assumed input shape: a batch carries ONE row per doc (every
  // caller here does — the streaming ingest dedupes before
  // appending); duplicate rows WITHIN one batch would overcount until
  // the next compaction heal, while cross-batch duplicates — the
  // replay case that actually occurs — are exactly what the
  // freshness probe absorbs.

  private def statsDir(path: String) = s"$path/_stats"

  /** A one-row (fp, n_docs, sum_dl) stats frame from driver-side
    * values (observed during the sidecar write). */
  private def statsRowDf(spark: org.apache.spark.sql.SparkSession,
      fp: Long, n: Long, sumDl: Long): DataFrame = {
    import spark.implicits._
    // no repartition(1): a one-row LocalRelation already writes as a
    // single task — the explicit repartition only added a shuffle
    // round-trip per stats write (r21)
    Seq((fp, n, sumDl)).toDF("fp", "n_docs", "sum_dl").coalesce(1)
  }

  private def visibleStatFiles(fs: org.apache.hadoop.fs.FileSystem,
      sd: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(sd)) Seq.empty
    else fs.listStatus(sd).toSeq.filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath)

  /** The sidecar's data files (depth-1 under `_dbkt=*`), listed
    * explicitly so tmp staging dirs never leak into a read. */
  private def sidecarFiles(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    if (!fs.exists(base)) Seq.empty
    else fs.globStatus(new org.apache.hadoop.fs.Path(base, "_dbkt=*")).toSeq
      .map(_.getPath).filter(_.getName.matches("_dbkt=\\d+"))
      .flatMap(d => fs.listStatus(d).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getPath))

  /** Replace the rollup with one consolidated (n, sumDl) row. Commit
    * order stages the row OUTSIDE visibility, deletes the old rows,
    * then moves the staged row in — a crash at any point leaves
    * either the old rows (sidecar unchanged yet → still exact) or an
    * empty dir (reader falls back to the exact full aggregate), never
    * a double count. */
  private def commitStats(spark: org.apache.spark.sql.SparkSession,
      path: String, n: Long, sumDl: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val sd = new Path(statsDir(path))
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val olds = visibleStatFiles(fs, sd)
    val stage = new Path(sd, "_stage_tmp")
    if (fs.exists(stage)) fs.delete(stage, true)
    val fp = org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          s"graft-stats-consolidated:$n:$sumDl"),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    import spark.implicits._
    Seq((fp, n, sumDl)).toDF("fp", "n_docs", "sum_dl").coalesce(1)
      .write.parquet(stage.toString)
    olds.foreach(f => fs.delete(f, false))
    fs.listStatus(stage).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-")).zipWithIndex.foreach {
        case (f, i) =>
          require(fs.rename(f, new Path(sd,
            s"stats-${java.util.UUID.randomUUID().toString.take(8)}-$i.parquet")),
            s"stats move failed: $f")
      }
    fs.delete(stage, true)
  }

  /** One (\_n, \_sumdl) row of corpus totals: merged from the rollup
    * when stat rows exist (O(batches), doc-count-independent), else
    * the exact full-sidecar aggregate (legacy indexes, or the empty
    * crash window of [[commitStats]]). Values are identical longs
    * either way, so every downstream score is bit-identical. */
  private[graft] def corpusStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val sd = new Path(statsDir(path))
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statFiles = visibleStatFiles(fs, sd)
    if (statFiles.nonEmpty)
      spark.read.parquet(statFiles.map(_.toString): _*)
        .dropDuplicates("fp", "n_docs", "sum_dl") // replayed appends
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("_n"),
          coalesce(sum(col("sum_dl")), lit(0L)).as("_sumdl"))
    else {
      val dlFiles = sidecarFiles(fs, new Path(doclensDir(path)))
      if (dlFiles.isEmpty)
        spark.range(1).select(lit(0L).as("_n"), lit(0L).as("_sumdl"))
      else
        spark.read.parquet(dlFiles.map(_.toString): _*)
          .dropDuplicates("doc", "dl")
          .agg(count(lit(1)).as("_n"),
            coalesce(sum(col("dl").cast("long")), lit(0L)).as("_sumdl"))
    }
  }

  /** Stored postings carry the owning doc's token count (`dl`)
    * DENORMALIZED on every row (+4 bytes/posting): [[bm25Search]] then
    * needs no join against the doc-count-sized length table — at
    * corpus scale that join shuffles every (doc, dl) pair per query,
    * while the denormalized column rides the already-pruned postings
    * read for free. The sidecar still exists for what postings cannot
    * answer: corpus totals (N, sum dl — including dl=0 docs that have
    * no postings at all) and per-doc erasure. */
  private def postingsWithDl(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "").as("_toks"))
      .select(col("doc"), size(col("_toks")).as("dl"),
        posexplode(col("_toks")))
      .select(col("doc"), (col("pos") + 1).as("pos"), col("col").as("token"),
        col("dl"))

  /** Build (full rewrite) the persisted postings index at `path`. */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit =
      WriterLock.withLock(df.sparkSession, path, "writeIndex") {
    require(buckets >= 1, "buckets must be >= 1")
    postingsWithDl(df, idCol, textCol)
      .withColumn("_tbkt", bucketCol(buckets))
      // one narrow shuffle on the partition column buys ONE file per
      // bucket directory; a direct partitionBy write emits up to
      // tasks x buckets files. The partition COUNT is pinned to the
      // bucket count (r21, guide §2.4/§6): an unpinned repartition(col)
      // lets AQE coalesce this small exchange to ONE task, which then
      // writes every bucket's file serially — the write wants exactly
      // one task per bucket at every scale (the one-file-per-dir
      // invariant already caps parallelism at `buckets`).
      .repartition(buckets, col("_tbkt"))
      .write.mode("overwrite").partitionBy("_tbkt").parquet(path)
    // NOT observe/CollectMetrics: Spark 4's Observation lazily
    // initializes the session's ObservationManager, which is not
    // serializable — after one observe, ANY later closure that
    // captures the session (an ML model summary, a user lambda)
    // dies with "Task not serializable". Library code must not
    // poison the session; the checkpointed doc-length frame makes
    // the explicit stats aggregation a cheap cached-read job.
    val dl = doclens(df, idCol, textCol, buckets).localCheckpoint(true)
    dl.repartition(buckets, col("_dbkt"))
      .write.mode("overwrite").partitionBy("_dbkt").parquet(doclensDir(path))
    val m = dl.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl").cast("long")), lit(0L)).as("s"),
      coalesce(expr("bit_xor(xxhash64(doc, dl))"), lit(0L)).as("fp")).head()
    statsRowDf(df.sparkSession, m.getLong(2), m.getLong(0), m.getLong(1))
      .write.mode("overwrite").parquet(statsDir(path))
    LayoutMeta.overwrite(df.sparkSession, path, Map("buckets" -> buckets))
  }

  /** Append a batch's postings to an existing index — the incremental
    * crawl-ingest form; one new file per touched bucket. Re-ingesting
    * a CHANGED document requires [[deleteDocs]] first (the update
    * contract of every append-only index here); bit-identical replays
    * are harmless — probes and [[bm25Search]] dedupe them. */
  def appendIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = LayoutMeta.Unspecified): Unit =
      WriterLock.withLock(df.sparkSession, path, "appendIndex") {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val bk = LayoutMeta.resolve(spark, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    // stats delta = the batch docs NOT already in the sidecar: a
    // replay — whole-batch or any subset of earlier batches (the
    // documented harmless-replay contract) — contributes zero,
    // mirroring how the full aggregate's global dedupe absorbs the
    // duplicate rows. The freshness anti-join reads only the batch's
    // own doc-hash bucket dirs (files listed BEFORE the write, so the
    // batch never shadows itself) — the same O(touched dirs) class as
    // [[deleteDocs]]. One explicit aggregation job over the
    // CHECKPOINTED frame (not observe/CollectMetrics, which would
    // lazily initialize the session's non-serializable
    // ObservationManager and break any later session-capturing
    // closure — see writeIndex).
    val dl = doclens(df, idCol, textCol, bk).localCheckpoint(true)
    val dlBase = new Path(doclensDir(path))
    val fs = dlBase.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dbkts = dl.select(col("_dbkt")).distinct()
      .collect().map(_.getInt(0)) // bounded by `buckets`
    val existingFiles = dbkts.map(v => new Path(dlBase, s"_dbkt=$v"))
      .filter(fs.exists(_))
      .flatMap(d => fs.listStatus(d).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getPath)) // an erasure-emptied dir holds no files
    // freshness key is (doc, dl) — the SAME key the exact fallback
    // aggregate ([[corpusStats]] legacy path, [[compactIndex]] heal)
    // dedupes on. Anti-joining on doc alone would zero the delta for
    // a doc re-appended with CHANGED text while the fallback counts
    // both (doc, dl) variants, silently diverging rollup vs heal; on
    // the shared key both paths count the contract-violating re-append
    // twice and stay bit-identical until deleteDocs+compact repairs it.
    val fresh =
      if (existingFiles.isEmpty) dl
      else dl.join(
        spark.read.parquet(existingFiles.map(_.toString): _*)
          .select(col("doc"), col("dl")).distinct(),
        Seq("doc", "dl"), "left_anti")
    val m = fresh.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl").cast("long")), lit(0L)).as("s"),
      coalesce(expr("bit_xor(xxhash64(doc, dl))"), lit(0L)).as("fp")).head()
    dl.repartition(bk, col("_dbkt"))
      .write.mode("append").partitionBy("_dbkt").parquet(doclensDir(path))
    // stats row lands right after the sidecar write: a crash in the
    // postings append below leaves stats already exact, and the
    // completing rerun contributes a zero delta (docs now all seen)
    if (m.getLong(0) != 0L)
      statsRowDf(spark, m.getLong(2), m.getLong(0), m.getLong(1))
        .write.mode("append").parquet(statsDir(path))
    postingsWithDl(df, idCol, textCol)
      .withColumn("_tbkt", bucketCol(bk))
      // pinned to the bucket count — see writeIndex (r21)
      .repartition(bk, col("_tbkt"))
      .write.mode("append").partitionBy("_tbkt").parquet(path)
    LayoutMeta.commit(spark, path, Map("buckets" -> bk))
  }

  /** Two source indexes of a merge share at least one doc id — the
    * [[appendIndex]] disjointness contract is violated and the merged
    * stats rollup would silently double-count N/avgdl, drifting every
    * BM25 score on the merged index. Thrown BEFORE any byte moves. */
  final class OverlappingSources(msg: String)
    extends IllegalArgumentException(msg)

  /** MERGE two persisted indexes into `out` (r18) — the shard-combine
    * operational tool: per-epoch or per-tenant builds folding into one
    * serving index. All three constituents are mergeable BY
    * CONSTRUCTION — postings and doclens files are immutable one-write
    * parquet whose rows probes dedupe/aggregate, and the stats rollup
    * is a sum of per-batch rows — so the merge is pure FILE TRANSPORT:
    * every data file copies into the same bucket dir under `out`
    * (names prefixed per source so equal part names never collide),
    * no shuffle, no decode, no re-tokenization; I/O = bytes copied.
    * The transport is a [[DistCopy]] Spark job over the file list
    * (r19): the driver walks NAMES only, every byte moves
    * executor-side — merging N shard indexes of TBs parallelizes
    * across the cluster instead of funneling through one JVM.
    *
    * Contracts, all enforced loudly (r19): layouts must agree on
    * `buckets` (a probe prunes by token-hash bucket — merging
    * mismatched layouts would misfile postings; [[compactIndex]]
    * +rebuild or re-append first); doc sets must be DISJOINT —
    * verified by a column-pruned distinct-doc census across the
    * source doclens sidecars before any byte moves, throwing
    * [[OverlappingSources]] naming colliding ids (a shared doc would
    * double-count the stats rollup's N/avgdl and drift every merged
    * BM25 score); and the merge holds the [[WriterLock]] lease on the
    * OUTPUT and on EVERY SOURCE for the duration — sources must be
    * quiescent, or a concurrent append/compact mid-transport could
    * yield a torn copy (a postings file without its doclens/stats
    * siblings). After transport the merged doclens census must equal
    * the sum of the source censuses, else the copy itself was torn
    * and the merge throws instead of serving a partial index. */
  def mergeIndexes(spark: org.apache.spark.sql.SparkSession, src1: String,
      src2: String, out: String): Unit =
    mergeIndexes(spark, Seq(src1, src2), out)

  /** N-way [[mergeIndexes]] — the general shard-combine (per-epoch
    * builds folding into one serving index merge in ONE pass, not a
    * chain of pairwise merges and intermediate copies). */
  def mergeIndexes(spark: org.apache.spark.sql.SparkSession,
      srcPaths: Seq[String], out: String): Unit = {
    import org.apache.hadoop.fs.Path
    require(srcPaths.size >= 2, "merge needs at least two source indexes")
    // output lease + every source lease: withLock never waits, so a
    // busy source fails fast (no deadlock ordering concern)
    def locked[T](ps: List[String])(body: => T): T = ps match {
      case Nil => body
      case h :: t =>
        WriterLock.withLock(spark, h, "mergeIndexes")(locked(t)(body))
    }
    locked((out +: srcPaths).toList) {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(out).getFileSystem(hconf)
    val srcs = srcPaths.zipWithIndex.map { case (p, i) => s"m$i" -> p }
    val bks = srcs.map { case (_, p) =>
      LayoutMeta.read(spark, p).flatMap(_.get("buckets")).getOrElse(
        throw new IllegalArgumentException(s"no index _META at $p"))
    }
    require(bks.distinct.size == 1,
      s"bucket layouts differ (${bks.mkString(",")}): a merged " +
        "probe would prune the wrong directories and silently miss " +
        "postings; rebuild the outliers on the common layout first")
    val outP = new Path(out)
    require(!fs.exists(outP) || fs.listStatus(outP).isEmpty,
      s"merge target $out must be empty (merge is a create, not an append)")
    // doc-disjointness census: doc column only (pruned scan of the
    // doclens sidecars — never the postings), distinct per source so
    // legitimate within-source replay duplicates don't trip it
    def srcDocs(p: String): DataFrame = {
      val dd = new Path(doclensDir(p))
      if (dd.getFileSystem(hconf).exists(dd))
        spark.read.parquet(doclensDir(p)).select(col("doc")).distinct()
      else spark.range(0).select(col("id").as("doc"))
    }
    val censuses = srcs.map { case (tag, p) =>
      tag -> srcDocs(p).localCheckpoint(true)
    }
    val censusSum = MergeCensus.requireDisjoint(censuses, "doc", colliding =>
      throw new OverlappingSources(
        s"source indexes share doc ids (first ${colliding.length}: " +
          s"${colliding.mkString(", ")}): merging would double-count " +
          "the stats rollup's N/avgdl and drift every BM25 score on " +
          "the merged index; deleteDocs the duplicates from all but " +
          "one source (then compactIndex) first"))
    // file list: driver walks NAMES only (manifest-scale); bytes move
    // in the DistCopy job below
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def walk(from: Path, toRel: String, tag: String): Unit = {
      val sfs = from.getFileSystem(hconf)
      if (!sfs.exists(from)) return
      sfs.listStatus(from).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          // recurse into the data subtrees (_tbkt=*, _doclens/_dbkt=*,
          // _stats) but never into crash debris or hidden dirs
          if (!n.startsWith(".") && n != "_compact_tmp")
            walk(st.getPath, s"$toRel/$n", tag)
        } else if (!n.startsWith("_") && !n.startsWith("."))
          pairs += ((st.getPath.toString, s"$toRel/$tag-$n"))
      }
    }
    srcs.foreach { case (tag, p) => walk(new Path(p), out, tag) }
    DistCopy.copyFiles(spark, pairs.toSeq, "graft mergeIndexes transport")
    // transport reconcile: the merged doclens census must equal the
    // sum of the (verified-disjoint) source censuses — a lost or
    // partial file shows up here instead of in served scores
    val mergedCensus = {
      val dd = new Path(doclensDir(out))
      if (dd.getFileSystem(hconf).exists(dd))
        spark.read.parquet(doclensDir(out)).select(col("doc"))
          .distinct().count()
      else 0L
    }
    if (mergedCensus != censusSum)
      throw new IllegalStateException(
        s"merge transport reconcile failed at $out: merged doclens " +
          s"census $mergedCensus != sum of source censuses $censusSum " +
          "— the copy was torn; delete the target and re-run")
    LayoutMeta.overwrite(spark, out, Map("buckets" -> bks.head))
    }
  }

  /** BM25 top-k SERVED FROM THE PERSISTED INDEX — same scorer, same
    * expression shapes, same fold order as [[TextAnalytics.bm25TopK]]
    * (scores are bit-identical), but the per-query cost is the query
    * terms' posting lists plus a merge of the O(batches) stats rollup
    * — never a corpus scan, a corpus re-tokenization, or even a
    * doc-count-sized aggregate.
    * The serving shape of lexical retrieval at 100 TB: the corpus pays
    * tokenization once at ingest. */
  def bm25Search(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    TextAnalytics.validateTerms(terms)
    val pruned = readPostingsDl(spark, path, terms, buckets)
    // corpus totals (N, sum dl incl. dl=0 docs) come from the stats
    // ROLLUP — O(batches) rows, doc-count-independent; per-doc dl
    // rides the pruned postings themselves — no join against the
    // whole doc population and no per-query sidecar aggregate
    val stats = corpusStats(spark, path)
    val tf = pruned.select(col("doc"), col("dl").as("_dl"),
        col("token").as("_term"))
      .groupBy(col("doc"), col("_dl"), col("_term"))
      .agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    val per = tf.join(broadcast(dfreq), "_term").crossJoin(broadcast(stats))
      .withColumn("_avgdl",
        col("_sumdl").cast("double") / col("_n").cast("double"))
      // expression SHAPES mirror bm25TopK token for token — identical
      // rounding sequences, so indexed and in-memory scores hash-match
      .withColumn("_idf",
        log((col("_n").cast("double") - col("_df").cast("double") + lit(0.5)) /
          (col("_df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("_sat",
        col("_tf").cast("double") * lit(k1 + 1.0) /
          (col("_tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("_dl").cast("double") / col("_avgdl"))))
      .withColumn("_s", col("_idf") * col("_sat"))
    TextAnalytics.foldTermScores(per, "doc", terms)
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))
  }

  /** BM25 top-k ACROSS N SHARD INDEXES with no physical merge (r19) —
    * the [[VectorIndex]] scatter-gather discipline applied to lexical
    * retrieval: per-epoch/per-tenant postings indexes keep serving in
    * place, and a query sees them as one corpus. Scores are
    * BIT-IDENTICAL to [[bm25Search]] over the [[mergeIndexes]]-merged
    * index (spec + gate hash-match):
    *
    * Two phases. GATHER THE CONSTANTS, tiny: each shard contributes
    * its O(batches) stats rollup row and a per-term doc-frequency row
    * from its term-pruned probe; both sum globally (longs — exactly
    * the values the merged index's rollup/probe would produce, since
    * shard doc sets are disjoint by the [[appendIndex]] contract).
    * SCATTER THE SCORING: each shard scores ITS OWN pruned postings
    * against the broadcast global (N, Σdl, df) — identical expression
    * shapes to [[bm25Search]], and the per-doc term fold never crosses
    * shards (a doc lives in one shard) — then keeps its local top-k.
    * The final merge orders k·shards rows and takes k: per-query
    * cross-shard traffic is k rows + the constant rows, never a
    * posting. Per-shard I/O stays the term-pruned bucket dirs.
    *
    * DISJOINTNESS IS TRUSTED PER QUERY (r20 note): verifying it would
    * cost a full cross-shard doc census on every search, so this
    * function (like every sharded probe) relies on the appendIndex
    * routing contract instead. A shard SET is certified once with
    * [[validateShards]] — run it when the set is assembled (new epoch
    * shard, tenant onboarding), not per query; a shared doc would
    * double-count df and dl rows here and surface a doc twice in the
    * union probes. */
  def bm25SearchSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, pinned: Boolean = true): DataFrame = {
    TextAnalytics.validateTerms(terms)
    val (tfs, dfreq, totals) = shardedTfGather(spark, paths, terms,
      withDl = true, pinned = pinned)
    val perShardTopK = tfs.map { tf =>
      val per = tf.join(broadcast(dfreq), "_term")
        .crossJoin(broadcast(totals))
        .withColumn("_avgdl",
          col("_sumdl").cast("double") / col("_n").cast("double"))
        .withColumn("_idf",
          log((col("_n").cast("double") - col("_df").cast("double") + lit(0.5)) /
            (col("_df").cast("double") + lit(0.5)) + lit(1.0)))
        .withColumn("_sat",
          col("_tf").cast("double") * lit(k1 + 1.0) /
            (col("_tf").cast("double") +
              lit(k1) * (lit(1.0 - b) +
                lit(b) * col("_dl").cast("double") / col("_avgdl"))))
        .withColumn("_s", col("_idf") * col("_sat"))
      TextAnalytics.foldTermScores(per, "doc", terms)
        .orderBy(col("score").desc, col("doc"))
        .limit(k)
    }
    mergeShardTopK(perShardTopK, k)
  }

  /** Shared scatter-gather scaffolding of the SCORED sharded probes
    * ([[bm25SearchSharded]]/[[tfidfSearchSharded]]/
    * [[moreLikeThisSharded]]) — factored (r20 review): three
    * hand-copies of the gather were exactly the drift risk the scored
    * families cannot afford, since every copy must stay
    * expression-shape-identical for the oracles to hash-match.
    *  - pin each shard's term-pruned tf on the [[Par]] pool (the pins
    *    are EAGER checkpoints — serialized they cost Σ(shards) wall
    *    time, overlapped max(shard)); one probe per shard feeds BOTH
    *    the df gather and the scoring scatter;
    *  - sum the global per-term df from the pinned tfs;
    *  - sum the corpus totals (N, Σdl) from the O(batches) shard stats
    *    rollups — `withDl = false` callers simply ignore `_sumdl`
    *    (same `_n`, value-identical scores).
    * `withDl` also carries the denormalized per-doc dl column BM25's
    * saturation needs (and widens the tf key by it — dl is
    * functionally dependent on doc, so the counts are unchanged). */
  private def shardedTfGather(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], terms: Seq[String], withDl: Boolean,
      pinned: Boolean = true)
      : (Seq[DataFrame], DataFrame, DataFrame) = {
    require(paths.nonEmpty, "at least one shard index required")
    def tfOf(p: String): DataFrame = {
      val pruned =
        if (withDl)
          readPostingsDl(spark, p, terms, LayoutMeta.Unspecified)
            .select(col("doc"), col("dl").as("_dl"), col("token").as("_term"))
            .groupBy(col("doc"), col("_dl"), col("_term"))
        else
          readPostings(spark, p, terms)
            .select(col("doc"), col("token").as("_term"))
            .groupBy(col("doc"), col("_term"))
      pruned.agg(count(lit(1)).as("_tf"))
    }
    // pinned=false builds a FULLY LAZY plan: no Par pool, no eager
    // localCheckpoint. Required when the plan is constructed INSIDE
    // Catalyst analysis (the graft_bm25_sharded TVF builder runs under
    // the SessionCatalog monitor — eager checkpoint jobs on pool
    // threads would re-enter analysis on those threads and deadlock on
    // that monitor; observed hang, r20). Cost: each consumer of a
    // shard's tf (the df gather + the scoring leg) re-evaluates the
    // term-pruned probe instead of sharing a checkpoint — identical
    // values, one extra pruned-bucket read per shard.
    val tfs =
      if (pinned) Par.inParallel(paths)(p => tfOf(p).localCheckpoint(true))
      else paths.map(tfOf)
    val dfreq = tfs
      .map(_.groupBy(col("_term")).agg(count(lit(1)).as("_c")))
      .reduce(_ unionByName _)
      .groupBy(col("_term")).agg(sum(col("_c")).as("_df"))
    val totals = paths.map(p => corpusStats(spark, p))
      .reduce(_ unionByName _)
      .agg(coalesce(sum(col("_n")), lit(0L)).as("_n"),
        coalesce(sum(col("_sumdl")), lit(0L)).as("_sumdl"))
    (tfs, dfreq, totals)
  }

  /** The scored scatter probes' k-merge tail: k·shards rows in, the
    * global (score desc, doc) top-k out. */
  private def mergeShardTopK(perShard: Seq[DataFrame], k: Int): DataFrame =
    perShard.reduce(_ unionByName _)
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))

  /** TF-IDF top-k ACROSS N SHARD INDEXES with no physical merge (r20)
    * — [[bm25SearchSharded]]'s discipline on the simpler scorer:
    * gather the constants (corpus N summed from the shard stats
    * rollups, per-term df summed from the term-pruned probes), scatter
    * the scoring (each shard scores its own pinned tf against the
    * broadcast globals — identical expression shapes to
    * [[tfidfSearch]], the per-doc fold never crosses shards), merge
    * k·shards rows. BIT-identical to [[tfidfSearch]] over the
    * [[mergeIndexes]]-merged index. Disjointness is trusted per query
    * ([[validateShards]] certifies the set once). */
  def tfidfSearchSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], terms: Seq[String], k: Int): DataFrame = {
    TextAnalytics.validateTerms(terms)
    val (tfs, dfreq, totals) = shardedTfGather(spark, paths, terms,
      withDl = false)
    val perShardTopK = tfs.map { tf =>
      val per = tf.join(broadcast(dfreq), "_term")
        .crossJoin(broadcast(totals))
        .withColumn("_s", col("_tf").cast("double") *
          col("_n").cast("double") / col("_df").cast("double"))
      TextAnalytics.foldTermScores(per, "doc", terms)
        .orderBy(col("score").desc, col("doc"))
        .limit(k)
    }
    mergeShardTopK(perShardTopK, k)
  }

  /** Lexical MORE-LIKE-THIS across a disjoint shard set (r20): the
    * [[moreLikeThis]] scorer with [[bm25SearchSharded]]'s gather/
    * scatter protocol — the query document tokenizes DRIVER-side once,
    * its distinct terms prune every shard's probe, corpus N sums from
    * the shard rollups and per-term df from the probes, each shard
    * scores its own postings (integer-exact tf·qtf products, sorted-
    * term fold — the scorer's cross-engine contract is untouched) and
    * keeps a local top-k. BIT-identical to [[moreLikeThis]] on the
    * merged index. */
  def moreLikeThisSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], queryText: String, k: Int,
      excludeDoc: Option[Long] = None): DataFrame = {
    val toks = queryText.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    require(toks.nonEmpty, "moreLikeThisSharded query text has no tokens")
    val qtf = toks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val terms = qtf.keys.toSeq.sorted
    val (tfs, dfreq, totals) = shardedTfGather(spark, paths, terms,
      withDl = false)
    import spark.implicits._
    val qw = terms.map(t => (t, qtf(t))).toDF("_term", "_qtf")
    val perShardTopK = tfs.map { tf =>
      val per = tf.join(broadcast(dfreq), "_term")
        .join(broadcast(qw), "_term")
        .crossJoin(broadcast(totals))
        .withColumn("_s", (col("_tf") * col("_qtf")).cast("double") *
          col("_n").cast("double") / col("_df").cast("double"))
      val scored = TextAnalytics.foldTermScores(per, "doc", terms)
      excludeDoc.map(id => scored.filter(col("doc") =!= id)).getOrElse(scored)
        .orderBy(col("score").desc, col("doc"))
        .limit(k)
    }
    mergeShardTopK(perShardTopK, k)
  }

  /** PSEUDO-RELEVANCE-FEEDBACK search across a disjoint shard set
    * (r20) — [[TextAnalytics.prfExpandTopK]]'s two-round protocol with
    * BOTH retrieval rounds served by [[bm25SearchSharded]], so the
    * full Rocchio-style loop (seed query → top `fbDocs` feedback docs
    * → mine `expand` expansion terms → re-query) runs against standing
    * shard state with no corpus rescan for RANKING. The one corpus
    * touch is the feedback-mining leg: expansion terms come from the
    * feedback docs' TEXTS, which the postings index cannot serve
    * without a full-bucket scan (term→doc is the stored direction), so
    * it reads `corpus`'s (id, text) under a broadcast semi-join of the
    * fbDocs ids — at scale an id-pruned point read of fbDocs rows,
    * never a scan. Selection orders are the in-memory operator's
    * exactly (floored micro-unit score desc, then id — the
    * cross-engine contract), applied OVER the sharded probes' raw
    * scores, which are bit-identical to the whole-corpus scorer's.
    *
    * `pool` bounds each retrieval round's candidate set (k·shards rows
    * merge per round): the micro-unit cuts are provably equal to the
    * whole-corpus operator's when `pool >=` the number of docs
    * matching any query term (every candidate survives to the
    * micro-unit re-sort); a smaller pool trades the tail of the
    * raw-score ranking, the standard fbDocs≪pool regime. */
  def prfSearchSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], corpus: DataFrame, idCol: String,
      textCol: String, seeds: Seq[String], fbDocs: Int = 10,
      expand: Int = 3, k: Int = 10, pool: Int = 10000): DataFrame = {
    require(fbDocs >= 1 && expand >= 0 && k >= 1,
      "fbDocs >= 1, expand >= 0, k >= 1 required")
    require(pool >= math.max(fbDocs, k),
      s"pool $pool must cover fbDocs $fbDocs and k $k")
    val seedToks = seeds.map(_.toLowerCase).distinct.sorted
    val microCut = floor(col("score") * lit(1000000.0)).cast("long")
    val fbIds = bm25SearchSharded(spark, paths, seedToks, k = pool)
      .orderBy(microCut.desc, col("doc"))
      .limit(fbDocs)
      .select(col("doc").as(idCol))
    // expansion mining: expression shapes mirror prfExpandTopK token
    // for token — identical tokenization, seed exclusion, (fdf desc,
    // term) cut — so the expanded term set is the operator's exactly
    val expTerms = corpus.join(broadcast(fbIds), idCol)
      .select(explode(array_distinct(filter(split(lower(col(textCol)),
        "[^a-z0-9]+"), t => t =!= ""))).as("term"))
      .filter(!col("term").isin(seedToks: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("_fdf"))
      .orderBy(col("_fdf").desc, col("term"))
      .limit(expand)
      .select(col("term")).collect().map(_.getString(0)).toSeq
    val allTerms = (seedToks ++ expTerms).distinct.sorted
    bm25SearchSharded(spark, paths, allTerms, k = pool)
      .orderBy(microCut.desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))
  }

  /** [[snippets]] across a disjoint shard set (r20): window selection
    * is purely per-doc (positions self-join within each doc), so the
    * sharded answer is the core over the unioned term-pruned probes —
    * see [[phraseSearchSharded]] for the union argument. */
  def snippetsSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], terms: Seq[String], window: Int): DataFrame =
    snippets(readPostingsSharded(spark, paths, terms), terms, window)

  /** CERTIFY a shard set's doc-disjointness (r20, the verdict's ask):
    * one [[MergeCensus.requireDisjoint]] pass over the shards' doclens
    * sidecars — the same census [[mergeIndexes]] runs before moving
    * bytes, WITHOUT the merge. Returns the certified total distinct
    * doc count across the set. Run once when a shard set is ASSEMBLED
    * (a new epoch's index joins the serving set, a tenant onboards) —
    * after that, every sharded probe ([[bm25SearchSharded]],
    * [[phraseSearchSharded]], [[proximitySearchSharded]],
    * [[booleanSearchSharded]]) trusts the certificate instead of
    * paying a cross-shard census per query. Cost: a column-pruned
    * distinct scan of each shard's doclens sidecar (doc ids only,
    * never a posting), one count per shard plus one overlap check —
    * O(total docs) once, not per query. Throws [[OverlappingSources]]
    * naming the first colliders. */
  def validateShards(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String]): Long = {
    import org.apache.hadoop.fs.Path
    require(paths.size >= 2, "a shard set needs at least two shards")
    require(paths.distinct.size == paths.size,
      s"duplicate shard paths: ${paths.mkString(", ")}")
    val hconf = spark.sparkContext.hadoopConfiguration
    def shardDocs(p: String): DataFrame = {
      val dd = new Path(doclensDir(p))
      if (dd.getFileSystem(hconf).exists(dd))
        spark.read.parquet(doclensDir(p)).select(col("doc")).distinct()
      else spark.range(0).select(col("id").as("doc"))
    }
    val censuses = paths.zipWithIndex.map { case (p, i) =>
      s"m$i" -> shardDocs(p).localCheckpoint(true)
    }
    MergeCensus.requireDisjoint(censuses, "doc", colliding =>
      throw new OverlappingSources(
        s"shard set shares doc ids (first ${colliding.length}: " +
          s"${colliding.mkString(", ")}): a shared doc would " +
          "double-count BM25's df/dl and surface twice in every " +
          "sharded probe; deleteDocs the duplicates from all but one " +
          "shard (then compactIndex) before serving the set"))
  }

  /** The stored postings of exactly `tokens` ACROSS a disjoint shard
    * set — the union of each shard's term-pruned [[readPostings]].
    * Because shard doc sets are disjoint ([[validateShards]]), this
    * union IS what [[readPostings]] over the [[mergeIndexes]]-merged
    * index would return (same rows, same (doc,pos,token) key space —
    * the per-shard key dedupe already covers every possible duplicate,
    * since cross-shard dupes would need a shared doc). Per-shard I/O
    * stays the tokens' bucket dirs. */
  def readPostingsSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], tokens: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "at least one shard index required")
    paths.map(p => readPostings(spark, p, tokens)).reduce(_ unionByName _)
  }

  /** [[phraseSearch]] ACROSS N SHARD INDEXES with no physical merge
    * (r20, closing the q235 family): positions never relate across
    * docs and docs never cross shards, so the sharded answer is the
    * phrase core over the unioned term-pruned probes — BIT-identical
    * to [[phraseSearchIndexed]] on the merged index (gate q248
    * hash-matches q174's oracle). Unlike BM25 there are no corpus
    * constants to gather: the union is the whole protocol, and the
    * per-doc join legs/folds stay shard-local rows under the hood.
    * Disjointness is trusted per query; certify the set once with
    * [[validateShards]]. */
  def phraseSearchSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], phrase: Seq[String]): DataFrame =
    phraseSearch(readPostingsSharded(spark, paths, phrase), phrase)

  /** [[proximitySearch]] across a disjoint shard set — see
    * [[phraseSearchSharded]] for the union argument. */
  def proximitySearchSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], terms: Seq[String], slop: Int): DataFrame =
    proximitySearch(readPostingsSharded(spark, paths, terms), terms, slop)

  /** [[booleanSearch]] across a disjoint shard set — see
    * [[phraseSearchSharded]] for the union argument; the conjunction
    * count and the NOT anti-join both key on doc, which never crosses
    * shards. */
  def booleanSearchSharded(spark: org.apache.spark.sql.SparkSession,
      paths: Seq[String], must: Seq[String],
      mustNot: Seq[String] = Seq.empty): DataFrame =
    booleanSearch(readPostingsSharded(spark, paths, must ++ mustNot),
      must, mustNot)

  /** Bucket ids for `toks`, computed DRIVER-SIDE by evaluating the
    * same catalyst `xxhash64` (seed 42) the write path used — zero
    * Spark jobs, where launching one 1-row job per query token made a
    * multi-term BM25/phrase probe pay N scheduler round-trips before
    * any real work. Parity with the written layout is spec-asserted
    * against the Column-API computation. */
  private[graft] def tokenBuckets(toks: Seq[String], bk: Int): Seq[Int] =
    toks.map { t =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType)), 42L)
        .eval(null).asInstanceOf[Long]
      val m = h % bk // pmod: fold a negative remainder back into [0, bk)
      (if (m < 0) m + bk else m).toInt
    }.distinct

  /** The stored postings of exactly `tokens` — reads only the tokens'
    * bucket directories (partition-pruned). Deduped on the natural
    * (doc, pos, token) key, so crash-duplicated files (an interrupted
    * [[compactIndex]]/[[deleteDocs]]) and replayed appends can never
    * inflate a phrase's match count — a posting is unique by
    * construction, duplicates are always debris. */
  def readPostings(spark: org.apache.spark.sql.SparkSession, path: String,
      tokens: Seq[String],
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    val bk = LayoutMeta.resolve(spark, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    val toks = tokens.map(_.toLowerCase).distinct
    val tbkts = tokenBuckets(toks, bk)
    spark.read.parquet(path)
      .filter(col("_tbkt").isin(tbkts.map(Integer.valueOf): _*))
      .filter(col("token").isin(toks: _*))
      .select(col("doc"), col("pos"), col("token"))
      .dropDuplicates("doc", "pos", "token")
  }

  /** [[readPostings]] plus the denormalized `dl` column — the BM25
    * feed. Same pruning, same key dedupe (dl is functionally dependent
    * on doc, so it never widens the key). */
  private def readPostingsDl(spark: org.apache.spark.sql.SparkSession,
      path: String, tokens: Seq[String], buckets: Int): DataFrame = {
    val bk = LayoutMeta.resolve(spark, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    val toks = tokens.map(_.toLowerCase).distinct
    val tbkts = tokenBuckets(toks, bk)
    spark.read.parquet(path)
      .filter(col("_tbkt").isin(tbkts.map(Integer.valueOf): _*))
      .filter(col("token").isin(toks: _*))
      .select(col("doc"), col("pos"), col("token"), col("dl"))
      .dropDuplicates("doc", "pos", "token")
  }

  /** Merge the files of bucket dirs that accumulated more than
    * `minFiles` of them (one file arrives per touched bucket per
    * [[appendIndex]] batch — a crawl ingest compacts on a cadence,
    * exactly like the Hamming index). Each flagged dir's file list is
    * SNAPSHOTTED up front; one staging job rewrites exactly those
    * files' postings DEDUPED to a single file per dir, then per dir:
    * move the replacement in, delete the snapshotted originals — and
    * ONLY those. A concurrent [[appendIndex]] (the streaming ingest
    * maintains this index) landing a file at ANY point is therefore
    * safe: a file outside the snapshot is never read and never
    * deleted, so its rows simply ride alongside the compacted file
    * until the next cadence. A crash between move and delete leaves
    * bit-identical duplicate rows that probes drop ([[readPostings]]'s
    * key dedupe) and the rerun removes; replacements that failed to
    * land leave the originals in place — rows can be transiently
    * doubled, never lost. Returns the number of compacted dirs.
    * `onAfterStage` is a test seam (default no-op) fired between the
    * staging write and the delete loop — the widest race window. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      minFiles: Int = 8, onAfterStage: () => Unit = () => ()): Int =
      WriterLock.withLock(spark, path, "compactIndex") {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return 0
    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    def compactPass(base: Path, dirPattern: String, dirRe: String,
        partCol: String, dedupKeys: Seq[String]): Int = {
      if (!fs.exists(base)) return 0
      // snapshot (dir, exact files) BEFORE anything reads the dirs:
      // the staging read and the delete both operate on this list, so
      // files landed by a concurrent writer are invisible to both
      val flagged: Seq[(Path, Seq[Path])] =
        fs.globStatus(new Path(base, dirPattern)).toSeq
          .map(_.getPath).filter(_.getName.matches(dirRe))
          .map(d => d -> dataFiles(d).map(_.getPath))
          .filter(_._2.size > minFiles)
      if (flagged.isEmpty) return 0
      val tmp = new Path(base, "_compact_tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true) // stale from a prior crash
      spark.read.option("basePath", base.toString)
        .parquet(flagged.flatMap(_._2).map(_.toString): _*)
        .dropDuplicates(dedupKeys.head, dedupKeys.tail: _*) // self-cleaning
        .repartition(flagged.size, col(partCol))
        .write.partitionBy(partCol).parquet(tmp.toString)
      onAfterStage()
      var compacted = 0
      flagged.foreach { case (dir, olds) =>
        val newDir = new Path(tmp, dir.getName)
        val moves =
          if (fs.exists(newDir)) dataFiles(newDir).map { f =>
            fs.rename(f.getPath, new Path(dir, "compact-" + f.getPath.getName))
          }
          else Seq.empty[Boolean]
        // originals go ONLY when every replacement landed (rename
        // returns false on races) — a partial move leaves duplicates,
        // never a gap
        if (moves.nonEmpty && moves.forall(identity)) {
          olds.foreach(f => fs.delete(f, false))
          compacted += 1
        }
      }
      fs.delete(tmp, true)
      compacted
    }
    val ndirs = compactPass(root, "_tbkt=*", "_tbkt=\\d+", "_tbkt",
      Seq("doc", "pos", "token")) +
      compactPass(new Path(doclensDir(path)), "_dbkt=*", "_dbkt=\\d+",
        "_dbkt", Seq("doc", "dl"))
    // stats heal: rebuild the corpus-stats rollup EXACTLY from the
    // sidecar on the compaction cadence — this closes every drift a
    // crash window can leave (stats not yet committed after a
    // sidecar rewrite; a concurrent append double-counted across a
    // consolidation). A concurrent stat row landing after this
    // snapshot is neither read nor deleted — it rides until the next
    // cadence, transiently double-counted at worst, never lost.
    val dlBase = new Path(doclensDir(path))
    val dlFiles = sidecarFiles(fs, dlBase)
    if (fs.exists(dlBase)) {
      if (dlFiles.nonEmpty) {
        val full = spark.read.parquet(dlFiles.map(_.toString): _*)
          .dropDuplicates("doc", "dl")
          .agg(count(lit(1)),
            coalesce(sum(col("dl").cast("long")), lit(0L))).head()
        commitStats(spark, path, full.getLong(0), full.getLong(1))
      } else commitStats(spark, path, 0L, 0L)
    }
    ndirs
  }

  /** Erase documents' postings — the right-to-be-forgotten reach into
    * the text index (the [[MinhashIndex.delete]] sibling). The caller
    * supplies the SAME (id, text) rows that were ingested: the docs'
    * own tokens determine every bucket their postings can live in, so
    * only those dirs are read and rewritten — O(touched buckets),
    * never an index scan. Survivor rows stage in ONE partitioned
    * write (deduped — self-cleaning), then per touched dir: move
    * survivors in, delete the listed originals. A crash mid-commit
    * leaves the victims partially present and survivors duplicated
    * (probes dedupe); RERUNNING with the same rows completes it —
    * the victims are identified from the caller's rows, not from the
    * index, so no commit ordering can strand them. Returns the number
    * of postings removed. */
  def deleteDocs(docs: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = LayoutMeta.Unspecified): Long =
      WriterLock.withLock(docs.sparkSession, path, "deleteDocs") {
    import org.apache.hadoop.fs.Path
    val spark = docs.sparkSession
    val bk = LayoutMeta.resolve(spark, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(hconf)
    def snapshotFiles(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getPath)
    val ids = docs.select(col(idCol).as("doc")).distinct()
    // the doc-length SIDECAR rewrites UNCONDITIONALLY — a tokenless
    // (dl=0) victim touches no postings bucket yet still owns a
    // sidecar row, and leaving it would both leak the id past a
    // right-to-be-forgotten call and keep [[bm25Search]]'s N/avgdl
    // counting an erased doc forever
    val dlBase = new Path(doclensDir(path))
    if (fs.exists(dlBase)) {
      val dbkts = ids
        .select(pmod(xxhash64(col("doc")), lit(bk.toLong)).cast("int").as("_dbkt"))
        .distinct().collect().map(_.getInt(0))
      val dlTouched = dbkts.map(v => new Path(dlBase, s"_dbkt=$v")).filter(fs.exists(_))
      if (dlTouched.nonEmpty) {
        // snapshot files BEFORE the read: a concurrent append's file
        // is then neither read nor deleted — its rows survive intact
        val dlSnap = dlTouched.map(d => d -> snapshotFiles(d))
        val storedDl = spark.read.option("basePath", dlBase.toString)
          .parquet(dlSnap.flatMap(_._2).map(_.toString): _*)
        // victim totals for the stats rollup, materialized BEFORE the
        // rewrite deletes the files this plan reads
        val vRow = storedDl.dropDuplicates("doc", "dl")
          .join(broadcast(ids), Seq("doc"), "left_semi")
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("dl").cast("long")), lit(0L)).as("s")).head()
        val (vN, vS) = (vRow.getLong(0), vRow.getLong(1))
        val dlSurvivors = storedDl.join(broadcast(ids), Seq("doc"), "left_anti")
          .dropDuplicates("doc", "dl")
        replaceDirContents(spark, dlBase, dlSnap, dlSurvivors, "_dbkt")
        // net the rollup minus the victims into one consolidated row.
        // When the rollup is empty/missing (legacy index or a prior
        // crash's fallback window) the sidecar itself — now already
        // post-delete — is the exact base, so nothing is subtracted.
        val sd = new Path(statsDir(path))
        val statRows = visibleStatFiles(fs, sd)
        if (statRows.nonEmpty) {
          val net = spark.read.parquet(statRows.map(_.toString): _*)
            .dropDuplicates("fp", "n_docs", "sum_dl")
            .agg(coalesce(sum(col("n_docs")), lit(0L)),
              coalesce(sum(col("sum_dl")), lit(0L))).head()
          commitStats(spark, path, net.getLong(0) - vN, net.getLong(1) - vS)
        } else {
          val dlFiles = sidecarFiles(fs, dlBase)
          if (dlFiles.nonEmpty) {
            val full = spark.read.parquet(dlFiles.map(_.toString): _*)
              .dropDuplicates("doc", "dl")
              .agg(count(lit(1)),
                coalesce(sum(col("dl").cast("long")), lit(0L))).head()
            commitStats(spark, path, full.getLong(0), full.getLong(1))
          } else commitStats(spark, path, 0L, 0L)
        }
      }
    }
    val victims = postings(docs, idCol, textCol).localCheckpoint(true)
    val tbkts = victims
      .select(pmod(xxhash64(col("token")), lit(bk.toLong)).cast("int").as("_tbkt"))
      .distinct().collect().map(_.getInt(0)) // bounded by `buckets`
    val touched = tbkts.map(b => new Path(path, s"_tbkt=$b")).filter(fs.exists(_))
    if (touched.isEmpty) return 0L // tokenless victims: no postings exist
    val snap = touched.map(d => d -> snapshotFiles(d))
    val stored = spark.read.option("basePath", path)
      .parquet(snap.flatMap(_._2).map(_.toString): _*)
    // count LOGICAL postings erased: crash-debris duplicate files
    // (interrupted compact/delete, replayed appends) must not inflate
    // the report, so dedupe on the natural key first — matching what
    // probes serve
    val removed = stored.dropDuplicates("doc", "pos", "token")
      .join(broadcast(ids), "doc").count()
    val survivors = stored.join(broadcast(ids), Seq("doc"), "left_anti")
      .dropDuplicates("doc", "pos", "token")
    replaceDirContents(spark, new Path(path), snap, survivors, "_tbkt")
    removed
  }

  /** Replace the SNAPSHOTTED data files of partition dirs with
    * `survivors`' rows: ONE staging write partitioned by `partCol`,
    * then per dir — move staged files in under fresh names, delete
    * exactly the files the caller listed BEFORE it read them. Files a
    * concurrent writer lands after the snapshot are neither staged nor
    * deleted, so they ride through untouched. A dir with no staged
    * output lost all its rows: deleting the originals IS the commit.
    * Crash window duplicates, never loses (probes dedupe on natural
    * keys). */
  private def replaceDirContents(spark: org.apache.spark.sql.SparkSession,
      base: org.apache.hadoop.fs.Path,
      snap: Seq[(org.apache.hadoop.fs.Path, Seq[org.apache.hadoop.fs.Path])],
      survivors: DataFrame, partCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(base, "_delstage_tmp")
    if (fs.exists(stage)) fs.delete(stage, true)
    survivors.repartition(snap.size, col(partCol))
      .write.partitionBy(partCol).parquet(stage.toString)
    try {
      snap.foreach { case (dir, olds) =>
        val part = new Path(stage, dir.getName)
        if (fs.exists(part)) {
          fs.listStatus(part).map(_.getPath)
            .filter(_.getName.startsWith("part-"))
            .zipWithIndex.foreach { case (f, i) =>
              require(fs.rename(f, new Path(dir,
                s"del-${java.util.UUID.randomUUID().toString.take(8)}-$i-${f.getName}")),
                s"survivor move failed: $f")
            }
        }
        olds.foreach(f => fs.delete(f, false))
      }
    } finally fs.delete(stage, true)
  }

  /** [[phraseSearch]] served from the PERSISTED index: the pruned
    * bucket read feeds every join leg. */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, phrase: Seq[String],
      buckets: Int = LayoutMeta.Unspecified): DataFrame =
    phraseSearch(readPostings(spark, path, phrase, buckets), phrase)

  /** TF-IDF top-k FROM THE PERSISTED INDEX — [[bm25Search]]'s sibling
    * with [[TextAnalytics.tfidfTopK]]'s scorer, expression shapes and
    * fold order mirrored token for token (scores bit-identical). Costs
    * the query terms' posting buckets + the sidecar's doc count. */
  def tfidfSearch(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k: Int,
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    TextAnalytics.validateTerms(terms)
    val pruned = readPostings(spark, path, terms, buckets)
    val n = corpusStats(spark, path).select(col("_n"))
    val tf = pruned.select(col("doc"), col("token").as("_term"))
      .groupBy(col("doc"), col("_term")).agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    val per = tf.join(broadcast(dfreq), "_term").crossJoin(broadcast(n))
      .withColumn("_s",
        col("_tf").cast("double") * col("_n").cast("double") / col("_df").cast("double"))
    TextAnalytics.foldTermScores(per, "doc", terms)
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))
  }

  /** Lexical "more like this" FROM THE PERSISTED INDEX: rank the
    * corpus by TF-IDF-weighted overlap with a query DOCUMENT —
    * score(d) = Σ_t tf_d(t)·tf_q(t)·N/df(t), the [[tfidfSearch]]
    * scorer with the query's own term frequencies as weights (Lucene's
    * MoreLikeThis family). The query text tokenizes DRIVER-side (one
    * document — never a job), its distinct terms prune the postings
    * read to their bucket dirs, and N comes from the stats rollup; the
    * per-term products keep integer arithmetic exact (tf·qtf as a
    * long) before one double multiply/divide in [[tfidfSearch]]'s
    * shape, and the per-doc sum folds in sorted-term order — so
    * scores replay bit-identically in any engine. Query length is the
    * caller's valve: an MLT query is typically the doc's lead
    * paragraph, not a whole book (every distinct term adds a posting
    * probe, exactly like one more term in a search query). */
  def moreLikeThis(spark: org.apache.spark.sql.SparkSession, path: String,
      queryText: String, k: Int, excludeDoc: Option[Long] = None,
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    val toks = queryText.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    require(toks.nonEmpty, "moreLikeThis query text has no tokens")
    val qtf = toks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val terms = qtf.keys.toSeq.sorted
    val pruned = readPostings(spark, path, terms, buckets)
    val n = corpusStats(spark, path).select(col("_n"))
    val tf = pruned.select(col("doc"), col("token").as("_term"))
      .groupBy(col("doc"), col("_term")).agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    import spark.implicits._
    val qw = terms.map(t => (t, qtf(t))).toDF("_term", "_qtf")
    val per = tf.join(broadcast(dfreq), "_term").join(broadcast(qw), "_term")
      .crossJoin(broadcast(n))
      .withColumn("_s", (col("_tf") * col("_qtf")).cast("double") *
        col("_n").cast("double") / col("_df").cast("double"))
    val scored = TextAnalytics.foldTermScores(per, "doc", terms)
    excludeDoc.map(id => scored.filter(col("doc") =!= id)).getOrElse(scored)
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))
  }

  /** Per-bucket posting counts — the reconciliation census: after any
    * build/append sequence, `sum(n_postings)` must equal the postings
    * count of the corpus the index claims to cover. */
  def censusByBucket(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).groupBy(col("_tbkt"))
      .agg(count(lit(1)).as("n_postings"))

  /** Ordered PROXIMITY search ("terms near each other, in order"):
    * docs where `terms` occur at strictly increasing positions
    * p1 < p2 < … < pk with at most `slop` extra tokens interleaved —
    * span pk − p1 ≤ (k−1) + slop; `slop = 0` degenerates to the exact
    * phrase. Returns each matching doc with the count of matching
    * position tuples. Like [[phraseSearch]], only the query terms'
    * postings are read (a partition-pruned probe when fed from
    * [[readPostings]]), and each adjacency leg is a doc-equijoin with
    * a position band predicate — the band rides the equijoin, so no
    * cartesian plan exists at any scale. Tuple counts are bounded by
    * the product of the terms' in-window frequencies; the tight span
    * bound is the valve that keeps pathological repeat-heavy docs from
    * exploding the join. */
  def proximitySearch(postings: DataFrame, terms: Seq[String],
      slop: Int): DataFrame = {
    require(terms.nonEmpty, "empty terms")
    require(slop >= 0, "slop must be >= 0")
    val toks = terms.map(_.toLowerCase)
    val span = toks.size - 1 + slop
    val pruned = postings.filter(col("token").isin(toks: _*))
    val first = pruned.filter(col("token") === toks.head)
      .select(col("doc"), col("pos").as("_p1"), col("pos").as("_plast"))
    val matches = toks.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, _)) =>
        val leg = pruned.filter(col("token") === t)
          .select(col("doc").as("_d"), col("pos").as("_p"))
        acc.join(leg, acc("doc") === col("_d") &&
            col("_p") > acc("_plast") &&
            col("_p") - acc("_p1") <= lit(span))
          .select(acc("doc"), acc("_p1"), col("_p").as("_plast"))
    }
    matches.groupBy(col("doc")).agg(count(lit(1)).as("n_matches"))
  }

  /** [[proximitySearch]] from the persisted index: reads only the
    * terms' bucket dirs. */
  def proximitySearchIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String], slop: Int,
      buckets: Int = LayoutMeta.Unspecified): DataFrame =
    proximitySearch(readPostings(spark, path, terms, buckets), terms, slop)

  /** SNIPPET WINDOW SELECTION (r18) — the KWIC/highlighting primitive:
    * for every doc matching any query term, the best `window`-token
    * span, i.e. the start position whose [start, start+window) covers
    * the MOST DISTINCT query terms, ties to the earliest start; the
    * caller slices display text from (start, window) client-side.
    * Candidate starts are exactly the matched positions — an optimal
    * window can always slide left until its left edge IS a match — so
    * the search is a positions self-join WITHIN each doc: cost is
    * O(per-doc query-term matches²), bounded by the terms' tf, never
    * by doc length, and the indexed form reads only the query terms'
    * bucket dirs. Deterministic throughout: integer positions, integer
    * coverage, (coverage desc, start asc) argmax. */
  def snippets(postings: DataFrame, terms: Seq[String],
      window: Int): DataFrame = {
    require(terms.nonEmpty, "snippets needs at least one term")
    require(window >= 1, "window must be >= 1")
    val toks = terms.map(_.toLowerCase).distinct
    val m = postings.filter(col("token").isin(toks: _*))
      .select(col("doc"), col("pos"), col("token"))
    // one token per (doc, pos) after the probe's key dedupe, so the
    // anchor set needs no extra distinct
    val anchors = m.select(col("doc"), col("pos").as("_start"))
    val cover = anchors.join(m, "doc")
      .filter(col("pos") >= col("_start") &&
        col("pos") < col("_start") + lit(window))
      .groupBy(col("doc"), col("_start"))
      .agg(countDistinct(col("token")).as("n_terms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc"))
      .orderBy(col("n_terms").desc, col("_start"))
    cover.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc"), col("_start").as("start"), col("n_terms"))
  }

  /** [[snippets]] from the persisted index: the pruned positions read
    * is [[readPostings]]'s. */
  def snippetsIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String], window: Int,
      buckets: Int = LayoutMeta.Unspecified): DataFrame =
    snippets(readPostings(spark, path, terms, buckets), terms, window)

  /** Boolean retrieval: docs containing EVERY `must` term and NONE of
    * the `mustNot` terms. The conjunction is a per-doc distinct-term
    * count over the must terms' postings (no self-join chain — one
    * aggregation regardless of term count); the negation is an
    * anti-join against the mustNot terms' doc lists. Reading from the
    * persisted index this touches only `must ∪ mustNot` bucket dirs —
    * NOT-queries never scan the corpus, because the exclusion list is
    * itself served by the index. */
  def booleanSearch(postings: DataFrame, must: Seq[String],
      mustNot: Seq[String] = Seq.empty): DataFrame = {
    require(must.nonEmpty, "boolean search needs at least one must term")
    val mtoks = must.map(_.toLowerCase).distinct
    val ntoks = mustNot.map(_.toLowerCase).distinct
    val hits = postings.filter(col("token").isin(mtoks: _*))
      .groupBy(col("doc"))
      .agg(countDistinct(col("token")).as("_nt"))
      .filter(col("_nt") === lit(mtoks.size.toLong))
      .select(col("doc"))
    if (ntoks.isEmpty) hits
    else {
      val excl = postings.filter(col("token").isin(ntoks: _*))
        .select(col("doc")).distinct()
      hits.join(excl, Seq("doc"), "left_anti")
    }
  }

  /** [[booleanSearch]] from the persisted index: one pruned read
    * covers both the conjunction and the exclusion legs. */
  def booleanSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, must: Seq[String], mustNot: Seq[String] = Seq.empty,
      buckets: Int = LayoutMeta.Unspecified): DataFrame =
    booleanSearch(readPostings(spark, path, must ++ mustNot, buckets),
      must, mustNot)

  /** Docs containing `phrase` as CONSECUTIVE tokens, with the match
    * count per doc. Only the phrase tokens' postings are read. */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = phrase.map(_.toLowerCase)
    // one pruned scan feeds every join leg
    val pruned = postings.filter(col("token").isin(toks: _*))
    val first = pruned.filter(col("token") === toks.head)
      .select(col("doc"), col("pos"))
    val matches = toks.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        val leg = pruned.filter(col("token") === t)
          .select(col("doc").as("_d"), (col("pos") - i).as("_p"))
        acc.join(leg, acc("doc") === col("_d") && acc("pos") === col("_p"))
          .select(acc("doc"), acc("pos"))
    }
    matches.groupBy(col("doc")).agg(count(lit(1)).as("n_matches"))
  }
}
