package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained keyed aggregate — the materialized-view
  * primitive (COUNT(*) + SUMs per key) kept fresh batch-by-batch
  * without ever re-reading the base data.
  *
  * A 100 TB corpus's dashboard aggregates (tokens per source, spend
  * per customer, events per user) cannot be recomputed per refresh;
  * the IVM discipline is: each batch partial-aggregates (map-side
  * combine reduces it to at most its distinct keys BEFORE the
  * shuffle), lands on a key-hash-bucketed store, and only the buckets
  * whose keys the batch touched are read, merged and atomically
  * swapped ([[AtomicSwap]] journal per bucket — [[Scd]]'s commit
  * machinery, reused). Cost per batch: O(batch) + O(touched buckets'
  * stored keys), independent of history length.
  *
  * The maintenance contract (spec-gated): after ANY sequence of
  * `applyBatch` calls, `read()` equals the one-shot aggregation of the
  * concatenated batches. That only holds when merging is EXACT, so
  * sum columns must be integral or decimal — DOUBLE sums are refused
  * loudly (addition order changes the low bits; the [[Events]] TWAP
  * decimal-guard discipline), widen to decimal upstream instead.
  *
  * Averages and other algebraic aggregates derive at READ time from
  * (count, sum); never store a ratio — ratios don't merge.
  */
object Ivm {

  private def resolveBuckets(spark: org.apache.spark.sql.SparkSession,
      store: String, passed: Int): Int =
    LayoutMeta.resolve(spark, store, Map("nBuckets" -> passed),
      Map("nBuckets" -> 8))("nBuckets")

  private def sumColName(c: String) = s"sum_$c"
  private def minColName(c: String) = s"min_$c"
  private def maxColName(c: String) = s"max_$c"
  private def hllColName(c: String) = s"hll_$c"

  /** Parse a bucket's `_applied` tag file: (writerId, batchId). */
  private def bucketApplied(fs: org.apache.hadoop.fs.FileSystem,
      store: String, b: Int): Option[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(Scd.bucketDir(store, b), "_applied")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    txt.split("\t") match {
      case Array(w, bid) => bid.toLongOption.map(w -> _)
      case _ => None
    }
  }

  /** Fold one batch into the view at `store`. Sum columns must be
    * integral or decimal (exact-merge types). Crash-safety: a crash
    * mid-commit leaves each bucket either old or new, and the journal
    * heals half-done swaps on the next call.
    *
    * Idempotence: pass `batchTag = Some((writerId, batchId))` (e.g.
    * the streaming query id + micro-batch id) and replays become
    * detected no-ops PER BUCKET — each bucket dir carries an
    * `_applied` tag that commits ATOMICALLY with its data in the same
    * swap, so even a crash BETWEEN bucket swaps replays safely: the
    * buckets that swapped skip, the ones that didn't apply. (A global
    * side-ledger can't give that — data and ledger would commit at
    * different instants, and the window between them double-counts.)
    * Without a tag, replay discipline is the caller's ledger's job. */
  def applyBatch(batch: DataFrame, store: String, keyCols: Seq[String],
      sumCols: Seq[String],
      nBuckets: Int = LayoutMeta.Unspecified,
      batchTag: Option[(String, Long)] = None,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      hllCols: Seq[String] = Nil): Unit = {
    require(keyCols.nonEmpty, "need at least one key column")
    val spark = batch.sparkSession
    // min/max/HLL (r18) carry an APPEND-ONLY contract, stricter than
    // count/sum's: a count or sum could in principle fold a retraction
    // (negative delta); min/max and an HLL register array cannot un-see
    // a value. This store is append-only BY CONSTRUCTION — the only
    // mutation is folding a batch in, and [[graft.streaming.StreamOps
    // .ivmIngest]] pins outputMode("append") — so the merge is sound;
    // any future retraction surface must refuse these columns, which is
    // why the contract is stated here rather than assumed. Averages and
    // other ratios still derive at READ time ([[readDerived]]).
    sumCols.foreach { c =>
      val dt = batch.schema(c).dataType
      val exact = dt match {
        case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
             _: DecimalType => true
        case _ => false
      }
      require(exact, s"Ivm: sum column '$c' is $dt — double/float sums " +
        "are order-dependent and break incremental == recompute; cast " +
        "to DECIMAL upstream (the exact-merge contract)")
    }
    val n = resolveBuckets(spark, store, nBuckets)
    val conf = spark.sparkContext.hadoopConfiguration
    (0 until n).foreach { i =>
      AtomicSwap.recover(conf, Scd.bucketDir(store, i))
    }
    // one shuffle, map-side combined: the batch enters the store as at
    // most one row per distinct key. min/max partial-aggregate the same
    // way; the HLL column is a mergeable REGISTER SKETCH (Spark's
    // hll_sketch_agg — KB-sized binary, the profileSketch discipline),
    // so distinct-count maintenance never stores or reshuffles the
    // observed values themselves.
    val aggExprs =
      sumCols.map(c => sum(col(c)).as(sumColName(c))) ++
        minCols.map(c => min(col(c)).as(minColName(c))) ++
        maxCols.map(c => max(col(c)).as(maxColName(c))) ++
        hllCols.map(c => hll_sketch_agg(col(c)).as(hllColName(c)))
    // persist the partial aggregate: it feeds BOTH the affected-bucket
    // collect and the staged commit write below — unpersisted, the
    // whole batch scan+aggregate ran twice per applyBatch (r21, guide
    // §1.2 "don't compute things twice"; persist-not-localCheckpoint so
    // the blocks release at the end of this call instead of pinning
    // until driver GC — the upsertOnce discipline)
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), aggExprs: _*)
      .withColumn("_bucket", Scd.bucketOf(keyCols, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val affected = partial.select(col("_bucket")).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nBuckets
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(conf)
    // replay detection: skip buckets whose _applied tag already covers
    // this (writer, batch) — a crash between bucket swaps leaves a mix,
    // and the replay applies exactly the unswapped remainder
    val pending = batchTag match {
      case None => affected
      case Some((w, bid)) => affected.filter { b =>
        bucketApplied(fs, store, b) match {
          case Some((w2, b2)) => !(w2 == w && b2 >= bid)
          case None => true
        }
      }
    }
    if (pending.isEmpty) return
    val partialPending =
      if (pending.length == affected.length) partial
      else partial.filter(col("_bucket")
        .isin(pending.map(Integer.valueOf).toIndexedSeq: _*))
    val existingDirs = pending.map(Scd.bucketDir(store, _)).filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(conf).exists(path)
    }
    val merged =
      if (existingDirs.isEmpty) partialPending
      else partialPending.unionByName(
        spark.read.parquet(existingDirs.toIndexedSeq: _*)
          .withColumn("_bucket", Scd.bucketOf(keyCols, n)))
    val mergeExprs =
      sumCols.map(c => sum(col(sumColName(c))).as(sumColName(c))) ++
        minCols.map(c => min(col(minColName(c))).as(minColName(c))) ++
        maxCols.map(c => max(col(maxColName(c))).as(maxColName(c))) ++
        hllCols.map(c => hll_union_agg(col(hllColName(c))).as(hllColName(c)))
    val out = merged.groupBy(keyCols.map(col) :+ col("_bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"), mergeExprs: _*)
    Scd.commitBuckets(out, store, pending, conf,
      marker = batchTag.map { case (w, bid) => ("_applied", s"$w\t$bid") })
    LayoutMeta.commit(spark, store, Map("nBuckets" -> n))
    } finally partial.unpersist(blocking = false)
  }

  /** The current view: (keys..., cnt, sum_<c>...). Bucket dirs are
    * ENUMERATED from disk (the [[Scd.readVersions]] discipline — a
    * wrong bucket guess throws or is ignored, never silently
    * truncates the view). */
  def read(spark: org.apache.spark.sql.SparkSession, store: String,
      nBuckets: Int = LayoutMeta.Unspecified): DataFrame = {
    resolveBuckets(spark, store, nBuckets) // throws on explicit mismatch
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (!fs.exists(root)) Array.empty[String]
      else fs.globStatus(new org.apache.hadoop.fs.Path(root, "bucket_*"))
        .filter(s => s.isDirectory && s.getPath.getName.matches("bucket_\\d+"))
        .map(_.getPath.toString)
    require(existing.nonEmpty, s"no IVM store at $store")
    spark.read.parquet(existing.toIndexedSeq: _*)
  }

  /** [[read]] plus the READ-TIME derivations the store refuses to
    * persist: `avg_<c>` = sum/cnt for each requested sum column
    * (ratios don't merge — storing one would break incremental ==
    * recompute), and `distinct_<c>` = the HLL register estimate for
    * each requested sketch column (the estimate is derived; the
    * MERGEABLE sketch is what's stored). Raw columns stay alongside. */
  def readDerived(spark: org.apache.spark.sql.SparkSession, store: String,
      avgOf: Seq[String] = Nil, distinctOf: Seq[String] = Nil,
      nBuckets: Int = LayoutMeta.Unspecified): DataFrame = {
    val base = read(spark, store, nBuckets)
    val withAvg = avgOf.foldLeft(base)((df, c) =>
      df.withColumn(s"avg_$c",
        col(sumColName(c)).cast("double") / col("cnt").cast("double")))
    distinctOf.foldLeft(withAvg)((df, c) =>
      df.withColumn(s"distinct_$c", hll_sketch_estimate(col(hllColName(c)))))
  }
}
