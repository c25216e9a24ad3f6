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

  /** Fold one batch into the view at `store`. Sum columns must be
    * integral or decimal (exact-merge types). Idempotence is the
    * CALLER's ledger's job (replaying a batch double-counts — pair
    * with the ingest ledger, as every sink here does); crash-safety is
    * this method's: a crash mid-commit leaves each bucket either old
    * or new, and the journal heals half-done swaps on the next call. */
  def applyBatch(batch: DataFrame, store: String, keyCols: Seq[String],
      sumCols: Seq[String],
      nBuckets: Int = LayoutMeta.Unspecified): Unit = {
    require(keyCols.nonEmpty, "need at least one key column")
    val spark = batch.sparkSession
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
    // most one row per distinct key
    val partial = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).as(sumColName(c))): _*)
      .withColumn("_bucket", Scd.bucketOf(keyCols, n))
    val affected = partial.select(col("_bucket")).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nBuckets
    if (affected.isEmpty) return
    val existingDirs = affected.map(Scd.bucketDir(store, _)).filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(conf).exists(path)
    }
    val merged =
      if (existingDirs.isEmpty) partial
      else partial.unionByName(
        spark.read.parquet(existingDirs.toIndexedSeq: _*)
          .withColumn("_bucket", Scd.bucketOf(keyCols, n)))
    val out = merged.groupBy(keyCols.map(col) :+ col("_bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(sumColName(c))).as(sumColName(c))): _*)
    Scd.commitBuckets(out, store, affected, conf)
    LayoutMeta.commit(spark, store, Map("nBuckets" -> n))
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
}
