package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) history building from a
  * change log.
  *
  * Given an append-only log of (key, ts, attributes) observations,
  * produce the versioned dimension: one row per key per CHANGE POINT,
  * with `[valid_from, valid_to)` validity and an `is_current` flag —
  * the standard warehouse shape an as-of join then serves ("what was
  * this user's tier when the order was placed" — [[AsOfJoin]] is the
  * read side of exactly this table).
  *
  * Two ordered windows over ONE key-hash exchange: a lag pass marks
  * rows whose attributes differ from the previous observation
  * (null-safe `<=>` per attribute, so a no-op re-observation never
  * mints a version), a lead pass over the surviving change points
  * closes each interval at the next change. Both windows share the
  * same partitioning and ordering, so Catalyst plans one Exchange +
  * one Sort. Per-key state is O(1); nothing is O(events) per key and
  * nothing joins the log to itself.
  *
  * `tieCol` breaks equal-timestamp order deterministically (the event
  * id contract) — without it, reruns could version-flip concurrent
  * updates.
  */
object Scd {

  /** Collapse a change log to SCD2 intervals: one row per (key,
    * version) with `valid_from` (inclusive), `valid_to` (exclusive,
    * null while current), `is_current`. */
  def intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, attrCols: Seq[String],
      keepTie: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "need at least one key and one attribute column")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val changed = df
      .withColumn("_prev", lag(attrs, 1).over(byKey))
      // first observation (lag null struct) always opens a version;
      // <=> makes per-attribute nulls compare stably
      .filter(col("_prev").isNull || !(attrs <=> col("_prev")))
    // keepTie carries the OPENING observation's tie value, which the
    // incremental maintainer needs to seed the next batch's ordering
    val tieOut = if (keepTie) Seq(col(tieCol).as("open_tie")) else Seq.empty
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")) ++
        tieOut: _*)
  }

  // ---------- incremental maintenance (the streaming half) ----------
  //
  // A dimension's change log is append-only, so its SCD2 table can be
  // maintained per micro-batch without ever rescanning history: closed
  // versions are immutable, and only each affected key's OPEN version
  // can change. applyBatch therefore touches O(affected buckets) of
  // the store per batch, never O(history) — the same incremental
  // discipline as the streaming dedup ingests.
  //
  // Ordering contract: per key, observations arrive in strictly
  // increasing (ts, tie) order ACROSS batches (any order within one).
  // Under that contract, a batch row at or before its key's open
  // version's (valid_from, open_tie) must already have been applied —
  // so such rows are DROPPED, which makes both full-batch replays and
  // mid-apply crash retries idempotent (a bucket already swapped simply
  // drops the batch again). Genuinely LATE data — a row older than its
  // key's already-closed versions — goes through [[applyLate]], which
  // rebuilds ONLY the key-hash buckets containing the late keys from
  // the complete change log; every other bucket is untouched, so the
  // repair is O(affected buckets), never O(store). Exactly-once
  // delivery belongs to the caller's batch-id ledger (the StreamOps
  // pattern).
  //
  // The bucket count is part of the on-disk layout, so it is persisted
  // in a `_META` sidecar ([[LayoutMeta]], the MinhashIndex pattern) at
  // first write and validated on every entry point: a store built with
  // 16 buckets read with a guessed 8 used to silently return partial
  // history — now the dirs actually read are ENUMERATED and an
  // explicit mismatched parameter throws.

  private[operators] def bucketOf(keyCols: Seq[String], n: Int) =
    pmod(hash(keyCols.map(col): _*), lit(n))

  private[operators] def bucketDir(store: String, b: Int) = s"$store/bucket_$b"

  private def resolveBuckets(spark: org.apache.spark.sql.SparkSession,
      store: String, passed: Int): Int =
    LayoutMeta.resolve(spark, store, Map("nBuckets" -> passed),
      Map("nBuckets" -> 8))("nBuckets")

  /** All versions currently in the store (empty-schema-safe only after
    * the first [[applyBatch]]). `nBuckets` is only VALIDATED against
    * the persisted layout — the dirs read are enumerated from disk, so
    * a wrong guess throws (explicit mismatch) or is ignored, never
    * silently truncates history. */
  def readVersions(spark: org.apache.spark.sql.SparkSession,
      store: String, nBuckets: Int = LayoutMeta.Unspecified): DataFrame = {
    resolveBuckets(spark, store, nBuckets) // throws on explicit mismatch
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (!fs.exists(root)) Array.empty[String]
      else fs.globStatus(new org.apache.hadoop.fs.Path(root, "bucket_*"))
        // exact bucket dirs only: a crash can leave a bucket_N__staged
        // sibling (healed by the next applyBatch), and reading it here
        // would double that bucket's rows
        .filter(s => s.isDirectory && s.getPath.getName.matches("bucket_\\d+"))
        .map(_.getPath.toString)
    require(existing.nonEmpty, s"no SCD store at $store")
    spark.read.parquet(existing.toIndexedSeq: _*)
  }

  /** Fold one in-order batch of observations into the versioned store.
    * Cost: reads + rewrites only the key-hash buckets the batch
    * touches; each bucket swap is journal-committed ([[AtomicSwap]]),
    * so a crash between buckets retries idempotently. */
  def applyBatch(batch: DataFrame, store: String, keyCols: Seq[String],
      tsCol: String, tieCol: String, attrCols: Seq[String],
      nBuckets: Int = LayoutMeta.Unspecified): Unit = {
    val spark = batch.sparkSession
    val resolved = resolveBuckets(spark, store, nBuckets)
    require(resolved >= 1, "nBuckets must be >= 1")
    applyBatchResolved(batch, store, keyCols, tsCol, tieCol, attrCols, resolved)
  }

  private def applyBatchResolved(batch: DataFrame, store: String,
      keyCols: Seq[String], tsCol: String, tieCol: String,
      attrCols: Seq[String], nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // heal any swap a previous crash left half-done
    (0 until nBuckets).foreach { i =>
      AtomicSwap.recover(conf, bucketDir(store, i))
    }
    val b = batch
      .select(keyCols.map(col) ++
        Seq(col(tsCol).as("_ts"), col(tieCol).as("_tie")) ++
        attrCols.map(col): _*)
      .withColumn("_bucket", bucketOf(keyCols, nBuckets))
    val affected = b.select(col("_bucket")).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nBuckets
    if (affected.isEmpty) return

    val existingDirs = affected.map(bucketDir(store, _)).filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(conf).exists(path)
    }
    val existing: Option[DataFrame] =
      if (existingDirs.isEmpty) None
      else Some(spark.read.parquet(existingDirs: _*))

    val open = existing.map(_.filter(col("is_current")))
    val keyJoin = keyCols // join on the key columns by name
    // drop already-applied rows: at or before the open version's order
    val fresh = open match {
      case None => b
      case Some(o) =>
        val oKeyed = o.select(keyCols.map(col) ++
          Seq(col("valid_from").as("_ovf"), col("open_tie").as("_otie")): _*)
        b.join(oKeyed, keyJoin, "left")
          .filter(col("_ovf").isNull ||
            col("_ts") > col("_ovf") ||
            (col("_ts") === col("_ovf") && col("_tie") > col("_otie")))
          .drop("_ovf", "_otie")
    }
    // the open version re-enters as the seed observation so the batch's
    // first change closes it (and a re-observed equal value is a no-op)
    val pseudo = open.map(_.select(keyCols.map(col) ++
      Seq(col("valid_from").as("_ts"), col("open_tie").as("_tie")) ++
      attrCols.map(col): _*).withColumn("_bucket", bucketOf(keyCols, nBuckets)))
    val obs = pseudo.map(_.unionByName(fresh)).getOrElse(fresh)
    val recomputed = intervals(obs, keyCols, "_ts", "_tie", attrCols,
        keepTie = true)
      .withColumn("_bucket", bucketOf(keyCols, nBuckets))
    val closed = existing.map(_.filter(!col("is_current"))
      .withColumn("_bucket", bucketOf(keyCols, nBuckets)))
    val out = closed.map(_.unionByName(recomputed)).getOrElse(recomputed)

    commitBuckets(out, store, affected, conf)
    // record the layout once data exists (resolve already proved any
    // existing _META agrees)
    LayoutMeta.commit(spark, store, Map("nBuckets" -> nBuckets))
  }

  /** Fold GENUINELY LATE observations — rows older than an already-
    * closed version, which [[applyBatch]]'s ordering contract drops as
    * replays — by a BOUNDED rebuild: only the key-hash buckets
    * containing the late keys are recomputed, from scratch, out of the
    * complete change log `log` (which must already contain the late
    * rows — append them to the log first, then call this). Every
    * other bucket is untouched, so the repair costs O(affected
    * buckets' history), never O(store) and never O(log): the log scan
    * itself is one pass filtered to the affected buckets, and at 100 TB
    * the log is partitioned by the same key hash, so that filter is
    * partition-pruned too.
    *
    * Idempotent: rebuilding a bucket from the same log is
    * deterministic, and each bucket swap is journal-committed — a
    * crash mid-repair reruns cleanly. After the repair,
    * incremental == rebuild holds again and in-order [[applyBatch]]
    * maintenance resumes as if the late rows had arrived on time. */
  def applyLate(late: DataFrame, log: DataFrame, store: String,
      keyCols: Seq[String], tsCol: String, tieCol: String,
      attrCols: Seq[String], nBuckets: Int = LayoutMeta.Unspecified): Unit = {
    val spark = late.sparkSession
    val resolved = resolveBuckets(spark, store, nBuckets)
    val conf = spark.sparkContext.hadoopConfiguration
    (0 until resolved).foreach { i =>
      AtomicSwap.recover(conf, bucketDir(store, i))
    }
    val affected = late
      .select(bucketOf(keyCols, resolved).as("_bucket"))
      .distinct().collect().map(_.getInt(0)).sorted // bounded by nBuckets
    if (affected.isEmpty) return
    val obs = log
      .select(keyCols.map(col) ++
        Seq(col(tsCol).as("_ts"), col(tieCol).as("_tie")) ++
        attrCols.map(col): _*)
      .withColumn("_bucket", bucketOf(keyCols, resolved))
      .filter(col("_bucket").isin(affected.map(Integer.valueOf): _*))
    val rebuilt = intervals(obs, keyCols, "_ts", "_tie", attrCols,
        keepTie = true)
      .withColumn("_bucket", bucketOf(keyCols, resolved))
    commitBuckets(rebuilt, store, affected, conf)
    LayoutMeta.commit(spark, store, Map("nBuckets" -> resolved))
  }

  /** ONE partitioned staging job for every affected bucket (a write
    * per bucket was Jx the job-launch overhead), then per-bucket
    * rename + journal swap; we are the commit authority, so the
    * per-dir _SUCCESS marker is written after the job succeeded. */
  private[operators] def commitBuckets(out: DataFrame, store: String,
      affected: Array[Int],
      conf: org.apache.hadoop.conf.Configuration,
      marker: Option[(String, String)] = None): Unit = {
    import org.apache.hadoop.fs.Path
    val stagedRoot = new Path(
      s"$store/__stage_${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = stagedRoot.getFileSystem(conf)
    // one task per affected bucket (r21, guide §2.4): unpinned, AQE
    // coalesces the small post-aggregate exchange to ONE task that
    // writes every staged bucket's file serially; pinning to the
    // affected count keeps one file per bucket dir at any scale
    out.repartition(math.max(1, affected.length), col("_bucket"))
      .write.mode("overwrite").partitionBy("_bucket")
      .parquet(stagedRoot.toString)
    try {
      affected.foreach { i =>
        val part = new Path(stagedRoot, s"_bucket=$i")
        if (fs.exists(part)) { // empty output for a bucket = no change
          val staged = new Path(bucketDir(store, i) + "__staged")
          if (fs.exists(staged)) fs.delete(staged, true)
          require(fs.rename(part, staged), s"staging rename failed: $part")
          // caller-supplied marker (e.g. Ivm's per-bucket applied tag)
          // rides the staged dir, so it commits ATOMICALLY with the
          // bucket's data in the swap below
          marker.foreach { case (name, content) =>
            val o = fs.create(new Path(staged, name), true)
            o.write(content.getBytes("UTF-8")); o.close()
          }
          fs.create(new Path(staged, "_SUCCESS")).close()
          val live = new Path(bucketDir(store, i))
          if (fs.exists(live))
            AtomicSwap.swapIn(conf, live.toString, staged.toString)
          else {
            fs.mkdirs(live.getParent)
            require(fs.rename(staged, live),
              s"failed to promote first-write bucket $staged -> $live")
          }
        }
      }
    } finally fs.delete(stagedRoot, true)
  }
}
