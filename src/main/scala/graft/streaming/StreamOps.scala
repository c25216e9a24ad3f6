package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.G streaming row).
  *
  * The reference is batch-only; these are the streaming extensions the
  * BASELINE north star mandates for the `events` table. Every operator
  * is defined on a DataFrame so the SAME definition runs in batch mode
  * (what the DuckDB oracle checks) and under `readStream` (what
  * StreamingSpec replays) — Structured Streaming's core guarantee that
  * a streaming query is semantically a repeated batch query over a
  * growing log.
  *
  * Scale notes: watermarks bound state (late events beyond the
  * watermark are dropped); state lives in the state store keyed by
  * (window/session, keys) — partitioned by key hash across executors.
  */
object StreamOps {

  /** Tumbling/sliding event-time windows with a watermark. */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "10 minutes",
      slide: Option[String] = None): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), windowLen, s)
      case None => window(col("ts"), windowLen)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Event-time session windows (5-minute inactivity gap by default). */
  def sessionCounts(
      events: DataFrame,
      gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
        col("n_events"))

  /** Streaming dedup bounded by the watermark (exactly-once per id
    * within the watermark horizon). */
  def dedupWithinWatermark(
      events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  // ---------- custom state: flatMapGroupsWithState ----------

  final case class UserEvent(user_id: Long, ts_us: Long)
  /** Input row for the incremental variant: the watermarked `ts` column
    * must survive projection into the stateful operator's input, or the
    * analyzer rejects EventTimeTimeout ("no watermark"). */
  final case class UserEventT(user_id: Long, ts_us: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)
  final case class UserSession(user_id: Long, sess_start_us: Long,
      sess_end_us: Long, n_events: Long)

  /** Shared session state machine: fold sorted event times into `open`,
    * appending every CLOSED session to `out`; returns the still-open
    * tail (null when no events and no prior state). */
  private def foldSessions(uid: Long, sorted: Array[Long], prior: OpenSession,
      gapUs: Long, out: scala.collection.mutable.ArrayBuffer[UserSession]): OpenSession = {
    var open = prior
    var i = 0
    while (i < sorted.length) {
      val t = sorted(i)
      if (open == null) open = OpenSession(t, t, 0L)
      else if (t - open.end_us > gapUs) {
        out += UserSession(uid, open.start_us, open.end_us, open.n)
        open = OpenSession(t, t, 0L)
      }
      open = OpenSession(open.start_us, t, open.n + 1)
      i += 1
    }
    open
  }

  final case class FunnelEvt(user_id: Long, etype: String, ts_us: Long)
  final case class FunnelSt(times: Array[Long])
  final case class FunnelProgress(user_id: Long, steps_done: Int,
      converted: Boolean)

  /** INCREMENTAL ordered funnel over an unbounded stream — the
    * streaming twin of [[graft.operators.Events.funnelUsers]], same
    * first-touch-anchored semantics (step k needs ts strictly after
    * step k-1's earliest qualifying time, within `spanMicros` of the
    * first step-1 event).
    *
    * State per user is the O(steps) array of earliest step times —
    * bounded regardless of event volume, hash-partitioned by user.
    * The chain mins are incrementally computable because events are
    * folded in timestamp order: under the per-key in-order-across-
    * batches contract (the [[graft.operators.Scd.applyBatch]]
    * contract), the first qualifying event IS the min, and a filled
    * step can never be displaced. A `FunnelProgress` row is emitted
    * whenever a user's reached-step count advances in a batch, so
    * downstream sees conversion transitions, not per-event noise;
    * spec asserts the final per-user progress equals the batch
    * funnel on the full log. */
  def streamingFunnel(events: DataFrame, steps: Seq[String],
      spanMicros: Long): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && spanMicros > 0, "steps and span required")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("etype").cast("string").as("etype"),
        col("ts_us").cast("long").as("ts_us"))
      .as[FunnelEvt]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelSt, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvt], state: GroupState[FunnelSt]) =>
          val times = state.getOption.map(_.times.clone())
            .getOrElse(Array.fill(steps.size)(-1L))
          val before = times.count(_ >= 0)
          // ts order inside the batch; etype tiebreak only stabilizes
          // iteration, equal-ts events can't fill a strict-> step anyway
          val evs = it.toArray.sortBy(e => (e.ts_us, e.etype))
          evs.foreach { e =>
            val k = steps.indexOf(e.etype)
            if (k >= 0 && times(k) < 0) {
              val prevOk = k == 0 ||
                (times(k - 1) >= 0 && e.ts_us > times(k - 1))
              val spanOk = k == 0 || e.ts_us <= times(0) + spanMicros
              if (prevOk && spanOk) times(k) = e.ts_us
            }
          }
          state.update(FunnelSt(times))
          val done = times.count(_ >= 0)
          if (done != before)
            Iterator(FunnelProgress(uid, done, done == steps.size))
          else Iterator.empty
      }
  }

  /** REPLAY-mode stateful sessionization (`flatMapGroupsWithState`):
    * per-user open-session state; a session closes when the inactivity
    * gap exceeds `gapMin`.
    *
    * Emission policy — the name is the warning: closed sessions are
    * emitted when they close AND the still-open tail session is emitted
    * eagerly at the end of every micro-batch (state is then cleared).
    * A single-batch replay — and batch execution, where Spark runs the
    * same function with empty state — is therefore EXACTLY equal to the
    * gaps-and-islands batch sessionization, which is what the spec
    * asserts. Run INCREMENTALLY it re-emits an evolving tail row per
    * batch for any user active across batches — use
    * [[statefulSessions]] for incremental pipelines.
    *
    * State size: O(1) per active user key (one open session), hash-
    * partitioned across executors by user — the standard bounded-state
    * shape at 100 TB event volume. */
  def statefulSessionsReplay(events: DataFrame, gapMin: Int = 5): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          val sorted = it.map(_.ts_us).toArray
          java.util.Arrays.sort(sorted)
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          val open = foldSessions(uid, sorted, state.getOption.orNull, gapUs, out)
          if (open != null) out += UserSession(uid, open.start_us, open.end_us, open.n)
          state.remove()
          out.iterator
      }
  }

  /** Streaming dedup-on-ingest: every micro-batch is near-deduped
    * within itself (keep-first MinHash) and then AGAINST everything
    * already accepted into the corpus at `corpusPath`; survivors are
    * appended. The rolling-crawl pipeline shape, kept incremental:
    * each accepted doc's MinHash signatures are persisted ONCE to a
    * sidecar table (`corpusPath`_sig) at accept time, and later batches
    * dedup against the sidecar via [[graft.operators.Dedup
    * .minhashAgainstPrepared]] — per batch the corpus costs one
    * columnar scan of stored signatures (broadcast-filtered by the
    * batch's buckets, no re-shingling, no corpus shuffle), so total
    * work over T batches is O(T·corpusScan + T·batch), not
    * O(T²·batch) signature recomputation.
    *
    * Accepted ids are immutable: a batch row re-using an already-
    * accepted id is dropped as a duplicate regardless of its text
    * (re-delivery is therefore idempotent, and the corpus keyspace
    * stays unique — minhashAgainst requires disjoint ids).
    *
    * Returns the foreachBatch writer; caller starts it with its own
    * checkpoint/trigger. Exactly-once: each batch commits a
    * (queryId, batchId) LEDGER as its last step ([[commitBatchLedger]]),
    * so a restart that re-delivers a FULLY-committed batch is a
    * detected no-op — no double-append, no heal. The remaining
    * at-least-once window is a crash BETWEEN the sink writes and the
    * ledger commit: that replay re-appends, and the restart-time heal
    * recovers it through the NON-NULL id-uniqueness invariant.
    * Residual window inside that window: a replayed batch's null-id
    * docs re-append undetected (the census deliberately exempts null
    * ids — several can legitimately coexist — and equally-doubled null
    * counts keep the sidecar freshness check passing). `ensureIds =
    * true` closes it: null ids are synthesized from the content hash
    * at batch entry ([[synthIds]]), so the uniqueness invariant covers
    * every row and the replay class collapses in the heal.
    *
    * Durability: the double-append HEAL commits via [[graft.operators
    * .AtomicSwap]] — a single-object journal names the staged heal dir
    * before the live dir is touched (the pointer-commit scheme of
    * [[graft.operators.VectorIndex]]'s manifest, applied to whole-dir
    * replacement), so the swap is crash-safe on object stores too,
    * where "rename" is per-object copy+delete and a bare two-rename
    * swap could lose the corpus mid-copy. */
  /** Local-property key Structured Streaming sets on the micro-batch
    * execution thread; the query id is stable across restarts of the
    * SAME checkpoint (it lives in the checkpoint metadata), which is
    * exactly the scope a batch-id ledger must be keyed by. */
  private val QueryIdProp = "sql.streaming.queryId"

  /** True iff `batchId` was already committed by THIS streaming query
    * (same checkpoint-scoped query id) — the replayed micro-batch a
    * restart re-delivers after a crash between the sink writes and the
    * checkpoint commit. Keying the ledger by query id makes a FRESH
    * checkpoint over an existing corpus safe: its batch ids restart at
    * 0, but its new query id never matches, so nothing is skipped.
    * The (appId, version) idempotent-writer pattern of transactional
    * lake sinks. */
  private def committedReplay(spark: org.apache.spark.sql.SparkSession,
      corpusPath: String, batchId: Long): Boolean = {
    val qid = Option(spark.sparkContext.getLocalProperty(QueryIdProp)).getOrElse("")
    if (qid.isEmpty) return false
    val p = new org.apache.hadoop.fs.Path(corpusPath + "__batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    txt.split("\t") match {
      case Array(q, b) => q == qid && b.toLongOption.exists(batchId <= _)
      case _ => false
    }
  }

  /** Record `batchId` as committed for this query — called as the LAST
    * step of a micro-batch, after every sink write landed, so a crash
    * anywhere earlier replays the batch (at-least-once, healed as
    * before) and a crash after it makes the replay a detected no-op.
    * tmp + rename, same commit discipline as the heal swap. */
  private def commitBatchLedger(spark: org.apache.spark.sql.SparkSession,
      corpusPath: String, batchId: Long): Unit = {
    val qid = Option(spark.sparkContext.getLocalProperty(QueryIdProp)).getOrElse("")
    if (qid.isEmpty) return
    val p = new org.apache.hadoop.fs.Path(corpusPath + "__batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(corpusPath + "__batch.tmp")
    val out = fs.create(tmp, true)
    out.write(s"$qid\t$batchId".getBytes("UTF-8"))
    out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"batch-ledger commit failed at $p")
  }

  /** Finish an interrupted [[healSwap]]: the journaled
    * [[graft.operators.AtomicSwap]] protocol first (object-store-safe —
    * the journal object names the staged heal dir and survives any
    * crash inside the promote), then the LEGACY two-rename states a
    * pre-journal build could have crashed in (heal dir complete +
    * corpus missing). Called once per writer lifetime, before the
    * corpus is first read. */
  private def recoverHealSwap(spark: org.apache.spark.sql.SparkSession,
      corpusPath: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    graft.operators.AtomicSwap.recover(hconf, corpusPath)
    def hp(p: String) = new org.apache.hadoop.fs.Path(p)
    val fs = hp(corpusPath).getFileSystem(hconf)
    def exists(p: String) = fs.exists(hp(p))
    val healPath = corpusPath + "__heal"
    val trashPath = corpusPath + "__trash"
    if (!exists(corpusPath) && exists(healPath + "/_SUCCESS"))
      fs.rename(hp(healPath), hp(corpusPath))
    // drop the spare dirs ONLY once a live corpus exists again: if the
    // rename above failed (FileSystem.rename signals most failures by
    // returning false), trash + heal are the only remaining copies of
    // the accepted corpus — leave them for the next recovery attempt
    if (exists(corpusPath)) {
      if (exists(trashPath)) fs.delete(hp(trashPath), true)
      if (exists(healPath)) fs.delete(hp(healPath), true)
    }
  }

  /** FORGET documents — the right-to-be-forgotten path for the
    * streaming dedup corpus and everything derived from it. Removes
    * the ids from the corpus, from the signature SIDECAR (the
    * [[dedupedIngest]] carrier) when present, and from the persisted
    * MinHash INDEX (the [[dedupedIngestIndexed]] carrier) when
    * `indexPath` is given, and from a persisted POSTINGS index
    * ([[graft.operators.InvertedIndex]], searchable text being as much
    * personal data as the text itself) when `postingsPath` is given —
    * after which re-ingesting the same text is ACCEPTED again, exactly
    * as if it had never been seen (the legal semantics of erasure, and
    * the spec's contract).
    *
    * Cost shape: the corpus/sidecar rewrites are one filtered scan +
    * journaled sibling swap each (the [[healSwap]] machinery — batch
    * forget requests to amortize, like compaction); the index delete
    * is [[graft.operators.MinhashIndex.delete]], touching only the
    * dirs the ids live in. Crash anywhere: the swaps recover via the
    * shared heal recovery, the index delete is rerun-idempotent, and a
    * crash BETWEEN the corpus swap and the index delete is caught by
    * the ingest's own census reconciliation — or simply rerun forget
    * (every step is a no-op once applied). Returns corpus rows
    * removed. */
  def forget(spark: org.apache.spark.sql.SparkSession, corpusPath: String,
      ids: Seq[Long], idCol: String = "doc_id",
      indexPath: Option[String] = None,
      postingsPath: Option[String] = None, textCol: String = "text"): Long = {
    require(ids.nonEmpty, "no ids to forget")
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    def hp(p: String) = new org.apache.hadoop.fs.Path(p)
    def exists(p: String) = hp(p).getFileSystem(hconf).exists(hp(p))
    recoverHealSwap(spark, corpusPath)
    var removed = 0L
    val idSet = ids.map(java.lang.Long.valueOf)
    // postings index FIRST, while the victims' text is still in the
    // corpus: InvertedIndex.deleteDocs derives the touched token
    // buckets from the victims' OWN rows, so running it before the
    // corpus swap keeps forget rerun-complete — a crash after this
    // step reruns it as a no-op (victims' postings already gone) and
    // the corpus swap then proceeds; the reverse order would strand
    // postings whose source text a completed corpus swap already
    // erased.
    postingsPath.filter(exists).foreach { p =>
      if (exists(corpusPath)) {
        val victims = spark.read.parquet(corpusPath)
          .filter(col(idCol).isin(idSet: _*))
          .select(col(idCol), col(textCol)).localCheckpoint(true)
        if (!victims.isEmpty)
          graft.operators.InvertedIndex.deleteDocs(victims, idCol, textCol, p)
      }
    }
    if (exists(corpusPath)) {
      val corpus = spark.read.parquet(corpusPath)
      removed = corpus.filter(col(idCol).isin(idSet: _*)).count()
      if (removed > 0) {
        // null-id rows survive: isin(null) is null, not a match
        corpus.filter(!coalesce(col(idCol).isin(idSet: _*), lit(false)))
          .write.mode("overwrite").parquet(corpusPath + "__heal")
        graft.operators.AtomicSwap.swapIn(hconf, corpusPath,
          corpusPath + "__heal")
      }
    }
    val sigPath = corpusPath + "_sig"
    if (exists(sigPath)) {
      graft.operators.AtomicSwap.recover(hconf, sigPath)
      val sig = spark.read.parquet(sigPath)
      if (sig.filter(col("_id").isin(idSet: _*)).count() > 0) {
        sig.filter(!coalesce(col("_id").isin(idSet: _*), lit(false)))
          .write.mode("overwrite").parquet(sigPath + "__heal")
        graft.operators.AtomicSwap.swapIn(hconf, sigPath, sigPath + "__heal")
      }
    }
    indexPath.filter(exists).foreach { p =>
      graft.operators.MinhashIndex.delete(spark, p, ids.toDF("_id"))
    }
    removed
  }

  /** Heal a double-appended corpus: accepted ids are immutable, so
    * duplicate ids carry identical payloads — keep one. NULL-id rows
    * are exempt: every dedup anti-join deliberately accepts them (null
    * never equals), so a corpus can legitimately hold several — they
    * pass through unchanged (`dropDuplicates` would collapse them all
    * into one, silently dropping accepted documents). The rewrite
    * goes to a SIBLING dir and swaps in via [[graft.operators
    * .AtomicSwap]]'s journaled pointer-commit (object-store-safe:
    * correct even where "rename" is copy+delete; recovered by
    * [[recoverHealSwap]] if interrupted); an in-place
    * `mode("overwrite")` deletes the directory before writing, so a
    * crash mid-heal would lose the whole accepted corpus. Returns the
    * healed, pinned corpus. */
  private def healSwap(corpus0: DataFrame, corpusPath: String,
      idCol: String): DataFrame = {
    val spark = corpus0.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val healed = corpus0.filter(col(idCol).isNotNull).dropDuplicates(idCol)
      .unionByName(corpus0.filter(col(idCol).isNull))
      .localCheckpoint(true)
    healed.write.mode("overwrite").parquet(corpusPath + "__heal")
    graft.operators.AtomicSwap.swapIn(hconf, corpusPath, corpusPath + "__heal")
    healed
  }

  /** Synthesize a deterministic id for null-id rows from their content
    * hash (xxhash64 of the content column) — the opt-in (`ensureIds`)
    * that closes the documented at-least-once residual: with no null
    * ids left, the heal's id-uniqueness invariant covers EVERY row, so
    * a replayed batch's re-appends are always collapsed. Content-hash
    * identity is the contract: two null-id rows with byte-identical
    * content become ONE row (they are the same document), and
    * re-delivering a null-id doc later is dropped as id reuse. A
    * synthesized id colliding with a real 64-bit id is the standard
    * hash-identity residual (~2^-64 per pair), same as every
    * content-addressed store. */
  private def synthIds(batch: DataFrame, ensureIds: Boolean,
      idCol: String, contentCol: String): DataFrame =
    if (!ensureIds) batch
    else batch.withColumn(idCol,
      coalesce(col(idCol).cast("long"), xxhash64(col(contentCol))))

  /** `postingsPath`: maintain a persisted positional postings index
    * ([[graft.operators.InvertedIndex]]) over the ACCEPTED docs — the
    * searchable-text surface next to the dedup sidecar. Appended
    * BEFORE the corpus append: a crash between the two replays the
    * batch (ids not yet in the corpus gate), re-appending postings as
    * bit-identical duplicates that probes dedupe and compaction
    * removes — the reverse order would strand accepted docs
    * permanently unindexed (the replay drops them as id reuse and
    * never re-derives their postings). */
  def dedupedIngest(docs: DataFrame, corpusPath: String,
      idCol: String = "doc_id", textCol: String = "text",
      ensureIds: Boolean = false,
      postingsPath: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val sigPath = corpusPath + "_sig"
    // Integrity (double-append heal + sidecar freshness) is verified ONCE
    // per writer lifetime, on the first batch that sees an existing
    // corpus — NOT per micro-batch: a full-corpus count plus distinct-id
    // shuffle every batch erodes the documented O(T·corpusScan) budget
    // as the corpus grows. The retry that can re-introduce duplicates
    // only happens across a restart, which constructs a fresh writer
    // (and therefore re-verifies).
    @volatile var verified = false
    docs.writeStream.outputMode("append").foreachBatch {
      (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val batch = synthIds(batch0, ensureIds, idCol, textCol)
        def runIngestBatch(): Unit = {
        val D = graft.operators.Dedup
        val hconf = spark.sparkContext.hadoopConfiguration
        def hp(p: String) = new org.apache.hadoop.fs.Path(p)
        def exists(p: String) = hp(p).getFileSystem(hconf).exists(hp(p))
        if (!verified) recoverHealSwap(spark, corpusPath)
        val withinDeduped = D.minhash(batch, idCol, textCol).localCheckpoint(true)
        val (accepted, acceptedSig) =
          if (!exists(corpusPath)) {
            (withinDeduped, D.prepareMinhash(withinDeduped, idCol, textCol))
          } else {
            // the CORPUS gates the dedup (never the sidecar: a missing or
            // diverged sidecar must not silently skip dedup). The append
            // delivery is at-least-once, so integrity is checked on IDS,
            // not raw row counts: a retried foreachBatch that double-
            // appended the same rows to both tables keeps raw counts
            // equal while violating the unique-id invariant.
            val corpusSig = if (verified) spark.read.parquet(sigPath) else {
              val corpus0 = spark.read.parquet(corpusPath)
              // the id-uniqueness invariant holds for NON-NULL ids only:
              // null-id docs are deliberately accepted by every dedup
              // anti-join, so several can legitimately coexist — counting
              // them into the census would misread them as a double-
              // append and the heal would collapse accepted documents
              val cIds = corpus0.where(col(idCol).isNotNull)
                .select(col(idCol).cast("long").as("_cid"))
                .distinct().localCheckpoint(true)
              // ONE aggregation job for both corpus censuses (total and
              // null-id rows — r21: two separate count jobs before), one
              // bounded count over the pinned distinct ids
              val cm = corpus0.agg(count(lit(1)),
                count(when(col(idCol).isNull, 1))).head()
              val cNullN = cm.getLong(1)
              val corpus =
                if (cm.getLong(0) - cNullN == cIds.count()) corpus0
                else healSwap(corpus0, corpusPath, idCol)
              val fresh0 =
                if (!exists(sigPath)) None
                else Some(spark.read.parquet(sigPath)).filter { s =>
                  // fresh iff the sidecar ids equal the corpus ids AS
                  // SETS and the sidecar carries no duplicate rows —
                  // matching cardinalities alone can hide divergence,
                  // which would both skip dedup for corpus ids missing
                  // from the sidecar and treat sidecar-only ids as
                  // corpus membership in the id-reuse anti-join.
                  // Null-id rows can't be set-compared (null never
                  // equals), so they are checked by COUNT — 1:1 with
                  // the corpus's null-id rows by construction.
                  // r21 job fusion: the sidecar's two censuses collapse
                  // into one aggregation, and the two directional
                  // anti-joins into one full-outer mismatch count —
                  // value-identical checks (set equality == no side
                  // has a key the other lacks), half the fixed per-job
                  // cost on the verify batch.
                  val sNonNull = s.where(col("_id").isNotNull)
                  val sDis = sNonNull.select(col("_id")).distinct()
                    .localCheckpoint(true)
                  val sm = s.agg(count(when(col("_id").isNotNull, 1)),
                    count(when(col("_id").isNull, 1))).head()
                  sm.getLong(0) == sDis.count() &&
                    sm.getLong(1) == cNullN &&
                    sDis.join(cIds, col("_id") === col("_cid"), "full_outer")
                      .where(col("_id").isNull || col("_cid").isNull)
                      .count() == 0L
                }
              val sig = fresh0.getOrElse {
                val rebuilt = D.prepareMinhash(corpus, idCol, textCol).localCheckpoint(true)
                // the sidecar is derived state, rebuildable from the
                // corpus — a plain overwrite is acceptable here
                rebuilt.write.mode("overwrite").parquet(sigPath)
                rebuilt
              }
              verified = true
              sig
            }
            // accepted ids are immutable -> id re-use is an exact dup
            val fresh = withinDeduped.join(corpusSig.select(col("_id")),
              withinDeduped(idCol).cast("long") === col("_id"), "left_anti")
            // shingle the fresh rows ONCE: the same prep feeds the dedup
            // and (for survivors) the sidecar append. Pin the drop set
            // too: unpinned, it is re-evaluated for each of the two
            // writes below AND the sidecar append's plan would re-read
            // sigPath while appending to it — fine under this single
            // JVM's listing snapshot, fragile on real filesystems.
            val prep = D.prepareMinhash(fresh, idCol, textCol).localCheckpoint(true)
            val drops = D.minhashAgainstPrepared(corpusSig, prep).localCheckpoint(true)
            (fresh.join(drops, fresh(idCol).cast("long") === drops("_drop"), "left_anti"),
              prep.join(drops, prep("_id") === drops("_drop"), "left_anti"))
          }
        postingsPath.foreach { p =>
          graft.operators.InvertedIndex.appendIndex(
            accepted.select(col(idCol), col(textCol)), idCol, textCol, p)
        }
        accepted.select(col(idCol), col(textCol))
          .write.mode("append").parquet(corpusPath)
        acceptedSig.write.mode("append").parquet(sigPath)
        }
        // a fully-committed batch re-delivered after a restart is a
        // NO-OP (ledger keyed by checkpoint-scoped query id): no
        // double-append happens at all, so no heal is ever needed for
        // this replay class
        if (committedReplay(spark, corpusPath, batchId)) ()
        else { runIngestBatch(); commitBatchLedger(spark, corpusPath, batchId) }
    }
  }

  /** [[dedupedIngest]] with the signature sidecar replaced by the
    * persisted bucket-partitioned [[graft.operators.MinhashIndex]] —
    * the text twin of [[imageDedupedIngestIndexed]]: the per-batch
    * corpus cost drops from one full sidecar scan (O(corpus), the last
    * per-batch cost that grew with corpus size) to partition-pruned
    * reads of exactly the band-bucket and id-bucket directories the
    * batch hashes into — O(probed directories), independent of corpus
    * size. Accept/drop semantics are IDENTICAL to [[dedupedIngest]]
    * (StreamingSpec asserts set equality across multi-batch runs):
    * same within-batch keep-first minhash, same id-immutability, and
    * the cross-batch verification is literally [[graft.operators.Dedup
    * .againstCore]] — the same census/valve/verify plan the sidecar
    * carrier runs, fed from pruned reads instead of a scan.
    *
    * Crash windows, mirroring the image-indexed variant plus the text
    * variant's heal:
    *
    *  - corpus append and index append are separate jobs; a crash
    *    between them leaves the index short. Every batch RECONCILES
    *    the corpus row count (parquet footers) against the index's
    *    payload-row census (1:1 by construction, partition-pruned to
    *    the `_band=-1` directories) and rebuilds the index from the
    *    corpus on divergence — O(#files) checks, bounded by
    *    [[graft.operators.MinhashIndex.compact]] housekeeping, not
    *    corpus size.
    *  - an at-least-once retry that lands BOTH appends twice keeps the
    *    counts equal while double-appending rows, so a fresh writer's
    *    first batch (the only place a retry can manifest — a retry
    *    implies a restart) additionally checks id-uniqueness and heals
    *    via the same sibling-dir swap as [[dedupedIngest]]
    *    ([[healSwap]], recovery on open), then rebuilds the index.
    *
    * Housekeeping is SELF-BOUNDING: when `autoCompactMinFiles > 0`
    * (default), each batch starts by folding any corpus/index
    * directory that accumulated more than that many files
    * ([[compactCorpus]] / [[graft.operators.MinhashIndex.compact]]) —
    * safe here because foreachBatch is the single writer and no append
    * is in flight at batch start; a sub-threshold check is one
    * directory listing, so idle batches pay O(#directories). Without
    * it the one-file-per-batch appends degrade probes to O(batches)
    * file opens unless the caller remembers to compact.
    *
    * Object-store rename caveat as documented on [[dedupedIngest]]. */
  def dedupedIngestIndexed(docs: DataFrame, corpusPath: String,
      indexPath: String, idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = graft.operators.LayoutMeta.Unspecified,
      autoCompactMinFiles: Int = 32, ensureIds: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    @volatile var verified = false
    docs.writeStream.outputMode("append").foreachBatch {
      (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val batch = synthIds(batch0, ensureIds, idCol, textCol)
        def runIngestBatch(): Unit = {
        val D = graft.operators.Dedup
        val MI = graft.operators.MinhashIndex
        val hconf = spark.sparkContext.hadoopConfiguration
        def hp(p: String) = new org.apache.hadoop.fs.Path(p)
        def exists(p: String) = hp(p).getFileSystem(hconf).exists(hp(p))
        if (!verified) recoverHealSwap(spark, corpusPath)
        if (autoCompactMinFiles > 0) {
          MI.compact(spark, indexPath, autoCompactMinFiles)
          compactCorpus(spark, corpusPath, autoCompactMinFiles)
        }
        val corpusExists = exists(corpusPath)
        if (corpusExists) {
          var corpus = spark.read.parquet(corpusPath)
          var corpusN = 0L
          if (!verified) {
            // uniqueness census over NON-NULL ids only: null-id docs are
            // deliberately accepted by every dedup anti-join, so several
            // can legitimately coexist — counting them here would misread
            // them as a double-append, and the heal would both drop
            // accepted documents and desync the payload census below
            // (forcing a spurious index rebuild).
            // r21 job fusion: total / non-null / distinct censuses in
            // ONE aggregation (three separate jobs before — fixed
            // per-job cost on the writer's first batch).
            val m = corpus.agg(count(lit(1)), count(col(idCol)),
              countDistinct(col(idCol))).head()
            corpusN = m.getLong(0)
            if (m.getLong(1) != m.getLong(2)) {
              corpus = healSwap(corpus, corpusPath, idCol)
              corpusN = corpus.count()
            }
          } else corpusN = corpus.count()
          val rebuild = !exists(indexPath) ||
            MI.payloadCount(spark, indexPath) != corpusN
          if (rebuild) {
            val ifs = hp(indexPath).getFileSystem(hconf)
            if (ifs.exists(hp(indexPath))) ifs.delete(hp(indexPath), true)
            MI.append(D.prepareMinhash(corpus, idCol, textCol), indexPath, buckets)
          }
        }
        verified = true
        val withinDeduped = D.minhash(batch, idCol, textCol).localCheckpoint(true)
        val (accepted, acceptedPrep) =
          if (!corpusExists) {
            (withinDeduped, D.prepareMinhash(withinDeduped, idCol, textCol))
          } else {
            // accepted ids are immutable -> id re-use is an exact dup;
            // the probe reads only the id buckets the batch hashes to
            val taken = MI.probeIds(spark, indexPath,
              withinDeduped.select(col(idCol).cast("long").as("_id")), buckets)
            val fresh = withinDeduped.join(taken,
              withinDeduped(idCol).cast("long") === taken("_id"), "left_anti")
            // shingle the fresh rows ONCE; pin prep + drops, each feeds
            // two consumers (same discipline as the sidecar variant)
            val prep = D.prepareMinhash(fresh, idCol, textCol).localCheckpoint(true)
            val drops = MI.drops(spark, indexPath, prep, buckets = buckets)
              .localCheckpoint(true)
            (fresh.join(drops, fresh(idCol).cast("long") === drops("_drop"), "left_anti"),
              prep.join(drops, prep("_id") === drops("_drop"), "left_anti"))
          }
        val pinned = accepted.select(col(idCol), col(textCol)).localCheckpoint(true)
        pinned.write.mode("append").parquet(corpusPath)
        MI.append(acceptedPrep, indexPath, buckets)
        }
        // replayed fully-committed batch => no-op (see dedupedIngest)
        if (committedReplay(spark, corpusPath, batchId)) ()
        else { runIngestBatch(); commitBatchLedger(spark, corpusPath, batchId) }
    }
  }

  /** Compact a streaming-ingest corpus directory in place: parquet
    * append lands one small file per micro-batch, so — exactly as the
    * Hamming/MinHash indexes before their compaction — corpus reads
    * degrade from O(data) to O(batches) file opens without occasional
    * folding. SIZE-TIERED: only files SMALLER than `targetFileBytes`
    * participate (when more than `minFiles` of them accumulate);
    * already-compacted target-sized files are never rewritten, so each
    * compaction's rewrite volume is bounded by the small-file tail —
    * amortized cost per batch <= targetFileBytes / minFiles, CONSTANT
    * in corpus size (a whole-directory rewrite would pay O(corpus)
    * every minFiles batches). The swap MOVES the new files in before
    * deleting the old ones, so a crash mid-swap leaves DUPLICATE rows,
    * never missing ones — the same failure class as an at-least-once
    * double-append, healed by the ingest's id-uniqueness check on its
    * next writer open ([[healSwap]]). Run between batches (not
    * concurrent with an appending ingest — single-writer, like the
    * ingest itself). Returns true if a rewrite happened. */
  def compactCorpus(spark: org.apache.spark.sql.SparkSession,
      corpusPath: String, minFiles: Int = 8,
      targetFileBytes: Long = 128L * 1024 * 1024): Boolean = {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(corpusPath)
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return false
    val olds = fs.listStatus(root).toSeq.filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
        f.getLen < targetFileBytes // size tier: leave compacted files be
    }
    if (olds.size <= minFiles) return false
    val nOut = math.max(1L,
      (olds.map(_.getLen).sum + targetFileBytes - 1) / targetFileBytes).toInt
    // tmp is a SIBLING of the corpus dir so corpus readers never see it
    val tmp = new Path(root.getParent, root.getName + "__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale from a prior crash
    // read exactly the snapshot of old files listed above (not the
    // directory, whose listing could change under a buggy caller)
    spark.read.parquet(olds.map(_.getPath.toString): _*)
      .repartition(nOut)
      .write.parquet(tmp.toString)
    val moves = fs.listStatus(tmp).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(f => fs.rename(f.getPath, new Path(root, "compact-" + f.getPath.getName)))
    // delete the originals ONLY when every replacement landed — same
    // discipline as Ann.compactHammingIndex: a failed/empty move must
    // never orphan rows. A partial move leaves rows present twice
    // (old + compact file), the duplicate-not-loss failure class the
    // id-uniqueness heal already covers.
    if (moves.nonEmpty && moves.forall(identity)) {
      olds.foreach(f => fs.delete(f.getPath, false))
      fs.delete(tmp, true)
      true
    } else {
      fs.delete(tmp, true) // unmoved files: originals still hold the rows
      false
    }
  }

  /** Streaming IMAGE dedup-on-ingest: every micro-batch of (id, blob)
    * rows is perceptually near-deduped within itself (keep-first dHash,
    * [[graft.operators.Ann.hammingJoin]]) and then AGAINST the already-
    * accepted corpus; survivors append. Structurally simpler than
    * [[dedupedIngest]] on purpose: the 64-bit dHash is derivable from
    * the blob, so it is stored AS A COLUMN of the corpus table itself —
    * one append per batch, no sidecar to diverge from, no heal-swap
    * machinery. Per batch the corpus costs one column-pruned parquet
    * scan of (id, sig) — 16 bytes/row, the blobs are never read — and
    * the match is the banded Hamming EQUIJOIN, never a cartesian.
    *
    * Semantics mirror the text variant: accepted ids are immutable (a
    * batch row re-using an accepted id drops regardless of content, so
    * re-delivery is idempotent); undecodable blobs (null dHash) are
    * never anyone's duplicate and always accept. Exactly-once caveat is
    * dedupedIngest's too: parquet append in foreachBatch is
    * at-least-once across retries; production stamps batchId into the
    * path and commits atomically. */
  def imageDedupedIngest(docs: DataFrame, corpusPath: String,
      idCol: String = "img_id", binCol: String = "blob", maxDist: Int = 8,
      ensureIds: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    docs.writeStream.outputMode("append").foreachBatch {
      (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val batch = synthIds(batch0, ensureIds, idCol, binCol)
        def runIngestBatch(): Unit = {
        val A = graft.operators.Ann
        val M = graft.operators.Multimodal
        val hconf = spark.sparkContext.hadoopConfiguration
        val cp = new org.apache.hadoop.fs.Path(corpusPath)
        val corpusExists = cp.getFileSystem(hconf).exists(cp)
        val sigged = batch
          .withColumn("_sig", M.dHashCol(col(binCol)))
          .localCheckpoint(true) // pin: reused for self-join + corpus match + write
        val hashed = sigged.filter(col("_sig").isNotNull)
        // keep-first within the batch (same orientation as bucketDrops)
        val selfDrops = A.hammingJoin(
            hashed.select(col(idCol), col("_sig")), "_sig", idCol, maxDist)
          .select(col(s"${idCol}_b").as("_drop")).distinct()
        val selfKept = sigged
          .join(selfDrops, sigged(idCol) === col("_drop"), "left_anti")
        val accepted =
          if (!corpusExists) selfKept
          else {
            val corpus = spark.read.parquet(corpusPath)
              .select(col(idCol).as("_cid"), col("_sig").as("_csig"))
            // id immutability: re-delivered accepted ids drop outright
            val newIds = selfKept.join(corpus,
              selfKept(idCol) === col("_cid"), "left_anti")
            val dupDrops = A.hammingJoinBetween(
                corpus.filter(col("_csig").isNotNull), "_csig", "_cid",
                newIds.filter(col("_sig").isNotNull).select(col(idCol), col("_sig")),
                "_sig", idCol, maxDist)
              .select(col(idCol).as("_drop")).distinct()
            newIds.join(dupDrops, newIds(idCol) === col("_drop"), "left_anti")
          }
        accepted.write.mode("append").parquet(corpusPath)
        }
        // replayed fully-committed batch => no-op (see dedupedIngest)
        if (committedReplay(spark, corpusPath, batchId)) ()
        else { runIngestBatch(); commitBatchLedger(spark, corpusPath, batchId) }
    }
  }

  /** [[imageDedupedIngest]] with a persisted partition-pruned Hamming
    * index ([[graft.operators.Ann.appendHammingIndexWithIds]]) instead
    * of a per-batch corpus scan: the corpus-signature match becomes a
    * probe that statically prunes to the (band, bucket) directories the
    * batch hashes into, and the id-immutability check probes the
    * reserved id band the same way — per-batch I/O is O(probed
    * directories), independent of corpus size, where the unindexed
    * variant re-scans the 16-byte (id, sig) projection of the whole
    * corpus every batch. Accept/drop semantics are IDENTICAL (the spec
    * asserts set equality against [[imageDedupedIngest]]).
    *
    * The index is maintained incrementally: each batch appends its
    * accepted rows' band + id rows. A corpus without an index (first
    * run after adopting this variant) bootstraps the index from the
    * corpus once. The corpus append and the index append are separate
    * jobs, so a crash between them would leave the index permanently
    * missing those rows' bands (later near-duplicates would slip in,
    * and a batch retry would re-append the rows) — every batch
    * therefore starts by RECONCILING: when the corpus row count and
    * the index's reserved-id-band row count diverge (they are 1:1 by
    * construction), the index is rebuilt from the corpus before any
    * probe (ADVICE r10). The id-band count is a partition-pruned scan
    * of the band=-1 directories and the corpus count reads parquet
    * footers only, so the check is O(#files), not O(rows) — bounded by
    * [[graft.operators.Ann.compactHammingIndex]]-style housekeeping,
    * not corpus size. At-least-once caveat otherwise as before;
    * production stamps batchId into both paths and commits atomically. */
  def imageDedupedIngestIndexed(docs: DataFrame, corpusPath: String,
      indexPath: String, idCol: String = "img_id", binCol: String = "blob",
      maxDist: Int = graft.operators.LayoutMeta.Unspecified,
      buckets: Int = graft.operators.LayoutMeta.Unspecified,
      autoCompactMinFiles: Int = 32, ensureIds: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    docs.writeStream.outputMode("append").foreachBatch {
      (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val batch = synthIds(batch0, ensureIds, idCol, binCol)
        def runIngestBatch(): Unit = {
        val A = graft.operators.Ann
        val M = graft.operators.Multimodal
        val hconf = spark.sparkContext.hadoopConfiguration
        // the layout params feed the in-batch hammingJoin too, so
        // resolve them here against the index _META (fail-fast on an
        // explicit conflict) instead of letting each probe re-resolve
        val lp = graft.operators.LayoutMeta.resolve(spark, indexPath,
          Map("maxDist" -> maxDist, "buckets" -> buckets),
          Map("maxDist" -> 8, "buckets" -> 64))
        val md = lp("maxDist"); val bk = lp("buckets")
        // self-bounding housekeeping, as documented on
        // [[dedupedIngestIndexed]]: single writer, no append in flight
        if (autoCompactMinFiles > 0) {
          A.compactHammingIndex(spark, indexPath, autoCompactMinFiles)
          compactCorpus(spark, corpusPath, autoCompactMinFiles)
        }
        val cp = new org.apache.hadoop.fs.Path(corpusPath)
        val ip = new org.apache.hadoop.fs.Path(indexPath)
        val corpusExists = cp.getFileSystem(hconf).exists(cp)
        if (corpusExists) {
          val ifs = ip.getFileSystem(hconf)
          val rebuild =
            if (!ifs.exists(ip)) true // bootstrap: first run with an index
            else {
              // reconcile: a crash between the corpus append and the
              // index append leaves the index short; the reserved id
              // band holds exactly one row per corpus row, so count
              // divergence detects it (and a same-batch retry then
              // dedupes against the healed index instead of
              // re-appending)
              val corpusN = spark.read.parquet(corpusPath).count()
              val idN = spark.read.parquet(indexPath)
                .filter(col("_band") === -1).count()
              corpusN != idN
            }
          if (rebuild) {
            if (ifs.exists(ip)) ifs.delete(ip, true)
            A.appendHammingIndexWithIds(
              spark.read.parquet(corpusPath).select(col(idCol), col("_sig")),
              "_sig", idCol, indexPath, md, bk)
          }
        }
        val sigged = batch
          .withColumn("_sig", M.dHashCol(col(binCol)))
          .localCheckpoint(true) // pin: reused for self-join + probes + write
        val hashed = sigged.filter(col("_sig").isNotNull)
        // keep-first within the batch (same orientation as bucketDrops)
        val selfDrops = A.hammingJoin(
            hashed.select(col(idCol), col("_sig")), "_sig", idCol, md)
          .select(col(s"${idCol}_b").as("_drop")).distinct()
        val selfKept = sigged
          .join(selfDrops, sigged(idCol) === col("_drop"), "left_anti")
        val accepted =
          if (!corpusExists) selfKept
          else {
            // id immutability: re-delivered accepted ids drop outright
            val existing = A.probeHammingIndexIds(spark, indexPath,
              selfKept.select(col(idCol)), idCol, bk)
            val newIds = selfKept.join(existing, Seq(idCol), "left_anti")
            val dupDrops = A.probeHammingIndex(spark, indexPath,
                newIds.select(col(idCol), col("_sig")), "_sig", idCol,
                md, bk)
              .select(col(idCol)).distinct()
            newIds.join(dupDrops, Seq(idCol), "left_anti")
          }
        val pinned = accepted.localCheckpoint(true) // two writes read it
        pinned.write.mode("append").parquet(corpusPath)
        A.appendHammingIndexWithIds(pinned.select(col(idCol), col("_sig")),
          "_sig", idCol, indexPath, md, bk)
        }
        // replayed fully-committed batch => no-op (see dedupedIngest)
        if (committedReplay(spark, corpusPath, batchId)) ()
        else { runIngestBatch(); commitBatchLedger(spark, corpusPath, batchId) }
    }
  }

  /** INCREMENTAL stateful sessionization — the production variant: the
    * open tail stays in GroupState across micro-batches and is flushed
    * exactly once, when the event-time watermark passes
    * `session end + gap` (EventTimeTimeout). Each session is emitted a
    * single time, closed; no overlapping/evolving rows downstream.
    *
    * Batch-mode caveat: timeouts never fire in batch execution, so open
    * tails are not emitted there — [[statefulSessionsReplay]] is the
    * batch-equal form the DuckDB oracle checks. */
  def statefulSessions(events: DataFrame, gapMin: Int = 5,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("ts"))
      .as[UserEventT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[UserEventT], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed tail end + gap: no event can extend it
            val out = state.getOption
              .map(o => UserSession(uid, o.start_us, o.end_us, o.n)).iterator
            state.remove()
            out
          } else {
            val sorted = it.map(_.ts_us).toArray
            java.util.Arrays.sort(sorted)
            val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            val open = foldSessions(uid, sorted, state.getOption.orNull, gapUs, out)
            if (open != null) {
              state.update(open)
              // flush when the watermark passes end+gap; timeout must be
              // strictly later than the current watermark, so clamp for
              // tails that are already expired as they arrive
              val endMs = open.end_us / 1000L + gapMin * 60L * 1000L
              state.setTimeoutTimestamp(math.max(endMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** STREAMING-maintained incremental view: each micro-batch folds
    * into the [[graft.operators.Ivm]] keyed aggregate at `storePath`.
    * Exactly-once under crash-replay WITHOUT a side ledger: the
    * (queryId, batchId) tag commits atomically WITH each bucket's
    * data ([[graft.operators.Ivm.applyBatch]]'s per-bucket `_applied`
    * marker), so a restart that re-delivers a micro-batch applies
    * exactly the buckets the crash left unswapped and skips the rest —
    * the failure mode a whole-store ledger cannot cover (its commit
    * instant is necessarily after the last bucket's). The query id is
    * checkpoint-scoped, so a FRESH checkpoint over an existing view
    * restarts batch ids at 0 without ever matching the old tags. */
  /** STREAMING-maintained VECTOR index (r18): each micro-batch UPSERTS
    * into the snapshot index at `indexPath` — continuous embedding
    * ingest into the ANN serving index, the missing streaming sibling
    * of [[dedupedIngestIndexed]] (MinHash) and [[ivmIngest]] (keyed
    * aggregates). Exactly-once BY IDEMPOTENCE, not by ledger: upsert
    * is id-keyed last-write-wins through the manifest CAS, so a
    * replayed micro-batch (restart re-delivery) re-commits the same
    * rows to the same content — versions advance, the served answer
    * does not drift; a concurrent API writer linearizes through the
    * same CAS with the usual retry. Rows must carry the index schema:
    * (id string, values array<float>, metadata struct). */
  def vectorIndexIngest(rows: DataFrame, indexPath: String, dim: Int,
      numBuckets: Int = graft.operators.LayoutMeta.Unspecified)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val idx =
            if (numBuckets == graft.operators.LayoutMeta.Unspecified)
              graft.operators.VectorIndex.ensure(batch.sparkSession,
                indexPath, dim)
            else
              graft.operators.VectorIndex.ensure(batch.sparkSession,
                indexPath, dim, numBuckets = numBuckets)
          idx.upsert(batch.select(col("id"), col("values"), col("metadata")))
        }
    }

  /** DEDUP-ON-INGEST for the VECTOR index (r19; within-batch pass
    * de-quadratified r20) — [[vectorIndexIngest]] with the semantic
    * gate in front, the vector edition of [[dedupedIngest]]: per
    * micro-batch,
    *  1. WITHIN-BATCH keep-first near-dedup — a row drops iff a
    *     SMALLER-id row of the same batch reaches `threshold` cosine.
    *     The smaller-id row counts WHETHER OR NOT it was itself
    *     dropped (a transitive chain A~B, B~C with ids A<B<C drops
    *     BOTH B and C even when A!~C): the rule is "drops compare
    *     against all smaller-id rows, kept or not" — one parallel
    *     pass, no sequential kept-set dependence, and the committed
    *     q241 oracle encodes exactly this.
    *     COST (r20): candidate pairs come from a 4 x 16-bit band join
    *     over the 64-bit hyperplane signature (the
    *     [[graft.operators.Dedup]] simhash banding over
    *     [[graft.operators.Ann.bitSignature64]]) with exact cosine
    *     verifying only in-bucket pairs — O(batch + collisions), never
    *     the batch^2 all-pairs BNLJ this pass ran through r19.
    *     APPROXIMATION: pigeonhole guarantees a band match for any
    *     pair within signature Hamming distance 3, so exact re-sends
    *     and near-identical vectors always flag; a pair at cosine >=
    *     `threshold` whose signatures differ in >= 4 bits in every
    *     band can UNDER-flag (ingest a near-dup — the safe direction,
    *     and the same contract the against-index pass already
    *     carries). Verification is always exact cosine: the pre-pass
    *     never OVER-flags.
    *     VALVE: a micro-batch larger than `maxBatchRows` throws loudly
    *     (the [[graft.operators.IntervalJoin]] maxCellsPerRow
    *     discipline) instead of letting one unbounded trigger turn the
    *     band join's in-bucket work quadratic — size the trigger, or
    *     raise the valve deliberately.
    *  2. AGAINST-INDEX [[graft.operators.VectorIndex.nearDupAgainst]] —
    *     one batched knnJoin probe, batch-vs-corpus orientation: the
    *     index is never rescanned per row and never reshuffled;
    *  3. survivors upsert through the manifest CAS.
    * First-seen-wins across batches: a later exact re-send of an
    * already-accepted vector flags against the index and drops, EVEN
    * when the accepted copy entered under a different id.
    *
    * Replay-idempotent WITHOUT a ledger (the [[vectorIndexIngest]]
    * argument, strengthened): a crash between upsert and checkpoint
    * commit replays the batch, whose already-upserted rows now
    * SELF-FLAG against the index (score 1) and drop — the committed
    * state is untouched either way, so at-least-once delivery closes
    * by construction. Unlike [[dedupedIngest]]'s corpus+sidecar, the
    * index IS the signature store: the stored `_bsig` column serves
    * the probe, so there is no sidecar to heal or verify.
    *
    * Approximation contract inherits [[VectorIndex.knnJoin]]'s: a
    * pruned `shortlist` can only UNDER-flag (ingest a near-dup — the
    * safe direction); `shortlist >= index size` makes the against-index
    * verdicts exact. The within-batch pass carries the banded contract
    * stated above: candidate generation can under-flag a pair whose
    * signatures differ in >= 4 bits in every band, and the cosine
    * VERIFY of every generated candidate is exact. */
  def vectorDedupIngest(rows: DataFrame, indexPath: String, dim: Int,
      threshold: Double, shortlist: Int = 400,
      numBuckets: Int = graft.operators.LayoutMeta.Unspecified,
      maxBatchRows: Long = 1L << 21)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.outputMode("append").foreachBatch {
      (batch0: DataFrame, _: Long) =>
        if (!batch0.isEmpty) {
          val spark = batch0.sparkSession
          val within = withinBatchVectorDedup(batch0, dim, threshold,
            maxBatchRows)
          val idx =
            if (numBuckets == graft.operators.LayoutMeta.Unspecified)
              graft.operators.VectorIndex.ensure(spark, indexPath, dim)
            else
              graft.operators.VectorIndex.ensure(spark, indexPath, dim,
                numBuckets = numBuckets)
          val verdicts = idx.nearDupAgainst(within, "id", "values",
            threshold, shortlist)
          val survivors = within.join(
            verdicts.filter(col("is_dup")).select(col("id")),
            Seq("id"), "left_anti")
          if (!survivors.isEmpty)
            idx.upsert(survivors.select(col("id"), col("values"),
              col("metadata")))
        }
    }

  /** The WITHIN-BATCH leg shared by [[vectorDedupIngest]] and
    * [[vectorDedupIngestEpoch]] (factored r20 — the two entry points
    * must never drift on the keep-first rule the q241/q268 oracles
    * encode): id collapse (values-hash-desc survivor), `maxBatchRows`
    * valve, typed E2 null/width refusal, 4x16-bit signature band
    * candidate join, exact-cosine verify, smaller-id-wins drop. Returns
    * the surviving rows (id, values, metadata), eagerly pinned. */
  private def withinBatchVectorDedup(batch0: DataFrame, dim: Int,
      threshold: Double, maxBatchRows: Long): DataFrame = {
    // collapse duplicate ids WITHIN the batch first (a stream can
    // re-deliver an id in one micro-batch): the upsert tie-break
    // (values-hash desc — version is constant inside a batch), so
    // the survivor is deterministic and knnJoin's distinct-qid
    // contract holds
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(xxhash64(col("values")).desc)
    val batch = batch0.select(col("id").cast("string").as("id"),
        col("values"), col("metadata"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .localCheckpoint(eager = true)
    // ONE aggregation job answers both pre-pass questions — the row
    // count the maxBatchRows valve needs and the E2 null/width census
    // (r21: these were two separate jobs, a fixed per-job cost paid
    // every micro-batch; the fused agg scans the pinned batch once)
    val pre = batch.agg(count(lit(1)),
      count(when(col("values").isNull || size(col("values")) =!= dim, 1))).head()
    val nRows = pre.getLong(0)
    lastWithinBatchRows = nRows
    if (nRows > maxBatchRows)
      throw new IllegalStateException(
        s"vector dedup-ingest: micro-batch of $nRows rows exceeds " +
          s"maxBatchRows $maxBatchRows — one unbounded trigger " +
          "would make the within-batch band join's in-bucket " +
          "verify quadratic in the batch; bound the source " +
          "trigger (maxFilesPerTrigger / maxOffsetsPerTrigger) " +
          "or raise maxBatchRows deliberately")
    // E2 up front (r20 review): a null or wrong-width vector
    // must fail TYPED here, not as an opaque NPE inside the
    // banding signature UDF (the knnJoin null-guard discipline;
    // upsert would refuse the row anyway — refusing before the
    // dedup passes names the problem)
    if (pre.getLong(1) > 0)
      throw new graft.core.IngestError(
        s"vector dedup-ingest: micro-batch contains a null or " +
          s"wrong-dimension vector (index dimension $dim)")
    // banded candidate generation (r20): 64-bit hyperplane
    // signature (the index's own _bsig seed), 4 x 16-bit bands —
    // only in-bucket pairs pay an exact cosine. The band join
    // shuffles on the band key (no broadcast: the valve bounds
    // the batch, AQE broadcasts small batches on its own).
    val sigf = udf((v: Seq[Double]) =>
      graft.operators.Ann.bitSignature64(v.toArray, 42L))
    val sigs = batch
      .select(col("id"), col("values").cast("array<double>").as("_v"))
      .withColumn("_sig", sigf(col("_v")))
    val banded = sigs.select(col("id"), col("_v"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("_sig"), b * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("_band", "_bh")))
    val cand = banded
      .select(col("_band"), col("_bh"), col("id").as("_bid"),
        col("_v").as("_bv"))
      .join(banded.select(col("_band"), col("_bh"),
        col("id").as("_aid"), col("_v").as("_av")),
        Seq("_band", "_bh"))
      .filter(col("_aid") < col("_bid"))
      .select(col("_aid"), col("_av"), col("_bid"), col("_bv"))
      .dropDuplicates("_aid", "_bid")
      .localCheckpoint(eager = true)
    lastWithinCandidatePairs = cand.count()
    val withinDropped = cand
      .filter(graft.functions.vectors.cosine(col("_av"), col("_bv"))
        >= threshold)
      .select(col("_bid").as("id")).distinct()
    batch.join(withinDropped, Seq("id"), "left_anti")
      .localCheckpoint(eager = true)
  }

  /** EPOCH-ROLLOVER STREAMING VECTOR DEDUP-INGEST (r20) — the
    * [[vectorDedupIngest]] pipeline for the deployment the sharded
    * serving family exists for: the standing corpus lives in N
    * IMMUTABLE frozen epoch shards (served by [[graft.operators
    * .VectorIndex.queryManyApprox]]/[[graft.operators.VectorIndex
    * .knnJoinSharded]]), and the stream fills the CURRENT epoch. Per
    * micro-batch:
    *
    *  1. the shared within-batch keep-first pass
    *     ([[withinBatchVectorDedup]] — the q241 contract verbatim);
    *  2. dedup against the WHOLE standing set in one sharded k=1 join
    *     ([[graft.operators.VectorIndex.nearDupAgainstSharded]] over
    *     frozen ∪ active) — first-seen-wins ACROSS epochs: a vector
    *     near one accepted in ANY earlier epoch never re-enters;
    *  3. survivors upsert into the ACTIVE epoch only.
    *
    * The scale point: all ingest WRITE I/O (CAS manifest commits,
    * touched-bucket rewrites) lands on the active epoch — the frozen
    * 100-TB epochs are PROBED (column-pruned signature scans +
    * shortlist-bucket reads per shard), never locked, rewritten, or
    * reshuffled, so epoch rollover is rename-free: freeze = stop
    * passing the index as `activePath` and start passing it in
    * `frozenPaths`. Replay idempotence is inherited (the active epoch
    * is in the probed set, so a replayed batch's own rows self-flag);
    * frozen-epoch id disjointness is the certify-once contract every
    * sharded probe trusts. Frozen epochs must exist and share `dim`
    * (loud refusal at WRITER CONSTRUCTION — before any micro-batch
    * work, and visible even if the source never delivers a batch;
    * a missing meta throws in open). */
  def vectorDedupIngestEpoch(rows: DataFrame, frozenPaths: Seq[String],
      activePath: String, dim: Int, threshold: Double, shortlist: Int = 400,
      numBuckets: Int = graft.operators.LayoutMeta.Unspecified,
      maxBatchRows: Long = 1L << 21)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // frozen epochs validate at WRITER CONSTRUCTION, not per batch: a
    // missing or wrong-dimension epoch is a configuration error that
    // must refuse before any micro-batch work (or no batch at all —
    // an empty source must not hide it), and the opened handles are
    // immutable-path readers safely reused across batches (each probe
    // resolves the current snapshot itself)
    val frozen = frozenPaths.map(
      graft.operators.VectorIndex.open(rows.sparkSession, _))
    frozen.foreach(f => require(f.meta.dimension == dim,
      s"frozen epoch '${f.meta.name}' stores ${f.meta.dimension}-dim " +
        s"vectors, ingest declared $dim"))
    rows.writeStream.outputMode("append").foreachBatch {
      (batch0: DataFrame, _: Long) =>
        if (!batch0.isEmpty) {
          val spark = batch0.sparkSession
          val within = withinBatchVectorDedup(batch0, dim, threshold,
            maxBatchRows)
          val active =
            if (numBuckets == graft.operators.LayoutMeta.Unspecified)
              graft.operators.VectorIndex.ensure(spark, activePath, dim)
            else
              graft.operators.VectorIndex.ensure(spark, activePath, dim,
                numBuckets = numBuckets)
          val verdicts = graft.operators.VectorIndex.nearDupAgainstSharded(
            frozen :+ active, within, "id", "values", threshold, shortlist)
          val survivors = within.join(
            verdicts.filter(col("is_dup")).select(col("id")),
            Seq("id"), "left_anti")
          if (!survivors.isEmpty)
            active.upsert(survivors.select(col("id"), col("values"),
              col("metadata")))
        }
    }
  }

  /** Diagnostics for the last [[vectorDedupIngest]] /
    * [[vectorDedupIngestEpoch]] micro-batch: rows after the id
    * collapse, and banded candidate pairs the exact cosine verify
    * actually paid for (the number the r20 pre-pass exists to keep
    * << rows^2). */
  private[graft] var lastWithinBatchRows: Long = 0L
  private[graft] var lastWithinCandidatePairs: Long = 0L

  /** STREAMING TOKEN-BUDGET ADMISSION (r19) — the continuous form of
    * [[graft.operators.Sampling.tokenBudgetSample]] (q177), built on
    * Spark 4's `transformWithState` API (the arbitrary-state surface
    * that succeeds flatMapGroupsWithState: typed ValueState under the
    * RocksDB provider, TTL-capable, timer-capable): per group, ADMIT
    * docs in id order until the group's token budget is exhausted,
    * with the running total persisted across micro-batches — the
    * mixture-recipe enforcement a rolling ingest needs ("stop taking
    * lang=fr once its 2B-token quota fills") without ever re-counting
    * admitted history.
    *
    * Admission is deterministic: within a micro-batch each group's
    * rows process in ascending id order; across batches the state
    * linearizes them. A doc is admitted iff the group's running total
    * BEFORE it is still under budget (the q177 rule: the crossing doc
    * is admitted, everything after drops), and emits its post-admit
    * cumulative total for auditability. State is one Long per group —
    * O(groups), never O(docs). Requires the RocksDB state store
    * provider (transformWithState's backend).
    *
    * A group key ABSENT from `budgets` gets `defaultBudget`, which
    * defaults to 0 — absent means "no quota", and a recipe that
    * enumerates its mixture should not silently pass-through a group
    * it never budgeted (an unanticipated `lang` value flooding the
    * ingest is the failure this operator exists to stop). The
    * trade-off is that a TYPO'D key also admits zero docs — silently
    * from the stream's perspective, loudly in the emitted audit rows
    * (the group simply never appears). Callers that prefer
    * pass-through for unlisted groups set `defaultBudget =
    * Long.MaxValue`; callers that want a hard error should validate
    * the incoming group domain upstream (state sees keys one at a
    * time, so the processor itself cannot distinguish a typo from a
    * legitimately unbudgeted group). */
  def tokenBudgetIngest(docs: DataFrame, groupCol: String, idCol: String,
      tokCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L)
      : org.apache.spark.sql.Dataset[(String, Long, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(tokCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TokenBudgetProcessor(budgets, defaultBudget),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  def ivmIngest(rows: DataFrame, storePath: String, keyCols: Seq[String],
      sumCols: Seq[String],
      nBuckets: Int = graft.operators.LayoutMeta.Unspecified)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val qid = Option(spark.sparkContext.getLocalProperty(QueryIdProp))
          .getOrElse("")
        val tag = if (qid.isEmpty) None else Some((qid, batchId))
        graft.operators.Ivm.applyBatch(batch, storePath, keyCols, sumCols,
          nBuckets, tag)
    }
}

/** The [[StreamOps.tokenBudgetIngest]] processor: one ValueState[Long]
  * per group key (tokens admitted so far). In each micro-batch the
  * group's rows buffer and sort by id before admission, so the
  * admitted set is a deterministic function of (state, batch content)
  * — never of shuffle arrival order. The q177 crossing rule: a doc is
  * admitted iff the running total BEFORE it is under budget. A key
  * absent from `budgets` gets `defaultBudget` (see
  * [[StreamOps.tokenBudgetIngest]] for the zero-default rationale). */
private[streaming] class TokenBudgetProcessor(budgets: Map[String, Long],
    defaultBudget: Long = 0L)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long, Long), (String, Long, Long, Long)] {
  @transient private var used: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    used = getHandle.getValueState[Long]("used",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(String, Long, Long, Long)] = {
    val budget = budgets.getOrElse(key, defaultBudget)
    var u = if (used.exists()) used.get() else 0L
    val out = rows.toSeq.sortBy(_._2).flatMap { case (g, id, tok) =>
      if (u < budget) { u += tok; Some((g, id, tok, u)) } else None
    }
    used.update(u)
    out.iterator
  }
}
