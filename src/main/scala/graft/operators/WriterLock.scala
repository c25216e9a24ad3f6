package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Exclusive writer lease for the append-only multi-directory indexes
  * ([[InvertedIndex]] postings + doclens + stats, [[MinhashIndex]]
  * bands + payload).
  *
  * [[VectorIndex]] mutations are safe under concurrency because every
  * one funnels into a single-file manifest CAS; the postings/MinHash
  * indexes have no single commit point — one logical mutation lands
  * files across several sidecar directories in a fixed order, and the
  * ordering argument ("the dir the rerun probe reads commits last")
  * only holds for ONE writer at a time. Until r18 that single writer
  * was implicit (the streaming checkpoint); two sessions running
  * `appendIndex` vs `deleteDocs` vs `compactIndex` concurrently could
  * interleave beyond what the snapshot-listing discipline covers
  * (e.g. a compact's staged rewrite racing a delete's dir swap loses
  * the delete). This lock makes the contract EXPLICIT and loud: every
  * mutation takes the index's writer lease for its duration, and a
  * second writer fails fast with [[WriterConflict]] instead of
  * silently corrupting — the LayoutMeta philosophy (turn a silent
  * correctness trap into a thrown exception) applied to write-write
  * races. Readers never touch the lock: probes stay lock-free (they
  * already tolerate an in-flight append by the commit-order argument).
  *
  * Mechanics (r19: the manifest-CAS discipline, replacing exclusive
  * create): the lease is a `.<index-dir-name>._writer_lock` file
  * BESIDE the index root (inside it would die to full-rewrite
  * `mode=overwrite` writes), committed as a PER-ATTEMPT temp file
  * renamed onto the lock path — so a lease either exists complete or
  * not at all, and two racing acquirers never write the same object.
  * Same-JVM races are decided exactly by a process-wide `putIfAbsent`
  * gate; cross-JVM races by exists-check + rename. The rename is a
  * true CAS only on HDFS, where the NameNode atomically rejects a
  * rename whose destination exists. The Hadoop object-store
  * connectors (S3A/GCS) implement rename as a CLIENT-SIDE
  * exists-check followed by copy+delete — not one atomic operation —
  * so two JVMs racing through that window can both believe they hold
  * the lease: on object stores the cross-JVM gate is BEST-EFFORT
  * (it narrows the race to the copy window; the in-process
  * `putIfAbsent` gate stays exact). Deployments that need an exact
  * cross-JVM lease on S3/GCS should route acquisition through a
  * conditional-write create (`If-None-Match: *`, which both stores
  * support natively) or an external coordinator; the lease FORMAT
  * here is compatible with either. A raw local FS has the same
  * caveat (POSIX rename silently replaces); single JVM there, where
  * the in-process gate is exact (the [[VectorIndex]] writeManifest
  * caveat, verbatim).
  *
  * Crash recovery: a writer that crashes leaves the lease behind —
  * deliberately; silently expiring leases by wall-clock invites
  * split-brain. Two recovery paths: (1) the operator confirms the
  * writer is gone and calls [[breakLock]]; (2) AUTOMATIC for
  * streaming writers (r19) — a mutation running inside a Structured
  * Streaming micro-batch stamps its checkpoint-scoped query id (the
  * `sql.streaming.queryId` local property, stable across restarts of
  * the same checkpoint) into the lease as a stable holder identity,
  * and an acquirer whose stable identity EQUALS the abandoned lease's
  * reclaims it: Spark enforces one active query per checkpoint, so a
  * live lease carrying my own query id can only belong to a dead
  * incarnation of this same query. Without this, a crash mid-append
  * turned the ingest's documented self-healing replay into a stream
  * stuck on [[WriterConflict]] until a manual breakLock. Non-streaming
  * writers carry no stable identity and never auto-reclaim.
  */
private[graft] object WriterLock {

  /** A second writer attempted a mutation while one held the lease. */
  final class WriterConflict(msg: String) extends IllegalStateException(msg)

  /** Same-JVM exactness gate: qualified lock path -> holder token. */
  private val jvmHeld = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def lockPath(fs: org.apache.hadoop.fs.FileSystem, path: String): Path = {
    val root = fs.makeQualified(new Path(path))
    val parent = Option(root.getParent).getOrElse(root)
    new Path(parent, s".${root.getName}._writer_lock")
  }

  private def leaseText(fs: org.apache.hadoop.fs.FileSystem, p: Path): String =
    try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } catch { case _: Exception => "<unreadable>" }

  /** The stable holder field of a lease (4th tab field, "" if absent). */
  private def leaseHolder(text: String): String =
    text.split("\t") match {
      case a if a.length >= 4 => a(3)
      case _ => ""
    }

  /** The caller's stable writer identity: the checkpoint-scoped
    * streaming query id when running inside a micro-batch, else "". */
  private def stableId(spark: SparkSession): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("")

  /** Run `body` holding `path`'s exclusive writer lease; always
    * released on exit (including exceptions). Throws [[WriterConflict]]
    * if another writer holds it — never waits, never steals; the one
    * exception is a streaming writer reclaiming a lease abandoned by a
    * dead incarnation of ITSELF (same checkpoint query id). */
  def withLock[T](spark: SparkSession, path: String, what: String)(body: => T): T = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = lockPath(fs, path)
    val key = lock.toString
    val token = java.util.UUID.randomUUID().toString
    val holder = stableId(spark)
    def conflict(detail: String): Nothing = throw new WriterConflict(
      s"another writer holds the lease on $path ($detail) while this " +
        s"session attempted '$what'; postings/MinHash mutations are " +
        "single-writer — wait for the holder, or WriterLock.breakLock " +
        "the lease if its writer crashed")
    val claim = s"$token\t$what"
    val prev = jvmHeld.putIfAbsent(key, claim)
    if (prev != null) conflict(s"in-process holder: ${prev.split("\t", 2).last}")
    var locked = false
    try {
      if (fs.exists(lock)) {
        val text = leaseText(fs, lock)
        // auto-reclaim: the abandoned lease was stamped with MY OWN
        // checkpoint-scoped query id => its writer is a dead prior
        // incarnation of this stream (one live query per checkpoint);
        // anything else stays a loud conflict.
        if (holder.nonEmpty && leaseHolder(text) == holder)
          fs.delete(lock, false)
        else conflict(text)
      }
      val tmp = new Path(lock.getParent,
        s"${lock.getName}.tmp-${token.take(8)}")
      val out = fs.create(tmp, true)
      out.write(s"$token\t$what\t${System.currentTimeMillis()}\t$holder"
        .getBytes("UTF-8"))
      out.close()
      if (!fs.rename(tmp, lock)) {
        fs.delete(tmp, false)
        conflict(leaseText(fs, lock))
      }
      locked = true
      body
    } finally {
      if (locked) fs.delete(lock, false)
      jvmHeld.remove(key, claim)
    }
  }

  /** Operator escape hatch for a lease whose writer died: removes the
    * lock file (and any same-JVM claim), plus any
    * `.<lock>.tmp-*` debris a writer left by crashing between its
    * per-attempt tmp create and the rename (the tmp is otherwise
    * permanent — acquisition never re-reads it). Returns true if a
    * lease existed. NOT for contention — breaking a LIVE writer's
    * lease re-opens the interleavings the lock exists to prevent. */
  def breakLock(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = lockPath(fs, path)
    jvmHeld.remove(lock.toString)
    fs.globStatus(new Path(lock.getParent, s"${lock.getName}.tmp-*"))
      .foreach(st => fs.delete(st.getPath, false))
    fs.delete(lock, false)
  }
}
