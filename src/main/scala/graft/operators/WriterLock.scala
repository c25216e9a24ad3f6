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
  * Mechanics: the lease is a `.<index-dir-name>._writer_lock` file
  * BESIDE the index root (inside it would die to full-rewrite
  * `mode=overwrite` writes), created atomically-exclusive. Same-JVM
  * races are decided exactly by a process-wide `putIfAbsent` gate;
  * cross-JVM visibility comes from the exclusive file create — atomic
  * on HDFS; on a raw local FS the exists+create window is narrowed by
  * the JVM gate (the documented [[VectorIndex]] manifest-CAS
  * discipline: exact where a local FS implies one JVM). A writer that
  * crashes leaves the lease behind — deliberately: silently expiring
  * leases by wall-clock invites split-brain; the operator confirms the
  * writer is gone and calls [[breakLock]].
  */
private[graft] object WriterLock {

  /** A second writer attempted a mutation while one held the lease. */
  final class WriterConflict(msg: String) extends IllegalStateException(msg)

  /** Same-JVM exactness gate: qualified index root -> holder token. */
  private val jvmHeld = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def lockPath(fs: org.apache.hadoop.fs.FileSystem, path: String): Path = {
    val root = fs.makeQualified(new Path(path))
    val parent = Option(root.getParent).getOrElse(root)
    new Path(parent, s".${root.getName}._writer_lock")
  }

  private def holderInfo(fs: org.apache.hadoop.fs.FileSystem, p: Path): String =
    try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } catch { case _: Exception => "<unreadable>" }

  /** Run `body` holding `path`'s exclusive writer lease; always
    * released on exit (including exceptions). Throws [[WriterConflict]]
    * if another writer holds it — never waits, never steals. */
  def withLock[T](spark: SparkSession, path: String, what: String)(body: => T): T = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = lockPath(fs, path)
    val key = lock.toString
    val token = java.util.UUID.randomUUID().toString
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
      if (fs.exists(lock)) conflict(holderInfo(fs, lock))
      val out =
        try fs.create(lock, false)
        catch { case _: java.io.IOException => conflict(holderInfo(fs, lock)) }
      out.write(s"$token\t$what\t${System.currentTimeMillis()}".getBytes("UTF-8"))
      out.close()
      locked = true
      body
    } finally {
      if (locked) fs.delete(lock, false)
      jvmHeld.remove(key, claim)
    }
  }

  /** Operator escape hatch for a lease whose writer died: removes the
    * lock file (and any same-JVM claim). Returns true if a lease
    * existed. NOT for contention — breaking a LIVE writer's lease
    * re-opens the interleavings the lock exists to prevent. */
  def breakLock(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = lockPath(fs, path)
    jvmHeld.remove(lock.toString)
    fs.delete(lock, false)
  }
}
