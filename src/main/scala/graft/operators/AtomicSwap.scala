package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** Crash-safe directory replacement that does NOT assume atomic
  * directory rename — the object-store-safe sibling-swap commit
  * (r14 verdict "What's wrong #4").
  *
  * The two-rename swap (`live -> trash`, `staged -> live`) used by the
  * streaming corpus heal and the MinHash-index rebucket is atomic on
  * HDFS/POSIX but on S3A-class stores "rename" is per-object
  * copy+delete: a crash mid-copy leaves a PARTIALLY-present live dir
  * that an `exists(live)` recovery check then mistakes for a complete
  * corpus — and its cleanup deletes the only full copy. This utility
  * ports the pointer-commit discipline of [[VectorIndex]]'s manifest
  * (the single small-object write is the commit point) to whole-dir
  * replacement:
  *
  *  1. caller stages the replacement dir next to `live` (a Spark write
  *     — its `_SUCCESS` marker is the staged-complete witness);
  *  2. [[swapIn]] commits a one-line JOURNAL object (`<live>__swapjournal`,
  *     tmp + rename of a single small file — atomic everywhere) naming
  *     the staged dir: from this instant the staged dir is
  *     authoritative and the live dir is disposable;
  *  3. the live dir is deleted and the staged dir promoted — by plain
  *     rename where the filesystem honors it, by recursive copy where
  *     rename fails (the object-store shape); only after the promote
  *     completes is the staged dir's `_SUCCESS` dropped (un-marking it
  *     as a recovery source) and the journal deleted (closing the
  *     swap).
  *
  * A crash ANYWHERE in step 3 leaves the journal + a `_SUCCESS`-complete
  * staged dir, and [[recover]] simply redoes the promote (idempotent:
  * it re-deletes whatever partial live content exists first). A crash
  * after the staged `_SUCCESS` drop leaves a journal whose staged dir
  * is incomplete — which proves the promote finished, so [[recover]]
  * keeps live and sweeps the leftovers. No interleaving loses rows.
  *
  * Single-writer per live path, like every maintenance op that calls
  * it; readers racing a swap see either the old or the new dir listing
  * on POSIX/HDFS and may see a mid-copy listing on object stores —
  * the same read-isolation caveat the two-rename swap had (serving
  * reads that need snapshot isolation belong on [[VectorIndex]]'s
  * manifest layout instead).
  */
private[graft] object AtomicSwap {

  private[graft] def journalPath(live: Path): Path =
    new Path(live.getParent, live.getName + "__swapjournal")

  /** Replace `livePath` with the `_SUCCESS`-complete staged dir at
    * `stagedPath` (a sibling of `livePath`). Crash-safe per the class
    * contract; on return the staged dir and journal are gone. */
  def swapIn(conf: Configuration, livePath: String, stagedPath: String): Unit = {
    val live = new Path(livePath)
    val staged = new Path(stagedPath)
    val fs = live.getFileSystem(conf)
    require(staged.getParent == live.getParent,
      s"staged dir $staged must be a sibling of $live")
    require(fs.exists(new Path(staged, "_SUCCESS")),
      s"staged dir $staged incomplete (no _SUCCESS) — refusing to commit")
    writeJournal(fs, live, staged.getName)
    promote(conf, fs, live, staged)
  }

  /** Finish an interrupted [[swapIn]] at `livePath`, if any. Call once
    * before the first read/append of a maintenance cycle; a no-op
    * (one exists check) when no journal is present. */
  def recover(conf: Configuration, livePath: String): Unit = {
    val live = new Path(livePath)
    val fs = live.getFileSystem(conf)
    val j = journalPath(live)
    if (!fs.exists(j)) return
    val in = fs.open(j)
    val stagedName =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val staged = new Path(live.getParent, stagedName)
    if (stagedName.nonEmpty && fs.exists(new Path(staged, "_SUCCESS"))) {
      // the swap was committed but the promote did not finish: the
      // staged dir is authoritative — redo the promote (idempotent)
      promote(conf, fs, live, staged)
    } else {
      // staged incomplete -> the promote finished (its _SUCCESS drop is
      // ordered before the journal delete) or the journal is stale
      // debris: live is authoritative, sweep the leftovers
      fs.delete(j, false)
      if (stagedName.nonEmpty && fs.exists(staged)) fs.delete(staged, true)
    }
  }

  // the commit point: one small object, tmp + rename (atomic on object
  // stores too — single-object PUT semantics)
  private def writeJournal(fs: FileSystem, live: Path, stagedName: String): Unit = {
    val j = journalPath(live)
    val tmp = new Path(live.getParent,
      s".${live.getName}__swapjournal.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    out.write(stagedName.getBytes("UTF-8"))
    out.close()
    if (fs.exists(j)) fs.delete(j, false)
    if (!fs.rename(tmp, j)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(s"could not commit swap journal at $j")
    }
  }

  private def promote(conf: Configuration, fs: FileSystem,
      live: Path, staged: Path): Unit = {
    if (fs.exists(live)) fs.delete(live, true)
    if (fs.rename(staged, live)) {
      fs.delete(journalPath(live), false)
    } else {
      // rename refused (object-store shape): recursive copy, then
      // un-mark staged BEFORE closing the journal so a crash between
      // the two reads as "promote finished, live authoritative"
      if (!FileUtil.copy(fs, staged, fs, live,
        /* deleteSource = */ false, /* overwrite = */ true, conf))
        throw new IllegalStateException(s"could not promote $staged to $live")
      fs.delete(new Path(staged, "_SUCCESS"), false)
      fs.delete(journalPath(live), false)
      fs.delete(staged, true)
    }
  }
}
