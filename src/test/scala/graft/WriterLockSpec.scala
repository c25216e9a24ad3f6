package graft

import java.nio.file.Files

import graft.operators.{InvertedIndex, MinhashIndex, WriterLock}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Writer coordination for the multi-directory postings/MinHash
  * indexes (r18): mutations take an exclusive per-index lease, a
  * second writer fails fast with a loud [[WriterLock.WriterConflict]],
  * and racing append/delete/compact — each retrying on conflict —
  * serialize to a state with no lost and no resurrected postings. */
class WriterLockSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("second writer fails fast naming the holder; lease releases on exit; breakLock clears a dead lease") {
    val dir = Files.createTempDirectory("graft_wl").toString + "/idx"
    InvertedIndex.writeIndex(docsDf(Seq((1L, "alpha beta"))),
      "doc_id", "text", dir, buckets = 2)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLock.withLock(spark, dir, "slow-writer-test") {
        entered.countDown(); gate.await()
      })
    holder.start(); entered.await()
    val e = intercept[WriterLock.WriterConflict] {
      InvertedIndex.appendIndex(docsDf(Seq((2L, "gamma"))),
        "doc_id", "text", dir)
    }
    assert(e.getMessage.contains("slow-writer-test"),
      s"conflict must name the holder: ${e.getMessage}")
    gate.countDown(); holder.join()
    // lease released on exit: the same mutation now succeeds
    InvertedIndex.appendIndex(docsDf(Seq((2L, "gamma"))), "doc_id", "text", dir)
    // dead-writer lease: a lock file with no live holder (crashed JVM)
    // refuses mutations until the operator breaks it explicitly
    val lockFile = new java.io.File(
      new java.io.File(dir).getParent, ".idx._writer_lock")
    assert(!lockFile.exists(), "lease must not linger after release")
    java.nio.file.Files.writeString(lockFile.toPath, "deadbeef\tcrashed\t0")
    intercept[WriterLock.WriterConflict] {
      InvertedIndex.appendIndex(docsDf(Seq((3L, "delta"))),
        "doc_id", "text", dir)
    }
    assert(WriterLock.breakLock(spark, dir))
    InvertedIndex.appendIndex(docsDf(Seq((3L, "delta"))), "doc_id", "text", dir)
    assert(InvertedIndex.booleanSearchIndexed(spark, dir,
        must = Seq("delta"), mustNot = Nil)
      .select($"doc").as[Long].collect().toSeq == Seq(3L))
    // tmp-lease debris (a writer crashed between its per-attempt tmp
    // create and the rename) is swept by breakLock, not permanent
    val tmpDebris = new java.io.File(
      new java.io.File(dir).getParent, ".idx._writer_lock.tmp-deadbeef")
    java.nio.file.Files.writeString(tmpDebris.toPath, "orphan")
    WriterLock.breakLock(spark, dir)
    assert(!tmpDebris.exists(), "breakLock must sweep tmp-lease debris")
  }

  test("racing append/delete/compact serialize under the lease: no lost, no resurrected postings") {
    val dir = Files.createTempDirectory("graft_wl_race").toString + "/idx"
    val a = (0L until 40L).map(i => (i, s"alpha beta doc$i common"))
    val b = (100L until 140L).map(i => (i, s"gamma delta doc$i common"))
    val victims = a.filter(_._1 % 2 == 0)
    InvertedIndex.writeIndex(docsDf(a), "doc_id", "text", dir, buckets = 4)
    // each racer retries on conflict — the loud error is the
    // coordination signal; the retry models a caller backing off
    def retry(what: String)(f: => Unit): Unit = {
      var tries = 0
      var done = false
      while (!done) {
        try { f; done = true }
        catch {
          case _: WriterLock.WriterConflict =>
            tries += 1
            assert(tries < 500, s"$what starved behind the lease")
            Thread.sleep(5)
        }
      }
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(name: String)(f: => Unit) = new Thread(() =>
      try retry(name)(f) catch { case t: Throwable => errs.add(t) })
    val ts = Seq(
      racer("append") {
        InvertedIndex.appendIndex(docsDf(b), "doc_id", "text", dir)
      },
      racer("delete") {
        InvertedIndex.deleteDocs(docsDf(victims), "doc_id", "text", dir): Unit
      },
      racer("compact") {
        InvertedIndex.compactIndex(spark, dir, minFiles = 1): Unit
      })
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"racer failed: ${errs.peek()}")
    // survivors regardless of serialization order: (a minus victims) + b
    val survivors = (a.filterNot(r => victims.exists(_._1 == r._1)) ++ b)
    // no lost postings (every survivor answers), no resurrected ones
    // (no victim answers), and the stats rollup netted exactly: scores
    // from the raced index are BIT-identical to a fresh single-writer
    // rebuild over the survivor set — N/avgdl drift would break this
    def scored(path: String) =
      InvertedIndex.bm25Search(spark, path, Seq("common"), k = 1000)
        .select($"doc", floor($"score" * lit(1000000.0)).cast("long"))
        .as[(Long, Long)].collect().toSet
    val raced = scored(dir)
    assert(raced.map(_._1) == survivors.map(_._1).toSet)
    val ref = Files.createTempDirectory("graft_wl_ref").toString + "/idx"
    InvertedIndex.writeIndex(docsDf(survivors), "doc_id", "text", ref,
      buckets = 4)
    assert(raced == scored(ref),
      "raced index must score bit-identically to a fresh rebuild")
  }

  test("streaming writer auto-reclaims only ITS OWN stale lease; foreign and batch writers stay loud") {
    val dir = Files.createTempDirectory("graft_wl_rc").toString + "/idx"
    InvertedIndex.writeIndex(docsDf(Seq((1L, "alpha"))),
      "doc_id", "text", dir, buckets = 2)
    val lockFile = new java.io.File(
      new java.io.File(dir).getParent, ".idx._writer_lock")
    def plantStale(holder: String): Unit = java.nio.file.Files.writeString(
      lockFile.toPath, s"deadtok\tappendIndex\t0\t$holder")
    def append(id: Long): Unit = InvertedIndex.appendIndex(
      docsDf(Seq((id, "beta"))), "doc_id", "text", dir)
    val qidProp = "sql.streaming.queryId"
    try {
      // stale lease stamped by a crashed streaming incarnation "qA"
      plantStale("qA")
      // batch writer (no query id): loud conflict, no reclaim
      intercept[WriterLock.WriterConflict] { append(2L) }
      // a DIFFERENT streaming query: still a loud conflict
      spark.sparkContext.setLocalProperty(qidProp, "qB")
      intercept[WriterLock.WriterConflict] { append(2L) }
      // the same query id = a dead incarnation of myself: reclaim,
      // mutate, and release cleanly
      spark.sparkContext.setLocalProperty(qidProp, "qA")
      append(2L)
      assert(!lockFile.exists(), "reclaimed lease must release on exit")
      // a live holder is NEVER reclaimed, even by its own query id
      val entered = new java.util.concurrent.CountDownLatch(1)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => {
        spark.sparkContext.setLocalProperty(qidProp, "qA")
        WriterLock.withLock(spark, dir, "live-qA-writer") {
          entered.countDown(); gate.await()
        }
      })
      holder.start(); entered.await()
      intercept[WriterLock.WriterConflict] { append(3L) }
      gate.countDown(); holder.join()
    } finally spark.sparkContext.setLocalProperty(qidProp, null)
    assert(InvertedIndex.booleanSearchIndexed(spark, dir,
        must = Seq("beta"), mustNot = Nil)
      .select($"doc").as[Long].collect().toSeq == Seq(2L))
  }

  test("MinhashIndex mutations take the same lease") {
    val dir = Files.createTempDirectory("graft_wl_mh").toString + "/midx"
    val prep = graft.operators.Dedup.prepareMinhash(
      docsDf(Seq((1L, "alpha beta gamma delta epsilon zeta"))),
      "doc_id", "text")
    MinhashIndex.append(prep, dir, buckets = 4)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLock.withLock(spark, dir, "mh-holder") {
        entered.countDown(); gate.await()
      })
    holder.start(); entered.await()
    intercept[WriterLock.WriterConflict] { MinhashIndex.append(prep, dir) }
    intercept[WriterLock.WriterConflict] {
      MinhashIndex.delete(spark, dir, Seq(1L).toDF("_id"))
    }
    intercept[WriterLock.WriterConflict] {
      MinhashIndex.compact(spark, dir, minFiles = 1)
    }
    intercept[WriterLock.WriterConflict] {
      MinhashIndex.rebucket(spark, dir, 8)
    }
    gate.countDown(); holder.join()
    assert(MinhashIndex.compact(spark, dir, minFiles = 1) >= 0)
  }

  test("VectorIndex.mergeIndexes takes the lease on output and sources (r20)") {
    import graft.operators.VectorIndex
    val base = Files.createTempDirectory("graft_wl_vmerge").toString
    def build(p: String, lo: Long, hi: Long): Unit =
      VectorIndex.ensure(spark, p, 4).upsert(
        spark.range(lo, hi).select(concat(lit("v-"), $"id").as("id"),
          array($"id".cast("float"), lit(1f), lit(2f), lit(3f)).as("values"),
          struct(lit(0).as("chunk_index"), lit("t").as("source"))
            .as("metadata")))
    build(s"$base/s0", 0, 10)
    build(s"$base/s1", 10, 20)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def holding(path: String)(body: => Unit): Unit = {
      val t = new Thread(() =>
        WriterLock.withLock(spark, path, "vmerge-holder") {
          entered.countDown(); gate.await()
        })
      t.start(); entered.await()
      try body finally { gate.countDown(); t.join() }
    }
    // a busy SOURCE fails the merge fast (quiescence made loud)
    holding(s"$base/s1") {
      intercept[WriterLock.WriterConflict] {
        VectorIndex.mergeIndexes(spark, Seq(s"$base/s0", s"$base/s1"),
          s"$base/m0")
      }
    }
    // ...and the failed attempt released every lease it DID take (out
    // + s0 were acquired before s1 conflicted): the merge now succeeds
    val merged = VectorIndex.mergeIndexes(spark,
      Seq(s"$base/s0", s"$base/s1"), s"$base/m0")
    assert(merged.scan().count() == 20L)
  }
}
