package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Right-to-be-forgotten: after StreamOps.forget, the documents are
  * gone from corpus + sidecar + index, and re-ingesting the same text
  * is ACCEPTED again — erased means "as if never seen". */
class ForgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(seed: Int): String =
    (0 until 60).map(i => s"w${graft.operators.Dedup.splitmix64(seed * 100L + i) % 50}")
      .mkString(" ")

  private def driver(src: java.nio.file.Path) = {
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_forget_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
      Files.copy(part, Paths.get(s"$src/$name.parquet"))
    }
    writeBatch _
  }

  private def stream(src: java.nio.file.Path) =
    spark.readStream.schema(StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(src.toString)

  test("forget erases from corpus + sidecar; re-ingest of erased text is accepted") {
    val src = Files.createTempDirectory("graft_forget_src")
    val corpus = Files.createTempDirectory("graft_forget_c").toString + "/corpus"
    val writeBatch = driver(src)
    val cp = Files.createTempDirectory("graft_forget_cp").toString
    writeBatch("b1", Seq((1L, text(1)), (2L, text(2)), (3L, text(3))))
    val q = StreamOps.dedupedIngest(stream(src), corpus)
      .option("checkpointLocation", cp).start()
    try { q.processAllAvailable() } finally q.stop()

    val removed = StreamOps.forget(spark, corpus, Seq(2L))
    assert(removed == 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    assert(spark.read.parquet(corpus + "_sig").select("_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    // rerun is a no-op (idempotent erasure)
    assert(StreamOps.forget(spark, corpus, Seq(2L)) == 0L)

    // the same text, new id, arrives later: without forget it would be
    // dropped as a near-dup of doc 2 — erased means it is ACCEPTED
    writeBatch("b2", Seq((9L, text(2))))
    val q2 = StreamOps.dedupedIngest(stream(src), corpus)
      .option("checkpointLocation", cp).start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 9L))
  }

  test("forget erases from the persisted MinHash index; census stays reconciled") {
    val src = Files.createTempDirectory("graft_forgeti_src")
    val root = Files.createTempDirectory("graft_forgeti_c").toString
    val corpus = root + "/corpus"
    val index = root + "/index"
    val writeBatch = driver(src)
    val cp = Files.createTempDirectory("graft_forgeti_cp").toString
    writeBatch("b1", (1L to 6L).map(i => (i, text(i.toInt))))
    val q = StreamOps.dedupedIngestIndexed(stream(src), corpus, index)
      .option("checkpointLocation", cp).start()
    try { q.processAllAvailable() } finally q.stop()
    assert(graft.operators.MinhashIndex.payloadCount(spark, index) == 6L)

    val removed = StreamOps.forget(spark, corpus, Seq(2L, 5L),
      indexPath = Some(index))
    assert(removed == 2L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 4L, 6L))
    // index census matches the corpus again (the ingest's invariant)
    assert(graft.operators.MinhashIndex.payloadCount(spark, index) == 4L)
    // no band rows survive for the erased ids anywhere in the index
    val leftover = spark.read.parquet(index)
      .filter(col("_id").isin(2L, 5L)).count()
    assert(leftover == 0L, "erased ids must leave no index rows")

    // near-dup of an erased doc ingests cleanly; near-dup of a kept
    // doc still drops — the index keeps working after the rewrite
    writeBatch("b2", Seq((11L, text(2)), (12L, text(3))))
    val q2 = StreamOps.dedupedIngestIndexed(stream(src), corpus, index)
      .option("checkpointLocation", cp).start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 4L, 6L, 11L))
  }
}
