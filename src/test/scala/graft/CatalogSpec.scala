package graft

import java.nio.file.Files

import graft.catalog.GraftCatalog
import graft.operators.VectorIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The snapshot vector index as a real Spark TableCatalog: plain SQL
  * reads, native `VERSION AS OF` / `TIMESTAMP AS OF` time travel over
  * retained snapshots, column pruning into the manifest parquet scan,
  * and a read-only mutation surface. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def records(rows: (String, Seq[Float], Int)*) =
    rows.toDF("id", "values", "ci")
      .select($"id", $"values",
        struct($"ci".as("chunk_index"), lit("uploaded_pdf").as("source")).as("metadata"))

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_catalog").toString
    val idx = VectorIndex.ensure(spark, s"$dir/idx1", 2)
    idx.upsert(records(("a", Seq(1f, 0f), 0), ("b", Seq(0f, 1f), 1)))   // v0
    idx.upsert(records(("b", Seq(0.5f, 0.5f), 2), ("c", Seq(1f, 1f), 3))) // v1
    spark.conf.set("spark.sql.catalog.gtest", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.root", dir)
    dir
  }

  test("SQL reads the current snapshot; listTables sees the index") {
    root
    val rows = spark.sql(
      "SELECT id, metadata.chunk_index AS ci FROM gtest.idx1 ORDER BY id")
      .as[(String, Int)].collect().toSeq
    assert(rows == Seq(("a", 0), ("b", 2), ("c", 3)))
    val names = spark.sql("SHOW TABLES IN gtest").select("tableName")
      .as[String].collect().toSeq
    assert(names == Seq("idx1"))
  }

  test("VERSION AS OF reads the retained pre-upsert snapshot; a pruned version fails loudly") {
    root
    val v0 = spark.sql(
      "SELECT id, values FROM gtest.idx1 VERSION AS OF 0 ORDER BY id")
      .as[(String, Seq[Float])].collect().toSeq
    assert(v0 == Seq(("a", Seq(1f, 0f)), ("b", Seq(0f, 1f))))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gtest.idx1 VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("99"))
  }

  test("TIMESTAMP AS OF resolves to the newest snapshot committed by then") {
    root
    // far future -> head; before any commit -> loud failure
    val n = spark.sql(
      "SELECT count(*) AS n FROM gtest.idx1 TIMESTAMP AS OF '2100-01-01 00:00:00'")
      .as[Long].head()
    assert(n == 3L)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM gtest.idx1 TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
    assert(e.getMessage.toLowerCase.contains("no snapshot"))
  }

  test("column pruning reaches the scan; count(*) works through the empty projection") {
    root
    val df = spark.sql("SELECT id FROM gtest.idx1 WHERE id = 'a'")
    assert(df.as[String].collect().toSeq == Seq("a"))
    // the V1 relation's produced schema is just the required column
    val scanLine = df.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("Scan")).getOrElse("")
    assert(scanLine.contains("[id"), s"expected id-only scan, got: $scanLine")
    assert(!scanLine.contains("values"), s"values must be pruned: $scanLine")
    assert(spark.sql("SELECT count(*) FROM gtest.idx1").as[Long].head() == 3L)
  }

  test("SQL WHERE over metadata stats-prunes manifest files; rows identical; wrong value reads zero files") {
    val dir = Files.createTempDirectory("graft_catstats").toString
    val idx = VectorIndex.ensure(spark, s"$dir/sidx", 4, numBuckets = 16)
    def recs(from: Int, until: Int, priority: Option[Int]) =
      spark.range(from, until).select(
        concat(lit("p-"), col("id")).as("id"),
        array((0 until 4).map(j =>
          sin(col("id") * (j + 1)).cast("float")): _*).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source"),
          priority.map(v => lit(v)).getOrElse(lit(null)).cast("int")
            .as("priority")).as("metadata"))
    // sparse-tag corpus: NULL priority everywhere, then a small tagged
    // batch that rewrites only its own ids' buckets — every untouched
    // bucket's files stay all-null in priority and are stats-refutable
    idx.upsert(recs(0, 200, None))
    idx.upsert(recs(200, 208, Some(1)))
    spark.conf.set("spark.sql.catalog.gstat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstat.root", dir)
    val expect = idx.scan().filter($"metadata.priority" === 1)
      .select($"id").as[String].collect().toSeq.sorted
    assert(expect.nonEmpty)
    VectorIndex.lastScanStatsPruned = 0
    val got = spark.sql(
      "SELECT id FROM gstat.sidx WHERE metadata.priority = 1 ORDER BY id")
      .as[String].collect().toSeq
    assert(got == expect, "pruned SQL scan must return identical rows")
    assert(VectorIndex.lastScanStatsPruned > 0,
      "the SQL scan must stats-refute the untouched buckets' all-null files")
    // a wrong-value predicate refutes EVERY file: zero rows, zero I/O
    VectorIndex.lastScanStatsPruned = 0
    assert(spark.sql(
      "SELECT id FROM gstat.sidx WHERE metadata.priority = 7").count() == 0L)
    assert(VectorIndex.lastScanStatsPruned > 0)
  }

  test("INSERT INTO is the id-keyed upsert; OVERWRITE and DDL refuse") {
    root
    // new id appends, existing id overwrites (last-write-wins), and the
    // supplied version value is ignored — the commit stamps its own
    spark.sql(
      """INSERT INTO gtest.idx1 VALUES
        |  ('d', array(CAST(0.25 AS FLOAT), CAST(0.75 AS FLOAT)),
        |   named_struct('chunk_index', 7, 'source', 'sql'), 999),
        |  ('a', array(CAST(0.9 AS FLOAT), CAST(0.1 AS FLOAT)),
        |   named_struct('chunk_index', 8, 'source', 'sql'), 999)""".stripMargin)
    val rows = spark.sql(
      "SELECT id, metadata.chunk_index AS ci, version FROM gtest.idx1 ORDER BY id")
      .as[(String, Int, Long)].collect().toSeq
    assert(rows.map(r => (r._1, r._2)) == Seq(("a", 8), ("b", 2), ("c", 3), ("d", 7)))
    assert(rows.forall(_._3 != 999L), s"version must be commit-stamped: $rows")
    // the SQL write went through the real commit: a new snapshot exists
    // and VERSION AS OF still serves the pre-INSERT head
    val preInsert = rows.map(_._3).min
    val atPrev = spark.sql(
      s"SELECT id FROM gtest.idx1 VERSION AS OF ${rows.map(_._3).max - 1} ORDER BY id")
      .as[String].collect().toSeq
    assert(atPrev == Seq("a", "b", "c"))
    assert(preInsert >= 0L)
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => String.valueOf(t.getMessage)).mkString("|")
    // the analyzer refuses before our guard: no TRUNCATE capability
    val over = intercept[Exception] {
      spark.sql("INSERT OVERWRITE gtest.idx1 SELECT * FROM gtest.idx1")
    }
    assert(chain(over).toLowerCase.contains("truncate"))
    val drop = intercept[Exception] { spark.sql("DROP TABLE gtest.idx1") }
    assert(chain(drop).nonEmpty)
    // wrong-width vectors reject through SQL exactly like the API (E2)
    val bad = intercept[Exception] {
      spark.sql(
        """INSERT INTO gtest.idx1 VALUES
          |  ('e', array(CAST(1.0 AS FLOAT)),
          |   named_struct('chunk_index', 1, 'source', 'sql'), 0)""".stripMargin)
    }
    assert(chain(bad).toLowerCase.contains("dimension"))
  }

  test("DELETE FROM ... WHERE id IN is the CAS-committed erasure; predicate and unconditional DELETE refuse") {
    root
    val idx = VectorIndex.ensure(spark, s"$root/idx2", 2)
    idx.upsert(records(("a", Seq(1f, 0f), 0), ("b", Seq(0f, 1f), 1),
      ("c", Seq(1f, 1f), 2), ("d", Seq(0.5f, 0.5f), 3)))
    val vBefore = idx.snapshots().max
    spark.sql("DELETE FROM gtest.idx2 WHERE id IN ('b', 'd')")
    assert(spark.sql("SELECT id FROM gtest.idx2 ORDER BY id")
      .as[String].collect().toSeq == Seq("a", "c"))
    // the SQL delete went through the same snapshot commit protocol as
    // VectorIndex.delete: exactly one new version, linearized after the
    // upsert's, and the pre-delete snapshot still serves via time travel
    val reopened = VectorIndex.open(spark, s"$root/idx2")
    assert(reopened.snapshots().max == vBefore + 1,
      s"delete must commit exactly one version after $vBefore")
    assert(spark.sql(
        s"SELECT id FROM gtest.idx2 VERSION AS OF $vBefore ORDER BY id")
      .as[String].collect().toSeq == Seq("a", "b", "c", "d"))
    // single-id equality form (Spark plans EqualTo + IsNotNull)
    spark.sql("DELETE FROM gtest.idx2 WHERE id = 'c'")
    assert(spark.sql("SELECT id FROM gtest.idx2").as[String].collect()
      .toSeq == Seq("a"))
    // a predicate delete (no literal id set) refuses loudly — resolving
    // which rows die via a scan could drift between scan and commit
    intercept[Exception] {
      spark.sql("DELETE FROM gtest.idx2 WHERE metadata.chunk_index = 0")
    }
    // unconditional DELETE (truncate) refuses
    intercept[Exception] { spark.sql("DELETE FROM gtest.idx2") }
    // both refusals left the data alone
    assert(spark.sql("SELECT id FROM gtest.idx2").as[String].collect()
      .toSeq == Seq("a"))
  }

  test("missing table raises a catalog-level not-found error") {
    root
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gtest.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nope"))
  }

  test("graft_bm25 table function: SQL FROM clause scores bit-identically to the API; literal refusals (r20)") {
    import graft.operators.InvertedIndex
    val base = java.nio.file.Files.createTempDirectory("graft_tvf").toString
    val docs = Seq(
      (1L, "vector join hash common words"),
      (2L, "vector vector join other text"),
      (3L, "hash only here"),
      (4L, "nothing relevant at all"),
      (5L, "join hash vector join")).toDF("doc_id", "text")
    InvertedIndex.writeIndex(docs, "doc_id", "text", s"$base/pidx",
      buckets = 4)
    graft.functions.TableFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT doc, score FROM graft_bm25('$base/pidx', 'vector join', 10)")
      .as[(Long, Double)].collect().toSeq
    val viaApi = InvertedIndex.bm25Search(spark, s"$base/pidx",
      Seq("vector", "join"), k = 10).as[(Long, Double)].collect().toSeq
    assert(viaSql == viaApi,
      "the SQL TVF must be the API plan — same rows, same doubles, same order")
    // composes with other relations (the RAG join shape)
    docs.createOrReplaceTempView("tvf_docs")
    val joined = spark.sql(
      s"""SELECT d.text, r.score FROM graft_bm25('$base/pidx', 'vector join', 3) r
         |JOIN tvf_docs d ON d.doc_id = r.doc ORDER BY r.score DESC""".stripMargin)
    assert(joined.count() == 3)
    // non-literal arguments refuse loudly (they parameterize analysis)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25('$base/pidx', lower(rand()), 3)")
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("must be a literal"))), e.getMessage)
  }

  test("graft_bm25_sharded table function: SQL scatter equals the API scatter AND the merged single index (r20)") {
    import graft.operators.InvertedIndex
    val base = java.nio.file.Files.createTempDirectory("graft_tvf_sh").toString
    val docs = Seq(
      (1L, "vector join hash common words"),
      (2L, "vector vector join other text"),
      (3L, "hash only here"),
      (4L, "nothing relevant at all"),
      (5L, "join hash vector join"),
      (6L, "vector words appear again")).toDF("doc_id", "text")
    InvertedIndex.writeIndex(docs.filter($"doc_id" % 2 === 0), "doc_id",
      "text", s"$base/a", buckets = 4)
    InvertedIndex.writeIndex(docs.filter($"doc_id" % 2 === 1), "doc_id",
      "text", s"$base/b", buckets = 4)
    InvertedIndex.writeIndex(docs, "doc_id", "text", s"$base/m", buckets = 4)
    graft.functions.TableFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT doc, score FROM graft_bm25_sharded('$base/a;$base/b', " +
        "'vector join', 10)")
      .as[(Long, Double)].collect().toSeq
    assert(viaSql == InvertedIndex.bm25SearchSharded(spark,
        Seq(s"$base/a", s"$base/b"), Seq("vector", "join"), k = 10)
      .as[(Long, Double)].collect().toSeq,
      "the SQL TVF must be the API scatter plan — same doubles, same order")
    assert(viaSql == InvertedIndex.bm25Search(spark, s"$base/m",
        Seq("vector", "join"), k = 10).as[(Long, Double)].collect().toSeq,
      "the SQL scatter must equal the merged single index bit-for-bit")
    // an empty path list refuses loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_bm25_sharded(' ; ', 'vector', 3)")
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("no paths"))), e.getMessage)
  }

  test("graft_knn_sharded table function: SQL scatter equals the API queryMany and the union index (r20)") {
    import graft.operators.VectorIndex
    val base = java.nio.file.Files.createTempDirectory("graft_tvf_ks").toString
    def recs(pred: org.apache.spark.sql.Column) = spark.range(0, 40)
      .filter(pred)
      .select(concat(lit("v-"), $"id").as("id"),
        array($"id".cast("float"), ($"id" % 5).cast("float"),
          lit(1f), lit(2f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source"))
          .as("metadata"))
    val a = VectorIndex.ensure(spark, s"$base/a", 4); a.upsert(recs($"id" % 2 === 0))
    val b = VectorIndex.ensure(spark, s"$base/b", 4); b.upsert(recs($"id" % 2 === 1))
    val u = VectorIndex.ensure(spark, s"$base/u", 4); u.upsert(recs(lit(true)))
    graft.functions.TableFunctions.register(spark)
    val qv = Array(17f, 2f, 1f, 2f)
    val viaSql = spark.sql(
      s"SELECT id, score FROM graft_knn_sharded('$base/a;$base/b', " +
        s"'${qv.mkString(",")}', 6)")
      .as[(String, Double)].collect().toSeq
    assert(viaSql == VectorIndex.queryMany(Seq(a, b), qv, 6)
      .select($"id", $"score").as[(String, Double)].collect().toSeq,
      "the SQL TVF must be the API scatter plan — same doubles, same order")
    assert(viaSql == u.query(qv, 6).select($"id", $"score")
      .as[(String, Double)].collect().toSeq,
      "the SQL scatter must equal the union index bit-for-bit")
    // a shard whose dimension doesn't match refuses at analysis
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_knn_sharded('$base/a;$base/b', " +
        "'1.0,2.0', 3)").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("components"))), e.getMessage)
  }

  test("graft_knn table function: SQL FROM clause ranks bit-identically to the API; dim refusal at analysis (r20)") {
    import graft.operators.VectorIndex
    val base = java.nio.file.Files.createTempDirectory("graft_tvf_knn").toString
    val idx = VectorIndex.ensure(spark, s"$base/vidx", 4)
    idx.upsert(spark.range(0, 40)
      .select(concat(lit("v-"), $"id").as("id"),
        array($"id".cast("float"), ($"id" % 5).cast("float"),
          lit(1f), lit(2f)).as("values"),
        struct(lit(0).as("chunk_index"), lit("t").as("source"))
          .as("metadata")))
    graft.functions.TableFunctions.register(spark)
    val qv = Array(17f, 2f, 1f, 2f)
    val viaSql = spark.sql(
      s"SELECT id, score FROM graft_knn('$base/vidx', '${qv.mkString(",")}', 6)")
      .as[(String, Double)].collect().toSeq
    val viaApi = idx.query(qv, 6).select($"id", $"score")
      .as[(String, Double)].collect().toSeq
    assert(viaSql == viaApi,
      "the SQL TVF must be the API plan — same rows, same doubles, same order")
    // composes: join the hits back to a relation
    assert(spark.sql(
      s"""SELECT r.id FROM graft_knn('$base/vidx', '${qv.mkString(",")}', 3) r
         |JOIN (SELECT 'v-17' AS id) x ON x.id = r.id""".stripMargin)
      .count() == 1)
    // wrong-width query vector refuses at ANALYSIS, not as empty rows
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_knn('$base/vidx', '1.0,2.0', 3)")
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("components"))), e.getMessage)
  }

  test("Par.inParallel keeps order, propagates failures, handles singletons (r20)") {
    import graft.operators.Par
    assert(Par.inParallel(Seq(3))(_ * 2) == Seq(6))
    assert(Par.inParallel(1 to 20)(i => i * i) == (1 to 20).map(i => i * i))
    val e = intercept[IllegalStateException] {
      Par.inParallel(Seq(1, 2, 3))(i =>
        if (i == 2) throw new IllegalStateException("boom") else i)
    }
    assert(e.getMessage == "boom")
  }
}
