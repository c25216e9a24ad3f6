package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 gets a `queries` entry; entries that are
  * expressible in ANSI SQL also get an `oracleSql` entry (driver runs it in
  * DuckDB over the same parquet and hash-compares). Column names are aliased
  * identically on both sides; double-typed aggregates are computed exactly in
  * DECIMAL then cast to DOUBLE so both engines produce bit-identical values.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole lifecycle end-to-end (SURVEY.md §3.4): ingest
    * documents -> chunk -> embed -> vector index -> top-k cosine query. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.core.HashingEmbedder
    import graft.operators.{Ingest, VectorIndex}
    val dir = java.nio.file.Files.createTempDirectory("graft_entry").toString
    val docs = t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val embedder = new HashingEmbedder(dimension = 64, seed = 42L)
    val records = Ingest.pipeline(docs, embedder,
      Ingest.Config(expectedDim = Some(64)))
    val idx = VectorIndex.ensure(spark, s"$dir/flagship", 64)
    idx.upsert(records)
    val q = embedder.embedOne("spark window join stream batch")
    idx.query(q, k = 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.G hash aggregation partial+final — TPC-H Q1 shape on lineitem.
    "q01_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          ).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", $"sum_qty" / $"count_order")
        .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"sum_base_price",
          $"sum_disc_price", $"avg_qty", $"count_order")
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
