package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the 100 TB questions ("is the
  * filter pushed down? is the small side broadcast? is top-k a
  * TakeOrderedAndProject, not a global sort?") checked mechanically so
  * a regression in plan shape fails CI, not just the benchmark. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02 filter+projection reach the parquet scan (pushdown + pruning)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(!p.contains("PushedFilters: []"))
    // pruned read schema: only the selected + filtered columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"), "scan must not read unprojected columns")
  }

  test("q03 small dim side is broadcast") {
    assert(plan("q03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q01 aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q01_pricing_summary")
    // (WholeStageCodegen spans only appear in post-execution AQE plans,
    // so the codegen property is implied by HashAggregate, not asserted.)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final HashAggregate expected")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q11_topk_orders").contains("TakeOrderedAndProject"))
    assert(plan("q28_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("dedup pipelines never plan a cartesian/nested-loop join") {
    for (q <- Seq("q31_minhash_dedup", "q33_ngram_dedup", "q34_embedding_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
    }
  }

  test("as-of join is one window over a union — no range join") {
    val p = plan("q50_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("bucket-partitioned ANN layout: a query prunes to its bucket partitions") {
    // the shape that wins at 100 TB (q77): index exploded to one row per
    // (bucket, row), written partitionBy(_bucket); probing a query's band
    // buckets must plan as PARTITION pruning (scan reads `bands`
    // partitions), not a data filter over the whole index
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ann = graft.operators.Ann
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    ann.explodeForLayout(ann.buildIndex(emb, "embedding"))
      .write.partitionBy("_bucket").parquet(s"$tmp/idx")
    val qb = ann.bucketSet(q.map(_.toDouble), 4, 16, 42L)
    val probe = spark.read.parquet(s"$tmp/idx")
      .filter($"_bucket".isin(qb.toIndexedSeq: _*))
    val p = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters") && p.contains("_bucket"),
      s"bucket probe must hit partition pruning:\n$p")
    // and the pruned scan actually touches only the probed partitions
    val parts = probe.select(input_file_name()).distinct().as[String].collect()
    val bucketDirs = parts.flatMap(_.split("/").find(_.startsWith("_bucket="))).distinct
    assert(bucketDirs.length <= qb.length,
      s"read ${bucketDirs.length} bucket dirs for ${qb.length} probed buckets")
  }

  test("parquet aggregate pushdown: min/max/count answer from footer statistics") {
    // a 100 TB "SELECT min(x), max(x), count(*)" should read row-group
    // STATS, not data pages — Spark's parquet aggregate pushdown does
    // exactly that when enabled and the query is stats-answerable
    // (integer column: float/double min/max are excluded by design, NaN
    // ordering makes footer stats unreliable for them)
    val keys = Seq(
      // the pushdown lives in the DSv2 scan; parquet defaults to V1
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val olds = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1)))
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]"),
        p.take(2000))
      val row = df.head()
      // and the pushed plan answers exactly what the V1 scan computes
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      val plain = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1))).head()
      assert(row == plain)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("per-group top-n plans a WindowGroupLimit below the shuffle") {
    // rank-filter pushdown: each task keeps only its top-n rows per
    // group BEFORE the window exchange — without it, a 100 TB top-5-
    // per-group buffers every group's full row set through the shuffle
    val p = plan("q07_window_topn")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$p")
  }

  test("selective shuffle join injects a runtime bloom filter on the big side") {
    // the 100 TB semi-join-reduction shape: a selective filter on one
    // side of a shuffle join should re-appear as a bloom-filter probe
    // on the OTHER side's scan, so most fact rows die before the
    // exchange. Thresholds are sized for production data; lower them to
    // fixture scale to assert the rewrite itself fires.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      import spark.implicits._
      val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      val ord = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
        .filter($"o_orderpriority" === "1-URGENT")
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("bloom_filter_agg") || p.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$p")
      assert(joined.count() == 1)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("exactSubstr shuffle hygiene: count pass ships hashes only; corpus text joins behind the span Bloom") {
    val p = plan("q126_exact_substr_dedup")
    // formatted mode prints each operator's Input columns: every Exchange
    // partitioned on the window hash must carry (_h, count) — never the
    // gram string or the document text
    val blocks = p.split("\\n\\n")
    val hashExchanges = p.linesIterator.zipWithIndex.toSeq
      .filter { case (l, _) => l.contains("Arguments: hashpartitioning(_h") }
    assert(hashExchanges.nonEmpty, s"expected a count-pass exchange on _h in:\n$p")
    // per-operator detail lines: "Input [n]: [cols...]" directly precede
    // the Arguments line of the same node in formatted explain
    val lines = p.linesIterator.toIndexedSeq
    hashExchanges.foreach { case (_, i) =>
      val input = lines.take(i).reverse.find(_.startsWith("Input")).getOrElse("")
      assert(!input.contains("_g") && !input.contains("_text"),
        s"count-pass exchange must ship hashes only, got: $input")
    }
    // the cut join sits behind the span Bloom prefilter (UDF filter on
    // the corpus side), so untouched docs never shuffle their text
    assert(p.contains("UDF") || p.contains("mightHaveSpan"),
      "expected the span-Bloom prefilter on the corpus scan")
    assert(blocks.nonEmpty)
  }
}
