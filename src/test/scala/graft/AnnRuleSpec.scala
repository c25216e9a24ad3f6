package graft

import graft.operators.Ann
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ANN auto-prune optimizer rule: a declarative
  * `ORDER BY cosine DESC LIMIT k` over an LSH-indexed table gets a
  * bucket filter injected at plan time — opt-in, and equal to calling
  * Ann.queryIndex by hand. */
class AnnRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topkPlan(indexed: org.apache.spark.sql.DataFrame, q: Array[Float]) =
    indexed
      .orderBy(graft.functions.vectors.cosine($"embedding",
        lit(q.map(_.toDouble))).desc)
      .limit(10)

  test("opt-in rewrite injects arrays_overlap bucket pruning; off by default") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val indexed = Ann.buildIndex(emb, "embedding")

    spark.conf.set("spark.graft.ann.autoPrune", "false")
    val off = topkPlan(indexed, q)
    assert(!off.queryExecution.optimizedPlan.toString.contains("arrays_overlap"),
      "rule must not fire without opt-in")

    spark.conf.set("spark.graft.ann.autoPrune", "true")
    try {
      val on = topkPlan(indexed, q)
      assert(on.queryExecution.optimizedPlan.toString.contains("arrays_overlap"),
        s"rule did not fire:\n${on.queryExecution.optimizedPlan}")
      // the declarative form now equals the manual queryIndex call
      val declarative = on.select($"vec_id").as[Long].collect().toSeq
      val manual = Ann.queryIndex(indexed, "embedding", "vec_id", q, 10)
        .select($"vec_id").as[Long].collect().toSeq
      assert(declarative == manual)
    } finally spark.conf.set("spark.graft.ann.autoPrune", "false")
  }

  test("rule hashes the query with the index's OWN build params (column metadata)") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 3).select($"embedding").as[Array[Float]].head()
    // non-default params: a rule that assumed the defaults would probe
    // wrong buckets and diverge from the manual queryIndex call
    val indexed = Ann.buildIndex(emb, "embedding", planesPerBand = 6, bands = 8, seed = 7L)
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    try {
      val on = topkPlan(indexed, q)
      assert(on.queryExecution.optimizedPlan.toString.contains("arrays_overlap"))
      val declarative = on.select($"vec_id").as[Long].collect().toSeq
      val manual = Ann.queryIndex(indexed, "embedding", "vec_id", q, 10,
        planesPerBand = 6, bands = 8, seed = 7L)
        .select($"vec_id").as[Long].collect().toSeq
      assert(declarative == manual)
    } finally spark.conf.set("spark.graft.ann.autoPrune", "false")
  }

  test("rule fires under a projection (column pruning strips _buckets below the sort)") {
    // the shape every real query takes: select(id) over the top-k. Column
    // pruning removes _buckets from every node between the limit and the
    // indexed relation, so a rule that only inspects sort.child.output
    // silently degrades to the exact unpruned top-k (round-3 bug).
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val indexed = Ann.buildIndex(emb, "embedding")
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    try {
      val projected = topkPlan(indexed, q).select($"vec_id")
      assert(projected.queryExecution.optimizedPlan.toString.contains("arrays_overlap"),
        s"rule did not fire on the projected plan:\n${projected.queryExecution.optimizedPlan}")
      val declarative = projected.as[Long].collect().toSeq
      val manual = Ann.queryIndex(indexed, "embedding", "vec_id", q, 10)
        .select($"vec_id").as[Long].collect().toSeq
      assert(declarative == manual)
    } finally spark.conf.set("spark.graft.ann.autoPrune", "false")
  }

  test("persisted index: params survive the parquet round trip; rule prunes on stored buckets") {
    // the materialized path: _buckets is a STORED column after a write,
    // so even under a projection the relation still outputs it and the
    // rule filters stored values instead of recomputing signatures
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx_rt").toString
    Ann.buildIndex(emb, "embedding", planesPerBand = 6, bands = 8, seed = 7L)
      .write.parquet(s"$tmp/indexed")
    val stored = spark.read.parquet(s"$tmp/indexed")
    assert(stored.schema("_buckets").metadata.contains(Ann.ParamBands),
      "build params must survive the parquet schema round trip")
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    try {
      val projected = topkPlan(stored, q).select($"vec_id")
      val plan = projected.queryExecution.optimizedPlan.toString
      assert(plan.contains("arrays_overlap"), s"rule did not fire:\n$plan")
      assert(!plan.contains("lsh_buckets"),
        "stored index must prune on stored buckets, not recompute signatures")
      val declarative = projected.as[Long].collect().toSeq
      val manual = Ann.queryIndex(stored, "embedding", "vec_id", q, 10,
        planesPerBand = 6, bands = 8, seed = 7L)
        .select($"vec_id").as[Long].collect().toSeq
      assert(declarative == manual)
    } finally spark.conf.set("spark.graft.ann.autoPrune", "false")
  }

  test("IVF: declarative cosine top-k over a cell-tagged table probes only nearest cells") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val idx = graft.operators.Ann.buildIvf(emb, "embedding", k = 16, maxIter = 5)
    // materialized cells (what a real IVF index always is — ivfFor/q57
    // checkpoint or persist them); metadata rides the LogicalRDD schema
    val data = idx.data.localCheckpoint(true)
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    spark.conf.set("spark.graft.ann.ivf.nProbe", "12")
    try {
      val on = topkPlan(data, q).select($"vec_id")
      val plan = on.queryExecution.optimizedPlan.toString
      assert(plan.contains("_cell") && plan.contains(" IN "),
        s"cell-prune filter did not fire:\n$plan")
      val declarative = on.as[Long].collect().toSeq
      val manual = Ann.queryIvf(idx.copy(data = data), "embedding", "vec_id", q, 10, nProbe = 12)
        .select($"vec_id").as[Long].collect().toSeq
      assert(declarative == manual)
    } finally {
      spark.conf.set("spark.graft.ann.autoPrune", "false")
      spark.conf.unset("spark.graft.ann.ivf.nProbe")
    }
  }

  test("idempotence holds after OptimizeIn rewrites the cell filter to InSet") {
    // when the rule is wired via spark.sql.extensions it shares the
    // operator-optimization fixed point with OptimizeIn, which rewrites
    // In(>10 literals) to InSet — an idempotence check that only
    // recognizes In re-injects the cell filter every iteration until the
    // batch's max-iterations cap. Simulate that interleaving directly:
    // fire the rule, convert its filter with OptimizeIn, and assert a
    // second application is a no-op.
    import org.apache.spark.sql.catalyst.expressions.{Attribute, In, InSet}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val idx = graft.operators.Ann.buildIvf(emb, "embedding", k = 16, maxIter = 5)
    val data = idx.data.localCheckpoint(true)
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    spark.conf.set("spark.graft.ann.ivf.nProbe", "12") // > InSet threshold (10)
    try {
      val pruned = topkPlan(data, q).select($"vec_id").queryExecution.optimizedPlan
      def cellFilters(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        p.collect {
          case f: Filter if f.condition.exists {
            case In(a: Attribute, _) => a.name == "_cell"
            case InSet(a: Attribute, _) => a.name == "_cell"
            case _ => false
          } => f
        }
      assert(cellFilters(pruned).size == 1, s"rule did not fire once:\n$pruned")
      val asInSet = org.apache.spark.sql.catalyst.optimizer.OptimizeIn(pruned)
      assert(asInSet.exists {
        case Filter(cond, _) => cond.exists(_.isInstanceOf[InSet])
        case _ => false
      }, s"OptimizeIn should have produced an InSet at nProbe=12:\n$asInSet")
      val again = graft.plans.AnnTopKPruneRule(asInSet)
      assert(cellFilters(again).size == 1,
        s"rule re-injected over the InSet form:\n$again")
    } finally {
      spark.conf.set("spark.graft.ann.autoPrune", "false")
      spark.conf.unset("spark.graft.ann.ivf.nProbe")
    }
  }

  test("IVF under a projection that strips _cell: rule stays silent, top-k falls back to EXACT") {
    // Unlike the LSH path (which recomputes buckets from the tagged
    // vector column when pruning eliminated _buckets), the IVF path has
    // no recompute fallback by design: cell assignment costs k*dim work
    // per row scan-side, and a real IVF index always materializes its
    // cells. This pins the documented failure mode to the SAFE side —
    // an unmaterialized, projected IVF top-k must run as the exact
    // unpruned scan (correct, just not accelerated), never probe wrong
    // or stale cells.
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val idx = graft.operators.Ann.buildIvf(emb, "embedding", k = 16, maxIter = 5)
    // NOT checkpointed/persisted: _cell is a lazy projection, so column
    // pruning under select(vec_id) eliminates it from the whole subtree
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    try {
      val projected = topkPlan(idx.data, q).select($"vec_id")
      val plan = projected.queryExecution.optimizedPlan.toString
      assert(!plan.contains("_cell"),
        s"_cell should have been pruned out of the projected plan:\n$plan")
      assert(!plan.contains("arrays_overlap"),
        s"no LSH filter may appear on an IVF-only table:\n$plan")
      // exact semantics: equals brute-force over the raw table
      val declarative = projected.as[Long].collect().toSeq
      val exact = Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
        .select($"vec_id").as[Long].collect().toSeq
      assert(declarative == exact, "projected IVF top-k must be the exact top-k")
    } finally spark.conf.set("spark.graft.ann.autoPrune", "false")
  }

  test("a _buckets column without build-params metadata is NOT treated as an index") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    // same name, same type, but no recorded params: filtering on guessed
    // buckets would silently destroy recall, so the rule must skip it
    val impostor = emb.withColumn("_buckets", array(lit(1), lit(2)))
    spark.conf.set("spark.graft.ann.autoPrune", "true")
    try {
      val on = topkPlan(impostor, q)
      assert(!on.queryExecution.optimizedPlan.toString.contains("arrays_overlap"),
        "rewrite must not fire on a params-less _buckets column")
    } finally spark.conf.set("spark.graft.ann.autoPrune", "false")
  }
}
