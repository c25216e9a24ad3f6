package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixture control.
  *
  * A 100 TB corpus is rarely trained on as-is: each source (crawl,
  * books, code, ...) gets a target weight, and the pipeline must
  * sample every source at its own rate — deterministically, so reruns
  * and incremental refreshes pick the SAME rows (a `rand()` sample
  * re-drawn per run would churn the training set and break caching).
  *
  * The decision is a pure per-row predicate on a hash of the row id —
  * no shuffle, no state, trivially parallel at any scale, and
  * rate-composable (a row kept at 0.5 is a superset member of the
  * keep-set at 0.25: nested mixtures come free from the monotone
  * threshold).
  */
object Sampling {

  /** Knuth multiplicative hash of a non-negative id into [0, 2^32).
    * Chosen over xxhash64 because it is reproducible in ANY engine
    * with 64-bit integer arithmetic (the DuckDB oracle included) —
    * sufficient mixing for rate control, not for adversarial inputs;
    * swap in xxhash64 via `keep(hash = ...)` when cross-engine
    * reproducibility is not needed. */
  val Modulus: Long = 1L << 32
  def mixHash(id: Column): Column = pmod(id.cast("long") * lit(2654435761L), lit(Modulus))

  /** Keep predicate: hash(id) < rate * 2^32. `rate` is a per-row
    * column, so mixture weights can come from a joined config table. */
  def keep(id: Column, rate: Column, hash: Column => Column = mixHash): Column =
    hash(id) < (rate.cast("double") * lit(Modulus.toDouble)).cast("long")

  /** Exact-rational keep predicate: hash(id) * den < num * 2^32, all
    * in integer arithmetic — bit-identical across engines (a double
    * rate * 2^32 truncates differently between engines at the
    * boundary; a mixture config is a ratio anyway). */
  def keepFraction(id: Column, num: Column, den: Long): Column = {
    require(den > 0, "den must be positive")
    mixHash(id) * lit(den) < num.cast("long") * lit(Modulus)
  }

  /** Sample each group at its own rate: rows survive where
    * keep(idCol, rateCol). Pure narrow transformation — 0 shuffles. */
  def mixtureSample(df: DataFrame, idCol: String, rateCol: String): DataFrame =
    df.filter(keep(col(idCol), col(rateCol)))

  /** mixtureSample with exact num/den rates (numCol out of den). */
  def mixtureSampleFraction(df: DataFrame, idCol: String, numCol: String,
      den: Long): DataFrame =
    df.filter(keepFraction(col(idCol), col(numCol), den))

  /** Temperature-scaled corpus mixing — the T5/mT5/CC-100 recipe for
    * balancing a multi-source corpus: group g's share of the
    * `targetTotal`-doc mixture is n_g^alpha / Σ n^alpha, so alpha=1
    * reproduces the natural (size-proportional) mix and alpha→0
    * approaches uniform-per-group — small sources get UP-weighted
    * exactly as the low-resource-language literature prescribes.
    * Membership is [[keep]]'s hash predicate, so raising
    * `targetTotal` keeps earlier samples as subsets and the draw
    * replays in any engine.
    *
    * Cross-engine determinism: group sizes collect DRIVER-side
    * (bounded by the number of sources — the usual bounded-keys
    * collect), weights fold in sorted-group order, and every rate is
    * one fixed double shape; with the default alpha=0.5 the weight is
    * sqrt (correctly-rounded IEEE — bit-identical everywhere), which
    * is why 0.5 is the default; other alphas go through pow, whose
    * last-ulp is libm-dependent (document at the call site). */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
      targetTotal: Long, alpha: Double = 0.5): DataFrame = {
    require(targetTotal > 0, "targetTotal must be positive")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    val stats = df.groupBy(col(groupCol).cast("string").as("_g"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    def weight(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val totW = stats.foldLeft(0.0) { case (acc, (_, n)) => acc + weight(n) }
    val rates = stats.map { case (g, n) =>
      (g, math.min(1.0, targetTotal.toDouble * weight(n) / totW / n.toDouble))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("_g", "_rate")
    df.join(broadcast(rateDf), col(groupCol).cast("string") === col("_g"))
      // double comparison, NO cast-to-long: a truncating cast rounds
      // differently between engines at the boundary (keepFraction's
      // rationale); int-vs-double compares identically everywhere
      .filter(mixHash(col(idCol)).cast("double") <
        col("_rate") * lit(Modulus.toDouble))
      .drop("_g", "_rate")
  }

  /** Stratified EXACT-COUNT sample: the `n` rows with the smallest
    * (mixHash(id), id) per stratum — a deterministic per-group
    * reservoir. Where [[mixtureSample]] fixes a RATE (count varies with
    * stratum size), this fixes a COUNT (eval sets, per-language probe
    * suites, per-source human-review batches want exactly n docs each,
    * however skewed the corpus).
    *
    * Plan: `row_number <= n` over (hash, id) — Spark 4's
    * WindowGroupLimit keeps each partition's local top-n per stratum
    * BEFORE the exchange, so the shuffle carries partitions x strata
    * x n rows, never the corpus. Deterministic and engine-reproducible
    * (the Knuth hash replays in any 64-bit SQL engine), so reruns and
    * the DuckDB oracle pick the SAME rows. A stratum with fewer than
    * `n` rows keeps them all. `pos` (1..n, hash order) is exposed so
    * downstream splits ("first 10 for dev, rest for test") stay stable.
    *
    * Strata can be multiple columns; ids must be non-negative and
    * unique per row (the usual doc-id contract; collisions would make
    * the tie-break `id` order arbitrary between engines). */
  def stratifiedTopN(df: DataFrame, strataCols: Seq[String], idCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(mixHash(col(idCol)), col(idCol))
    df.withColumn("pos", row_number().over(w)).filter(col("pos") <= n)
  }

  /** TOKEN-BUDGET mixture sampling — the unit training mixtures are
    * actually specified in. [[mixtureSample]] fixes a rate and
    * [[stratifiedTopN]] a document count, but a data recipe says
    * "30 B tokens of web, 5 B of code": per group, take documents in
    * the deterministic hash order until the group's TOKEN budget is
    * reached — the first document that crosses the line is kept (the
    * greedy-fill convention: every budget is met, overshoot is at most
    * one document), everything after it drops. Deterministic and
    * engine-replayable end to end (Knuth hash order + one integer
    * cumulative sum), so reruns, incremental refreshes and the DuckDB
    * oracle pick the SAME documents; a raised budget KEEPS the
    * previous sample as a prefix (the monotonicity that makes mixture
    * re-weighting cache-friendly).
    *
    * `budgets`: group value (as string) -> token budget; groups absent
    * from the map are dropped entirely (an explicit recipe, not a
    * passthrough). Plan: one window cumsum per group over the hash
    * order — parallel across groups; within a heavy group the ordered
    * window funnels, which is fine for recipe-sized group counts (a
    * per-group range-partitioned prefix sum is the documented scale
    * path if a single group's candidate set outgrows a task). */
  def tokenBudgetSample(df: DataFrame, groupCol: String, idCol: String,
      tokCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "empty mixture recipe")
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(mixHash(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budgetCol = element_at(typedLit(budgets), col(groupCol).cast("string"))
    df.filter(col(groupCol).cast("string").isin(budgets.keys.toSeq: _*))
      .withColumn("_cum", sum(col(tokCol).cast("long")).over(w))
      // keep while the PRIOR total is under budget: the crossing doc
      // is included, so the budget is always met when the group has
      // enough tokens
      .filter(col("_cum") - col(tokCol).cast("long") < budgetCol)
      .drop("_cum")
  }
  /** QUALITY-QUANTILE pruning — "keep each domain's top q fraction by
    * score", the FineWeb-style per-source quality gate. A GLOBAL score
    * cutoff would let one high-scoring domain crowd out every other;
    * ranking WITHIN the group keeps the mixture's domain balance while
    * dropping each domain's worst tail. Rows survive where
    * percent_rank() (ascending by (score, id) — the id tiebreak pins
    * replay order in any engine) >= 1 - q, i.e. the top-q tail
    * inclusive of the boundary rank. One hash shuffle on the group
    * column; the window never crosses groups, so skew is bounded by
    * the largest single domain — salt upstream if one domain dominates
    * the corpus. */
  def topQuantilePerGroup(df: DataFrame, groupCol: String, scoreCol: Column,
      idCol: String, q: Double): DataFrame = {
    require(q > 0 && q <= 1, "q must be in (0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(scoreCol.asc, col(idCol).asc)
    df.withColumn("_pr", percent_rank().over(w))
      .filter(col("_pr") >= lit(1.0 - q))
      .drop("_pr")
  }
  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws u_i = (mixHash(id)+0.5)/2^32 — a
    * seeded hash-uniform in (0,1) — and the n rows with the largest
    * u_i^(1/w_i) win, which selects with inclusion probability
    * proportional to weight. Computed in log space (ln(u)/w, a
    * monotone transform — pow is less portable than ln) so the sort
    * key is one ln + one division per row; the global top-n is a
    * TakeOrderedAndProject, never a full sort. Replayable by any
    * engine from (id, weight) alone: same hash, same key, same
    * (key, id) tiebreak. Zero/negative weights never win (key −∞
    * effectively; they are filtered). The mixture-building use: spend
    * a document budget ∝ quality weight without coordinating state —
    * re-running on the same corpus reselects the identical sample. */
  def weightedTopN(df: DataFrame, idCol: String, weightCol: Column,
      n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.filter(weightCol > lit(0.0))
      .withColumn("_u",
        (mixHash(col(idCol)).cast("double") + lit(0.5)) / lit(Modulus.toDouble))
      .withColumn("_wkey", log(col("_u")) / weightCol.cast("double"))
      .orderBy(col("_wkey").desc, col(idCol))
      .limit(n)
      .drop("_u", "_wkey")
  }
}
