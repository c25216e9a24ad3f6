package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style SPAN CORRUPTION — the denoising training objective's
  * (inputs, targets) construction: mask ~1/rate of token positions in
  * short spans, replace each masked span with one `<extra_id_k>`
  * sentinel in the inputs, and emit `<extra_id_k> tokens…` in the
  * targets. The third training-export objective next to the LM pack
  * (q163) and the contrastive pairs (q209).
  *
  * Span selection is ARITHMETIC, not random-state: position p starts
  * a span iff mix(doc, p) hits the rate AND mix(doc, p−1) does not
  * (the previous-position gate prevents adjacent starts, so 2-token
  * spans never overlap and the whole construction stays a pure
  * per-position predicate — no sequential scan, no state, replayable
  * by any engine with integer `%`). Sentinel numbering is the
  * prefix-count of starts. Everything is a single column-expression
  * projection: no shuffle, WholeStageCodegen, 10^10 docs welcome. */
object Denoising {

  /** (id, n_toks, n_spans, inputs, targets) per doc. `rateDen`: a
    * position starts a span with probability ~1/rateDen. Spans cover
    * positions p and p+1 (the final position yields a 1-token span).
    * Docs with no tokens produce empty inputs/targets. */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
      rateDen: Int = 20, seed: Long = 13L): DataFrame = {
    require(rateDen >= 2, "rateDen must be >= 2")
    val id = col(idCol).cast("long")
    def mixOk(p: Column): Column =
      ((((id * lit(1000003L) + p.cast("long") * lit(999983L) + lit(seed)) %
        lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)) %
        lit(rateDen.toLong) === lit(0L)
    def start(p: Column): Column = mixOk(p) && !mixOk(p - 1)
    def kOf(p: Column): Column =
      when(p === 1, lit(0L)).otherwise(
        aggregate(sequence(lit(1), p - 1), lit(0L),
          (acc, q) => acc + when(start(q), lit(1L)).otherwise(lit(0L))))
    def sentinel(p: Column): Column =
      concat(lit("<extra_id_"), kOf(p).cast("string"), lit(">"))
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    df.select(id.as("doc_id"), toks.as("_tk"))
      .withColumn("_n", size(col("_tk")))
      .withColumn("n_spans",
        when(col("_n") === 0, lit(0L)).otherwise(
          aggregate(sequence(lit(1), col("_n")), lit(0L),
            (acc, p) => acc + when(start(p), lit(1L)).otherwise(lit(0L)))))
      .withColumn("inputs",
        when(col("_n") === 0, lit("")).otherwise(
          concat_ws(" ", filter(
            transform(sequence(lit(1), col("_n")), p =>
              when(start(p), sentinel(p))
                .when(p >= 2 && start(p - 1), lit(null).cast("string"))
                .otherwise(element_at(col("_tk"), p))),
            x => x.isNotNull))))
      .withColumn("targets",
        when(col("_n") === 0, lit("")).otherwise(
          concat_ws(" ", filter(
            transform(sequence(lit(1), col("_n")), p =>
              when(start(p),
                concat(sentinel(p), lit(" "), element_at(col("_tk"), p),
                  when(p + 1 <= col("_n"),
                    concat(lit(" "), element_at(col("_tk"), p + 1)))
                    .otherwise(lit(""))))),
            x => x.isNotNull))))
      .select(col("doc_id"), col("_n").cast("long").as("n_toks"),
        col("n_spans"), col("inputs"), col("targets"))
  }

  /** FILL-IN-THE-MIDDLE (the code-model training transform, PSM
    * order): two arithmetic cut points split each document's token
    * stream into prefix | middle | suffix, emitted as
    * `<PRE> prefix <SUF> suffix <MID> middle` — the model learns to
    * infill. Cuts are the same portable integer mix (draws at virtual
    * positions 1 and 2), sorted so lo ≤ hi; an empty middle (lo = hi)
    * is a legitimate degenerate sample. Docs with fewer than 2 tokens
    * pass through as pure prefix. Pure projection, no shuffle. */
  def fimPsm(df: DataFrame, idCol: String, textCol: String,
      seed: Long = 17L): DataFrame = {
    val id = col(idCol).cast("long")
    def mix(p: Int): Column =
      (((id * lit(1000003L) + lit(p.toLong * 999983L) + lit(seed)) %
        lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val base = df.select(id.as("doc_id"), toks.as("_tk"))
      .withColumn("_n", size(col("_tk")))
      .withColumn("_d1", mix(1) % greatest(col("_n") - 1, lit(1)) + 1)
      .withColumn("_d2", mix(2) % greatest(col("_n") - 1, lit(1)) + 1)
      .withColumn("cut_lo", least(col("_d1"), col("_d2")).cast("long"))
      .withColumn("cut_hi", greatest(col("_d1"), col("_d2")).cast("long"))
    base.select(col("doc_id"), col("_n").cast("long").as("n_toks"),
      when(col("_n") < 2, lit(0L)).otherwise(col("cut_lo")).as("cut_lo"),
      when(col("_n") < 2, lit(0L)).otherwise(col("cut_hi")).as("cut_hi"),
      when(col("_n") < 2,
        concat(lit("<PRE> "), concat_ws(" ", col("_tk")),
          lit(" <SUF>  <MID> ")))
        .otherwise(concat(
          lit("<PRE> "),
          concat_ws(" ", slice(col("_tk"), lit(1), col("cut_lo").cast("int"))),
          lit(" <SUF> "),
          concat_ws(" ", slice(col("_tk"),
            (col("cut_hi") + 1).cast("int"),
            (col("_n") - col("cut_hi")).cast("int"))),
          lit(" <MID> "),
          concat_ws(" ", slice(col("_tk"),
            (col("cut_lo") + 1).cast("int"),
            (col("cut_hi") - col("cut_lo")).cast("int")))))
        .as("psm"))
  }

  /** Deterministic PER-EPOCH shuffle order — the trainer-side data
    * ordering: epoch e reads the corpus in a pseudo-random permutation
    * that is a pure function of (id, e), so every worker, every
    * restart and every engine derives the same order, and no epoch
    * repeats its predecessor's. Position = 0-based contiguous rank by
    * (mix(id, e), id) via [[Ids.contiguous]] — a range-partitioned
    * sort, never a one-task window; the id tiebreak makes the
    * permutation total even under hash collisions. */
  def epochOrder(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    require(epoch >= 0, "epoch must be nonnegative")
    val h = (((col(idCol).cast("long") * lit(1000003L) +
      lit(epoch.toLong * 999983L)) % lit(2147483648L)) * lit(2654435761L)) %
      lit(4294967296L)
    Ids.contiguous(df.withColumn("_eh", h),
      Seq(col("_eh"), col(idCol)), "pos").drop("_eh")
  }
}
