package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-pair construction — the export shape bi-encoder
  * (DPR/Contriever-class) training jobs consume: (anchor, positive,
  * K negatives) per document.
  *
  * Positives come from INDEPENDENT CROPPING (Contriever's
  * construction): a document's token stream splits into two halves —
  * two views of the same document are a positive pair, no labels
  * needed. Negatives are sampled DETERMINISTICALLY: each anchor's K
  * negative ranks come from the same two-step integer mix the random
  * projection uses (engine-replayable, seed-keyed, rerun-stable), with
  * a +1 fallback when a draw hits the anchor itself. Sampling happens
  * in RANK space — documents get a 0-based contiguous rank
  * ([[Ids.contiguous]], no one-task window) so draws are uniform over
  * the corpus regardless of how sparse the real ids are — and one join
  * back on rank resolves the drawn negative's id (and, in a full
  * export, its text). One shuffle for the rank, one for the join;
  * nothing driver-side but the corpus count. */
object Contrastive {

  /** (id, anchor, positive, n_anchor_toks, n_pos_toks) via independent
    * cropping on the engine's standard tokenization; docs with fewer
    * than 2 tokens cannot form two views and are dropped. The first
    * ⌈n/2⌉ tokens are the anchor view, the rest the positive view. */
  def croppedPairs(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    df.select(col(idCol).as("id"), toks.as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .withColumn("_half", ((size(col("_toks")) + 1) / 2).cast("int"))
      .select(col("id"),
        concat_ws(" ", slice(col("_toks"), lit(1), col("_half"))).as("anchor"),
        concat_ws(" ", slice(col("_toks"), col("_half") + 1,
          size(col("_toks")) - col("_half"))).as("positive"),
        col("_half").cast("long").as("n_anchor_toks"),
        (size(col("_toks")) - col("_half")).cast("long").as("n_pos_toks"))
  }

  /** K deterministic negatives per row of `pairs` (which must carry a
    * unique `id`): output one row per (id, j) with the drawn negative
    * id joined back from rank space. `ordered by id` defines rank, so
    * the draw set is a pure function of (corpus id set, k, seed). */
  def negativeSample(pairs: DataFrame, k: Int, seed: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(seed >= 0, "seed must be nonnegative")
    val ranked = Ids.contiguous(pairs.select(col("id")), Seq(col("id")),
      "rank").localCheckpoint(true)
    val n = ranked.count()
    require(n >= 2, s"need at least 2 docs to sample negatives, got $n")
    val cand0 = (((col("rank") * lit(1000003L) + col("j") * lit(999983L) +
      lit(seed)) % lit(2147483648L)) * lit(2654435761L)) %
      lit(4294967296L) % lit(n)
    val drawn = ranked
      .select(col("id"), col("rank"),
        explode(sequence(lit(0L), lit(k - 1L))).as("j"))
      .withColumn("_cand",
        when(cand0 === col("rank"), (cand0 + lit(1L)) % lit(n))
          .otherwise(cand0))
    drawn
      .join(ranked.select(col("rank").as("_cand"), col("id").as("neg_id")),
        Seq("_cand"))
      .select(col("id"), col("j"), col("neg_id"))
  }
}
