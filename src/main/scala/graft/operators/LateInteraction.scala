package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ColBERT-class LATE-INTERACTION scoring — the third rung of the
  * retrieval-quality ladder the engine already serves (BM25 bags of
  * words → cross-encoder seam q198 → this): every token keeps its own
  * vector and relevance is MaxSim,
  *
  *   score(q, d) = Σ_{i∈q} max_{j∈d} ⟨v(q_i), v(d_j)⟩,
  *
  * which preserves term-level matching that single-vector cosine
  * averages away. The at-scale shape is the two-stage architecture the
  * real systems use: a cheap recall stage bounds the candidate set
  * (BM25 here — the caller passes it in), and the O(|q|·|d|) MaxSim
  * interaction runs ONLY over candidates — never the corpus. The
  * per-pair work is a doc-token × query-token equijoin-free local
  * product; doc tokens dedupe first (duplicate tokens share a vector,
  * so they cannot change a max).
  *
  * Token vectors here are the deterministic DOUBLE — an arithmetic
  * function of the token's corpus-vocabulary RANK (dense 0-based,
  * [[Ids.contiguous]] over the sorted distinct tokens — no one-task
  * window) and the component index, via the engine's portable
  * two-step integer mix. A real ColBERT checkpoint replaces
  * [[tokenComponent]] with an embedding lookup; every join, max,
  * and ordered fold — the parts that carry the architecture — stay
  * exactly as graded here. */
object LateInteraction {

  /** Component k of the deterministic token vector for vocab rank
    * `r`: an exact double in [-1, 1] with ~3 decimal digits, from
    * pure integer arithmetic any engine replays. */
  private[graft] def tokenComponent(r: Column, k: Column,
      seed: Long): Column = {
    val y = ((((r.cast("long") * lit(1000003L) + k.cast("long") * lit(999983L) +
      lit(seed)) % lit(2147483648L)) * lit(2654435761L)) %
      lit(4294967296L)) % lit(2001L)
    (y - lit(1000L)).cast("double") / lit(1000.0)
  }

  /** 0-based dense vocabulary ranks over the corpus' distinct tokens
    * in lexicographic order. */
  def vocabRanks(docs: DataFrame, textCol: String): DataFrame =
    Ids.contiguous(
      docs.select(explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => t =!= "")).as("token")).distinct(),
      Seq(col("token")), "rank")

  /** MaxSim rerank of `candidates` (a frame with a `doc` id column)
    * against `queryTerms`: top `k` (doc, score), score folded over
    * query terms in list order (bit-replayable). `dim` vector
    * components per token; query terms missing from the vocabulary
    * contribute nothing (both engines drop them in the same join). */
  def maxSimRerank(docs: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, queryTerms: Seq[String], dim: Int,
      seed: Long, k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    require(dim >= 1, "dim must be >= 1")
    val spark = docs.sparkSession
    val vocab = vocabRanks(docs, textCol).localCheckpoint(true)
    val dtoks = docs
      .join(candidates.select(col("doc")), col(idCol) === col("doc"))
      .select(col("doc"),
        explode(array_distinct(filter(split(lower(col(textCol)),
          "[^a-z0-9]+"), t => t =!= ""))).as("token"))
      .join(vocab, "token")
      .select(col("doc"), col("rank").as("_rd"))
    import spark.implicits._
    val qv = queryTerms.map(_.toLowerCase).distinct.toDF("token")
      .join(vocab, "token")
      .select(col("token").as("_term"), col("rank").as("_rq"))
    val dot = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
      (acc, kk) => acc +
        tokenComponent(col("_rq"), kk, seed) *
        tokenComponent(col("_rd"), kk, seed))
    val per = dtoks.crossJoin(broadcast(qv))
      .withColumn("_dot", dot)
      .groupBy(col("doc"), col("_term"))
      .agg(max(col("_dot")).as("_s"))
    TextAnalytics.foldTermScores(per, "doc", queryTerms.map(_.toLowerCase))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))
  }

  /** [[maxSimRerank]] with token vectors produced by a REAL model
    * behind the [[graft.core.Embedder]] seam (r18) — per-token embed:
    * a token is a one-term text, so the checkpoint-shaped batch API
    * serves token vectors directly, and the class doc's "a real
    * ColBERT checkpoint replaces the vector function" claim is now an
    * exercised code path, not prose. Doc-side vectors are computed
    * ONCE per distinct candidate token in mapPartitions BATCHES (the
    * [[graft.core.Embedder]] @transient-lazy-session pattern: a
    * non-serializable ONNX session rebuilds per executor, never
    * ships); query-term vectors are |q| driver-side embeds broadcast
    * like the rank frame. Every join, max, and ordered fold is the
    * same plan shape [[maxSimRerank]] grades — the q211 gate keeps
    * running the deterministic default, untouched. One semantic
    * difference is inherent: a model embeds ANY token, so there is no
    * out-of-vocabulary drop — a query term absent from the corpus
    * still scores against candidate tokens, which is the model-backed
    * behavior a checkpoint gives. */
  def maxSimRerankModel(docs: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, queryTerms: Seq[String],
      model: graft.core.Embedder, k: Int, batchSize: Int = 128): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    require(batchSize >= 1, "batchSize must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val dtokens = docs
      .join(candidates.select(col("doc")), col(idCol) === col("doc"))
      .select(col("doc"),
        explode(array_distinct(filter(split(lower(col(textCol)),
          "[^a-z0-9]+"), t => t =!= ""))).as("token"))
    val vecs = dtokens.select(col("token")).distinct().as[String]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(b => b.iterator.zip(model.embed(b).iterator))
      }.toDF("token", "_vd")
    val dvecs = dtokens.join(vecs, "token").select(col("doc"), col("_vd"))
    val qterms = queryTerms.map(_.toLowerCase).distinct
    val qv = qterms.zip(model.embed(qterms)).toDF("_term", "_vq")
    val dot = aggregate(
      zip_with(col("_vq"), col("_vd"),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val per = dvecs.crossJoin(broadcast(qv))
      .withColumn("_dot", dot)
      .groupBy(col("doc"), col("_term"))
      .agg(max(col("_dot")).as("_s"))
    TextAnalytics.foldTermScores(per, "doc", queryTerms.map(_.toLowerCase))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("score"))
  }
}
