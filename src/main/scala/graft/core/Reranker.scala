package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-encoder RERANKING boundary — the second stage of the
  * retrieve-then-rerank stack (BM25/ANN recall a candidate set, a
  * pairwise (query, document) model re-scores it; the
  * sentence-transformers CrossEncoder pattern over the same model
  * family the reference embeds with, `streamlit_app.py:89-94`).
  *
  * Like [[Embedder]], the trait is the plug point for a real ONNX
  * cross-encoder (batched pair scoring, per-executor lazy session);
  * the default [[TokenOverlapReranker]] is a deterministic pure
  * scorer — distinct-token F1 — whose arithmetic any engine replays,
  * which is what lets the q198 gate hash-match an independent SQL
  * replay of the ENTIRE retrieve-then-rerank pipeline.
  *
  * Scale shape: reranking is a pure per-row map over the CANDIDATE
  * set (k rows per query, never the corpus); `Rerank.rerank` runs the
  * scorer through `mapPartitions` in fixed-size batches — the exact
  * call shape a GPU/ONNX cross-encoder needs (per-partition session,
  * batched forward passes), proven here with the deterministic double.
  */
trait Reranker extends Serializable {
  /** Score (query, doc) pairs for one query; one score per doc,
    * higher = more relevant. Batched like the model forward pass. */
  def scoreBatch(query: String, docs: Seq[String]): Seq[Double]
}

/** Distinct-token F1: 2·|Q∩D| / (|Q|+|D|) over the engine's standard
  * lowercase `[^a-z0-9]+` tokenization, deduped. Integer counts, one
  * double division — bit-replayable anywhere. */
final class TokenOverlapReranker extends Reranker {
  private def toks(s: String): Set[String] =
    if (s == null) Set.empty
    else s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
  override def scoreBatch(query: String, docs: Seq[String]): Seq[Double] = {
    val q = toks(query)
    docs.map { d =>
      val t = toks(d)
      val denom = q.size + t.size
      if (denom == 0) 0.0 else 2.0 * (q & t).size / denom.toDouble
    }
  }
}

object Rerank {

  /** Re-score `candidates` (idCol, textCol) against `query` with `r`,
    * returning the top `k` by (score desc, id). The scorer runs via
    * mapPartitions in `batchSize` chunks — the batched-inference call
    * shape — and only the candidate set is touched. */
  def rerank(candidates: DataFrame, idCol: String, textCol: String,
      query: String, r: Reranker, k: Int, batchSize: Int = 32): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val scored = candidates
      .select(col(idCol).cast("long").as("_id"), col(textCol).cast("string").as("_t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val scores = r.scoreBatch(query, chunk.map(_._2))
          chunk.zip(scores).map { case ((id, _), s) => (id, s) }
        }
      }
      .toDF("_id", "score")
    scored.select(col("_id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
