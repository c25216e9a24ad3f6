package graft.core

/** Core data model, Spark-first re-expression of the reference's shapes
  * (see SURVEY.md §1).
  *
  *   - `VectorRecord` mirrors the (id, values, metadata) triple the
  *     reference upserts (`/root/reference/streamlit_app.py:102`).
  *   - `Chunk` is one split of one document (`streamlit_app.py:34-35`).
  *   - `IndexMeta` carries the index "schema": name, dimension, metric
  *     (`streamlit_app.py:37,49` — name=textembedding, dim=384,
  *     metric=cosine). We store it as table properties; fixtures use
  *     dim=64, so dimension is data-driven, never hardcoded.
  */
final case class Chunk(docId: Long, chunkIndex: Int, text: String)

final case class ChunkMeta(chunk_index: Int, source: String)

final case class VectorRecord(
    id: String,
    values: Array[Float],
    metadata: Map[String, String])

sealed trait Metric { def name: String }
object Metric {
  case object Cosine extends Metric { val name = "cosine" }
  case object Euclidean extends Metric { val name = "euclidean" }
  case object Dot extends Metric { val name = "dotproduct" }
  def parse(s: String): Metric = s.toLowerCase match {
    case "cosine" => Cosine
    case "euclidean" | "l2" => Euclidean
    case "dotproduct" | "dot" => Dot
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}

/** @param numBuckets id-hash buckets the index data files are
  *   partitioned into; an upsert/delete rewrites only touched buckets,
  *   so this bounds write amplification (size it so index/numBuckets
  *   is a comfortable rewrite unit — thousands at cluster scale).
  * @param sigCellBits signature-prefix cell layout of the data files:
  *   each rewritten row lands under `_cell=` = the top `sigCellBits`
  *   bits of its stored 64-bit hyperplane signature, so a serving
  *   query's shortlist pass prunes its (id,_bsig) scan to the files of
  *   the query cell's expanding Hamming neighborhoods instead of the
  *   whole index (VectorIndex.queryApprox). 0 = no cell layout (legacy
  *   indexes); fixed at creation like dimension — every file's path
  *   cell must mean the same bits.
  * @param cellMinRows a cell only gets its own `_cell=` directory in a
  *   snapshot write when it holds at least this many rows there;
  *   smaller cells land in the bucket's default partition, which
  *   probes always read. This is what keeps the cell layout from
  *   exploding a SMALL index into per-cell micro-files (measured 18x
  *   on the sf0.1 lifecycle gates) while converging to full per-cell
  *   pruning exactly where pruning pays — the large-index regime whose
  *   cells are file-sized anyway.
  * @param prefixDim when > 0, every snapshot write additionally stores
  *   the first `prefixDim` components of each vector as a narrow
  *   `_vpre` column — the Matryoshka serving layout
  *   (VectorIndex.queryMatryoshka shortlists on prefix cosine reading
  *   prefixDim/dimension of the vector bytes, then exact-rescores the
  *   shortlist full-dim). 0 = off; fixed at creation like dimension
  *   (prefix scores must mean the same slice in every file). */
final case class IndexMeta(name: String, dimension: Int, metric: Metric,
    numBuckets: Int = 16, sigCellBits: Int = 0, cellMinRows: Int = 1024,
    prefixDim: Int = 0) {
  def props: Map[String, String] =
    Map("dimension" -> dimension.toString, "metric" -> metric.name,
      "numBuckets" -> numBuckets.toString, "sigCellBits" -> sigCellBits.toString,
      "cellMinRows" -> cellMinRows.toString, "prefixDim" -> prefixDim.toString)
}

/** Ingestion errors — the reference raises ValueError on empty inputs
  * (`streamlit_app.py:29-30,98-100,133-134`) and asserts the embedding
  * width (`:142-143`). */
final class IngestError(msg: String) extends RuntimeException(msg)
