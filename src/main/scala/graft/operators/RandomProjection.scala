package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded sparse-free random projection (Johnson–Lindenstrauss) —
  * [[Pca]]'s at-scale sibling for dimensionality reduction.
  *
  * PCA needs a FIT pass (covariance over the corpus) before it can
  * transform anything; a ±1 random projection needs NOTHING from the
  * data — the matrix is a pure function of (row, col, seed), so the
  * transform is a stateless projection that runs identically on every
  * executor, every engine and every rerun, with no model to ship and
  * no staleness when the corpus grows. Distance preservation is the
  * JL guarantee: for k output dims, pairwise distances distort by
  * O(1/√k) — the standard prelude to LSH/Hamming indexing when the
  * input dimension is high ([[Ann.encodeBinary]] gets cheaper on the
  * projected vectors) and the classic alternative to an IVF coarse
  * quantizer's training pass.
  *
  * Determinism is arithmetic, not library: the sign of cell (i, j)
  * is a two-step integer mix (Knuth multiplicative, all intermediates
  * < 2^63 by construction) any engine replays with `%` and `*`; the
  * projection itself folds input components in ascending order with
  * exact negation (never a ±1.0 multiply), so outputs are
  * bit-identical doubles wherever IEEE holds. */
object RandomProjection {

  /** true ⇒ +, false ⇒ − for matrix cell (i, j) under `seed`. */
  private def positive(i: Column, j: Column, seed: Long): Column = {
    val x = (i.cast("long") * lit(1000003L) + j.cast("long") * lit(999983L) +
      lit(seed)) % lit(2147483648L) // < 2^31, all terms nonnegative
    val y = (x * lit(2654435761L)) % lit(4294967296L) // < 2^63 pre-mod
    y < lit(2147483648L)
  }

  /** Project an `inDim` float/double array column to `outDim` doubles,
    * scaled by 1/√outDim (the JL normalization). Pure column
    * expression — whole-stage codegen, no shuffle, no fit. */
  def project(vec: Column, inDim: Int, outDim: Int, seed: Long): Column = {
    require(inDim > 0 && outDim > 0, "dimensions must be positive")
    require(seed >= 0, "seed must be nonnegative")
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(sequence(lit(0), lit(inDim - 1)), lit(0.0),
        (acc, i) => {
          val e = element_at(vec, i + 1).cast("double")
          acc + when(positive(i, j, seed), e).otherwise(-e)
        }) / lit(math.sqrt(outDim.toDouble)))
  }
}
