package graft.operators

import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for embedding columns — the standard
  * compression step in front of ANN/dedup at scale (project 384-dim
  * vectors to the subspace that actually carries the corpus structure,
  * then every downstream index pays k/384 of the memory and compute).
  *
  * Fit is the correct 100 TB shape: the covariance is ONE distributed
  * `treeAggregate` of a d x d grammian (384² doubles = ~1.2 MB of
  * state per task, independent of row count), and only the d x d
  * matrix is eigendecomposed on the driver — no row ever leaves its
  * partition, no sample is collected. Projection broadcasts the
  * (k x d) basis + mean once per executor and is a pure map: zero
  * shuffles, zero driver involvement.
  *
  * Vectors are mean-CENTERED before projection (y = B'(x - mu)) —
  * principal axes are directions of variance around the mean, and an
  * uncentered projection would let a large common offset dominate
  * every cosine. Reduced vectors come back as float arrays, drop-in
  * compatible with every vector operator in the engine (brute-force
  * / LSH / IVF / the snapshot index).
  *
  * Determinism: the eigenbasis is produced by the JVM's LAPACK path on
  * a deterministic covariance; sign/rotation ambiguity is fixed per
  * library version, and distances in the reduced space are invariant
  * to it — recall gates (q154) are therefore stable across reruns.
  */
object Pca {

  /** Fitted model: `basis` is k rows of length d (principal axes,
    * orthonormal), `mean` the column means. */
  case class PcaModel(mean: Array[Double], basis: Array[Array[Double]]) {
    def dim: Int = mean.length
    def targetDim: Int = basis.length
  }

  /** Fit the top-`targetDim` principal axes of a float-array vector
    * column. Cost: one pass for the covariance grammian + one for the
    * column means, both d²-state aggregates. */
  def fit(df: DataFrame, vecCol: String, targetDim: Int): PcaModel = {
    require(targetDim >= 1, "targetDim must be >= 1")
    val rows = df.select(col(vecCol)).na.drop()
      .rdd.map { r =>
        val s = r.getSeq[Float](0)
        val a = new Array[Double](s.length)
        var i = 0
        while (i < a.length) { a(i) = s(i); i += 1 }
        Vectors.dense(a)
      }
    val rm = new RowMatrix(rows)
    val pc = rm.computePrincipalComponents(targetDim) // d x k, column-major
    val mean = rm.computeColumnSummaryStatistics().mean.toArray
    val d = mean.length
    val basis = Array.tabulate(targetDim) { j =>
      Array.tabulate(d)(i => pc(i, j))
    }
    PcaModel(mean, basis)
  }

  /** Project one query vector on the caller's side (serving-path
    * helper: the query must enter the same reduced space the corpus
    * was indexed in). */
  def projectOne(model: PcaModel, v: Array[Float]): Array[Float] = {
    require(v.length == model.dim,
      s"vector dim ${v.length} != model dim ${model.dim}")
    val x = Array.tabulate(model.dim)(i => v(i) - model.mean(i))
    Array.tabulate(model.targetDim) { j =>
      val b = model.basis(j)
      var s = 0.0
      var i = 0
      while (i < x.length) { s += b(i) * x(i); i += 1 }
      s.toFloat
    }
  }

  /** Project `vecCol` onto the model's axes: `outCol` holds the
    * k-dim float array B'(x - mu). Broadcast model, narrow map. */
  def transform(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String): DataFrame = {
    require(model.basis.nonEmpty, "empty model")
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val project = udf { v: Seq[Float] =>
      if (v == null) null
      else {
        val m = bc.value
        val d = m.dim
        require(v.length == d, s"vector dim ${v.length} != model dim $d")
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = v(i) - m.mean(i); i += 1 }
        val out = new Array[Float](m.targetDim)
        var j = 0
        while (j < m.targetDim) {
          val b = m.basis(j)
          var s = 0.0
          var i2 = 0
          while (i2 < d) { s += b(i2) * x(i2); i2 += 1 }
          out(j) = s.toFloat
          j += 1
        }
        out
      }
    }
    df.withColumn(outCol, project(col(vecCol)))
  }
}
