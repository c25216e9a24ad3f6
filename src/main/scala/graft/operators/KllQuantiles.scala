package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** KLL quantile sketches: MERGEABLE, PERSISTABLE percentiles — the
  * third sketch family next to the HLL profile sidecars (distinct) and
  * theta (set ops). Spark's `approx_percentile` answers a one-shot
  * query but its state dies with the job; a KLL sidecar stored per
  * ingest batch lets "p99 latency over the whole corpus" be a MERGE of
  * KB-sized sketches — old batches are never rescanned, and any
  * rolling window of batches can be re-aggregated after the fact
  * (drop a batch's sketch, merge the rest) — the observability/
  * data-quality rollup shape.
  *
  * Build mirrors [[ThetaSketch]]: partition-local KllDoublesSketch
  * updates, then per-key compact-bytes merge through a key shuffle of
  * sketches, never of values. KLL's published guarantee is a RANK
  * error bound (~1.65% at k=200, two-sided): the value returned for
  * rank p is a real element of the data whose true rank is within eps
  * of p — the spec gates exactly that contract, not value closeness.
  */
object KllQuantiles {

  /** Per-key KLL sketches of `valueCol`: (key, sketch bytes). */
  def sketch(df: DataFrame, keyCol: String, valueCol: String,
      k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .as[(String, Double)]
    val local: Dataset[(String, Array[Byte])] = pairs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
      it.foreach { case (key, v) =>
        m.getOrElseUpdate(key, KllDoublesSketch.newHeapInstance(k)).update(v)
      }
      m.iterator.map { case (key, s) => (key, s.toByteArray) }
    }
    local.groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, mergeBytes(a._2, b._2, k)))
      .map(_._2)
      .toDF(keyCol, "sketch")
  }

  /** Merge per-batch sketch rows sharing a key — the sidecar rollup. */
  def merge(sketches: DataFrame, keyCol: String, k: Int = 200): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    sketches.select(col(keyCol).cast("string"), col("sketch"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, mergeBytes(a._2, b._2, k)))
      .map(_._2)
      .toDF(keyCol, "sketch")
  }

  private[operators] def mergeBytes(a: Array[Byte], b: Array[Byte],
      k: Int): Array[Byte] = {
    val m = KllDoublesSketch.newHeapInstance(k)
    m.merge(KllDoublesSketch.wrap(Memory.wrap(a)))
    m.merge(KllDoublesSketch.wrap(Memory.wrap(b)))
    m.toByteArray
  }

  /** Quantile at rank `p` in [0,1] (inclusive criteria — the returned
    * value is an element of the sketched data). */
  def quantile(bytes: Array[Byte], p: Double): Double =
    KllDoublesSketch.wrap(Memory.wrap(bytes))
      .getQuantile(p, QuantileSearchCriteria.INCLUSIVE)

  /** The sketch's own normalized rank-error bound (two-sided). */
  def rankError(bytes: Array[Byte]): Double =
    KllDoublesSketch.wrap(Memory.wrap(bytes)).getNormalizedRankError(true)

  /** Number of values the sketch has absorbed. */
  def count(bytes: Array[Byte]): Long =
    KllDoublesSketch.wrap(Memory.wrap(bytes)).getN
}
