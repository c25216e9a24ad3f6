package graft.operators

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) sketches: the FOURTH mergeable
  * sketch family next to HLL (distinct), theta (set ops) and KLL
  * (quantiles) — Misra-Gries-style counting with published
  * over/under-estimate bounds.
  *
  * What it is FOR at 100 TB: skew diagnosis and hot-key discovery
  * without a full groupBy — "which tokens/domains/users dominate this
  * batch" as a KB-sized per-batch sidecar that merges across the whole
  * corpus, so the skew report that decides salting/banding parameters
  * never rescans old data. An exact groupBy answers one batch's
  * question at shuffle cost; persisted sketches answer the corpus'
  * question at merge cost.
  *
  * Build mirrors [[ThetaSketch]]/[[KllQuantiles]]: partition-local
  * ItemsSketch updates, then per-key compact-bytes merge through a key
  * shuffle of sketches — item values never shuffle. Contracts (the
  * sketch's own, what the specs gate): estimates lie in
  * [lowerBound, upperBound] with upperBound - estimate <= maximumError;
  * when the stream's distinct-item count stays under the sketch's
  * capacity (~0.75 * maxMapSize), maximumError is 0 and every count is
  * EXACT; NO_FALSE_NEGATIVES returns a superset of every item with
  * true count > maximumError.
  */
object FrequentItems {

  private def serde = new ArrayOfStringsSerDe()

  /** Per-key frequent-items sketches of `itemCol`: (key, sketch bytes).
    * `maxMapSize` must be a power of two; capacity ~ 0.75 * maxMapSize
    * distinct items before approximation starts. */
  def sketch(df: DataFrame, keyCol: String, itemCol: String,
      maxMapSize: Int = 1024): DataFrame = {
    require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
      s"maxMapSize must be a power of two >= 8, got $maxMapSize")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(keyCol).cast("string").as("k"),
        col(itemCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .as[(String, String)]
    val local: Dataset[(String, Array[Byte])] = pairs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, ItemsSketch[String]]
      it.foreach { case (key, v) =>
        m.getOrElseUpdate(key, new ItemsSketch[String](maxMapSize)).update(v)
      }
      m.iterator.map { case (key, s) => (key, s.toByteArray(serde)) }
    }
    local.groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, mergeBytes(a._2, b._2, maxMapSize)))
      .map(_._2)
      .toDF(keyCol, "sketch")
  }

  /** Merge per-batch sketch rows sharing a key — the sidecar rollup. */
  def merge(sketches: DataFrame, keyCol: String,
      maxMapSize: Int = 1024): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    sketches.select(col(keyCol).cast("string"), col("sketch"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, mergeBytes(a._2, b._2, maxMapSize)))
      .map(_._2)
      .toDF(keyCol, "sketch")
  }

  private[operators] def mergeBytes(a: Array[Byte], b: Array[Byte],
      maxMapSize: Int): Array[Byte] = {
    val m = new ItemsSketch[String](maxMapSize)
    m.merge(ItemsSketch.getInstance(Memory.wrap(a), serde))
    m.merge(ItemsSketch.getInstance(Memory.wrap(b), serde))
    m.toByteArray(serde)
  }

  /** Frequent items of one sketch, estimate-descending:
    * (item, estimate, lowerBound, upperBound). `noFalseNegatives`
    * true = a superset of every truly-frequent item (the audit
    * direction); false = only items PROVABLY above the error line
    * (the report direction). */
  def items(bytes: Array[Byte], noFalseNegatives: Boolean = false)
      : Seq[(String, Long, Long, Long)] = {
    val s = ItemsSketch.getInstance(Memory.wrap(bytes), serde)
    val et = if (noFalseNegatives) ErrorType.NO_FALSE_NEGATIVES
      else ErrorType.NO_FALSE_POSITIVES
    s.getFrequentItems(et).toSeq
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
  }

  /** The sketch's maximum count error: 0 = every estimate is EXACT
    * (the stream's distinct items fit the map). */
  def maxError(bytes: Array[Byte]): Long =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde).getMaximumError

  /** Total items the sketch absorbed. */
  def streamLength(bytes: Array[Byte]): Long =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde).getStreamLength
}
