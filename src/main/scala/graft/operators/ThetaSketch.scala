package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Theta sketches: approximate DISTINCT with SET OPERATIONS — the
  * piece HLL lacks. An HLL union answers "distinct users who did A or
  * B"; only a theta sketch also answers INTERSECTION ("did BOTH A and
  * B" — audience overlap, cohort intersection) and A-NOT-B ("did A but
  * never B" — churn, exclusion lists) without a second pass over the
  * data. Each group's sketch is a few KB regardless of cardinality,
  * persists like the HLL profile sidecars, and set-ops run on the
  * sketches alone.
  *
  * Build shape (no per-row UDAF deserialization): partitions build
  * local UpdateSketches in a hash map (`mapPartitions`, one sketch
  * update per row), then per-key compact sketches reduce via theta
  * Union — two narrow passes + one key shuffle of KB-sized sketches,
  * never of values. Below the nominal-entries threshold (2^lgK) a
  * theta sketch is EXACT; above it estimates hold ~1/sqrt(2^lgK)
  * relative error, and intersections inherit both operands' bounds.
  *
  * Cited behavior is the published Apache DataSketches contract (the
  * same library Spark's own hll_sketch_agg ships).
  */
object ThetaSketch {

  /** Per-key theta sketches of `valueCol`'s distinct values:
    * (key, sketch bytes). Values sketch by their string rendering
    * (injective per type, the profileSketch convention). */
  def sketch(df: DataFrame, keyCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nominal = 1 << lgK
    val pairs = df
      .select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .as[(String, String)]
    val local: Dataset[(String, Array[Byte])] = pairs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
      it.foreach { case (k, v) =>
        m.getOrElseUpdate(k,
          UpdateSketch.builder().setNominalEntries(nominal).build())
          .update(v)
      }
      m.iterator.map { case (k, s) => (k, s.compact().toByteArray) }
    }
    local.groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, unionBytes(a._2, b._2, nominal)))
      .map(_._2)
      .toDF(keyCol, "sketch")
  }

  /** Merge sketch rows that share a key (e.g. per-batch sidecars) —
    * the incremental-rollup shape. */
  def merge(sketches: DataFrame, keyCol: String, lgK: Int = 12): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val nominal = 1 << lgK
    sketches.select(col(keyCol).cast("string"), col("sketch"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, unionBytes(a._2, b._2, nominal)))
      .map(_._2)
      .toDF(keyCol, "sketch")
  }

  private def wrap(b: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(b))

  private[operators] def unionBytes(a: Array[Byte], b: Array[Byte],
      nominal: Int): Array[Byte] = {
    val u = SetOperation.builder().setNominalEntries(nominal).buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    u.getResult.toByteArray
  }

  /** Distinct estimate of one sketch (exact below nominal entries). */
  def estimate(b: Array[Byte]): Double = wrap(b).getEstimate

  /** |A ∪ B| estimate. */
  def unionEstimate(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Double =
    Sketches.wrapCompactSketch(Memory.wrap(unionBytes(a, b, 1 << lgK)))
      .getEstimate

  /** |A ∩ B| estimate — what HLL cannot answer. */
  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a))
    i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** |A \ B| estimate. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(wrap(a), wrap(b)).getEstimate
  }
}
