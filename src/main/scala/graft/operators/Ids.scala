package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable contiguous id assignment (SURVEY.md §2.D op D1).
  *
  * The reference enumerates chunks `doc-0 .. doc-{n-1}` in order
  * (`/root/reference/streamlit_app.py:102`). A global
  * `row_number()` window over an un-partitioned frame would funnel all
  * rows through one task — wrong at 100 TB. Instead: range-repartition
  * on the ordering key (so partition p holds keys < partition p+1),
  * sort within partitions, then a zipWithIndex-style two-pass: count
  * rows per partition (small job), broadcast the cumulative offsets,
  * and add `offset(p) + local index` per row. Cost: one extra count
  * job over already-shuffled data; no single-task bottleneck.
  */
object Ids {

  /** Result of [[contiguousWithHandle]]: the id-stamped frame plus the
    * handle that releases its pinned RDD. The frame's rows come from a
    * persisted RDD (MEMORY_AND_DISK) — `df.rdd.unpersist()` on the
    * RETURNED frame would be a no-op (that `.rdd` is a fresh RDD derived
    * from the plan, not the persisted one), so the real reference is
    * exposed here. After `unpersist()`, re-computing the frame would
    * re-run the range shuffle; ids stay correct (offsets are fixed in
    * the broadcast) but tie-order within equal keys is no longer pinned,
    * so unpersist only once downstream has consumed or written the ids. */
  final case class WithIds(df: DataFrame, unpersist: () => Unit)

  /** Append a 0-based contiguous `idCol` ordered by `orderCols`.
    * Convenience form of [[contiguousWithHandle]] that keeps the
    * backing RDD pinned until Spark's ContextCleaner collects it. */
  def contiguous(df: DataFrame, orderCols: Seq[Column], idCol: String): DataFrame =
    contiguousWithHandle(df, orderCols, idCol).df

  /** As [[contiguous]], but also returns the unpersist handle for the
    * cached id-stamped RDD. */
  def contiguousWithHandle(df: DataFrame, orderCols: Seq[Column], idCol: String): WithIds = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // persisted: the count job and the id-assignment job must see the
    // SAME partition contents — recomputed lineage between the two jobs
    // could misalign offsets (and doubles the sort cost regardless).
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex { (p, it) =>
      Iterator.single(p -> it.size.toLong)
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val withId = rdd.mapPartitionsWithIndex { (pi, it) =>
      var i = bOffsets.value(pi)
      it.map { row => val r = Row.fromSeq(row.toSeq :+ i); i += 1; r }
    }
    // Materialize ids while the sorted input is still cached, THEN release
    // it — unpersisting earlier would let a recompute misalign offsets.
    // The result stays persisted (it is the product of two jobs); the
    // returned handle unpersists THIS RDD (the persisted one — see
    // [[WithIds]] for why `df.rdd.unpersist()` would not).
    withId.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withId.count()
    rdd.unpersist(blocking = false)
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    WithIds(spark.createDataFrame(withId, schema), () => withId.unpersist(blocking = false))
  }
}
