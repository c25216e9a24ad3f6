package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared disjointness-census machinery for the index merges
  * ([[InvertedIndex.mergeIndexes]] / [[VectorIndex.mergeIndexes]]):
  * verify no key appears in more than one source, name the first
  * colliders through the caller's typed error, and return the total
  * key count the post-transport reconcile compares against. One
  * implementation so the two merges cannot drift (r19 review). */
private[graft] object MergeCensus {

  /** `censuses`: per-source (tag, single-key-column DataFrame, keys
    * distinct within each source). Calls `onOverlap` with the first
    * (≤10) colliding keys — the callback must throw. Returns the sum
    * of the sources' key counts. */
  def requireDisjoint(censuses: Seq[(String, org.apache.spark.sql.DataFrame)],
      keyCol: String, onOverlap: Seq[Any] => Nothing): Long = {
    import org.apache.spark.sql.functions.{col, countDistinct, lit}
    val colliding = censuses
      .map { case (tag, d) => d.withColumn("_src", lit(tag)) }
      .reduce(_ unionByName _)
      .groupBy(col(keyCol)).agg(countDistinct(col("_src")).as("_ns"))
      .filter(col("_ns") > 1).select(col(keyCol))
      .limit(10).collect().map(_.get(0)).toSeq
    if (colliding.nonEmpty) onOverlap(colliding)
    censuses.map(_._2.count()).sum
  }
}

/** Distributed file transport — copy an explicit (srcFile, dstFile)
  * list as a flat Spark job, one independent copy per element: the
  * distcp shape. The driver handles NAMES only (manifest-scale);
  * every byte moves executor-side, so merging N shard indexes of TBs
  * parallelizes across the cluster instead of funneling through one
  * JVM (the r18 [[InvertedIndex.mergeIndexes]] driver loop this
  * replaces). A failed copy fails its task loudly — Spark's retry
  * re-copies with overwrite, so the job is idempotent per file. */
private[graft] object DistCopy {

  /** Hadoop `Configuration` is not java-serializable; wrap it through
    * its own public Writable contract (write/readFields) so the
    * executor-side copies see the driver's filesystem configuration —
    * credentials, connectors, the lot — not a default-constructed
    * one. */
  final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Copy every (srcFile, dstFile) pair executor-side; parent dirs
    * are created by the destination create. Throws (via the job) if
    * any copy fails. `jobTag` labels the job in the UI/listeners. */
  def copyFiles(spark: SparkSession, pairs: Seq[(String, String)],
      jobTag: String): Unit = {
    if (pairs.isEmpty) return
    val sc = spark.sparkContext
    val bc = sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    val slices = math.max(1, math.min(pairs.size, sc.defaultParallelism))
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"$jobTag: ${pairs.size} files")
    try {
      sc.parallelize(pairs, slices).foreach { case (s, d) =>
        val conf = bc.value.value
        val sp = new org.apache.hadoop.fs.Path(s)
        val dp = new org.apache.hadoop.fs.Path(d)
        val ok = org.apache.hadoop.fs.FileUtil.copy(
          sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
          false /* deleteSource */, true /* overwrite: task retry */, conf)
        if (!ok) throw new java.io.IOException(s"copy failed: $s -> $d")
      }
    } finally {
      sc.setJobDescription(prev)
      bc.destroy()
    }
  }
}
