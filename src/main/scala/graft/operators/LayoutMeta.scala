package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Layout parameters of a partitioned on-disk index (Hamming /
  * MinHash), persisted as a `_META` sidecar at the index root.
  *
  * The partition layout of these indexes is DERIVED from parameters
  * (`buckets`, `maxDist`) that the write side and every probe must
  * agree on: a probe run with a different `buckets` than the append
  * prunes the WRONG directories and silently misses near-duplicates —
  * a correctness trap wearing a perf hat. Persisting the parameters
  * with the data turns that silent miss into (a) automatic resolution
  * when the caller does not care (pass [[Unspecified]]) and (b) a
  * fail-fast exception when an explicitly passed value conflicts with
  * the written layout.
  *
  * The file is one `k=v` line per parameter, written tmp + rename
  * (same commit discipline as the VectorIndex manifest) AFTER the
  * first data lands, so a crash can never leave a `_META`-only
  * directory that readers would mistake for an index. Underscore
  * prefix keeps it invisible to parquet directory scans and to
  * [[Ann.compactHammingIndex]]'s file census. Indexes written before
  * this file existed keep working: probes on a META-less index fall
  * back to the caller's values exactly as before (and the next append
  * records them).
  */
private[graft] object LayoutMeta {

  /** Sentinel for "caller did not specify" — resolve from `_META`,
    * falling back to the operator's documented default. */
  val Unspecified: Int = -1

  private def metaPath(path: String) = new Path(path, "_META")

  def read(spark: SparkSession, path: String): Option[Map[String, Int]] = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(txt.split("\n").toSeq.filter(_.contains("=")).map { l =>
        val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim.toInt
      }.toMap)
    }
  }

  /** Effective parameters for one append/probe: stored `_META` values
    * win; explicitly passed (non-[[Unspecified]]) values must agree
    * with them or this THROWS (never a silent misprune); `defaults`
    * fill whatever neither source names. */
  def resolve(spark: SparkSession, path: String, passed: Map[String, Int],
      defaults: Map[String, Int]): Map[String, Int] = {
    val explicit = passed.filter(_._2 != Unspecified)
    val stored = read(spark, path).getOrElse(Map.empty)
    explicit.foreach { case (k, v) =>
      stored.get(k).filter(_ != v).foreach { s =>
        throw new IllegalArgumentException(
          s"index layout mismatch at $path: caller passed $k=$v but the " +
            s"written layout records $k=$s (_META); a mismatched probe " +
            s"would prune the wrong directories and silently miss matches")
      }
    }
    defaults ++ explicit ++ stored
  }

  /** Record `params` if the index has no `_META` yet (call AFTER data
    * lands — see class doc). [[resolve]] has already proven any
    * existing file agrees, so presence means nothing to do. */
  def commit(spark: SparkSession, path: String, params: Map[String, Int]): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) overwrite(spark, path, params)
  }

  /** Unconditionally (re)write `_META` — for full-rewrite creates
    * (`Ann.writeHammingIndex`'s overwrite), whose new layout replaces
    * whatever was recorded before. */
  def overwrite(spark: SparkSession, path: String, params: Map[String, Int]): Unit = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // unique tmp name: a fixed `._META.tmp` lets two writers clobber
    // each other's in-flight content mid-create
    val tmp = new Path(path,
      s"._META.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    out.write(params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }
}
