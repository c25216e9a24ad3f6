package graft.operators

import graft.core.{IndexMeta, IngestError, Metric}
import graft.functions.vectors
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** A named vector index over Parquet with snapshot isolation
  * (SURVEY.md §1.4, §2.E, §2.F).
  *
  * Reference semantics reproduced:
  *   - fixed dimension + metric declared at creation
  *     (`/root/reference/streamlit_app.py:49`: dim=384, metric=cosine);
  *     stored in `_graft_meta.json`, validated on every upsert
  *     (`:142-143`);
  *   - idempotent create / existence check (`:46-49`); no readiness
  *     poll needed — a written snapshot IS ready (`:52-58` collapses);
  *   - id-keyed upsert, last write wins (`:110`);
  *   - query surface: top-k cosine with optional metadata filter,
  *     fetch/delete by id (Pinecone query API `[dep]`).
  *
  * Storage: `path/snapshot=N/` Parquet dirs; the current snapshot is
  * max(N) (simplified Iceberg-style snapshotting). Writers never
  * rewrite the files a concurrent reader is scanning, which also
  * side-steps Spark's cannot-overwrite-input restriction without a
  * driver-side checkpoint of the whole index. At cluster scale the
  * upsert shuffle partitions by `id` — the same layout the next
  * upsert's window needs.
  */
final class VectorIndex private (
    val spark: SparkSession,
    val path: String,
    val meta: IndexMeta) {

  import VectorIndex._

  /** Current contents: (id, values, metadata, version). */
  def scan(): DataFrame = currentSnapshot(spark, path) match {
    case Some(n) => spark.read.parquet(s"$path/snapshot=$n")
    case None => emptyIndexDf(spark)
  }

  /** Committed snapshot versions, ascending (bounded by the retention
    * in pruneOldSnapshots). */
  def snapshots(): Seq[Long] = listSnapshots(spark, path)

  /** Time travel: read the index as of an older committed snapshot. */
  def scanAt(version: Long): DataFrame = {
    require(snapshots().contains(version),
      s"snapshot $version not present (have ${snapshots().mkString(",")})")
    spark.read.parquet(s"$path/snapshot=$version")
  }

  /** G3 `describe_index` parity: dimension / metric / row count. */
  def describe(): (IndexMeta, Long) = (meta, scan().count())

  /** D4 upsert: id-keyed, last-write-wins. Records need (id, values,
    * metadata); rejects wrong-width vectors before any write (E2). */
  def upsert(records: DataFrame): Unit = {
    val dim = meta.dimension
    val bad = records.filter(size(col("values")) =!= dim).limit(1).count()
    if (bad > 0)
      throw new IngestError(s"upsert: embedding dimension != index dimension $dim")
    val cur = currentSnapshot(spark, path)
    val version = cur.map(_ + 1L).getOrElse(0L)
    val incoming = records
      .select(col("id").cast("string"), col("values").cast("array<float>"), col("metadata"))
      .withColumn("version", lit(version))
    val merged = cur match {
      case None => incoming.dropDuplicates("id") // within-batch: keep one per id
      case Some(n) =>
        val old = spark.read.parquet(s"$path/snapshot=$n")
        val unioned = old.unionByName(incoming)
        // last write wins; within a batch ties broken arbitrarily-but-
        // deterministically by values hash. Shuffle partitions by id —
        // the natural key layout for the next merge.
        val w = Window.partitionBy(col("id"))
          .orderBy(col("version").desc, xxhash64(col("values")).desc)
        unioned.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
          .withColumn("version", lit(version))
    }
    merged.write.mode(SaveMode.Overwrite).parquet(s"$path/snapshot=$version")
    pruneOldSnapshots(spark, path, keep = 2)
  }

  /** Q1/Q3: top-k by metric score with optional metadata pre-filter
    * (filter applies BEFORE scoring; Catalyst pushes it into the scan).
    * `orderBy.limit` plans as TakeOrderedAndProject — distributed top-k,
    * no global sort. */
  def query(q: Array[Float], k: Int, filter: Option[Column] = None): DataFrame = {
    val base = filter.foldLeft(scan())((df, f) => df.filter(f))
    val qCol = lit(q.map(_.toDouble))
    val score = meta.metric match {
      case Metric.Cosine => vectors.cosine(col("values"), qCol)
      case Metric.Dot => vectors.dot(col("values"), qCol)
      // clamp: fp cancellation for v≈q can push the operand slightly
      // negative → sqrt NaN, which Spark sorts ABOVE all doubles.
      case Metric.Euclidean => -sqrt(greatest(
        vectors.dot(col("values"), col("values")) - lit(2.0) * vectors.dot(col("values"), qCol)
          + vectors.dot(qCol, qCol), lit(0.0)))
    }
    base.withColumn("score", score)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select(col("id"), col("score"), col("metadata"))
  }

  /** Q4 fetch by id. */
  def fetch(ids: Seq[String]): DataFrame =
    scan().filter(col("id").isin(ids: _*))

  /** Q4 delete by id — anti-join rewrite into a new snapshot. */
  def delete(ids: Seq[String]): Unit = {
    val version = currentSnapshot(spark, path).map(_ + 1L).getOrElse(0L)
    val remaining = scan().filter(!col("id").isin(ids: _*))
      .withColumn("version", lit(version))
    remaining.write.mode(SaveMode.Overwrite).parquet(s"$path/snapshot=$version")
    pruneOldSnapshots(spark, path, keep = 2)
  }
}

object VectorIndex {

  /** G2 create — idempotent like the reference's existence check
    * (streamlit_app.py:46-49). Fails if it exists with different meta. */
  def ensure(spark: SparkSession, path: String, dimension: Int,
      metric: Metric = Metric.Cosine, name: String = "textembedding"): VectorIndex = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaPath = new Path(path, "_graft_meta.json")
    if (fs.exists(metaPath)) {
      val existing = readMeta(spark, path)
      require(existing.dimension == dimension && existing.metric == metric,
        s"index exists with different meta: $existing")
      new VectorIndex(spark, path, existing)
    } else {
      val meta = IndexMeta(name, dimension, metric)
      fs.mkdirs(new Path(path))
      val out = fs.create(metaPath, true)
      out.write(
        s"""{"name":"${meta.name}","dimension":${meta.dimension},"metric":"${meta.metric.name}"}"""
          .getBytes("UTF-8"))
      out.close()
      new VectorIndex(spark, path, meta)
    }
  }

  def open(spark: SparkSession, path: String): VectorIndex =
    new VectorIndex(spark, path, readMeta(spark, path))

  /** G1 list indexes under a root dir. */
  def list(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, "_graft_meta.json")))
      .map(_.getPath.getName)
  }

  private def readMeta(spark: SparkSession, path: String): IndexMeta = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path, "_graft_meta.json"))
    val txt = scala.io.Source.fromInputStream(in).mkString
    in.close()
    // minimal parse of the fixed shape we write
    def field(k: String): String =
      txt.split(s""""$k":""")(1).split("[,}]")(0).trim.stripPrefix("\"").stripSuffix("\"")
    IndexMeta(field("name"), field("dimension").toInt, Metric.parse(field("metric")))
  }

  private def listSnapshots(spark: SparkSession, path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("snapshot=") => s.stripPrefix("snapshot=").toLong }
      // only snapshots with a _SUCCESS marker are committed
      .filter(n => fs.exists(new Path(p, s"snapshot=$n/_SUCCESS")))
      .sorted
  }

  private def currentSnapshot(spark: SparkSession, path: String): Option[Long] =
    listSnapshots(spark, path).lastOption

  private def pruneOldSnapshots(spark: SparkSession, path: String, keep: Int): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("snapshot="))
      .sortBy(_.getName.stripPrefix("snapshot=").toLong)
    snaps.dropRight(keep).foreach(fs.delete(_, true))
  }

  private def emptyIndexDf(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", StringType),
        StructField("values", ArrayType(FloatType, containsNull = false)),
        StructField("metadata", StructType(Seq(
          StructField("chunk_index", IntegerType),
          StructField("source", StringType)))),
        StructField("version", LongType))))
  }
}
