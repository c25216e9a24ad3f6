package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset release integrity — the data-card side of publishing a
  * curated corpus: every released table gets an ENGINE-PORTABLE
  * content fingerprint that any downstream consumer (Spark, DuckDB, a
  * Python script with hashlib) can recompute from the rows alone and
  * compare against the manifest, no trust in the transport required.
  *
  * The fingerprint is bit_xor over rows of the first 48 bits of
  * sha256 of the '|'-joined canonical column strings — XOR makes it
  * ORDER-INDEPENDENT (partitioning, file layout and row order never
  * matter; a release re-shuffled for layout still verifies) and
  * mergeable (shard fingerprints XOR into the table's). sha256 keeps
  * it portable: no engine-specific hash in the contract. NULLs
  * canonicalize to a NUL-prefixed sentinel no real text collides
  * with (the concat_ws-skips-nulls ambiguity). The caller chooses fingerprint
  * columns and is responsible for canonical TYPES: integers, strings
  * and decimals render identically across engines; raw doubles and
  * sub-second timestamps do not — cast them to decimals/epoch-micros
  * first (the same rule every oracle here already lives by).
  *
  * XOR's known weakness — a row appearing an even number of times
  * cancels out — is why the manifest also carries the exact row
  * count: a duplication that fools the XOR moves the count, and vice
  * versa. */
object Release {

  private val NullSentinel = "\u0001null"

  private def canonical(cols: Seq[String]): Column =
    concat_ws("|", cols.map(c =>
      coalesce(col(c).cast("string"), lit(NullSentinel))): _*)

  /** One row: (n_rows, fp) for `df` over `cols`. */
  def fingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    df.select(conv(substring(sha2(canonical(cols), 256), 1, 12), 16, 10)
        .cast("long").as("_h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(_h)"), lit(0L)).as("fp"))
  }

  /** Write each table as parquet under `dir/<name>` plus a
    * `_MANIFEST.json` of per-table (columns, rows, fingerprint). The
    * manifest commits LAST, tmp + rename — its presence means every
    * table landed. */
  def publish(spark: SparkSession, dir: String,
      tables: Seq[(String, DataFrame, Seq[String])]): Unit = {
    require(tables.nonEmpty, "nothing to publish")
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = tables.map { case (name, df, cols) =>
      require(name.matches("[A-Za-z0-9_]+"), s"unsafe table name $name")
      df.write.mode("overwrite").parquet(s"$dir/$name")
      val r = fingerprint(spark.read.parquet(s"$dir/$name"), cols).head()
      (name, cols, r.getLong(0), r.getLong(1))
    }
    val json = entries.map { case (n, cols, rows, fp) =>
      s"""{"table":"$n","cols":[${cols.map(c => s""""$c"""").mkString(",")}],""" +
        s""""rows":$rows,"fp":$fp}"""
    }.mkString("[", ",", "]")
    val tmp = new Path(dir, "._MANIFEST.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
    val fin = new Path(dir, "_MANIFEST.json")
    fs.delete(fin, false)
    require(fs.rename(tmp, fin), s"manifest commit failed at $fin")
  }

  /** Recompute every manifest entry against the files on disk:
    * (table, rows_expected, rows_actual, fp_expected, fp_actual, ok).
    * A tampered, truncated, or re-written table fails loudly here —
    * and any OTHER engine can run the same check from the manifest
    * alone. */
  def validate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(dir, "_MANIFEST.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // dependency-free parse of the flat structure publish writes
    val entryRe =
      """\{"table":"([A-Za-z0-9_]+)","cols":\[([^\]]*)\],"rows":(\d+),"fp":(-?\d+)\}""".r
    val rows = entryRe.findAllMatchIn(json).map { m =>
      val cols = m.group(2).split(",").map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).toSeq
      val actual = fingerprint(
        spark.read.parquet(s"$dir/${m.group(1)}"), cols).head()
      (m.group(1), m.group(3).toLong, actual.getLong(0),
        m.group(4).toLong, actual.getLong(1))
    }.toSeq
    require(rows.nonEmpty, s"empty or unparseable manifest at $dir")
    import spark.implicits._
    rows.toDF("table", "rows_expected", "rows_actual", "fp_expected",
        "fp_actual")
      .withColumn("ok", col("rows_expected") === col("rows_actual") &&
        col("fp_expected") === col("fp_actual"))
  }
}
