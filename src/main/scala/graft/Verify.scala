package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd+ args: run only the named queries (builder-local
    // iteration; the driver always passes exactly two args). The
    // literal "--valves" expands to [[ValveGates]] — the r18 sf0.1
    // oracle pass for the operators whose skew/size valves barely
    // engage at sf0.01 (results committed as
    // CORRECTNESS_sf01_valves_r18.json alongside the round artifacts).
    val only: Set[String] = args.drop(2).toSet match {
      case s if s.contains("--valves") => (s - "--valves") ++ ValveGates
      case s => s
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet stamps ts as timestamp[us] WITHOUT
      // isAdjustedToUTC, which Spark 4 infers as TIMESTAMP_NTZ by
      // default; read it as session-TZ (UTC) TIMESTAMP so time
      // functions (unix_micros, windowing) keep their types and the
      // wall-clock values match DuckDB's naive read of the same file
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json FIRST: the map is static, and writing it after the
    // ~140s query loop meant any driver-side interruption graded ZERO
    // queries (r15's CORRECTNESS file came back `{}`). Written up front,
    // a partial run still grades every query whose parquet landed.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // builder-local diagnosis: full stack on demand (the driver
        // never sets this; getMessage alone hides serialization roots)
        if (sys.env.contains("SPARK_GRAFT_VERIFY_TRACE")) e.printStackTrace()
      }
    }
    spark.stop()
  }

  /** The valve-bearing gates (skew/size/fan-out valves that barely
    * engage at the driver's sf0.01): banded/blocked dedup (q31 bands,
    * q33 df-band, q75 LSH buckets, q87 carriers, q212 cluster pass),
    * cell/cap valves (q119 maxCellSize, q185 dfCap, q187
    * maxCellsPerRow), stride/window valves (q126/q130 anchorStride,
    * q184 SNM window), and the n-gram join family whose candidate
    * fan-out scales with corpus size (q118/q120/q220). Run at sf0.1
    * (`runMain graft.Verify /root/testdata/sf0.1 <out> --valves`) the
    * valves demonstrably engage and the oracles still hash-match.
    * r20 adds q241: the streaming vector dedup's within-batch pass
    * gained a banded candidate pre-pass + maxBatchRows valve — at
    * sf0.1 its micro-batches carry 4x the rows and the oracle's exact
    * pairwise replay must still match the banded verdicts. */
  val ValveGates: Set[String] = Set(
    "q31_minhash_dedup", "q33_ngram_dedup", "q75_minhash_clusters",
    "q87_dedup_against", "q118_decontaminate", "q119_semantic_dedup",
    "q120_decontaminate_fuzzy", "q126_exact_substr_dedup",
    "q130_exact_substr_against", "q184_snm_dedup", "q185_containment",
    "q187_interval_join", "q212_cluster_best", "q220_split_contamination",
    "q241_stream_vector_dedup",
    // r20 close-out: the sharded dedup probes carry the same valves
    // (dropsSharded inherits drops' per-shard maxBucketSize census;
    // the epoch ingest runs the banded within-batch pass + maxBatchRows)
    "q261_minhash_scatter", "q268_stream_epoch_dedup")
}
