package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test assignment — the eval-contamination
  * guard at split time: identical documents (the q24 exact-dup class)
  * must never straddle a split boundary, or the eval set leaks into
  * training verbatim. Assignment therefore happens per CONTENT GROUP,
  * not per row: every doc takes its group's representative id (min id
  * over identical text — one window partitioned by the text, the same
  * shuffle class as exact dedup itself), and the group id hashes into
  * percent bands with the engine's portable Knuth mix. By
  * construction all copies of a text land in the same split; the
  * assignment is deterministic, seedless re-runs reproduce it, and
  * any engine replays it from the rows alone. For NEAR-dup safety,
  * feed `minhashClustersBest`'s survivors in (one representative per
  * cluster exists, so group = row) or substitute the cluster
  * component for the text column — the mechanism is the same. */
object Splits {

  /** Assign each row a split label. `bands`: cumulative-percent
    * boundaries over [0, 100), e.g. Seq(("train", 80), ("val", 90),
    * ("test", 100)) — band < 80 → train, < 90 → val, else test. */
  def leakSafeSplit(df: DataFrame, idCol: String, textCol: String,
      bands: Seq[(String, Int)]): DataFrame = {
    require(bands.nonEmpty && bands.last._2 == 100 &&
      bands.map(_._2) == bands.map(_._2).sorted &&
      bands.map(_._2).distinct == bands.map(_._2),
      s"bands must be ascending cumulative percents ending at 100: $bands")
    val gkey = min(col(idCol).cast("long"))
      .over(Window.partitionBy(col(textCol)))
    val band = pmod(pmod(col("_gkey") * lit(2654435761L), lit(1L << 32)),
      lit(100L))
    val split = bands.init.reverse.foldLeft(lit(bands.last._1)) {
      case (acc, (name, hi)) => when(band < lit(hi.toLong), lit(name))
        .otherwise(acc)
    }
    df.withColumn("_gkey", gkey)
      .withColumn("split", split)
      .drop("_gkey")
  }
}
