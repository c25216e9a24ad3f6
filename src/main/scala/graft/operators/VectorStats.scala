package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregation over embedding columns (SURVEY.md §2.G
  * UDAF row — `Aggregator[IN, BUF, OUT]`).
  *
  * Per-dimension min/max was chosen deliberately: unlike a mean, min
  * and max are order- and grouping-independent, so the result is
  * bit-identical on any cluster layout and reproducible by any other
  * engine — the property the DuckDB-oracle gate needs. The buffer is a
  * pair of primitive arrays; merge is elementwise, so partial
  * aggregation (map-side combine) applies as with any built-in agg.
  */
object VectorStats {

  final case class MinMax(mins: Array[Double], maxs: Array[Double])

  /** Elementwise min/max over Array[Double] vectors of width `dim`. */
  final class DimMinMax(dim: Int) extends Aggregator[Array[Double], MinMax, MinMax] {
    override def zero: MinMax = MinMax(
      Array.fill(dim)(Double.PositiveInfinity),
      Array.fill(dim)(Double.NegativeInfinity))

    override def reduce(b: MinMax, v: Array[Double]): MinMax = {
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) {
        if (v(i) < b.mins(i)) b.mins(i) = v(i)
        if (v(i) > b.maxs(i)) b.maxs(i) = v(i)
        i += 1
      }
      b
    }

    override def merge(a: MinMax, b: MinMax): MinMax = {
      var i = 0
      while (i < dim) {
        if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
        if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
        i += 1
      }
      a
    }

    override def finish(r: MinMax): MinMax = r
    override def bufferEncoder: Encoder[MinMax] = Encoders.product[MinMax]
    override def outputEncoder: Encoder[MinMax] = Encoders.product[MinMax]
  }

  /** (label, pos, min_val, max_val) rows: grouped typed aggregation +
    * posexplode of the zipped result arrays. */
  def perDimMinMax(df: DataFrame, labelCol: String, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new DimMinMax(dim).toColumn
    df.select(col(labelCol).cast("long").as("_label"),
        col(vecCol).cast("array<double>").as("_v"))
      .as[(Long, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("mm"))
      .toDF("label", "mm")
      .select(col("label"), posexplode(arrays_zip(col("mm.mins"), col("mm.maxs"))))
      .select(col("label"), col("pos").cast("long").as("pos"),
        col("col.mins").as("min_val"), col("col.maxs").as("max_val"))
  }
}
