package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right
  * row with `rightTime <= leftTime` per key (the time-series join Spark
  * lacks natively; SURVEY.md §2.G theta/range-join row, reference query
  * surface extension).
  *
  * Scale shape: a naive formulation is a range join (BNLJ or an
  * inequality sort-merge with per-key rescans). This implementation is
  * ONE hash shuffle on the key plus a per-partition sort: union both
  * sides tagged, window by key ordered by (time, side) with right rows
  * sorting before left rows at equal timestamps, and carry the latest
  * right payload forward with last(ignoreNulls). Cost is
  * O((|L|+|R|) log) per partition regardless of key skew in time —
  * the same plan shape Structured Streaming uses for stream-stream
  * event alignment.
  *
  * Right payloads ride inside a struct, so a right row whose payload
  * columns are themselves null still matches (null-struct marks "no
  * right row yet", not "null payload").
  *
  * Null event times: `rightTime IS NULL` rows are DROPPED before the
  * union — under ascending traversal Spark sorts nulls first, so such a
  * row would otherwise sit at the window start and be carried forward as
  * a spurious "latest at-or-before" match. `leftTime IS NULL` rows are
  * KEPT but never match (the comparison is unknown under the naive
  * definition), mirroring a left join's null-key behavior.
  */
object AsOfJoin {

  /** @param keyCols     equi-join key columns (present on both sides)
    * @param leftTime    left event-time column name
    * @param rightTime   right event-time column name
    * @param rightPayload right columns to attach (suffixed on output)
    * @param suffix      suffix for attached right columns */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      suffix: String = "_asof"): DataFrame =
    joinImpl(left, right, keyCols, leftTime, rightTime, rightPayload, suffix,
      descending = false)

  /** Forward as-of join: the EARLIEST right row with
    * `rightTime >= leftTime` per key — the same single-shuffle window
    * plan traversed in descending time order. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      suffix: String = "_asof"): DataFrame =
    joinImpl(left, right, keyCols, leftTime, rightTime, rightPayload, suffix,
      descending = true)

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      suffix: String,
      descending: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)

    val l = left
      .withColumn("_asof_t", col(leftTime))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right
      .filter(col(rightTime).isNotNull) // see scaladoc: null right times never match
      .select((keyCols.map(col) :+ col(rightTime).as("_asof_t")) :+
        payloadStruct.as("_asof_payload"): _*)
      .withColumn("_asof_side", lit(0))
    // align schemas: right side has no left columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (keyCols.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unioned = l.select((leftCols ++ Seq("_asof_t", "_asof_side", "_asof_payload")).map(col): _*)
      .unionByName(rAligned.select(
        (leftCols ++ Seq("_asof_t", "_asof_side", "_asof_payload")).map(col): _*))

    // Traversal order: time asc for backward (latest right at-or-before),
    // time desc for forward (earliest right at-or-after). Either way
    // right rows (side 0) sort before left rows at equal timestamps so
    // an exactly-equal timestamp matches.
    val tOrder = if (descending) col("_asof_t").desc else col("_asof_t").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tOrder, col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      // null left times never match: under desc traversal (forward mode)
      // nulls sort LAST — after every right row — so the window value
      // must be masked, not trusted
      .withColumn("_asof_match",
        when(col("_asof_t").isNotNull, col("_asof_match")))
      .filter(col("_asof_side") === 1)

    val attached = rightPayload.foldLeft(matched) { (df, p) =>
      df.withColumn(s"$p$suffix", col(s"_asof_match.$p"))
    }
    attached.select((leftCols ++ rightPayload.map(p => s"$p$suffix")).map(col): _*)
  }
}
