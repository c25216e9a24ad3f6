package graft.functions

import graft.core.Chunker
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `chunk_text(text, size, overlap)` as a native Catalyst Generator —
  * the SQL/LATERAL VIEW surface for the reference's splitter
  * (`/root/reference/streamlit_app.py:34-35`; semantics in
  * [[graft.core.Chunker]], SURVEY.md §2.B op C1).
  *
  * A Generator (not a UDF returning array + explode) emits rows
  * directly: no intermediate array allocation per document, and the
  * planner places it in a dedicated Generate node that pipelines with
  * the surrounding projection — the shape Spark's own explode/inline
  * use. size/overlap must be foldable (literals).
  */
case class ChunkText(child: Expression, size: Expression, overlap: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, size, overlap)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "chunk_text: first argument must be STRING")
    else if (!size.foldable || !overlap.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "chunk_text: size/overlap must be literals")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType =
    StructType(StructField("chunk", StringType, nullable = false) :: Nil)

  @transient private lazy val chunkSize: Int =
    size.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val chunkOverlap: Int =
    overlap.eval(null).asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else Chunker.split(t.toString, chunkSize, chunkOverlap).iterator
      .map(s => InternalRow(UTF8String.fromString(s)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), size = newChildren(1), overlap = newChildren(2))
}

/** Column + SQL registration surface for text functions. */
object text {
  def chunkText(text: Column, size: Int = Chunker.DefaultChunkSize,
      overlap: Int = Chunker.DefaultChunkOverlap): Column =
    ColumnShim.column(ChunkText(ColumnShim.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(size),
      org.apache.spark.sql.catalyst.expressions.Literal(overlap)))

  /** Register `chunk_text` for SQL / LATERAL VIEW use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_text", es => ChunkText(es(0), es(1), es(2)), "scala_udf")
}
