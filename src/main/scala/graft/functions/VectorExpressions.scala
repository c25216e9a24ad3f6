package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{ColumnShim => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The reference's index scores with cosine similarity
  * (`/root/reference/streamlit_app.py:49`, `metric='cosine'`) over
  * non-pre-normalized float32 vectors (SURVEY.md §2.C note), so cosine
  * here is true `dot/(|a|*|b|)`. Implemented as codegen'd expressions —
  * not UDFs — so top-k scoring stays inside whole-stage codegen and the
  * per-row cost is a tight primitive loop with no boxing.
  *
  * All three accept `ARRAY<FLOAT>` or `ARRAY<DOUBLE>` and compute in
  * double. Null if either input is null; mismatched lengths raise.
  */
private[graft] object VecCodegen {
  def elemGetter(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  def checkArrayArg(e: Expression, side: String): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$side argument must be ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
  }

  @inline def get(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
}

/** `dot(a, b)` — inner product in double precision. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    VecCodegen.checkArrayArg(left, "left") match {
      case TypeCheckResult.TypeCheckSuccess => VecCodegen.checkArrayArg(right, "right")
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(), s"$prettyName: length mismatch $n vs ${y.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += VecCodegen.get(leftElem, x, i) * VecCodegen.get(rightElem, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException("vec_dot: length mismatch");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${VecCodegen.elemGetter(leftElem, x, i)} * ${VecCodegen.elemGetter(rightElem, y, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `l2_norm(a)` — Euclidean norm in double precision. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_l2_norm"

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    VecCodegen.checkArrayArg(child, "input")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = VecCodegen.get(elem, x, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${VecCodegen.elemGetter(elem, x, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `cosine(a, b) = dot/(|a|*|b|)`; 0.0 when either norm is zero.
  * Single fused loop: one pass computes dot and both norms. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    VecCodegen.checkArrayArg(left, "left") match {
      case TypeCheckResult.TypeCheckSuccess => VecCodegen.checkArrayArg(right, "right")
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(),
      s"$prettyName: length mismatch $n vs ${y.numElements()}")
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = VecCodegen.get(leftElem, x, i)
      val yv = VecCodegen.get(rightElem, y, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException("cosine_similarity: length mismatch");
         |}
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${VecCodegen.elemGetter(leftElem, x, i)};
         |  double $yv = ${VecCodegen.elemGetter(rightElem, y, i)};
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `l2_normalize(a)` — the vector scaled to unit L2 norm, as
  * ARRAY<DOUBLE>; a zero vector passes through (cast) unchanged. One
  * fused per-row pass. This expression exists because the
  * higher-order-function formulation — `transform(v, x => x / l2Norm(v))`
  * — re-evaluates the norm expression once PER ELEMENT (HOF lambdas run
  * interpreted, outside whole-stage codegen and its subexpression
  * elimination), turning normalization O(dim²) per row. Element math is
  * `element / sqrt(Σx²)` exactly like the HOF form, so results are
  * bit-identical to the plan it replaces. An input array containing a
  * null ELEMENT yields a null result row (a null element has no
  * defined norm contribution; silently reading the slot as 0.0 would
  * change results) — only reachable when the input's element type is
  * nullable, so the fast path is untouched for containsNull=false
  * inputs. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_l2_normalize"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val elementsNullable =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = child.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult =
    VecCodegen.checkArrayArg(child, "input")

  override def nullSafeEval(a: Any): Any =
    L2NormalizeUtil.normalize(a.asInstanceOf[ArrayData], isFloat, elementsNullable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val call =
        s"${ev.value} = graft.functions.L2NormalizeUtil.normalize($x, $isFloat, $elementsNullable);"
      if (elementsNullable) s"$call\nif (${ev.value} == null) { ${ev.isNull} = true; }"
      else call
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared eval for [[L2Normalize]] (interpreted + generated code — the
  * standalone object gets Java static forwarders). */
object L2NormalizeUtil {
  /** Null when `checkNulls` and any element is null (→ null result row). */
  def normalize(arr: ArrayData, isFloat: Boolean, checkNulls: Boolean): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && arr.isNullAt(i)) return null
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      s += v(i) * v(i)
      i += 1
    }
    if (s != 0.0) {
      val norm = math.sqrt(s)
      i = 0
      while (i < n) { v(i) = v(i) / norm; i += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(v)
  }
}

/** `lsh_buckets(v)` — banded hyperplane-LSH bucket ids for a vector
  * (band id packed into the high bits; see [[graft.operators.Ann]]).
  * Codegen'd so index builds and plan-injected bucket filters stay
  * inside whole-stage codegen; identical bits to Ann.bucketSet. */
case class LshBuckets(child: Expression, planesPerBand: Int, bands: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    VecCodegen.checkArrayArg(child, "input")

  override def nullSafeEval(a: Any): Any =
    LshBucketsUtil.buckets(a.asInstanceOf[ArrayData], isFloat, planesPerBand, bands, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.LshBucketsUtil.buckets(" +
        s"$x, $isFloat, $planesPerBand, $bands, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared eval for [[LshBuckets]] (interpreted + generated code — the
  * standalone object gets Java static forwarders, so codegen can call
  * `graft.functions.LshBucketsUtil.buckets(...)` directly). */
object LshBucketsUtil {
  def buckets(arr: ArrayData, isFloat: Boolean,
      planesPerBand: Int, bands: Int, seed: Long): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.operators.Ann.bucketSet(v, planesPerBand, bands, seed))
  }
}

/** Column-API + SQL surface for the vector expressions. */
object vectors {
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2Norm(a: Column): Column =
    ExpressionUtils.column(L2Norm(ExpressionUtils.expression(a)))

  def l2Normalize(a: Column): Column =
    ExpressionUtils.column(L2Normalize(ExpressionUtils.expression(a)))

  def lshBuckets(a: Column, planesPerBand: Int, bands: Int, seed: Long): Column =
    ExpressionUtils.column(
      LshBuckets(ExpressionUtils.expression(a), planesPerBand, bands, seed))

  /** Register `cosine_similarity`, `vec_dot`, `vec_l2_norm` for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_similarity", es => CosineSimilarity(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_dot", es => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_l2_norm", es => L2Norm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_l2_normalize", es => L2Normalize(es.head), "scala_udf")
  }
}
