package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{ColumnShim => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a NATIVE codegen'd expression — the
  * record-linkage scorer (Winkler's string comparator from the Census
  * Bureau matcher) that pairs with [[graft.operators.Dedup
  * .sortedNeighborhood]]: SNM proposes window pairs, Jaro–Winkler
  * scores them. A codegen expression (like Spark's own `levenshtein`)
  * keeps the scorer inside whole-stage codegen — no UDF boxing on the
  * candidate stream.
  *
  * Semantics match the classic definition AND DuckDB/rapidfuzz
  * conventions bit-for-bit (probed empirically, gate-verified):
  * match window ⌊max(|a|,|b|)/2⌋−1, transpositions halved, prefix
  * boost `j + 0.1·ℓ·(1−j)` with ℓ ≤ 4 applied only when j > 0.7,
  * and EITHER side empty → 0 (the rapidfuzz convention; classic
  * texts give 1 for both-empty). Operates on UTF-16 code units
  * (Java chars), same as DuckDB's byte/char walk on ASCII data. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarityUtil.jaroWinkler(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarityUtil.jaroWinkler(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared eval (interpreted + generated code — static forwarder). */
object StringSimilarityUtil {

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(s1.length, s2.length))
    while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
    j + 0.1 * l * (1.0 - j)
  }

  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - mt).toDouble / m) / 3.0
  }
}

/** Column-API surface. */
object strings {
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
