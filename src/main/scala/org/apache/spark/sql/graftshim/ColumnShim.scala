package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x made Column<->Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This shim, living
  * under the `org.apache.spark.sql` package, re-exposes the two
  * conversions our custom Catalyst expressions need to surface as
  * `Column`s. No Spark internals are modified. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Simplified PUBLIC view of a Column's unresolved `ColumnNode` tree
    * (Spark 4 Columns carry `org.apache.spark.sql.internal.ColumnNode`,
    * not catalyst Expressions, until plan resolution — and the node
    * classes are `private[sql]`). Callers that want to reason about a
    * user-supplied predicate (which fields it touches, which conjuncts
    * are literal comparisons) pattern-match this instead. [[SOpaque]]
    * marks any node shape the view does not model — its CHILDREN ARE
    * NOT WALKED, so a consumer that needs completeness (e.g. "does
    * this filter reference only these columns") must treat any
    * [[SOpaque]] as unknown. */
  sealed trait SimpleNode
  final case class SFunc(name: String, args: Seq[SimpleNode]) extends SimpleNode
  final case class SAttr(nameParts: Seq[String]) extends SimpleNode
  final case class SLit(value: Any) extends SimpleNode
  case object SOpaque extends SimpleNode

  def simplify(c: Column): SimpleNode = simplifyNode(c.node)

  private def simplifyNode(n: org.apache.spark.sql.internal.ColumnNode): SimpleNode =
    n match {
      case f: org.apache.spark.sql.internal.UnresolvedFunction =>
        SFunc(f.functionName, f.arguments.map(simplifyNode))
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        SAttr(a.nameParts)
      case l: org.apache.spark.sql.internal.Literal =>
        SLit(l.value)
      case c0: org.apache.spark.sql.internal.Cast =>
        // transparent for reference analysis; consumers that compare
        // literal VALUES must not see through a cast, so surface it as
        // a named function instead of unwrapping
        SFunc("cast", Seq(simplifyNode(c0.child)))
      case _ => SOpaque
    }
}
