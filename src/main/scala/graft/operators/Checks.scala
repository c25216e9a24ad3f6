package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints with a single-pass report —
  * the Deequ-shaped surface: completeness, uniqueness, ranges, and
  * arbitrary row predicates declared as a list, verified in ONE
  * aggregation over the table, reported as (check, violations,
  * passed) rows.
  *
  * The naive audit runs one job per constraint — N scans of 100 TB.
  * Here every row-level check compiles to a `count(when(violated))`
  * aggregate and uniqueness to `count - countDistinct`, all in the
  * same `df.agg(...)`: one scan, partial aggregation map-side,
  * whatever the constraint count. (Uniqueness is the one check that
  * costs shuffle width — the same documented Expand trade as
  * [[DataProfile.profile]]; leave Unique checks out of hot paths and
  * the pass is pure map-side counters.) Referential integrity crosses
  * tables, so it is its own check: a left-anti join against the
  * parent's key projection — broadcastable for dimension parents,
  * key-only shuffle otherwise.
  */
object Checks {

  sealed trait Check { def name: String }
  /** Column must have no nulls. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** Column tuple must be unique across rows. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Value must lie in [lo, hi]; nulls count as violations. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Row predicate must hold; nulls/unknowns count as violations. */
  final case class Satisfies(label: String, predicate: Column) extends Check {
    def name = s"satisfies($label)"
  }

  /** Verify every check in ONE aggregation pass; returns
    * (check, violations, passed) ordered as declared. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      val viol: Column = c match {
        case NotNull(col0) => count(when(col(col0).isNull, 1))
        case Unique(cols) =>
          count(lit(1)) - countDistinct(struct(cols.map(col): _*))
        case InRange(c0, lo, hi) =>
          count(when(col(c0).isNull || col(c0) < lo || col(c0) > hi, 1))
        case Satisfies(_, p) => count(when(!coalesce(p, lit(false)), 1))
      }
      viol.as(s"v_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // Typed literals, not selectExpr interpolation: Spark's lexer reads
    // '' as two adjacent string literals (concatenated to nothing, not
    // an escaped quote), so a Satisfies label containing ' or \ would
    // silently mangle the check name — and no escaping is needed when
    // the name never passes through the SQL parser.
    val pairs = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"v_$i").as("violations"))
    }
    row.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.check").as("check"), col("kv.violations").as("violations"),
        (col("kv.violations") === 0L).as("passed"))
  }

  /** Referential integrity: child rows whose key tuple has no match in
    * the parent (null child keys violate too, the FK-with-NOT-NULL
    * convention). Returns the same report shape as [[run]]. */
  def foreignKey(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.size == parentKeys.size,
      "key lists must align")
    val p = parent.select(parentKeys.zip(childKeys)
      .map { case (pk, ck) => col(pk).as(s"__p_$ck") }: _*).distinct()
    val cond = childKeys.map(ck => col(ck) === col(s"__p_$ck"))
      .reduce(_ && _)
    val orphans = child.join(p, cond, "left_anti").count()
    val name = s"foreign_key(${childKeys.mkString(",")})"
    val spark = child.sparkSession
    import spark.implicits._
    Seq((name, orphans, orphans == 0L))
      .toDF("check", "violations", "passed")
  }
}
