package graft.plans

import graft.functions.CosineSimilarity
import graft.operators.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Optimizer rule (SURVEY.md §4 item 2): rewrite
  *
  *   ORDER BY cosine_similarity(vecCol, <literal query>) DESC LIMIT k
  *
  * over a relation that carries an LSH `_buckets` column (built by
  * [[Ann.buildIndex]]) into the same top-k over a bucket-pruned scan:
  * a `Filter(arrays_overlap(_buckets, <query buckets>))` is injected
  * below the sort, so the exact rescore touches only candidate rows.
  * The query vector is a literal, so its band signatures are computed
  * at PLAN time.
  *
  * The rewrite trades exactness for speed (it is the declarative form
  * of [[Ann.queryIndex]]), so it is OFF unless the session opts in:
  *
  *   spark.conf.set("spark.graft.ann.autoPrune", "true")
  *
  * Install with [[GraftExtensions.install]] (existing session) or
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * at session build.
  */
object AnnTopKPruneRule extends Rule[LogicalPlan] {

  private val FLAG = "spark.graft.ann.autoPrune"

  private def enabled: Boolean =
    SparkSession.getActiveSession.exists(_.conf.get(FLAG, "false") == "true")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case limit @ LocalLimit(_, sort @ Sort(
          Seq(SortOrder(cos @ CosineSimilarity(_, _), Descending, _, _), _*),
          true, child, _)) =>
        rewrite(cos, child).map(f => limit.copy(child = sort.copy(child = f)))
          .getOrElse(limit)
      case limit @ LocalLimit(_, proj @ Project(_, sort @ Sort(
          Seq(SortOrder(cos @ CosineSimilarity(_, _), Descending, _, _), _*),
          true, child, _))) =>
        rewrite(cos, child).map(f =>
            limit.copy(child = proj.copy(child = sort.copy(child = f))))
          .getOrElse(limit)
    }
  }

  /** If the sort key is cosine(col, literal) and `child` outputs an LSH
    * `_buckets` column CARRYING its build params in column metadata
    * (written by [[Ann.buildIndex]]), return the bucket-pruning Filter
    * over child. A `_buckets` column without the metadata is NOT treated
    * as an index: hashing the query vector with guessed params would
    * filter on mismatched buckets and silently destroy recall. */
  private def rewrite(cos: CosineSimilarity, child: LogicalPlan): Option[Filter] = {
    // already pruned? (idempotence under fixed-point rule execution)
    val alreadyPruned = child.collectFirst {
      case Filter(cond, _) if cond.isInstanceOf[ArraysOverlap] => true
    }.isDefined
    if (alreadyPruned) return None
    val bucketsAttr = child.output.find(a =>
      a.name == "_buckets" &&
        a.metadata.contains(Ann.ParamPlanes) &&
        a.metadata.contains(Ann.ParamBands) &&
        a.metadata.contains(Ann.ParamSeed) &&
        a.dataType.isInstanceOf[ArrayType])
    val qvec: Option[Array[Double]] = (cos.left, cos.right) match {
      case (_, l: Literal) if l.foldable => literalVec(l)
      case (l: Literal, _) if l.foldable => literalVec(l)
      case _ => None
    }
    for (b <- bucketsAttr; q <- qvec) yield {
      val qBuckets = Ann.bucketSet(q,
        planesPerBand = b.metadata.getLong(Ann.ParamPlanes).toInt,
        bands = b.metadata.getLong(Ann.ParamBands).toInt,
        seed = b.metadata.getLong(Ann.ParamSeed))
      Filter(
        ArraysOverlap(b,
          Literal.create(qBuckets, ArrayType(IntegerType, containsNull = false))),
        child)
    }
  }

  private def literalVec(l: Literal): Option[Array[Double]] = l.value match {
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      l.dataType match {
        case ArrayType(org.apache.spark.sql.types.DoubleType, _) => Some(a.toDoubleArray())
        case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
          Some(a.toFloatArray().map(_.toDouble))
        case _ => None
      }
    case _ => None
  }
}

/** Session extension wiring: vector functions + the ANN prune rule.
  * Usable both at builder time (`spark.sql.extensions`) and on a live
  * session via [[GraftExtensions.install]]. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => AnnTopKPruneRule)
}

object GraftExtensions {
  /** Attach to an already-running session: SQL-register the vector
    * functions and add the prune rule to experimental optimizations. */
  def install(spark: SparkSession): Unit = {
    graft.functions.vectors.register(spark)
    if (!spark.experimental.extraOptimizations.contains(AnnTopKPruneRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnTopKPruneRule
  }
}
