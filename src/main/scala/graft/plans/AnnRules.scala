package graft.plans

import graft.functions.{CosineSimilarity, LshBuckets}
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
  * at PLAN time. The same walk prunes IVF indexes: a `_cell` column
  * tagged with its centroids ([[Ann.buildIvf]]) gets
  * `Filter(_cell IN <nProbe nearest cells>)` — nProbe read from
  * `spark.graft.ann.ivf.nProbe` (default 4).
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
      case limit @ LocalLimit(_, inner) =>
        rewriteBelowLimit(inner).map(nc => limit.copy(child = nc)).getOrElse(limit)
    }
  }

  /** Strip the chain of Projects the optimizer's column pruning inserts
    * between the limit and the sort (on `select(id)`-shaped top-k
    * queries `_buckets` is pruned out of every intermediate node, so
    * matching only `LocalLimit(Sort)` / `LocalLimit(Project(Sort))` and
    * looking at `sort.child.output` makes the rule a silent no-op on
    * exactly the realistic query shapes). */
  private def rewriteBelowLimit(inner: LogicalPlan): Option[LogicalPlan] = inner match {
    case p: Project => rewriteBelowLimit(p.child).map(nc => p.copy(child = nc))
    case sort @ Sort(
        Seq(SortOrder(cos @ CosineSimilarity(_, _), Descending, _, _), _*),
        true, child, _) =>
      injectPrune(cos, child).map(nc => sort.copy(child = nc))
    case _ => None
  }

  /** If the sort key is cosine(col, literal), prune with the index
    * whose build params ride in column metadata (written by
    * [[Ann.buildIndex]]):
    *
    *   - MATERIALIZED index (persisted/checkpointed `_buckets`, or an
    *     unprojected query): some node under the sort still outputs the
    *     tagged `_buckets` column — wrap THAT node with the
    *     arrays_overlap Filter. Cheap: stored values, no recompute.
    *   - UNMATERIALIZED index under a projection: column pruning has
    *     eliminated the `_buckets` projection entirely, but buildIndex
    *     also tags the VECTOR column, and the sort key references it —
    *     so recompute bucket membership from the vector with the
    *     codegen'd [[LshBuckets]] expression. Exactly the work
    *     [[Ann.queryIndex]] does on an unmaterialized index.
    *
    * A `_buckets`/vector column without the metadata is NOT treated as
    * an index: hashing the query vector with guessed params would
    * filter on mismatched buckets and silently destroy recall. */
  private def injectPrune(cos: CosineSimilarity, subtree: LogicalPlan): Option[LogicalPlan] = {
    val qvec: Option[Array[Double]] = (cos.left, cos.right) match {
      case (_, l: Literal) if l.foldable => literalVec(l)
      case (l: Literal, _) if l.foldable => literalVec(l)
      case _ => None
    }
    if (qvec.isEmpty) return None
    // already pruned? (idempotence under fixed-point rule execution —
    // when installed via spark.sql.extensions this rule shares the
    // operator-optimization batch with OptimizeIn, which rewrites an In
    // of >inSetConversionThreshold literals to InSet, so BOTH forms must
    // be recognized or the rule re-injects its filter every iteration)
    val alreadyPruned = subtree.collectFirst {
      case Filter(cond, _) if cond.exists {
        case _: ArraysOverlap => true
        case In(a: Attribute, _) => a.name == "_cell"
        case InSet(a: Attribute, _) => a.name == "_cell"
        case _ => false
      } => true
    }.isDefined
    if (alreadyPruned) return None
    var injected = false
    val result = subtree.transformDown {
      // topmost node still outputting a tagged index column; the guard
      // also stops recursion into the injected Filter's child (which
      // outputs the same attribute). LSH buckets and IVF cells share
      // the walk — whichever tagged column the plan carries wins.
      case node if !injected && indexedBuckets(node).isDefined =>
        injected = true
        val b = indexedBuckets(node).get
        Filter(ArraysOverlap(b, queryBuckets(qvec.get, b.metadata)), node)
      case node if !injected && ivfCell(node).isDefined =>
        injected = true
        val c = ivfCell(node).get
        val flat = c.metadata.getDoubleArray(Ann.IvfCentroids)
        val dim = c.metadata.getLong(Ann.IvfDim).toInt
        val centroids = if (dim == 0) Array.empty[Array[Double]] else flat.grouped(dim).toArray
        val cells = Ann.nearestCells(centroids, qvec.get, nProbe)
        Filter(In(c, cells.map(Literal(_)).toIndexedSeq), node)
    }
    if (injected) return Some(result)
    // fallback: tagged vector column in the sort key (an unmaterialized
    // LSH index whose _buckets projection column pruning eliminated —
    // recompute membership from the vector). No IVF analogue: cell
    // assignment needs the centroids scan-side at k*dim work per row,
    // and a real IVF index always materializes its cells.
    Seq(cos.left, cos.right).collectFirst {
      case a: AttributeReference if hasParams(a.metadata) =>
        val p = a.metadata.getLong(Ann.ParamPlanes).toInt
        val bands = a.metadata.getLong(Ann.ParamBands).toInt
        val seed = a.metadata.getLong(Ann.ParamSeed)
        Filter(
          ArraysOverlap(LshBuckets(a, p, bands, seed), queryBuckets(qvec.get, a.metadata)),
          subtree)
    }
  }

  /** Query-time probe width for the IVF cell-prune path (the LSH path
    * needs no knob — band width is fixed at build). */
  private def nProbe: Int =
    SparkSession.getActiveSession
      .map(_.conf.get("spark.graft.ann.ivf.nProbe", "4").toInt).getOrElse(4)

  private def ivfCell(node: LogicalPlan): Option[Attribute] =
    node.output.find(a =>
      a.name == "_cell" &&
        a.metadata.contains(Ann.IvfCentroids) &&
        a.metadata.contains(Ann.IvfDim))

  private def hasParams(md: org.apache.spark.sql.types.Metadata): Boolean =
    md.contains(Ann.ParamPlanes) && md.contains(Ann.ParamBands) && md.contains(Ann.ParamSeed)

  private def queryBuckets(q: Array[Double],
      md: org.apache.spark.sql.types.Metadata): Literal = {
    val qBuckets = Ann.bucketSet(q,
      planesPerBand = md.getLong(Ann.ParamPlanes).toInt,
      bands = md.getLong(Ann.ParamBands).toInt,
      seed = md.getLong(Ann.ParamSeed))
    Literal.create(qBuckets, ArrayType(IntegerType, containsNull = false))
  }

  private def indexedBuckets(node: LogicalPlan): Option[Attribute] =
    node.output.find(a =>
      a.name == "_buckets" &&
        hasParams(a.metadata) &&
        a.dataType.isInstanceOf[ArrayType])

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
  * session via [[GraftExtensions.install]].
  *
  * Builder caveat: Spark reads `spark.sql.extensions` from the
  * SPARKCONTEXT's conf at session construction — a builder that reuses
  * an already-running SparkContext silently drops the setting (static
  * conf). On a shared/pre-existing context, use [[install]]. */
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
