package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.VectorIndex

/** Spark-native SQL surface for the snapshot vector index: a real
  * `TableCatalog`, so every index under a warehouse root is a queryable
  * table — including NATIVE time travel syntax over the index's retained
  * snapshots (the r15 rollback window):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/warehouse/indexes")
  *   spark.sql("SELECT id, metadata.source FROM graft.textembedding WHERE ...")
  *   spark.sql("SELECT * FROM graft.textembedding VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.textembedding TIMESTAMP AS OF '...'")
  * }}}
  *
  * Writes: `INSERT INTO` is supported and IS the index upsert —
  * id-keyed last-write-wins through [[VectorIndex.upsert]], so a SQL
  * writer gets the same manifest commit protocol (zombie-writer guard,
  * dim validation, touched-buckets-only rewrite) as an API writer.
  * `DELETE FROM ... WHERE id IN (...)` (r18) is the erasure surface:
  * the literal id set maps onto [[VectorIndex.delete]] — the same
  * CAS-committed touched-buckets-only rewrite, versions linearized.
  * Everything else stays refused: CREATE/ALTER/DROP/RENAME, INSERT
  * OVERWRITE, predicate/unconditional DELETE have no semantics the
  * commit protocol can honor (indexes are created via
  * [[VectorIndex.ensure]]).
  * `VERSION AS OF n` maps to [[VectorIndex.scanAt]] — every
  * retained manifest is a complete immutable file list, so historical
  * reads cost nothing extra; a pruned-out version fails loudly.
  * `TIMESTAMP AS OF` resolves to the newest snapshot whose manifest
  * was committed at or before the timestamp (manifest files are
  * written once and never touched, so their modification time IS the
  * commit time).
  *
  * Scans delegate to the index's own manifest-driven parquet read
  * through a [[V1Scan]]: required-column pruning is pushed into the
  * inner scan (a two-column projection reads two columns of parquet),
  * and translatable filters are applied inside it too — reported as
  * NOT pushed, so Spark re-applies every filter above the scan and
  * correctness never depends on the translation (the inner parquet
  * reader still gets its row-group skipping).
  */
final class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.root = <indexes root dir>")
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def pathOf(ident: Identifier): String = {
    require(ident.namespace().isEmpty,
      s"graft catalog has a single flat namespace, got ${ident.namespace().mkString(".")}")
    s"$root/${ident.name()}"
  }

  private def openOrThrow(ident: Identifier): VectorIndex =
    try VectorIndex.open(spark, pathOf(ident))
    catch {
      case _: Exception =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty, s"unknown namespace ${namespace.mkString(".")}")
    VectorIndex.list(spark, root).map(Identifier.of(Array.empty, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && VectorIndex.list(spark, root).contains(ident.name())

  override def loadTable(ident: Identifier): Table =
    new GraftIndexTable(openOrThrow(ident), ident.name(), None)

  /** `VERSION AS OF <snapshot>` — native SQL time travel over retained
    * manifests. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft snapshot versions are integers, got '$version'")
      }
    new GraftIndexTable(openOrThrow(ident), ident.name(), Some(v))
  }

  /** `TIMESTAMP AS OF` — micros since epoch; resolved against manifest
    * commit (file modification) times. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val idx = openOrThrow(ident)
    val v = idx.snapshotAsOfTimestamp(timestamp).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of ${ident.name()} committed at or before timestamp $timestamp"))
    new GraftIndexTable(idx, ident.name(), Some(v))
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog supports no DDL ($op): create indexes via " +
        "VectorIndex.ensure; INSERT INTO upserts, DELETE FROM ... WHERE " +
        "id IN (...) erases")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}

/** One snapshot-pinned (or head) read view of a [[VectorIndex]], plus
  * the one SQL write shape the index's commit protocol can honor:
  * `INSERT INTO` runs as an id-keyed UPSERT through [[VectorIndex.upsert]]
  * (last-write-wins, touched-buckets-only rewrite, dim validation, the
  * same snapshot commit every API writer gets). The `version` column is
  * stamped by the commit — a value supplied in the INSERT is ignored.
  * `INSERT OVERWRITE` refuses: truncate-then-load contradicts id-keyed
  * upsert semantics and the retention contract. */
private[catalog] final class GraftIndexTable(
    idx: VectorIndex,
    tableName: String,
    asOf: Option[Long]) extends Table with SupportsRead with SupportsWrite
    with SupportsDelete {

  // scanAt validates retention and fails loudly on a pruned version
  private def df: DataFrame = asOf.map(idx.scanAt).getOrElse(idx.scan())

  override def name(): String =
    asOf.map(v => s"$tableName@v$v").getOrElse(tableName)
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)
  override def properties(): util.Map[String, String] =
    Map("location" -> idx.path, "provider" -> "graft-vector-index").asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftIndexScanBuilder(idx, asOf, df)

  /** `DELETE FROM <idx> WHERE id IN (...)` / `id = '...'` (r18) —
    * erasure, the other mutation with an honest mapping onto the
    * snapshot commit protocol. The id set is extracted STATICALLY from
    * the pushed conjuncts (zero scan I/O) and handed to
    * [[VectorIndex.delete]], so a SQL deleter gets the identical
    * CAS-committed, touched-buckets-only manifest rewrite as an API
    * caller — versions linearize against concurrent writers the same
    * way. Anything that is not a pure id-set predicate refuses loudly
    * (`canDeleteWhere` = false): a general predicate delete would need
    * a scan-then-delete whose row set can drift between the scan and
    * the commit, a promise the protocol doesn't make. Unconditional
    * DELETE (truncate) refuses for the same reason OVERWRITE does. */
  private def idSetOf(fs: Array[Filter]): Option[Seq[String]] = {
    def one(f: Filter): Option[Set[String]] = f match {
      case sources.EqualTo("id", v: String) => Some(Set(v))
      case sources.In("id", vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        Some(vs.iterator.map(_.asInstanceOf[String]).toSet)
      case _ => None
    }
    // Spark plans `IsNotNull(id)` alongside the equality — it never
    // narrows a literal id set, so it drops; remaining conjuncts must
    // ALL be id-set shapes, and the conjunction is their intersection
    val conjuncts = fs.filterNot(_ == sources.IsNotNull("id"))
    if (conjuncts.isEmpty) None
    else {
      val sets = conjuncts.map(one)
      if (sets.exists(_.isEmpty)) None
      else Some(sets.flatten.reduce(_ intersect _).toSeq.sorted)
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && idSetOf(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    if (asOf.nonEmpty) throw new UnsupportedOperationException(
      s"cannot DELETE from time-travel view ${name()}: deletes go to the head")
    val ids = idSetOf(filters).getOrElse(throw new UnsupportedOperationException(
      "graft DELETE supports only a literal id set (id = '...' or id IN " +
        s"(...)): got ${filters.mkString(", ")}; run predicate deletes by " +
        "resolving ids first (SELECT id ... ), then DELETE ... WHERE id IN"))
    idx.delete(ids)
  }

  override def truncateTable(): Boolean = throw new UnsupportedOperationException(
    "unconditional DELETE (truncate) is not supported: the index is " +
      "id-keyed; enumerate ids (DELETE ... WHERE id IN (...))")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (asOf.nonEmpty) throw new UnsupportedOperationException(
      s"cannot INSERT into time-travel view $name: writes go to the head")
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation(): InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite) throw new UnsupportedOperationException(
                "INSERT OVERWRITE is not supported: the index is id-keyed " +
                  "(INSERT INTO upserts); delete ids via the VectorIndex API")
              idx.upsert(data.select(col("id"), col("values"), col("metadata")))
            }
          }
      }
    }
  }
}

/** Column pruning pushed into the inner manifest-parquet scan; filters
  * applied inside it for row-group skipping but reported unpushed, so
  * the engine's own post-filter is always the correctness authority.
  *
  * FILE pruning (r17): the pushed filters are additionally read as
  * [[VectorIndex.extractStatPreds]] stat predicates and handed to
  * [[VectorIndex.scanStatsPruned]], so a SQL
  * `WHERE metadata.priority = 1` over a sparse-tag index opens only
  * the files whose manifest stats cannot refute the predicate — the
  * same refutation-only pruning `queryApprox` does, now on the SQL
  * read path. Manifest stats never decide a row's fate: they only
  * drop files PROVABLY empty of matches, and the full filter is still
  * re-applied above the scan. */
private[catalog] final class GraftIndexScanBuilder(
    idx: VectorIndex, asOf: Option[Long], df: DataFrame)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = df.schema
  private var filters: Array[Filter] = Array.empty

  /** TOP-LEVEL pruning only: Spark may hand a NESTED-pruned schema
    * (e.g. metadata carrying only the one filtered subfield), but the
    * inner scan produces full structs — declaring the pruned struct
    * while returning the full one makes every post-scan ordinal-based
    * nested access read the WRONG subfield (the re-applied filter then
    * silently drops every row). Widening each requested top-level
    * field back to the source's full type keeps readSchema() honest
    * about the rows actually produced; Spark projects above it. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(requiredSchema.fieldNames.toIndexedSeq
      .map(n => df.schema(df.schema.fieldIndex(n))))

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all returned as post-scan filters: translation is advisory only
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    val requiredCols = required
    val pushed = filters
    val statPreds = pushed.toIndexedSeq
      .flatMap(GraftIndexScanBuilder.translate)
      .flatMap(VectorIndex.extractStatPreds)
    val source =
      if (statPreds.isEmpty) df
      else idx.scanStatsPruned(statPreds, asOf, emptySchema = Some(df.schema))
    new V1Scan {
      override def readSchema(): StructType = requiredCols
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = requiredCols
          override def buildScan(): RDD[Row] = {
            val prunedDf =
              if (requiredCols.isEmpty) source.select()
              else source.select(requiredCols.fieldNames.toIndexedSeq.map(col): _*)
            val filtered = pushed
              .flatMap(GraftIndexScanBuilder.translate)
              .foldLeft(prunedDf)(_ where _)
            filtered.rdd
          }
        }.asInstanceOf[T]
      }
    }
  }
}

private[catalog] object GraftIndexScanBuilder {
  /** Conservative V1 Filter -> Column translation: only shapes whose
    * SQL semantics (incl. null-drop behavior) mirror the engine's own
    * post-filter translate; anything else simply isn't pushed. */
  private[catalog] def translate(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === v)
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> v)
    case sources.GreaterThan(a, v) => Some(col(a) > v)
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case sources.LessThan(a, v) => Some(col(a) < v)
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= v)
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      (translate(l), translate(r)) match {
        case (Some(lc), Some(rc)) => Some(lc && rc)
        case (one, other) => one.orElse(other) // AND halves push independently
      }
    case sources.Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case _ => None
  }
}
