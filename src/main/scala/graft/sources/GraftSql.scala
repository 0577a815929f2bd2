package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft._
import graft.meta.Snapshot

/**
 * SQL front door: a snapshot-pinned `FileIndex` over the engine's
 * manifests, exposed through Spark's native parquet relation — the same
 * integration shape Delta's TahoeFileIndex uses, and the reason the
 * reference's lakehouse is queryable by ad-hoc SQL
 * (/root/reference/README.md:506-538 Trino over the Delta catalog,
 * /root/reference/trino/catalog/delta.properties:1-12).
 *
 * Why FileIndex rather than a DataSource V2 Table: plugging into
 * `HadoopFsRelation` keeps the WHOLE native read path — vectorized parquet
 * decode, whole-stage codegen, parquet row-group pruning via pushed
 * filters — while `listFiles` adds the engine's manifest-stats file
 * skipping in front of it. A V2 PartitionReader would have to reimplement
 * the vectorized reader (or run strictly slower); this route gets
 * `spark.sql("... WHERE source = 'web'")` to (a) skip files by manifest
 * min/max, then (b) skip row groups by parquet footer stats, then
 * (c) decode only the projected columns.
 *
 * `sizeInBytes` reports the snapshot's true byte count so the planner's
 * broadcast decisions see honest statistics (SupportsReportStatistics
 * equivalent).
 */
final class GraftFileIndex(val table: TokenTable, snap: Snapshot,
    spark: SparkSession) extends FileIndex {

  // Manifest-granular planning state: totals come from the manifest-list
  // rollups alone, and a manifest is OPENED only when a filter cannot rule
  // it out (at 10^6 manifests eager listing would be a driver storm —
  // Iceberg's manifest-list partition summaries play the same role).
  // Opened manifests are memoized: Spark may call listFiles several times
  // while planning one query.
  private val liveRefs = snap.manifestList
  private val totalBytes = liveRefs.iterator.map(_.bytes).sum
  private val totalFiles = liveRefs.iterator.map(_.fileCount).sum
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[graft.meta.DataFile]]()
  private def entriesOf(m: graft.meta.ManifestRef): Seq[graft.meta.DataFile] =
    manifestCache.computeIfAbsent(m.path, _ => table.log.readManifest(m).entries)

  /** Metrics of the most recent planning call — pruning evidence. */
  @volatile var lastScan: Option[ScanMetrics] = None

  override def rootPaths: Seq[HPath] = Seq(new HPath(table.root))

  /** `source` stays a DATA column (with manifest stats) rather than a
    * hive partition column: pruning on it goes through the same
    * stats path as n_tok/doc_id, and scans need no partition discovery. */
  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = totalBytes

  override def inputFiles: Array[String] =
    liveRefs.flatMap(entriesOf)
      .map(f => table.log.absolute(f.path).toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pred = dataFilters.map(toPredicate)
      .reduceOption(Predicate.And(_, _)).getOrElse(Predicate.True)
    val openedRefs = liveRefs.filter(_.stats.forall(pred.mightMatch))
    val kept = openedRefs.flatMap(entriesOf)
      .filter(f => pred.mightMatch(f.stats))
    lastScan = Some(ScanMetrics(totalFiles, kept.size,
      totalBytes, kept.iterator.map(_.bytes).sum,
      manifestsTotal = liveRefs.size, manifestsKept = openedRefs.size))
    val statuses = kept.map { f =>
      new FileStatus(f.bytes, false, 1, 128L * 1024 * 1024, 0L,
        new HPath(table.log.absolute(f.path).toUri))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

  /** Catalyst filter → engine Predicate; anything unrecognized maps to
    * Predicate.True (conservative: file kept, rows re-filtered). */
  private def toPredicate(e: Expression): Predicate = e match {
    case expressions.And(l, r) => Predicate.And(toPredicate(l), toPredicate(r))
    case expressions.Or(l, r) => Predicate.Or(toPredicate(l), toPredicate(r))
    case expressions.EqualTo(a: AttributeReference, Literal(v, _)) =>
      Predicate.Eq(a.name, scalaValue(v))
    case expressions.EqualTo(Literal(v, _), a: AttributeReference) =>
      Predicate.Eq(a.name, scalaValue(v))
    case expressions.GreaterThan(a: AttributeReference, Literal(v, _)) =>
      Predicate.Gt(a.name, scalaValue(v))
    case expressions.GreaterThan(Literal(v, _), a: AttributeReference) =>
      Predicate.Lt(a.name, scalaValue(v))
    case expressions.GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      Predicate.Ge(a.name, scalaValue(v))
    case expressions.GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      Predicate.Le(a.name, scalaValue(v))
    case expressions.LessThan(a: AttributeReference, Literal(v, _)) =>
      Predicate.Lt(a.name, scalaValue(v))
    case expressions.LessThan(Literal(v, _), a: AttributeReference) =>
      Predicate.Gt(a.name, scalaValue(v))
    case expressions.LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      Predicate.Le(a.name, scalaValue(v))
    case expressions.LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      Predicate.Ge(a.name, scalaValue(v))
    case expressions.In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      Predicate.In(a.name, vs.map { case Literal(v, _) => scalaValue(v) })
    case expressions.IsNotNull(a: AttributeReference) =>
      Predicate.IsNotNull(a.name)
    case _ => Predicate.True
  }

  private def scalaValue(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case other => other
  }
}

/**
 * Read-capable, write-BLOCKING parquet format for graft relations. Spark's
 * V1 file-source insert path (InsertIntoHadoopFsRelationCommand) would
 * otherwise "succeed" an `INSERT INTO <graft view>` by writing parquet
 * files straight into rootPaths — unregistered in any manifest, invisible
 * to every scan, sitting as garbage next to meta/ (observed on a probe
 * table). With the graft extensions installed (GraftExtensions) inserts
 * are intercepted during ANALYSIS and never reach this; without them the
 * user gets a loud error instead of silent row loss.
 */
final class GraftParquetFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "direct file writes into a graft table bypass the snapshot log and " +
      "would be invisible to scans. Enable the engine's SQL write path " +
      "(.config(\"spark.sql.extensions\", \"graft.sources.GraftExtensions\")) " +
      "or commit through TokenTable.append / the graft.Maintain CLI")
}

object GraftSql {

  /** Snapshot-pinned DataFrame over the table through the native parquet
    * relation; the returned index exposes pruning metrics. */
  def toDF(spark: SparkSession, table: TokenTable,
      version: Option[Long] = None): (DataFrame, GraftFileIndex) = {
    val snap = version.map(table.log.snapshot).orElse(table.log.current())
      .getOrElse(sys.error(s"no table at ${table.root}"))
    val index = new GraftFileIndex(table, snap, spark)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      // snapshot schema: a version pinned BEFORE an addColumn evolution
      // serves the old shape; the current view unifies evolved columns
      // (null-filled for pre-evolution files) — SQL sees time-travelled
      // schemas, not just time-travelled rows
      dataSchema = table.schemaOf(snap),
      bucketSpec = None,
      fileFormat = new GraftParquetFormat,
      options = Map.empty[String, String])(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    (Bridge.ofRows(spark, LogicalRelation(relation)), index)
  }

  /** Register the table as a temp view so `spark.sql` reaches manifest
    * pruning; returns the index for pruning-metrics inspection.
    * `version` pins the view to a historical snapshot — SQL time travel
    * (the engine-side equivalent of `VERSION AS OF`): the view keeps
    * serving that snapshot's files even as the table advances. */
  def register(spark: SparkSession, table: TokenTable,
      viewName: String, version: Option[Long] = None): GraftFileIndex = {
    val (df, index) = toDF(spark, table, version)
    df.createOrReplaceTempView(viewName)
    index
  }
}
