package graft.meta

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation

import graft.ColStats

/**
 * Footer-based per-file column statistics.
 *
 * Reads only Parquet footers (O(KB) per file) — never row data — so manifest
 * construction stays metadata-sized even when a commit adds thousands of
 * files. This replaces the reference's approach of deriving run metrics from
 * full re-scan `count()`s (e.g. /root/reference/spark/jobs/silver/laps.py:93,
 * noted as an anti-pattern in SURVEY.md §3.2).
 *
 * At real cluster scale footer collection would ride back from the write
 * tasks themselves; on local[k] a driver-side thread pool over footers is
 * equivalent and keeps the write path stock.
 */
object ParquetStats {

  /** (rows, bytes, per-column stats) for one parquet file.
    * Only top-level atomic columns get min/max (nested paths like
    * tokens.list.element are skipped — not used for pruning). */
  def fileStats(path: String, conf: Configuration): (Long, Long, Map[String, ColStats]) = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(conf)
    val bytes = fs.getFileStatus(hp).getLen
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(hp, conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala
      val rows = blocks.iterator.map(_.getRowCount).sum

      // accumulate per column across row groups
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, ColStats]
      for (block <- blocks; col <- block.getColumns.asScala) {
        val name = col.getPath.toDotString
        if (!name.contains('.')) { // top-level atomics only
          val prim = col.getPrimitiveType
          val tpe = typeTag(prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation)
          if (tpe != null) {
            val st = col.getStatistics
            val nulls = if (st != null && st.isNumNullsSet) st.getNumNulls else 0L
            // no typed tuple pattern here: an ALL-NULL column (e.g. a
            // freshly added evolved column) has (null, null) min/max and
            // `(mn: String, ...)` is a runtime type TEST that null fails
            val hasVals = st != null && st.hasNonNullValue
            val mn = if (hasVals) render(st.genericGetMin.asInstanceOf[AnyRef], tpe) else null
            val mx = if (hasVals) render(st.genericGetMax.asInstanceOf[AnyRef], tpe) else null
            val vc = block.getRowCount
            acc.get(name) match {
              case None => acc(name) = ColStats(tpe, mn, mx, nulls, vc)
              case Some(prev) =>
                acc(name) = ColStats(tpe,
                  minOf(tpe, prev.min, mn), maxOf(tpe, prev.max, mx),
                  prev.nullCount + nulls, prev.valueCount + vc)
            }
          }
        }
      }
      (rows, bytes, acc.toMap)
    } finally reader.close()
  }

  /** Footer reads for a batch of files, on a bounded driver thread pool. */
  def batch(paths: Seq[String], conf: Configuration, parallelism: Int = 16)
      : Seq[(String, (Long, Long, Map[String, ColStats]))] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, paths.size)))
    try {
      val futs = paths.map { p =>
        pool.submit(new java.util.concurrent.Callable[(String, (Long, Long, Map[String, ColStats]))] {
          def call() = p -> fileStats(p, conf)
        })
      }
      futs.map(_.get())
    } finally pool.shutdown()
  }

  private def typeTag(t: PrimitiveTypeName, logical: LogicalTypeAnnotation): String = t match {
    case PrimitiveTypeName.BINARY
      if logical != null && logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] => "string"
    case PrimitiveTypeName.INT32 => "int"
    case PrimitiveTypeName.INT64 => "long"
    case PrimitiveTypeName.FLOAT => "float"
    case PrimitiveTypeName.DOUBLE => "double"
    case PrimitiveTypeName.BOOLEAN => "boolean"
    case _ => null // untracked (fixed-len, int96, non-string binary)
  }

  private def render(v: AnyRef, tpe: String): String = v match {
    case null => null
    case b: Binary if tpe == "string" => b.toStringUsingUTF8
    case other => other.toString
  }

  private def minOf(tpe: String, a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else if (graft.Predicate.cmp(tpe, a, b) <= 0) a else b

  private def maxOf(tpe: String, a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else if (graft.Predicate.cmp(tpe, a, b) >= 0) a else b
}
