package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Core data model of the engine.
 *
 * The subject table is an Iceberg-style lakehouse table of pre-tokenized
 * training sequences (BASELINE.json `input_hint`):
 *   doc_id:string, tokens:array<int32>, n_tok:int32, source:string
 *
 * This mirrors the reference's typed-silver shape — explicit StructType with
 * an int-array column (cf. /root/reference/spark/jobs/schemas/laps.py:20-22
 * `segments_sector_N: array<int>`), surrogate string identity derived from
 * xxhash64 (cf. /root/reference/spark/jobs/silver/laps.py:38-46).
 */
final case class TokenRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String)

object TokenRow {
  /** Declared schema — no inference, matching the reference's discipline
    * (every silver job parses with an explicit StructType,
    * /root/reference/spark/jobs/silver/sessions.py:31). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("source", StringType, nullable = false)))

  val columns: Seq[String] = Seq("doc_id", "tokens", "n_tok", "source")
}

/**
 * Predicate ADT — the engine's pushdown surface.
 *
 * Plays two roles (cf. the reference's parameterized predicate dispatch table,
 * /root/reference/spark/jobs/bronze/bronze_ingestion_by_key.py:19-22):
 *  1. `toColumn` compiles to a Catalyst `Column` applied to the row data;
 *  2. `mightMatch` evaluates against per-file min/max manifest stats to decide
 *     whether a data file can possibly contain matching rows (file skipping).
 *
 * `mightMatch` MUST be conservative: returning true on uncertainty is safe
 * (file is scanned, rows re-filtered by Catalyst); returning false on a file
 * that has matches would be a correctness bug.
 */
sealed trait Predicate {
  def toColumn: Column

  /** Conservative test against a file's column stats. */
  def mightMatch(stats: Map[String, ColStats]): Boolean
}

object Predicate {

  /** Typed comparison helper: compares two stat strings under the column's
    * logical type. Stats are stored as strings in manifests (schema-tagged). */
  private[graft] def cmp(tpe: String, a: String, b: String): Int = tpe match {
    case "int" | "long" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" | "float" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "boolean" => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case _ => a.compareTo(b) // string — parquet UTF8 min/max order
  }

  final case class Eq(col: String, v: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) === lit(v)
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall { s =>
        if (s.min == null || s.max == null) true
        else cmp(s.tpe, s.min, v.toString) <= 0 && cmp(s.tpe, v.toString, s.max) <= 0
      }
  }

  final case class Ne(col: String, v: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) =!= lit(v)
    // A file could be skipped only if min==max==v; otherwise conservative keep.
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall { s =>
        !(s.min != null && s.max != null &&
          cmp(s.tpe, s.min, s.max) == 0 && cmp(s.tpe, s.min, v.toString) == 0 &&
          s.nullCount == 0L)
      }
  }

  final case class Gt(col: String, v: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) > lit(v)
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall(s => s.max == null || cmp(s.tpe, s.max, v.toString) > 0)
  }

  final case class Ge(col: String, v: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) >= lit(v)
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall(s => s.max == null || cmp(s.tpe, s.max, v.toString) >= 0)
  }

  final case class Lt(col: String, v: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) < lit(v)
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall(s => s.min == null || cmp(s.tpe, s.min, v.toString) < 0)
  }

  final case class Le(col: String, v: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col) <= lit(v)
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall(s => s.min == null || cmp(s.tpe, s.min, v.toString) <= 0)
  }

  final case class Between(col: String, lo: Any, hi: Any) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).between(lit(lo), lit(hi))
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall { s =>
        (s.min == null || cmp(s.tpe, s.min, hi.toString) <= 0) &&
        (s.max == null || cmp(s.tpe, s.max, lo.toString) >= 0)
      }
  }

  final case class In(col: String, vs: Seq[Any]) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).isin(vs: _*)
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      vs.exists(v => Eq(col, v).mightMatch(stats))
  }

  final case class IsNotNull(col: String) extends Predicate {
    def toColumn: Column = org.apache.spark.sql.functions.col(col).isNotNull
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      stats.get(col).forall(s => s.min != null || s.max != null || s.nullCount < s.valueCount)
  }

  final case class And(l: Predicate, r: Predicate) extends Predicate {
    def toColumn: Column = l.toColumn && r.toColumn
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      l.mightMatch(stats) && r.mightMatch(stats)
  }

  final case class Or(l: Predicate, r: Predicate) extends Predicate {
    def toColumn: Column = l.toColumn || r.toColumn
    def mightMatch(stats: Map[String, ColStats]): Boolean =
      l.mightMatch(stats) || r.mightMatch(stats)
  }

  /** Identity predicate — the reference's `F.lit(True)` fallback
    * (bronze_ingestion_by_key.py:46). */
  case object True extends Predicate {
    def toColumn: Column = lit(true)
    def mightMatch(stats: Map[String, ColStats]): Boolean = true
  }
}

/** Per-file, per-column statistics carried in manifests.
  * min/max are stored as strings tagged with the logical type `tpe`
  * (one of: string,int,long,double,float,boolean); null min/max means
  * unknown (all-null column or untracked type). */
final case class ColStats(
    tpe: String,
    min: String,
    max: String,
    nullCount: Long,
    valueCount: Long)
