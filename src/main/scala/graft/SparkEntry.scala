package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{MaintQueries, Relational, TextOps, VectorOps}
import graft.streaming.StreamOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator family:
  *  - q.. relational core (SURVEY.md §2 P/A/W/O/F families + joins)
  *  - d.. and t.. training-data text ops (dedup, lang-ID, quality,
  *    tokens, fingerprints) over `documents`
  *  - e.. similarity search over `embeddings`
  *  - m.. the maintenance engine itself (compact / zorder / merge /
  *    expire / salted agg), rows-only checks (no SQL oracle exists for
  *    our own table format; correctness lives in the scalatest suites)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ VectorOps.queries ++
      StreamOps.queries ++ MaintQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
      StreamOps.oracle ++ MaintQueries.oracle
}
