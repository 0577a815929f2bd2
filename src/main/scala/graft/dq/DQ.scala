package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.TokenTable
import graft.lineage.{LineageLog, LineageRecord}

/**
 * Data-quality gate over the token table — the engine's mirror of the
 * reference's Great Expectations suite + runner
 * (/root/reference/spark/jobs/tests/dq_expectations.py:98-109,
 * /root/reference/spark/jobs/tests/dq_runner.py:15-58):
 *
 *  | reference expectation                          | our invariant          |
 *  |------------------------------------------------|------------------------|
 *  | expect_table_row_count_to_be_between(min=1)    | count >= 1             |
 *  | expect_column_values_to_be_unique(key)         | doc_id unique          |
 *  | expect_column_values_to_not_be_null(c)         | all 4 columns not null |
 *  | expect_column_values_to_match_regex            | doc_id ~ ^[0-9a-f]{16}-[0-9]+ |
 *  | expect_column_pair_A_greater_than_B            | n_tok == size(tokens), n_tok >= 1 |
 *
 * All checks run as ONE aggregation job (the reference runs one job per
 * expectation — SURVEY.md §3.4 flags that as a re-scan storm; we fold them
 * into a single pass). Like dq_runner, the audit record is persisted
 * whether the gate passes or fails, and failure throws so an orchestrator
 * task fails (dq_runner.py:55-58).
 */
object DQ {

  final case class Result(checks: Map[String, Long], passed: Boolean)

  /** @param keyPattern regex the key must match (the reference's
    *   expect_column_values_to_match_regex, dq_expectations.py:14) —
    *   default just rejects empty keys; pass a stricter shape for
    *   generator-owned tables. */
  def check(df: DataFrame, keyPattern: String = "^.+$"): Result = {
    val row = df.agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("n_keys"),
      sum(when(col("doc_id").isNull || col("tokens").isNull ||
        col("n_tok").isNull || col("source").isNull, 1L).otherwise(0L))
        .as("n_nulls"),
      sum(when(not(col("doc_id").rlike(keyPattern)), 1L)
        .otherwise(0L)).as("n_bad_key_shape"),
      sum(when(col("n_tok") =!= size(col("tokens")), 1L).otherwise(0L))
        .as("n_tok_mismatch"),
      sum(when(col("n_tok") < 1, 1L).otherwise(0L)).as("n_empty"))
      .head()
    val checks = Map(
      "row_count" -> row.getLong(0),
      "duplicate_keys" -> (row.getLong(0) - row.getLong(1)),
      "null_values" -> row.getLong(2),
      "bad_key_shape" -> row.getLong(3),
      "n_tok_mismatch" -> row.getLong(4),
      "empty_docs" -> row.getLong(5))
    val passed = checks("row_count") >= 1 && checks("duplicate_keys") == 0 &&
      checks("null_values") == 0 && checks("bad_key_shape") == 0 &&
      checks("n_tok_mismatch") == 0 && checks("empty_docs") == 0
    Result(checks, passed)
  }

  /** Run the gate against the current snapshot; persist the audit record
    * either way (status=done/failed); throw on failure. */
  def gate(table: TokenTable, spark: SparkSession): Result = {
    val snap = table.log.current().getOrElse(sys.error("empty table"))
    val (df, _) = table.scan()
    val res = check(df)
    val lin = new LineageLog(table.root)
    lin.append(LineageRecord(s"dq-v${snap.version}", "dq", "all",
      if (res.passed) "done" else "failed",
      0, Seq.empty, res.checks("row_count"), 0L, 1))
    if (!res.passed)
      throw new IllegalStateException(
        s"DQ FAILED at v${snap.version}: " +
          res.checks.filter(_._2 != 0).mkString(", "))
    res
  }
}
