package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> catalyst Expression bridge. Spark 4 made these converters
 * `private[sql]` (Column became API-agnostic across classic/connect);
 * living in a `org.apache.spark.sql` subpackage is the sanctioned way for
 * an extension library to reach them (same pattern Spark-native libraries
 * use for custom expressions).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw logical plan (Dataset.ofRows is
    * private[sql]; needed to expose a LogicalRelation over the engine's
    * own FileIndex — the same door Delta's DeltaTable.toDF goes through). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
