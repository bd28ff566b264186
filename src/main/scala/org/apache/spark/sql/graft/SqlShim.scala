package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The `private[sql]` doorways the graft SQL-DML commands need — the
  * write-side sibling of [[StreamShim]], and like it deliberately
  * logic-free: each method is a one-line re-export of an internal
  * surface that every logical-plan-level Spark extension (Delta's
  * command classes walk the identical path) must reach.
  *
  *   - `ofRows` — a [[graft.sql.GraftDmlRule]]-built command captures
  *     RESOLVED logical plans (the DML target's snapshot read, the
  *     MERGE source, classification joins the command assembles from
  *     them); turning a logical plan back into a runnable DataFrame is
  *     `Dataset.ofRows`, which Spark scopes `private[sql]`.
  *   - `column` — the commands re-apply ANALYZER-RESOLVED expressions
  *     (merge conditions, assignment values) on those DataFrames; the
  *     Expression→Column wrap is `ExpressionUtils.column`, also
  *     `private[sql]` since the Spark 4 Column/ColumnNode split.
  */
object SqlShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
