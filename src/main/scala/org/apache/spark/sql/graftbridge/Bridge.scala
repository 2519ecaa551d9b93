package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the Column <-> Expression conversions, which are
  * private[sql] in Spark 4 — required to expose custom Catalyst expressions
  * (e.g. graft.functions.MaxByRow) through the public Column API, plus the
  * LogicalPlan -> DataFrame constructor the SQL MERGE command needs. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a batch DataFrame as a STREAMING frame (`isStreaming = true`) —
    * the V1 `Source.getBatch` contract. Same private[sql]
    * `internalCreateDataFrame` Spark's own FileStreamSource uses; the plan
    * stays lazy (`toRdd` builds the RDD, nothing runs until the sink). */
  def streamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
