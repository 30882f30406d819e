package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** Narrow bridge to two `private[sql]` constructors a Spark connector
  * cannot do without (Delta ships its codebase under
  * `org.apache.spark.sql.delta` for exactly this access): building a
  * DataFrame from an already-resolved LogicalPlan (the MERGE source —
  * its exprIds must survive) and from an InternalRow RDD (a V1
  * streaming sink's micro-batch, which must NOT be re-executed as a
  * fresh query over streaming sources). Nothing else crosses here.
  */
object Bridges {

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  def internalCreateDataFrame(spark: SparkSession,
      rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
