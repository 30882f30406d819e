package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversion for the
  * engine's native Catalyst expressions (graft.functions.VecExpressions).
  * Lives in the org.apache.spark.sql package on purpose — the standard
  * pattern for Spark-native extension libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Non-blocking-ish observed-metrics fetch (`Observation.getOrEmpty`
    * is private[sql]): returns empty if the metrics have not arrived
    * within the call's internal ~100 ms wait, instead of `get`'s
    * unbounded block — callers that may race a swallowed job failure
    * poll this under their own deadline.
    */
  def observedOrEmpty(obs: Observation): Map[String, Any] = obs.getOrEmpty
}
