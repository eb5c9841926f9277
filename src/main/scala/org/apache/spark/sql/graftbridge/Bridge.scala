package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column API implementation-agnostic
  * and scoped the conversion helpers `private[sql]`; extension libraries shipping
  * native Catalyst expressions (graft.functions) reach them via this in-namespace
  * shim — the same pattern other Spark-native libraries use. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking Observation read (`getRowOrEmpty` is `private[sql]`): None when
    * the observed action never fired its metrics (e.g. a skipped write). */
  def observedRow(obs: org.apache.spark.sql.Observation)
      : Option[org.apache.spark.sql.Row] = obs.getRowOrEmpty
}
