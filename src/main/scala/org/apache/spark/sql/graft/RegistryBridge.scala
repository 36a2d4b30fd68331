package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Bridge into the session's `private[sql]` function registry — the
 * live-session counterpart of `SparkSessionExtensions.injectFunction`
 * (which only applies at session construction). Same rationale as
 * [[ColumnBridge]].
 */
object RegistryBridge {
  def register(spark: SparkSession, name: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
}
