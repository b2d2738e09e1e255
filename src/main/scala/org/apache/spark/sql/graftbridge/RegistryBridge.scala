package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime function registration for an ALREADY-RUNNING session.
  *
  * The blessed path is `spark.sql.extensions=graft.GraftExtensions`
  * (or [[graft.GraftSession]], which passes the extension at build
  * time), but a library user handed an existing session — a notebook,
  * a shared driver — needs to add the graft functions after the fact.
  * `SparkSession.sessionState` is `private[sql]`, so the lookup lives
  * in this shim package alongside [[ExprBridge]]. Classic-session only.
  */
object RegistryBridge {
  /** Register (or overwrite — idempotent) one SQL function. */
  def register(spark: SparkSession, name: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
