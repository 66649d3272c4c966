package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 moved Column onto ColumnNode and gated the
  * Expression-backed constructors behind `private[sql]`; this
  * package-located shim re-exposes exactly the two conversions a
  * library needs to ship custom codegen expressions without a
  * SparkSessionExtensions install (the driver owns session creation
  * here, so extension registration isn't available).
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a public Column. */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Resolve a public Column back to its Catalyst expression. */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Register a function builder on an existing session's registry —
    * for sessions whose construction the library doesn't control
    * (config-based `spark.sql.extensions` covers the other case). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
