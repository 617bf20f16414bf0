package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 keeps these conversions
  * `private[sql]`, so extension libraries expose them from a child
  * package of `org.apache.spark.sql` (the same technique used by
  * public Spark extensions, e.g. connectors that add native
  * expressions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Guaranteed-unique id of a classic session (`sessionUUID` is
    * `private[sql]`), or None for non-classic implementations. */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): Option[String] = s match {
    case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }
}
