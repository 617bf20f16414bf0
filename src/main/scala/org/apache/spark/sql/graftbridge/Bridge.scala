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

  /** Eager Column → catalyst Expression conversion. (The lazy
    * `ExpressionUtils.expression` wrapper — `ColumnNodeExpression` —
    * is only unwrapped by the analyzer; a custom logical node built
    * outside `Dataset` combinators needs the converted tree up
    * front, and the wrapper's api-internal nodes are not
    * task-serializable.) */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Guaranteed-unique id of a classic session (`sessionUUID` is
    * `private[sql]`), or None for non-classic implementations. */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): Option[String] = s match {
    case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }

  /** Analyzed logical plan of a DataFrame (for building custom
    * logical nodes on top of it). */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Executed physical plan of a DataFrame as `RDD[InternalRow]`
    * (`QueryExecution.toRdd`). The UNBOXED analogue of `df.rdd`:
    * no per-row InternalRow→Row conversion — rows stay in Tungsten
    * binary format. CONTRACT: iterator rows may be reused by the
    * upstream operator; a consumer that holds a row across `next()`
    * (or emits something referencing its buffers into an operator
    * that buffers) must copy. */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd

  /** `SparkSession.internalCreateDataFrame` (private[sql]): wrap an
    * `RDD[InternalRow]` already in the given schema's binary layout
    * back into a DataFrame WITHOUT a per-row encoder pass (the unboxed
    * analogue of `createDataFrame(rdd, schema)`). */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** `Dataset.ofRows` (private[sql]): wrap a custom logical node back
    * into the public DataFrame surface. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Executed physical plan of the LAST micro-batch a streaming query
    * ran (None before the first batch, or for non-classic wrappers) —
    * for PLAN PINS on streaming shapes: the micro-batch planner
    * re-plans the static side of a stream-static join every batch, so
    * asserting exchange-freeness needs the batch's OWN executed plan,
    * not the batch-mode plan of an equivalent query
    * (`IncrementalExecution` is `private[sql]`). */
  def lastMicroBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[org.apache.spark.sql.execution.SparkPlan] = q match {
    case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }

  /** Resolves `UnresolvedAttribute`s in a Column expression against a
    * DataFrame's analyzed output (name resolution only — the column
    * set a custom node built on that frame can legally reference). */
  def resolver(df: org.apache.spark.sql.DataFrame): Expression => Expression = {
    val plan = analyzed(df)
    e => e.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        plan.resolve(u.nameParts, org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution)
          .getOrElse(throw new IllegalArgumentException(
            s"column ${u.name} not in ${plan.output.map(_.name).mkString(", ")}"))
    }
  }
}
