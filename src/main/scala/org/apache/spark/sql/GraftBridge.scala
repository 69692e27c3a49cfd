package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 wraps Column around ColumnNode; custom Catalyst expressions
  * need these two hops). Lives in the org.apache.spark.sql package for
  * access — the standard shim pattern for Spark extensions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Mark a provably-non-null column as such (`KnownNotNull`). Join keys
    * and pushed filters get `isnotnull(k)` guards from the optimizer;
    * when k is an EXPENSIVE projected expression (a literal-argmin encode,
    * a map-side centroid assignment) the pushed guard re-evaluates the
    * whole expression below the projection — guide §4.4's duplicated-
    * evaluation problem on the JVM side. Wrapping the expression
    * KnownNotNull folds those guards away at analysis time. ONLY for
    * expressions that cannot return null (argmins over non-empty literal
    * arrays of non-null structs over non-null inputs) — declaring a
    * nullable expression not-null produces undefined behavior.
    * (r16: the argmin sites that motivated this now use the native
    * [[graft.functions.CodebookArgmin]], whose own nullable=false gives
    * the same fold; the helper stays for future provably-non-null
    * composed expressions.) */
  def knownNotNull(c: Column): Column =
    column(catalyst.expressions.KnownNotNull(expression(c)))

  /** Register a SQL function on a live session (the per-session analog of
    * the GraftExtensions injection used at cluster deploy time). */
  def registerFunction(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Free the executor blocks behind a `localCheckpoint()`ed DataFrame.
    * A local checkpoint's data IS its persisted blocks (lineage is
    * truncated at checkpoint time), so only call this once the DataFrame
    * — and everything derived from it — is no longer needed; a later
    * action on it would fail rather than recompute. No-op on plans that
    * are not checkpoint-backed. */
  def unpersistLocalCheckpoint(df: Dataset[Row]): Unit =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed.foreach {
      case r: execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }
}
