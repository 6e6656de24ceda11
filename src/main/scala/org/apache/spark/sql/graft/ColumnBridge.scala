package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Build a [[Column]] directly from a Catalyst [[Expression]].
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the
  * supported routes are the function registry (`call_function`, which
  * requires the session to have registered the function) or the
  * `private[sql]` `classic.ExpressionUtils.column`. The graft ml
  * helpers ([[graft.ml.HashUtils]]) construct native-kernel columns
  * from session-free code, where `call_function` would make every
  * public ml API (`Dedup`, `Corpus`, `SetSimJoin`, ...) throw
  * `Undefined function` on any SparkSession built without
  * [[graft.functions.GraftExtensions]] — a silent registration
  * precondition those entry points never had. This one-line shim in
  * the `org.apache.spark.sql` namespace exposes the internal builder
  * — the established pattern for Spark-native extension libraries
  * needing expression-level access (the SQL registration of the same
  * kernels remains, for SQL-text callers).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The inverse: the Catalyst expression behind a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
