package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The similarity operators (graft.ml.Similarity) evaluate the dot
  * product once per candidate *pair* — the single hottest expression in
  * the engine (N·k evaluations for top-k, |candidates| for near-dup).
  * The composable `aggregate(zip_with(...))` formulation allocates an
  * intermediate array per pair and evaluates a lambda per element;
  * this expression instead emits a tight primitive loop straight into
  * whole-stage codegen: no allocation, no virtual calls, auto-
  * vectorizable by the JIT. That is the preferred Spark extension
  * order: built-in functions first, then a native `Expression` with
  * `doGenCode` — never an opaque UDF (which would box every element).
  *
  * Inputs must already be `array<double>` (cast at the call site);
  * embedding vectors are dense by contract — null *elements* are not
  * supported, a null *array* yields null (standard BinaryExpression
  * null semantics). Summation order is strictly sequential, matching
  * DuckDB's list_* kernels so rounded similarities hash-compare.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail loudly on dimension mismatch: silently truncating to the
    // shorter prefix understates every cosine with no diagnostic (and
    // diverges from DuckDB's list kernels, which error) — a mixed-model
    // or corrupt embedding must surface, not mis-rank
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: dimension mismatch (" + $n + " vs " +
         |      $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {

  /** `dot(a, b)` over two array<double> columns. Resolved through the
    * session function registry (see [[GraftExtensions]]), so the
    * session must have the graft functions registered — query entry
    * points call [[GraftExtensions.register]] idempotently.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}

/** Session extensions registering the native functions for SQL and
  * Column use (`SELECT graft_dot(a, b)`), the idiomatic packaging for
  * engine extensions: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotDescriptor)
    // band-theta-join → bucketed-equi-join rewrite (the declarative
    // user gets the RangeJoin scale path automatically)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

object GraftExtensions {
  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Imperative (idempotent) registration for an already-built session —
    * the fallback when the session was not constructed with
    * `.withExtensions(new GraftExtensions)`.
    */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = dotDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    // the optimizer-rule half of the extensions, for sessions not
    // built with spark.sql.extensions: experimental.extraOptimizations
    // runs in the post-optimization user batch (idempotent append; if
    // the extensions-injected copy also runs, the second application
    // matches nothing — the rewrite is fixed-point safe)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
  }
}
