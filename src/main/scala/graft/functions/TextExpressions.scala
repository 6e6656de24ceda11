package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression —
  * `graft_nfc(str)`.
  *
  * Text cleaning for a training corpus starts with canonical
  * normalization: the same visible text can arrive as precomposed
  * codepoints (é = U+00E9) or base + combining mark (e + U+0301), and
  * every downstream exact/hash operator (dedup content hashes, n-gram
  * shingles, token counts) silently treats them as different documents
  * unless the corpus is normalized first. Spark ships no normalizer,
  * and a Scala UDF would box every
  * row; this is the documented extension order — a `UnaryExpression`
  * with `doGenCode`, registered via [[GraftExtensions]], staying
  * inside whole-stage codegen.
  *
  * The codegen path calls the static [[NfcNormalize.nfc]] helper,
  * whose `Normalizer.isNormalized` fast path returns the INPUT
  * UTF8String untouched for already-normalized text (the overwhelming
  * case — ASCII corpora skip allocation entirely and the check is a
  * linear scan with an ASCII early-out).
  *
  * DuckDB oracle equivalent: `nfc_normalize(s)`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted and codegen paths (one implementation, no
    * eval/codegen drift). Returns the input object unchanged when the
    * text is already NFC.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column wrapper (function-registry route, like `Vectors.dot`). */
  def apply(c: Column): Column = call_function("graft_nfc", c)
}
