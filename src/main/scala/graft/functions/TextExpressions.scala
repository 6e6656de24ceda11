package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
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

  /** Column wrapper — expression-direct (no registration
    * precondition), like the other kernel wrappers. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  }
}

/** Word n-gram shingle statistics in ONE text pass —
  * `graft_shingle_stats(text, n)` → struct<n_grams int, n_distinct int>.
  *
  * The repetition-ratio quality gate (ns20) only needs two counts:
  * total word n-grams and DISTINCT word n-grams. Expressing those
  * through the `split → transform(sequence) → array_distinct` HOF
  * pipeline is a 100 TB scale-killer the hard way: the HOFs are
  * non-codegen (CodegenFallback), so no subexpression elimination
  * applies, CollapseProject inlines the whole pipeline into every
  * consumer (ratio numerator AND the surfaced count), and inside each
  * lambda `element_at(split(text), i+o)` re-splits the text per
  * shingle index — measured 97.6 s for 5k short docs at sf0.1 where
  * sibling map-only text queries run 0.6–2.5 s (r7 verdict; SURVEY §9
  * documents the trap). This expression splits once, counts distinct
  * shingles with one hash set, stays inside whole-stage codegen, and
  * — being codegen-capable — is deduplicated by subexpression
  * elimination when a projection reads both struct fields.
  *
  * Semantics match [[graft.ml.HashUtils.wordShingles]] exactly: words
  * are `split(text, " ")` (empty tokens kept, like Spark/DuckDB), a
  * doc with fewer than n words has 0 shingles, shingles are the
  * space-joined n consecutive words. DuckDB oracle: `len(w) - n + 1`
  * and `len(list_distinct([array_to_string(w[i:i+n-1], ' ') FOR ...]))`
  * over `string_split(text, ' ')` (ns20's oracle, unchanged).
  */
case class ShingleStats(text: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, n.dataType) match {
      case (_: StringType, IntegerType) if n.foldable =>
        val nv = n.eval()
        if (nv != null && nv.asInstanceOf[Int] >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_shingle_stats n must be a literal >= 1, got $nv")
      case (t, nt) => TypeCheckResult.TypeCheckFailure(
        "graft_shingle_stats requires (string, literal int), got " +
          s"(${t.simpleString}, ${nt.simpleString})")
    }

  override def dataType: DataType = ShingleStats.schema

  override def prettyName: String = "graft_shingle_stats"

  override def nullSafeEval(t: Any, nv: Any): Any =
    ShingleStats.stats(t.asInstanceOf[UTF8String], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nv) =>
      s"${ev.value} = graft.functions.ShingleStats.stats($t, $nv);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleStats =
    copy(text = newLeft, n = newRight)
}

/** 60-bit md5 hash of a binary value — `graft_hash60(bytes)` → long.
  *
  * [[graft.ml.HashUtils.hash60]]'s contract is "the first 15 hex
  * chars of md5, parsed as an unsigned integer" (chosen because
  * DuckDB can restate it: `('0x'||substr(md5(s),1,15))::BIGINT`).
  * The declarative form pays for that portability per call: md5()
  * allocates a 32-char hex STRING, substring slices it, conv()
  * parses digits back into a long — three string round-trips per
  * hashed word/shingle, and the hash runs per word in simhash,
  * minhash, fingerprinting, bigram LMs, contamination. This kernel
  * computes the identical value arithmetically: the first 15 hex
  * chars are digest bytes 0..6 plus the high nibble of byte 7, i.e.
  * the big-endian unsigned value of d[0..7] >>> 4 — no hex string,
  * no parse, one thread-local MessageDigest. Spec-pinned equal to
  * the conv form; the DuckDB oracle side is unchanged.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hash60 requires a binary argument, got ${other.simpleString}")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(v: Any): Any =
    Hash60.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60.hash($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : Hash60 = copy(child = newChild)
}

object Hash60 {
  // MessageDigest is stateful and not thread-safe; one per executor
  // thread, reset by digest() itself
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted and codegen paths. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // 64 big-endian bits of d[0..7] minus the 16th nibble
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Hash60(ColumnBridge.expression(c)))
  }
}

/** Distinct, order-stable word n-gram shingles in ONE text pass —
  * `graft_shingles(text, n)` → array<string>.
  *
  * The array sibling of [[ShingleStats]], for the consumers that need
  * the shingles THEMSELVES (minhash/Jaccard/paragraph dedup,
  * contamination, set-sim join — every `explode(wordShingles(...))`
  * site). The declarative form those call sites used —
  * `array_distinct(transform(sequence(...), i =>
  * concat_ws(element_at(split(text), i+o)...)))` — re-evaluates
  * `split(text)` for EVERY element of the transform lambda (HOFs are
  * non-codegen, no subexpression elimination inside the lambda), so
  * shingling a doc of L words costs O(L²) character work. Fine at the
  * fixtures' 54-word mean; a scale-killer on real corpora where docs
  * run 10³–10⁵ words. This kernel splits once and builds the
  * first-occurrence-ordered distinct shingle list in O(L).
  *
  * Semantics are IDENTICAL to the HOF form (spec-pinned): words =
  * split on single spaces keeping empty tokens, fewer than n words →
  * empty array, shingles joined with one space, `array_distinct`
  * keeps first occurrence — a LinkedHashSet reproduces exactly that
  * order.
  */
case class Shingles(text: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, n.dataType) match {
      case (_: StringType, IntegerType) if n.foldable =>
        val nv = n.eval()
        if (nv != null && nv.asInstanceOf[Int] >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_shingles n must be a literal >= 1, got $nv")
      case (t, nt) => TypeCheckResult.TypeCheckFailure(
        "graft_shingles requires (string, literal int), got " +
          s"(${t.simpleString}, ${nt.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(t: Any, nv: Any): Any =
    Shingles.shingles(t.asInstanceOf[UTF8String], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nv) =>
      s"${ev.value} = graft.functions.Shingles.shingles($t, $nv);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Shingles =
    copy(text = newLeft, n = newRight)
}

object Shingles {
  /** The ONE shingle-enumeration core both kernels share — any change
    * to tokenization or join semantics lands in stats() and
    * shingles() together, so `n_distinct == size(shingles)` can never
    * silently desynchronize. Returns (total n-gram count,
    * first-occurrence-ordered distinct shingles).
    */
  private[functions] def enumerate(s: UTF8String, n: Int)
      : (Int, java.util.LinkedHashSet[String]) = {
    val words = s.toString.split(" ", -1)
    val total = words.length - n + 1
    if (total <= 0) return (0, new java.util.LinkedHashSet[String](0))
    val seen = new java.util.LinkedHashSet[String](
      math.min(total * 2, 1 << 20))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    (total, seen)
  }

  /** Shared by interpreted and codegen paths. One split, one pass,
    * first-occurrence order (array_distinct parity). */
  def shingles(s: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val seen = enumerate(s, n)._2
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next()); k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Shingles(ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
  }
}

object ShingleStats {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  /** Shared by interpreted and codegen paths. One split, one pass —
    * delegates to [[Shingles.enumerate]], the single enumeration core
    * (split on literal spaces with limit -1: Spark split() / DuckDB
    * string_split parity, trailing empty tokens kept). */
  def stats(s: UTF8String, n: Int): InternalRow = {
    val (total, seen) = Shingles.enumerate(s, n)
    InternalRow(total, seen.size)
  }

  def apply(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ShingleStats(ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
  }
}

/** ALL word n-gram shingles in position order, duplicates kept —
  * `graft_all_shingles(text, n)` → array<string>, element i = the
  * shingle starting at word index i.
  *
  * The positional sibling of [[Shingles]]: the cross-document
  * duplicated-span remover (ExactSubstr dedup, `Dedup.exactSubstr`)
  * needs WHERE each shingle occurs, not just the distinct set —
  * `posexplode` over this array yields (word index, shingle) pairs
  * directly. Same one-pass kernel rationale as the siblings: the HOF
  * form (`transform(sequence(...), i => concat_ws(' ',
  * element_at(split(text), i+o)...))`) re-splits the text per lambda
  * element, O(L²) character work per doc (the ns20 trap, SURVEY §9).
  *
  * Tokenization is pinned to the shared [[Shingles]] semantics: words
  * = `split(text, " ")` with empty tokens kept (Spark split /
  * DuckDB string_split parity), fewer than n words → empty array,
  * shingles space-joined. Invariant, spec-pinned:
  * `array_distinct(graft_all_shingles(t, n)) == graft_shingles(t, n)`.
  *
  * DuckDB oracle equivalent: `[array_to_string(w[i:i+n-1], ' ') FOR i
  * IN generate_series(1, len(w) - n + 1)]` over
  * `string_split(text, ' ')`.
  */
case class AllShingles(text: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, n.dataType) match {
      case (_: StringType, IntegerType) if n.foldable =>
        val nv = n.eval()
        if (nv != null && nv.asInstanceOf[Int] >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_all_shingles n must be a literal >= 1, got $nv")
      case (t, nt) => TypeCheckResult.TypeCheckFailure(
        "graft_all_shingles requires (string, literal int), got " +
          s"(${t.simpleString}, ${nt.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_all_shingles"

  override def nullSafeEval(t: Any, nv: Any): Any =
    AllShingles.all(t.asInstanceOf[UTF8String], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nv) =>
      s"${ev.value} = graft.functions.AllShingles.all($t, $nv);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AllShingles =
    copy(text = newLeft, n = newRight)
}

object AllShingles {
  /** Shared by interpreted and codegen paths. One split, one pass,
    * position order with duplicates kept. */
  def all(s: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val words = s.toString.split(" ", -1)
    val total = words.length - n + 1
    if (total <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(AllShingles(ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
  }
}
