package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType}
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

/** SQ8 scalar quantization, packed: rescale an `array<double>` vector so
  * its largest-magnitude component maps to ±127, round each component to
  * an integer, and emit the result as a BINARY value of signed bytes —
  * one byte per component instead of the eight an `array<double>` (or
  * the doubles-holding-integers form this replaces) spends. At 100 TB
  * the quantized candidate scan is bandwidth-bound, so the packed column
  * is the whole point: 8× less shuffle/scan traffic for the N² half of
  * SQ8, with full-precision vectors touched only in the final re-score.
  *
  * Rounding is `floor(x + 0.5)` (half-up toward +∞) — deliberately NOT
  * `Math.round`: the two differ only where Java's anti-double-rounding
  * special case fires (x within one ulp below k+0.5), but `floor(x +
  * 0.5)` is the identical IEEE expression in ANSI SQL, which is what
  * lets the SQ8 pipeline be restated verbatim in a DuckDB oracle and
  * hash-gated (ns7c) instead of trusted rows-only. Cosine is
  * scale-invariant so the per-vector rescale needs no de-scaling
  * downstream. The zero vector would divide 0/0 → bytes of 0; callers
  * exclude zero-norm vectors upstream (Similarity.withNorm) and the
  * byte-dot norm guard below catches any that slip through.
  */
case class PackSq8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_pack requires an array<double> argument, got " +
        other.simpleString)
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "graft_sq8_pack"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(x.getDouble(i)); if (a > amax) amax = a; i += 1
    }
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = Math.floor(x.getDouble(i) * 127.0 / amax + 0.5).toInt.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val amax = ctx.freshName("amax")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = Math.abs($a.getDouble($i));
         |  if ($v > $amax) $amax = $v;
         |}
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) (int) Math.floor(
         |    $a.getDouble($i) * 127.0 / $amax + 0.5);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackSq8 =
    copy(child = newChild)
}

/** Integer dot product over two [[PackSq8]]-packed BINARY vectors:
  * Σ xᵢ·yᵢ with each component a signed byte, accumulated in a long
  * (exact — |term| ≤ 127² so even 2⁴⁸ dimensions cannot overflow). This
  * is the int8 sibling of [[DotProduct]] and the hot expression of the
  * SQ8 candidate scan: a tight primitive byte loop in whole-stage
  * codegen over 1/8th the bytes the double form reads.
  */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot8 requires two binary arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    // same loud dimension-mismatch contract as graft_dot: a silent
    // prefix truncation would mis-rank with no diagnostic
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"graft_dot8: dimension mismatch (${x.length} vs ${y.length})")
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "graft_dot8: dimension mismatch (" + $a.length + " vs " +
         |      $b.length + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt8 =
    copy(left = newLeft, right = newRight)
}

/** Pack product-quantization code words into a BINARY value: an
  * `array<long>` of codes (each 0..255, one per subspace) becomes one
  * unsigned byte each. The PQ index stores ONLY this column plus a
  * reconstructed norm — for a 64-dim vector at 8 subspaces that is 8
  * bytes against SQ8's 64 and the raw array's 512, and at 100 TB the
  * candidate scan is bandwidth-bound, so the bytes ARE the speedup.
  * Out-of-range codes throw: a code wider than a byte means the
  * caller's codebook size and the pack width have drifted, which would
  * otherwise corrupt every downstream ADC lookup silently.
  */
case class PackCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pack_codes requires an array<long> argument, got " +
        other.simpleString)
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "graft_pack_codes"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // a null element would read as code 0 and pack silently —
      // same loud-failure contract as the out-of-range check
      if (x.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pack_codes: null code at index $i")
      val c = x.getLong(i)
      if (c < 0L || c > 255L)
        throw new IllegalArgumentException(
          s"graft_pack_codes: code $c out of byte range")
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_pack_codes: null code at index " + $i);
         |  }
         |  long $c = $a.getLong($i);
         |  if ($c < 0L || $c > 255L) {
         |    throw new IllegalArgumentException(
         |      "graft_pack_codes: code " + $c + " out of byte range");
         |  }
         |  $out[$i] = (byte) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackCodes =
    copy(child = newChild)
}

/** Asymmetric-distance-computation (ADC) lookup, the PQ scoring
  * kernel: given a query's flattened lookup table `lut` (array<double>
  * of nSub·k entries, entry `sub·k + code` = dot(query subvector,
  * codebook centroid)) and an index vector's packed `codes` (BINARY,
  * one unsigned byte per subspace), the approximate dot product is
  * Σ_sub lut[sub·k + codes[sub]] — nSub array reads and adds per
  * candidate instead of a dim-length float loop, over an 8-byte code
  * column instead of a 512-byte vector. Tight loop in whole-stage
  * codegen, the [[DotProductInt8]] pattern. A lut/codes size mismatch
  * throws (same loud contract as graft_dot: silent misindexing would
  * mis-rank every candidate with no diagnostic).
  */
case class AdcLookup(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_adc requires (array<double>, binary, int), got " +
          s"(${l.simpleString}, ${r.simpleString}, ${kk.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_adc"

  override def nullSafeEval(l: Any, r: Any, kk: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[Array[Byte]]
    val kv = kk.asInstanceOf[Int]
    if (lut.numElements() != codes.length * kv)
      throw new IllegalArgumentException(
        s"graft_adc: lut size ${lut.numElements()} != " +
          s"${codes.length} subspaces * $kv codes")
    var s = 0.0
    var m = 0
    while (m < codes.length) {
      s += lut.getDouble(m * kv + (codes(m) & 0xFF)); m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes, kv) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |if ($lut.numElements() != $codes.length * $kv) {
         |  throw new IllegalArgumentException(
         |    "graft_adc: lut size " + $lut.numElements() + " != " +
         |      $codes.length + " subspaces * " + $kv + " codes");
         |}
         |double $s = 0.0;
         |for (int $m = 0; $m < $codes.length; $m++) {
         |  $s += $lut.getDouble($m * $kv + ($codes[$m] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AdcLookup =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level entry points for the native vector expressions.
  *
  * Built expression-direct through
  * [[org.apache.spark.sql.graft.ColumnBridge]], NOT via
  * `call_function`: these back the public ml APIs ([[graft.ml.Similarity]],
  * the PQ/IVF index builders), which must work on any SparkSession —
  * the function-REGISTRY route (for SQL-text callers) remains
  * available via [[GraftExtensions]] registration.
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** `dot(a, b)` over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** `sq8Pack(e)`: array<double> → BINARY of per-vector-rescaled signed
    * bytes (see [[PackSq8]]).
    */
  def sq8Pack(e: Column): Column = column(PackSq8(expression(e)))

  /** `dot8(a, b)`: integer dot product of two packed BINARY vectors
    * (see [[DotProductInt8]]); returns long.
    */
  def dot8(a: Column, b: Column): Column =
    column(DotProductInt8(expression(a), expression(b)))

  /** `packCodes(codes)`: array<long> of PQ code words → BINARY, one
    * unsigned byte per subspace (see [[PackCodes]]).
    */
  def packCodes(codes: Column): Column =
    column(PackCodes(expression(codes)))

  /** `adc(lut, codes, k)`: PQ asymmetric-distance lookup score — the
    * approximate dot product of a query (via its flattened nSub·k
    * lookup table) against a packed code word (see [[AdcLookup]]).
    */
  def adc(lut: Column, codes: Column, k: Column): Column =
    column(AdcLookup(expression(lut), expression(codes), expression(k)))
}

/** Session extensions registering the native functions for SQL and
  * Column use (`SELECT graft_dot(a, b)`), the idiomatic packaging for
  * engine extensions: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptors.foreach(ext.injectFunction)
    // band-theta-join → bucketed-equi-join rewrite (the declarative
    // user gets the RangeJoin scale path automatically)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

object GraftExtensions {
  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotDescriptor: Descriptor =
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  val sq8PackDescriptor: Descriptor =
    (new FunctionIdentifier("graft_sq8_pack"),
      new ExpressionInfo(classOf[PackSq8].getName, "graft_sq8_pack"),
      (children: Seq[Expression]) => PackSq8(children.head))

  val dot8Descriptor: Descriptor =
    (new FunctionIdentifier("graft_dot8"),
      new ExpressionInfo(classOf[DotProductInt8].getName, "graft_dot8"),
      (children: Seq[Expression]) => DotProductInt8(children(0), children(1)))

  val nfcDescriptor: Descriptor =
    (new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head))

  val packCodesDescriptor: Descriptor =
    (new FunctionIdentifier("graft_pack_codes"),
      new ExpressionInfo(classOf[PackCodes].getName, "graft_pack_codes"),
      (children: Seq[Expression]) => PackCodes(children.head))

  val adcDescriptor: Descriptor =
    (new FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcLookup].getName, "graft_adc"),
      (children: Seq[Expression]) =>
        AdcLookup(children(0), children(1), children(2)))

  val shingleStatsDescriptor: Descriptor =
    (new FunctionIdentifier("graft_shingle_stats"),
      new ExpressionInfo(classOf[ShingleStats].getName,
        "graft_shingle_stats"),
      (children: Seq[Expression]) =>
        ShingleStats(children(0), children(1)))

  val shinglesDescriptor: Descriptor =
    (new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        Shingles(children(0), children(1)))

  val hash60Descriptor: Descriptor =
    (new FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
      (children: Seq[Expression]) => Hash60(children.head))

  val allShinglesDescriptor: Descriptor =
    (new FunctionIdentifier("graft_all_shingles"),
      new ExpressionInfo(classOf[AllShingles].getName,
        "graft_all_shingles"),
      (children: Seq[Expression]) =>
        AllShingles(children(0), children(1)))

  val functionDescriptors: Seq[Descriptor] =
    Seq(dotDescriptor, sq8PackDescriptor, dot8Descriptor, nfcDescriptor,
      packCodesDescriptor, adcDescriptor, shingleStatsDescriptor,
      shinglesDescriptor, hash60Descriptor, allShinglesDescriptor)

  /** Imperative (idempotent) registration for an already-built session —
    * the fallback when the session was not constructed with
    * `.withExtensions(new GraftExtensions)`.
    */
  def register(spark: SparkSession): Unit = {
    functionDescriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
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
