package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns, accumulated
  * in double. `doGenCode` emits a tight primitive loop that runs inside whole-stage
  * codegen — no boxing, no per-element HOF lambda dispatch. This is the BENCH-scale
  * hot path for similarity search (SURVEY.md §4); the oracle-hashed queries use the
  * decimal-exact formulation in [[graft.llm.Similarity]] instead, which is
  * reproducible across engines (a double fold is not).
  *
  * Sequential left-to-right accumulation — deterministic for a fixed array order. */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: DECIMAL-EXACT dot product of two `array<float>`
  * columns — the oracle-hashable counterpart of [[FloatVecDot]]. Reproduces the
  * HOF formulation `aggregate(zip_with(a, b, (x,y) => (x*y).cast(decimal(30,12))),
  * 0, (acc,x) => acc+x)` bit-for-bit: each IEEE double product is rounded HALF_UP
  * at scale 12 of its SHORTEST-STRING decimal form (what Spark's double→decimal
  * cast does), and the rounded terms are summed exactly — associative, so the
  * result is partitioning-independent and matches a DuckDB `SUM(CAST(... AS
  * DECIMAL(30,12)))` over the same pairs in any order.
  *
  * Why not the HOF: Spark's higher-order functions are CodegenFallback — per pair
  * they allocate an intermediate decimal array and dispatch a lambda per element.
  * This expression runs the whole loop inside whole-stage codegen with a scaled
  * LONG accumulator (exact for |term| sums < 9.2e6 at scale 12; larger magnitudes
  * fall back to BigInteger accumulation with the HOF's decimal(30,12) capacity
  * enforced — values that would overflow the HOF's casts yield NULL), which makes
  * exact brute-force similarity usable as a real baseline, not just an oracle.
  *
  * Null semantics mirror the HOF chain: null array, null element, or length
  * mismatch (zip_with pads with null) all yield NULL. */
case class FloatVecDotExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  // Can return NULL even for non-null inputs (length mismatch, decimal
  // overflow) — without this override, non-nullable children make ev.isNull
  // a codegen LITERAL and the `isNull = true` branch fails Janino
  // compilation ("not an rvalue"), silently dropping the whole stage to
  // interpreted execution.
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_exact"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatVecDotExact.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.FloatVecDotExact.compute($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object FloatVecDotExact {
  // decimal(30,12) capacity: |unscaled| must stay below 10^30, like the HOF's
  // casts. Values past it have no defined decimal(30,12) representation (the
  // HOF overflows there — an error under ANSI, null otherwise): return NULL
  // rather than inventing a number the spec formulation cannot produce.
  private val MaxUnscaled = java.math.BigInteger.TEN.pow(30)

  /** Σᵢ roundHalfUp₁₂(xᵢ · yᵢ), exactly; null on length mismatch / null element
    * / decimal(30,12) overflow. */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L // unscaled at scale 12
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      val u = java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue() // scale-12 units; NOT the numeric value
      try acc = java.lang.Math.addExact(acc, u.longValueExact())
      catch { case _: ArithmeticException => return computeBig(x, y) }
      i += 1
    }
    java.lang.Double.valueOf(
      java.math.BigDecimal.valueOf(acc, 12).doubleValue())
  }

  /** Long-overflow fallback: same per-term rounding, BigInteger sum, with the
    * HOF's decimal(30,12) capacity enforced on every term and partial sum. */
  private def computeBig(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    var acc = java.math.BigInteger.ZERO // unscaled at scale 12
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      val u = java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP).unscaledValue()
      if (u.abs.compareTo(MaxUnscaled) >= 0) return null // term overflows cast
      acc = acc.add(u)
      if (acc.abs.compareTo(MaxUnscaled) >= 0) return null // sum overflows cast
      i += 1
    }
    java.lang.Double.valueOf(new java.math.BigDecimal(acc, 12).doubleValue())
  }
}

/** Native Catalyst expression: DECIMAL-EXACT squared euclidean distance between
  * two vector columns (each independently `array<float>` or `array<double>`) —
  * the L2 companion of [[FloatVecDotExact]], for the posexplode-free spellings of
  * the nearest-centroid / residual-quantization queries. Reproduces the HOF
  * formulation `aggregate(zip_with(a, b, (x,y) => ((x-y)*(x-y)).cast(decimal(30,12))),
  * 0, (acc,x) => acc+x)` bit-for-bit: the per-position difference and square run
  * in IEEE double (floats widened exactly), each square is rounded HALF_UP at
  * scale 12 of its shortest-string decimal form (Spark's double→decimal cast),
  * and the rounded terms are summed exactly — associative, so the result equals
  * the grouped `SUM(CAST((v-c)*(v-c) AS DECIMAL(30,12)))` the flattened queries
  * (and the DuckDB oracle) compute over the same positions in any order.
  *
  * Same scaled-long fast path / BigInteger fallback / decimal(30,12) capacity
  * and null semantics as [[FloatVecDotExact]]. */
case class VecL2Exact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  // NULL on length mismatch / null element / capacity overflow even for
  // non-null inputs — same nullable-override requirement as FloatVecDotExact
  // (Janino "not an rvalue" fallback otherwise).
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2_exact"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecL2Exact.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.VecL2Exact.compute($a, $b, $lf, $rf);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VecL2Exact {
  private val MaxUnscaled = java.math.BigInteger.TEN.pow(30)

  @inline private def elem(x: ArrayData, i: Int, f: Boolean): Double =
    if (f) x.getFloat(i).toDouble else x.getDouble(i)

  /** Σᵢ roundHalfUp₁₂((xᵢ − yᵢ)²), exactly; null on length mismatch / null
    * element / decimal(30,12) overflow. */
  def compute(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L // unscaled at scale 12
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = elem(x, i, xf) - elem(y, i, yf)
      val u = java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue() // scale-12 units; NOT the numeric value
      try acc = java.lang.Math.addExact(acc, u.longValueExact())
      catch { case _: ArithmeticException => return computeBig(x, y, xf, yf) }
      i += 1
    }
    java.lang.Double.valueOf(
      java.math.BigDecimal.valueOf(acc, 12).doubleValue())
  }

  /** Long-overflow fallback: same per-term rounding, BigInteger sum, with the
    * HOF's decimal(30,12) capacity enforced on every term and partial sum. */
  private def computeBig(x: ArrayData, y: ArrayData, xf: Boolean,
      yf: Boolean): java.lang.Double = {
    val n = x.numElements()
    var acc = java.math.BigInteger.ZERO // unscaled at scale 12
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = elem(x, i, xf) - elem(y, i, yf)
      val u = java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP).unscaledValue()
      if (u.abs.compareTo(MaxUnscaled) >= 0) return null // term overflows cast
      acc = acc.add(u)
      if (acc.abs.compareTo(MaxUnscaled) >= 0) return null // sum overflows cast
      i += 1
    }
    java.lang.Double.valueOf(new java.math.BigDecimal(acc, 12).doubleValue())
  }
}

/** Native Catalyst expression: dot product of two `array<bigint>` columns in
  * exact long arithmetic — the hot path of int8-quantized similarity search
  * (sim_int8_rerank), where candidate scores are integer by design so the
  * result is bit-reproducible on any engine. The HOF spelling
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0L, (acc,x)=>acc+x)` is CodegenFallback
  * (per-pair array allocation + lambda dispatch); this runs the whole loop
  * inside whole-stage codegen. Same long wrap-around semantics as the HOF's
  * non-ANSI multiply/add (irrelevant for 8-bit codes: |sum| <= d * 255^2).
  *
  * Null semantics mirror the HOF chain: null array, null element, or length
  * mismatch (zip_with pads with null) all yield NULL. */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  // NULL on length mismatch / null element even for non-null inputs — same
  // nullable-override requirement as FloatVecDotExact (Janino "not an
  // rvalue" fallback otherwise).
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ivec_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |boolean $bad = ($b.numElements() != $n);
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Column-API + SQL-registry surface for the native vector expressions. */
object VectorFunctions {

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Decimal-exact, codegen'd — drop-in for the HOF dotExact formulation. */
  def vec_dot_exact(a: Column, b: Column): Column =
    Bridge.column(FloatVecDotExact(Bridge.expression(a), Bridge.expression(b)))

  /** Decimal-exact squared L2 distance over array<float|double> — codegen'd
    * drop-in for `aggregate(zip_with(a,b,(x,y)=>((x-y)*(x-y)).cast(dec(30,12))),
    * 0, _+_).cast(double)`. */
  def vec_l2_exact(a: Column, b: Column): Column =
    Bridge.column(VecL2Exact(Bridge.expression(a), Bridge.expression(b)))

  /** Exact integer dot over array<bigint> — codegen'd HOF drop-in. */
  def ivec_dot(a: Column, b: Column): Column =
    Bridge.column(LongVecDot(Bridge.expression(a), Bridge.expression(b)))

  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Codegen'd cosine similarity (BENCH path). */
  def cosine_fast(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Register the vector functions for SQL use in an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ivec_dot", exprs => LongVecDot(exprs(0), exprs(1)), "scala_udf")
  }
}

/** Session extension wiring (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`): injects the native
  * vector functions into the function registry at session build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ivec_dot"),
      new ExpressionInfo(classOf[LongVecDot].getName, "ivec_dot"),
      (exprs: Seq[Expression]) => LongVecDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_similarity"),
      new ExpressionInfo(classOf[JaroSimilarity].getName, "jaro_similarity"),
      (exprs: Seq[Expression]) => JaroSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler_similarity"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName,
        "jaro_winkler_similarity"),
      (exprs: Seq[Expression]) => JaroWinklerSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc_normalize"),
      (exprs: Seq[Expression]) => NfkcNormalize(exprs(0))))
    e.injectOptimizerRule(_ => LevenshteinPrefilter)
    e.injectOptimizerRule(_ => JaroWinklerPrefilter)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
