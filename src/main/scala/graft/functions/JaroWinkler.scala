package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler string similarity as native Catalyst expressions — the
  * name/record-linkage primitive Spark lacks (its built-in string-distance surface
  * stops at levenshtein/soundex). Semantics mirror the conventional definition as
  * shipped by DuckDB (`jaro_similarity` / `jaro_winkler_similarity`), which is
  * what the oracle hashes against:
  *
  *  - either side empty → 0.0 (not 1.0);
  *  - match window = max(len)/2 − 1 (clamped at 0), greedy left-to-right matching;
  *  - jaro = (m/len1 + m/len2 + (m − t/2)/m) / 3 with t = full transposition count;
  *  - Winkler boost only when jaro > 0.7: jw = jaro + min(prefix,4)·0.1·(1−jaro).
  *
  * `doGenCode` emits a single static call, so the expression stays inside
  * whole-stage codegen (no CodegenFallback row boxing) — at 100 TB this sits in
  * the inner loop of a banded candidate-pair join, same place as levenshtein in
  * the fuzzy-dedup path (and composes with the same length-delta prefilter idea:
  * a pair can only clear a JW threshold if lengths are comparable). Comparison is
  * over UTF-16 code units, identical to DuckDB's byte-wise walk for ASCII inputs;
  * the oracle queries keep inputs ASCII.
  */
abstract class JaroBase extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
}

case class JaroSimilarity(left: Expression, right: Expression) extends JaroBase {
  override def prettyName: String = "jaro_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jaro(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.jaro($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression) extends JaroBase {
  override def prettyName: String = "jaro_winkler_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jaroWinkler(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object JaroWinklerImpl {

  /** Code-point array view: lengths then agree with Spark's `length()` (which
    * counts code points), so the [[JaroWinklerPrefilter]] length-ratio guard is
    * sound on supplementary characters too (UTF-16 `charAt` would count
    * surrogate pairs as two units and diverge). */
  private def codePoints(s: String): Array[Int] = s.codePoints().toArray

  /** Jaro similarity; 0.0 when either side is empty or no characters match. */
  def jaro(a: String, b: String): Double = jaroCp(codePoints(a), codePoints(b))

  private def jaroCp(s1: Array[Int], s2: Array[Int]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val bound = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - bound)
      val hi = math.min(l2 - 1, i + bound)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // full transposition count over the two matched sequences, in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t / 2.0) / md) / 3.0
  }

  /** Winkler variant: prefix boost (≤4 chars, weight 0.1) only above 0.7. */
  def jaroWinkler(a: String, b: String): Double = {
    val s1 = codePoints(a)
    val s2 = codePoints(b)
    val sim = jaroCp(s1, s2)
    if (sim <= 0.7) return sim
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    var p = 0
    while (p < maxPrefix && s1(p) == s2(p)) p += 1
    sim + p * 0.1 * (1.0 - sim)
  }
}

/** Column-API + SQL-registry surface. */
object StringSimFunctions {

  def jaro_similarity(a: Column, b: Column): Column =
    Bridge.column(JaroSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def jaro_winkler_similarity(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Register both functions for SQL use in an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_similarity", exprs => JaroSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler_similarity",
      exprs => JaroWinklerSimilarity(exprs(0), exprs(1)), "scala_udf")
  }
}
