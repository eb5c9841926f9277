package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression — the text-cleaning
  * primitive every web-scale corpus pipeline runs before dedup/fingerprinting
  * (the same logical text arrives composed ("é") and decomposed ("e" + U+0301)
  * from different crawls, and every downstream hash/shingle/token operator would
  * treat them as distinct documents). Spark has no built-in for this; a Scala UDF
  * would fall out of whole-stage codegen, so like [[JaroWinkler]] this emits a
  * single static call and stays codegen-green in the map stage where it runs.
  *
  * NFC semantics follow `java.text.Normalizer` (Unicode standard annex #15),
  * which is what DuckDB's `nfc_normalize` implements too — the t2 oracle
  * hash-matches the two engines on mixed composed/decomposed input.
  * NFKC (compatibility composition: ligatures, full-width forms, superscripts
  * folded to their plain equivalents) is exposed for the aggressive-cleaning
  * path; DuckDB ships no NFKC fn, so its query is declared rows-only.
  */
abstract class NormalizeBase extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
}

case class NfcNormalize(child: Expression) extends NormalizeBase {
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UnicodeNormalizeImpl.nfc(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.UnicodeNormalizeImpl.nfc($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NfkcNormalize(child: Expression) extends NormalizeBase {
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(UnicodeNormalizeImpl.nfkc(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.UnicodeNormalizeImpl.nfkc($s.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalizeImpl {
  // Normalizer.isNormalized is a cheap scan; the common case (already-NFC web
  // text) then skips the allocating normalize pass entirely.
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  def nfkc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFKC)
}

object UnicodeNormalize {
  def nfc_normalize(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
  def nfkc_normalize(c: Column): Column = Bridge.column(NfkcNormalize(Bridge.expression(c)))

  /** Register both for SQL use in an existing session (same names DuckDB/Postgres
    * use for the NFC one, so oracle SQL and engine SQL read identically). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfkc_normalize", exprs => NfkcNormalize(exprs(0)), "scala_udf")
  }
}
