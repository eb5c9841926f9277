package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table function (UDTF): streams `(pos, shingle)` rows of
  * word-`width` shingles over a token array — the generator analogue of the
  * reference's splitter archetype (one row → many), completing the UDTF surface
  * beyond `explode`.
  *
  * Why a Generator and not `posexplode(transform(...))`: the HOF formulation first
  * MATERIALIZES the full shingle array per row (length × width characters — for a
  * 100 k-token web document that is a multi-MB allocation per row, per stage) and
  * only then explodes it. A Generator emits one row at a time through
  * GenerateExec's lazy iterator, so peak memory per input row stays O(width words),
  * which is what survives a 100 TB corpus with heavy-tailed document lengths.
  *
  * Deterministic; rows are emitted in position order. Lives in the interpreted
  * GenerateExec path (CodegenFallback), same as most built-in generators' outer or
  * non-array cases.
  */
case class ShingleGen(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "shingle_gen"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = left.eval(input).asInstanceOf[ArrayData]
    val w = right.eval(input)
    if (arr == null || w == null) return Iterator.empty
    val width = w.asInstanceOf[Int]
    val count = arr.numElements() - width + 1
    if (width <= 0 || count <= 0) return Iterator.empty
    // Windows containing a null token are skipped (elementSchema declares shingle
    // non-nullable; a null element would otherwise NPE the task). Positions still
    // index the ORIGINAL token array, so surviving shingles stay addressable.
    (0 until count).iterator.flatMap { i =>
      var hasNull = false
      var j = 0
      while (j < width && !hasNull) { hasNull = arr.isNullAt(i + j); j += 1 }
      if (hasNull) Iterator.empty
      else {
        val sb = new java.lang.StringBuilder
        j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        Iterator.single(InternalRow(i, UTF8String.fromString(sb.toString)))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object ShingleGen {
  /** Register `shingle_gen` for SQL / LATERAL VIEW use in an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_gen", exprs => ShingleGen(exprs(0), exprs(1)), "scala_udf")
}
