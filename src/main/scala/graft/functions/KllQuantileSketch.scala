package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable quantile sketches as native Catalyst aggregates — the quantile
  * counterpart of Spark's built-in `hll_sketch_agg` family, which Spark does not
  * provide (its `percentile_approx` summaries are not exposed as storable/
  * mergeable artifacts). Built on the DataSketches KLL sketch that ships with
  * Spark's own jars.
  *
  * Why this matters at 100 TB: a KLL sketch is a ~few-KB bounded-error summary
  * with an associative merge, so per-partition/per-day sketches can be stored as
  * BINARY columns and rolled up later — cross-period p99s from daily artifacts
  * without ever re-scanning the fact (the same incremental-aggregate pattern as
  * `agg_incremental_merge`, for quantiles). `TypedImperativeAggregate` keeps the
  * sketch as a live on-heap object between rows; serialization happens only at
  * partial-aggregate shuffle boundaries.
  *
  * Approximate by design ⇒ BENCH/rows-only surface, never oracle-hashed
  * (BASELINE.md determinism rules).
  */
/** Shared KLL buffer lifecycle — both aggregates differ only in what update()
  * feeds the sketch (raw doubles vs serialized sub-sketches) and the input type
  * they accept. */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  def k: Int
  protected def inputType: DataType
  /** Fold one non-null input value into the sketch. */
  protected def updateOne(buffer: KllDoublesSketch, value: Any): Unit

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = true

  final override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == inputType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${inputType.simpleString}, got " +
        child.dataType.simpleString)

  final override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  final override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) updateOne(buffer, v)
    buffer
  }

  final override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  final override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray

  final override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  final override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {

  def this(child: Expression) = this(child, 200)

  override def prettyName: String = "kll_sketch_agg"
  override protected def inputType: DataType = DoubleType
  override protected def updateOne(buffer: KllDoublesSketch, value: Any): Unit =
    buffer.update(value.asInstanceOf[Double])

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches (BINARY column → BINARY sketch) — the rollup
  * leg: fold previously-stored sketch artifacts without touching raw data. */
case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {

  def this(child: Expression) = this(child, 200)

  override def prettyName: String = "kll_merge_agg"
  override protected def inputType: DataType = BinaryType
  override protected def updateOne(buffer: KllDoublesSketch, value: Any): Unit =
    buffer.merge(
      KllDoublesSketch.heapify(Memory.wrap(value.asInstanceOf[Array[Byte]])))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile estimate from a serialized sketch (runs on the tiny aggregated frame —
  * CodegenFallback is fine there). */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, double rank), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object KllFunctions {
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(c), k).toAggregateExpression())
  def kll_merge_agg(c: Column, k: Int = 200): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(c), k).toAggregateExpression())
  def kll_quantile(sketch: Column, rank: Column): Column =
    Bridge.column(KllQuantile(Bridge.expression(sketch), Bridge.expression(rank)))

  /** Register the SQL spellings in an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // bare AggregateFunction builders — the analyzer wraps them (same pattern
    // as SketchFunctions.graft_bloom_agg)
    reg.createOrReplaceTempFunction("kll_sketch_agg",
      exprs => new KllSketchAgg(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("kll_merge_agg",
      exprs => new KllMergeAgg(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("kll_quantile",
      exprs => KllQuantile(exprs(0), exprs(1)), "scala_udf")
  }
}
