package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native mergeable Catalyst aggregate.
  *
  * With `k` counters the summary GUARANTEES that every item whose true frequency
  * exceeds n/(k+1) survives — so it is a candidate GENERATOR, not an answer:
  * the oracle-hashed query re-joins the (≤ k) candidates against exact counts
  * and thresholds on those, which makes the final output deterministic even
  * though the candidate set itself depends on merge order (the two-phase
  * "sketch for candidates, exact for truth" pattern — the same shape as the
  * bloom-prefiltered semi join).
  *
  * At 100 TB: the buffer is a bounded k-entry map per partial aggregate (a few
  * KB), merges are associative by count-sum + (k+1)-th-largest subtraction
  * (Agarwal et al., "Mergeable Summaries", PODS'12), and the exact second pass
  * touches only rows whose key is in the broadcast candidate set.
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 16)

  override def prettyName: String = "mg_topk_candidates"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None => // decrement-all step; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (ky, c) => if (c <= 0) dead += ky }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (ky, c) => buf.update(ky, buf.getOrElse(ky, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, keep strictly-positive survivors
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (ky, c) => if (c <= 0) dead += ky }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    ArrayData.toArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  // length-prefixed UTF-8, not writeUTF: writeUTF caps keys at 65535 bytes and
  // would crash the partial-aggregate shuffle on long keys (whole-document or
  // large-JSON key columns)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (ky, c) =>
      val b = ky.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesFunctions {
  /** Sorted candidate array of frequent items; every item with true frequency
    * > n/(k+1) is guaranteed present. */
  def mg_topk_candidates(c: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(c), k).toAggregateExpression())
}
