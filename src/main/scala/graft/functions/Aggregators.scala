package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (SURVEY.md §2b "UDF / UDAF / UDTF surface") via
  * `Aggregator[IN, BUF, OUT]` — merge-based, so Catalyst runs them as partial +
  * final aggregation (map-side combine) like any built-in. */
object Aggregators {

  /** Element-wise mean of float vectors (e.g. label centroids in one aggregation).
    * Buffer = (count, running sums); merge is associative. */
  class VectorMean(dims: Int)
    extends Aggregator[Array[Float], (Long, Array[Double]), Array[Double]] {
    override def zero: (Long, Array[Double]) = (0L, new Array[Double](dims))
    override def reduce(b: (Long, Array[Double]), a: Array[Float]): (Long, Array[Double]) = {
      val (n, s) = b
      var i = 0
      while (i < math.min(dims, a.length)) { s(i) += a(i); i += 1 }
      (n + 1, s)
    }
    override def merge(x: (Long, Array[Double]), y: (Long, Array[Double])): (Long, Array[Double]) = {
      val (nx, sx) = x; val (ny, sy) = y
      var i = 0
      while (i < dims) { sx(i) += sy(i); i += 1 }
      (nx + ny, sx)
    }
    override def finish(b: (Long, Array[Double])): Array[Double] = {
      val (n, s) = b
      if (n == 0) s else s.map(_ / n)
    }
    // native tuple/array encoding: partial buffers cross the shuffle as an
    // UnsafeRow (long, double[]), not a Java-serialized blob per group
    override def bufferEncoder: Encoder[(Long, Array[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Double])]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Exact bounded top-k of (score, id) pairs per group: buffer keeps only k entries,
    * so memory per group is O(k) regardless of group size — the aggregation analogue
    * of the windowed top-k. */
  class TopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    // rank order: higher score first, id ascending on ties
    private def outranks(x: (Double, Long), y: (Double, Long)): Boolean =
      x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (score, id) => (-score, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Nil
    // Invariant: the buffer stays rank-sorted, so the per-row path is a bounded
    // O(k) insert (common case O(1): the row doesn't beat the current floor) —
    // not an O(k log k) re-sort per input row.
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.size >= k && !outranks(a, b.last)) b
      else {
        val i = b.indexWhere(e => outranks(a, e))
        val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
        if (ins.size > k) ins.take(k) else ins
      }
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }
}
