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

  /** Exact upper-triangle Gram (second-moment) accumulation for `array<float>`
    * vectors — distributed linear algebra as ONE aggregation instead of an
    * n·d²-row explode+shuffle. Each product v_p·v_q (p ≤ q) is rounded
    * HALF_UP at scale 12 of its shortest-string decimal form — bit-identical
    * to Spark's `(vp*vq).cast(decimal(30,12))` (the FloatVecDotExact rule) —
    * and accumulated as a scaled long; partial buffers are d(d+1)/2-cell long
    * arrays that merge by exact addition, so the result is
    * partitioning-independent and equals the decimal-sum DataFrame
    * formulation bit for bit (spec-enforced). `finish` converts each cell
    * with the same decimal→double rounding as `CAST(dec AS DOUBLE)`.
    *
    * Capacity: |cell| < 2^63 scaled units ⇔ Σ|v_p·v_q| < 9.2e6 per cell —
    * ~2.3M unit-normish vectors; past that `addExact` fails loudly (switch
    * to the decimal-sum formulation, which this aggregator must always
    * match, rather than silently wrapping). */
  class GramExact(dims: Int)
    extends Aggregator[Array[Float], Array[Long], Array[Double]] {
    private val cells = dims * (dims + 1) / 2
    override def zero: Array[Long] = new Array[Long](cells)
    /** Scaled-long HALF_UP rounding of `prod`'s shortest-string decimal form.
      * Fast path: `prod * 1e12` differs from the true scaled value by < ~2e-3
      * units (double-multiply error + shortest-string vs exact-binary gap,
      * both bounded by ulps at |prod| ≤ ~4e6), so when the nearest integer is
      * farther than 0.01 from the half-boundary it is provably the HALF_UP
      * result and the BigDecimal materialization (the hot-path cost: a
      * Double.toString per term) is skipped; boundary-adjacent values take
      * the exact slow path. Spec-enforced bit-equal to the decimal cast. */
    @inline private def scaled12(prod: Double): Long = {
      val r = prod * 1e12
      if (math.abs(r) < 9.0e15) { // double is integer-exact past 2^53: be safe
        val n = Math.rint(r)
        if (math.abs(math.abs(r - n) - 0.5) > 0.01) return n.toLong
      }
      java.math.BigDecimal.valueOf(prod)
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    override def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
      var k = 0
      var p = 0
      while (p < dims) {
        val vp = a(p).toDouble
        var q = p
        while (q < dims) {
          b(k) = Math.addExact(b(k), scaled12(vp * a(q).toDouble))
          k += 1
          q += 1
        }
        p += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var k = 0
      while (k < cells) { x(k) = Math.addExact(x(k), y(k)); k += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Double] =
      b.map(u => java.math.BigDecimal.valueOf(u, 12).doubleValue())
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
