package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Shared plumbing for the t2 oracle query corpus.
  *
  * Determinism rules (BASELINE.md): the driver hashes the Spark result against DuckDB
  * running `oracle` on the same parquet tables, so every hashed query must be
  * bit-reproducible across engines AND across partitionings:
  *
  *  - every query ends in a total ORDER BY (ties broken down to a unique key);
  *  - double aggregations go through exact DECIMAL sums ([[QueryDSL.dsum]]): cast each
  *    value to DECIMAL (exact, ties vanishingly unlikely on random doubles), sum
  *    exactly (associative — partitioning-independent, unlike double sums), cast back
  *    to DOUBLE. Both engines then produce identical bits;
  *  - top-level output columns are scalars only (arrays are joined to strings);
  *  - approximate operators (HLL, percentile_approx, LSH) are BENCH-only, never hashed;
  *  - the double→decimal cast inside [[dsum]] is engine-divergent at rounding
  *    boundaries (Spark rounds the double's SHORTEST-STRING form, DuckDB its exact
  *    binary expansion). The divergence only materializes when the decimal grid is
  *    finer than the double's ulp — i.e. |value| ≳ 1e8 at scale 8 — which is why
  *    plain sums and ~1e5-magnitude revenue products are safe but large SQUARES are
  *    not. For moments of large-magnitude expressions, cast the (few-decimal)
  *    inputs to DECIMAL first and multiply in decimal so no product is ever
  *    double-rounded (see agg_stats_exact / agg_corr_exact).
  */
object QueryDSL {
  /** (session, scale-factor dir) => result */
  type QFn = (SparkSession, String) => DataFrame

  final case class Q(name: String, fn: QFn, oracle: Option[String])

  /** Order-insensitive exact sum of a double expression. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DataTypes.createDecimalType(30, scale))).cast("double")

  /** Order-insensitive exact mean: exact decimal sum / count, single double division. */
  def davg(c: Column, scale: Int = 4): Column = dsum(c, scale) / count(lit(1))

  /** DuckDB-side equivalent of [[dsum]]. */
  def sqlDsum(e: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** DuckDB-side equivalent of [[davg]]. */
  def sqlDavg(e: String, scale: Int = 4): String = s"${sqlDsum(e, scale)} / COUNT(*)"

  /** DuckDB: integer value of `len` hex nibbles of a hex-string expression starting
    * at 1-based `start` — the oracle mirror of Spark's
    * `conv(substring(hex, start, len), 16, 10)`. DuckDB has no hex-string→integer
    * cast, so the nibbles are summed positionally. Keep len ≤ 15 (fits BIGINT). */
  def sqlHexInt(hex: String, start: Int, len: Int): String =
    (0 until len).map { i =>
      val place = math.pow(16, len - 1 - i).toLong
      s"(instr('0123456789abcdef', substring($hex, ${start + i}, 1)) - 1) * CAST($place AS BIGINT)"
    }.mkString("(", " + ", ")")

  def t(s: SparkSession, dir: String, name: String): DataFrame = graft.Tables(s, dir, name)

  /** Distributed global row_number over a TOTAL order, without the classic
    * `row_number() OVER (ORDER BY ...)` single-reducer sort — the
    * scan_global_row_ids two-level pattern packaged for reuse:
    *
    *  1. bucket every row by `bucket`, a MONOTONE function of the leading order
    *     key (so bucket order refines to row order and ties never span buckets);
    *  2. count rows per bucket and prefix-sum offsets on the tiny bucket frame
    *     (the only single-partition window ever run is over |buckets| rows);
    *  3. rank within each bucket in parallel (hash-partitioned by bucket) and
    *     add the broadcast offset.
    *
    * Appends `rankCol` (1-based LONG global row number under `order`) and
    * `totalCol` (LONG frame row count — the N that NTILE math needs). `order`
    * must be a total order for the rank to be deterministic. */
  def bandedRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      rankCol: String, totalCol: String): DataFrame = {
    val b = df.withColumn("__band", bucket)
    val offs = b.groupBy(col("__band")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__band"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum(col("__cnt")).over(
        Window.orderBy(col("__band")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__band").as("__jband"), col("__off"), col(totalCol))
    // null-safe: a NULL bucket expression still forms a (correctly counted)
    // band — plain === would silently drop those rows vs the window semantics
    b.join(broadcast(offs), col("__band") <=> col("__jband"))
      .withColumn(rankCol,
        (col("__off") + row_number().over(
          Window.partitionBy(col("__band")).orderBy(order: _*))).cast("long"))
      .drop("__band", "__jband", "__off")
  }

  /** Exact NTILE(k) reconstructed from a 1-based global rank + total row count
    * (integer-only: the first `total mod k` tiles carry `⌈total/k⌉` rows, the
    * rest `⌊total/k⌋` — the ANSI definition). Composed with [[bandedRowNumber]]
    * this replaces `ntile(k) OVER (ORDER BY ...)` — which moves the WHOLE frame
    * through one reducer — with a fully parallel plan. Returns INT like
    * Spark's native ntile. */
  def ntileFromRank(rank: Column, total: Column, k: Int): Column = {
    val q = floor(total / lit(k)).cast("long")    // base tile size
    val rem = total % lit(k)                      // tiles carrying one extra row
    val cut = rem * (q + 1)                       // rows covered by the big tiles
    when(rank <= cut, floor((rank - 1) / (q + 1)) + 1)
      .otherwise(rem + floor((rank - lit(1) - cut) / q) + 1)
      .cast("int")
  }
}
