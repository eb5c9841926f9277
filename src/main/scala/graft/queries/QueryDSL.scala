package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
