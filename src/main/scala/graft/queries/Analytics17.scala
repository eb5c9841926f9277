package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Analytics wave 17 — risk and operational analytics: drawdown, tail risk,
  * burstiness, and quantile-forecast grading.
  *
  *  - maximum drawdown over the cumulative monthly revenue curve — the
  *    classic peak-to-trough risk readout, fully DECIMAL-exact (cumsum,
  *    running max, and differences never leave decimal)
  *  - CVaR / expected shortfall (rank-based, interpolation-free): the mean
  *    of the top-5% tail per group, with VaR as the exact k-th data value
  *  - Goh–Barabási burstiness index B = (σ−μ)/(σ+μ) of per-user
  *    inter-event gaps — the human-dynamics diagnostic
  *  - pinball (quantile) loss at τ ∈ {0.1, 0.5, 0.9} grading a per-weekday
  *    empirical-quantile forecast on a train/test split of the daily series
  *
  * Scale posture: drawdown runs on the ≤|months| calendar rollup
  * (sanctioned grain class); CVaR windows partition BY GROUP; burstiness
  * is per-user keyed lag algebra; pinball lives on the ≤31-row daily
  * frame. Determinism: gaps/revenues/ranks are exact integers/decimals;
  * σ chains are pinned IEEE; quantile interpolation feeds only
  * round-absorbed arithmetic (never set membership).
  */
object Analytics17 {

  private val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
  private val DEC4 = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 4)

  val queries: Seq[Q] = Seq(

    // Maximum drawdown over cumulative monthly revenue: dd_t = max_{s≤t}
    // cum_s − cum_t. Revenue, cumulative sum, running max, and drawdown all
    // stay in DECIMAL (window sums of decimals are exact and associative;
    // max is an exact compare), so the readout is bit-stable with no
    // rounding discipline needed — the only double appears at output cast.
    // Windows run on the ≤|months| (80-row) calendar rollup.
    Q("stats_max_drawdown",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .groupBy(date_trunc("month", $"o_orderdate").cast("date")
            .as("month"))
          .agg(sum($"o_totalprice".cast(DEC4)).as("rev"))
          .withColumn("cum", sum($"rev").over(w))
          .withColumn("runmax", max($"cum").over(w))
          .select($"month", $"rev".cast("double").as("revenue"),
            ($"runmax" - $"cum").cast("double").as("drawdown"),
            ($"runmax" === $"cum").as("at_peak"))
          .orderBy($"month")
      },
      Some("""WITH m AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
             |      AS month,
             |    SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS rev
             |  FROM orders GROUP BY 1),
             |c1 AS (
             |  SELECT month, rev, SUM(rev) OVER w AS cum
             |  FROM m
             |  WINDOW w AS (ORDER BY month
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |c AS (
             |  SELECT month, rev, cum, MAX(cum) OVER w AS runmax
             |  FROM c1
             |  WINDOW w AS (ORDER BY month
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT month, CAST(rev AS DOUBLE) AS revenue,
             |  CAST(runmax - cum AS DOUBLE) AS drawdown,
             |  runmax = cum AS at_peak
             |FROM c ORDER BY month""".stripMargin)),

    // CVaR / expected shortfall at the 95% level per order priority,
    // rank-based (no quantile interpolation, so no cross-engine ulp
    // surface): the tail is the top k = ⌈n/20⌉ prices under a unique
    // (price desc, orderkey) order, VaR is the exact k-th data value, and
    // the tail mean is a decimal-exact sum. Windows partition BY GROUP
    // (the agg_median_positional shape) — never a global frame.
    Q("agg_cvar_expected_shortfall",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        val wn = Window.partitionBy($"o_orderpriority")
        t(s, dir, "orders")
          .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .filter($"rn" <= ($"n" + 19) / 20)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_tail"),
            min($"o_totalprice").as("var_95"),
            (dsum($"o_totalprice", 4) / count(lit(1))).as("cvar_95"))
          .select($"o_orderpriority", $"n_tail", $"var_95",
            round($"cvar_95", 6).as("cvar_95"))
          .orderBy($"o_orderpriority")
      },
      Some("""WITH r AS (
             |  SELECT o_orderpriority, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
             |  FROM orders)
             |SELECT o_orderpriority, COUNT(*) AS n_tail,
             |  MIN(o_totalprice) AS var_95,
             |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
             |      AS DOUBLE) / COUNT(*), 6) AS cvar_95
             |FROM r WHERE rn <= (n + 19) / 20
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of per-user inter-event gaps
    // (B→−1 periodic, 0 Poisson, →1 bursty). Gaps are exact microsecond
    // longs from a per-user lag; squares accumulate in DECIMAL(38,0) (a
    // 30-day gap squared overflows BIGINT); the σ/μ/B chain is pinned IEEE.
    // Readout: user counts and decimal-exact mean B per B-decile bucket.
    Q("events_burstiness_index",
      (s, dir) => {
        import s.implicits._
        val wu = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val gaps = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id")
          .withColumn("gap",
            unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(wu))
          .filter($"gap".isNotNull)
        val per = gaps.groupBy($"user_id")
          .agg(count(lit(1)).as("ng"), sum($"gap").as("sg"),
            sum($"gap".cast("decimal(38,0)") * $"gap").as("ssg"))
          .withColumn("mu", $"sg".cast("double") / $"ng".cast("double"))
          .withColumn("sigma",
            sqrt(($"ssg".cast("double") -
              $"sg".cast("double") * $"sg".cast("double") /
                $"ng".cast("double")) / $"ng".cast("double")))
          .withColumn("b", ($"sigma" - $"mu") / ($"sigma" + $"mu"))
        per.groupBy(floor($"b" * 10.0d).cast("int").as("b_decile"))
          .agg(count(lit(1)).as("n_users"),
            round(sum($"b".cast(DEC)).cast("double") / count(lit(1)), 6)
              .as("avg_b"))
          .orderBy($"b_decile")
      },
      Some("""WITH gaps AS (
             |  SELECT user_id,
             |    epoch_us(ts) - lag(epoch_us(ts))
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM events),
             |per AS (
             |  SELECT user_id, COUNT(*) AS ng,
             |    CAST(SUM(gap) AS BIGINT) AS sg,
             |    SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS ssg
             |  FROM gaps WHERE gap IS NOT NULL GROUP BY 1),
             |b AS (
             |  SELECT (sigma - mu) / (sigma + mu) AS b FROM (
             |    SELECT CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS mu,
             |      sqrt((CAST(ssg AS DOUBLE) -
             |        CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
             |          CAST(ng AS DOUBLE)) / CAST(ng AS DOUBLE)) AS sigma
             |    FROM per))
             |SELECT CAST(floor(b * 10.0) AS INT) AS b_decile,
             |  COUNT(*) AS n_users,
             |  round(CAST(SUM(CAST(b AS DECIMAL(30,12))) AS DOUBLE) /
             |    COUNT(*), 6) AS avg_b
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Pinball (quantile) loss grading a per-weekday empirical-quantile
    // forecast: quantiles of the first-21-day daily counts per weekday,
    // evaluated on the remaining days at τ ∈ {0.1, 0.5, 0.9} —
    // L_τ = mean(max(τ(y−q), (τ−1)(y−q))). Quantile values feed ONLY
    // round-absorbed arithmetic (never row-set membership), so engine
    // interpolation ulp cannot flip the result; per-day losses accumulate
    // decimal-exact. Everything lives on the ≤31-row daily frame.
    Q("events_pinball_loss",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("idx", row_number().over(Window.orderBy($"day")))
          .withColumn("dow",
            datediff($"day", lit("2024-01-01").cast("date")) % 7)
        val fc = daily.filter($"idx" <= 21)
          .groupBy($"dow")
          .agg(expr("percentile(c, array(0.1D, 0.5D, 0.9D))").as("qs"))
          .select($"dow", element_at($"qs", 1).as("q10"),
            element_at($"qs", 2).as("q50"), element_at($"qs", 3).as("q90"))
        def pin(tau: Double, q: Column): Column = {
          val e = $"c".cast("double") - q
          greatest(lit(tau) * e, lit(tau - 1.0d) * e).cast(DEC)
        }
        daily.filter($"idx" > 21)
          .join(broadcast(fc), "dow")
          .agg(count(lit(1)).as("n_test"),
            round(sum(pin(0.1d, $"q10")).cast("double") / count(lit(1)), 6)
              .as("pinball_10"),
            round(sum(pin(0.5d, $"q50")).cast("double") / count(lit(1)), 6)
              .as("pinball_50"),
            round(sum(pin(0.9d, $"q90")).cast("double") / count(lit(1)), 6)
              .as("pinball_90"))
      },
      Some("""WITH daily AS (
             |  SELECT day, c,
             |    row_number() OVER (ORDER BY day) AS idx,
             |    date_diff('day', DATE '2024-01-01', day) % 7 AS dow
             |  FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
             |        FROM events GROUP BY 1)),
             |fc AS (
             |  SELECT dow, quantile_cont(c, 0.1) AS q10,
             |    quantile_cont(c, 0.5) AS q50, quantile_cont(c, 0.9) AS q90
             |  FROM daily WHERE idx <= 21 GROUP BY 1)
             |SELECT COUNT(*) AS n_test,
             |  round(CAST(SUM(CAST(greatest(0.1 * (CAST(c AS DOUBLE) - q10),
             |    (0.1 - 1.0) * (CAST(c AS DOUBLE) - q10)) AS DECIMAL(30,12)))
             |    AS DOUBLE) / COUNT(*), 6) AS pinball_10,
             |  round(CAST(SUM(CAST(greatest(0.5 * (CAST(c AS DOUBLE) - q50),
             |    (0.5 - 1.0) * (CAST(c AS DOUBLE) - q50)) AS DECIMAL(30,12)))
             |    AS DOUBLE) / COUNT(*), 6) AS pinball_50,
             |  round(CAST(SUM(CAST(greatest(0.9 * (CAST(c AS DOUBLE) - q90),
             |    (0.9 - 1.0) * (CAST(c AS DOUBLE) - q90)) AS DECIMAL(30,12)))
             |    AS DOUBLE) / COUNT(*), 6) AS pinball_90
             |FROM daily JOIN fc USING (dow) WHERE idx > 21""".stripMargin))
  )
}
