package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Round-10 wave nine: sequential-filter recursions (Kalman, theta), time
  * deviation statistics (Allan variance, Hurst R/S), storage-layout and
  * packing audits — same contract as every family (scale-shaped plans,
  * decimal-exact cross-partition reductions, total ORDER BY, DuckDB oracle
  * per query). */
object Analytics8 {

  val queries: Seq[Q] = Seq(

    // Per-user 1D Kalman filter (constant-level model, pinned Q=0.1 R=1)
    // over each user's daily value series: the classical recursive
    // smoother — state x folds innovation v−x by gain K = P/(P+R); P
    // shrinks as evidence accumulates. Distributed the streaming way:
    // user-keyed groups, bounded per-group state; the recursion is pure
    // pinned-IEEE arithmetic, so the DuckDB recursive CTE steps the exact
    // same doubles (the events_holt_linear identical-recursion contract;
    // inputs are decimal-exact daily sums).
    Q("events_kalman_filter",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy($"user_id", date_format(date_trunc("day", $"ts"),
            "yyyy-MM-dd").as("day"))
          .agg(dsum($"value").as("v"))
          .select($"user_id".as[Long], $"day".as[String], $"v".as[Double])
          .as[(Long, String, Double)]
        daily.groupByKey(_._1)
          .mapGroups { (uid, it) =>
            val vs = it.toArray.sortBy(_._2).map(_._3)
            var x = vs(0)
            var p = 1.0d
            var k = 0.0d
            var i = 1
            while (i < vs.length) {
              val pp = p + 0.1d
              k = pp / (pp + 1.0d)
              x = x + k * (vs(i) - x)
              p = (1.0d - k) * pp
              i += 1
            }
            (uid, vs.length.toLong, x, p, k)
          }
          .toDF("user_id", "n_days", "x_hat", "p_var", "gain")
          .orderBy($"user_id")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT user_id, date_trunc('day', ts) AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT user_id, v,
             |    row_number() OVER (PARTITION BY user_id ORDER BY day)
             |      AS rn
             |  FROM daily),
             |nn AS (SELECT user_id, MAX(rn) AS n FROM idx GROUP BY 1),
             |kf AS (
             |  SELECT user_id, 1 AS rn, v AS x, CAST(1.0 AS DOUBLE) AS p,
             |    CAST(0.0 AS DOUBLE) AS k
             |  FROM idx WHERE rn = 1
             |  UNION ALL
             |  SELECT kf.user_id, kf.rn + 1,
             |    kf.x + ((kf.p + 0.1) / (kf.p + 0.1 + 1.0))
             |      * (i.v - kf.x),
             |    (1.0 - (kf.p + 0.1) / (kf.p + 0.1 + 1.0)) * (kf.p + 0.1),
             |    (kf.p + 0.1) / (kf.p + 0.1 + 1.0)
             |  FROM kf JOIN idx i
             |    ON i.user_id = kf.user_id AND i.rn = kf.rn + 1)
             |SELECT kf.user_id, CAST(nn.n AS BIGINT) AS n_days,
             |  kf.x AS x_hat, kf.p AS p_var, kf.k AS gain
             |FROM kf JOIN nn ON nn.user_id = kf.user_id AND kf.rn = nn.n
             |ORDER BY kf.user_id""".stripMargin)),

    // Per-user theta-method forecast: exact OLS trend (long day-index
    // moments × decimal-exact daily sums), SES (α=0.5, pinned) over the
    // θ=2 line z_t = 2v_t − (a + b·t), forecast = ½·SES + ½·trend(n+1) —
    // the M3-winning forecaster, decomposed exactly as published.
    // User-keyed groups with bounded state; the SES recursion is
    // pinned-IEEE on decimal-exact inputs, so the recursive-CTE oracle
    // steps identical doubles.
    Q("events_theta_forecast",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy($"user_id", date_format(date_trunc("day", $"ts"),
            "yyyy-MM-dd").as("day"))
          .agg(dsum($"value").as("v"))
          .select($"user_id".as[Long], $"day".as[String], $"v".as[Double])
          .as[(Long, String, Double)]
        daily.groupByKey(_._1)
          .flatMapGroups { (uid, it) =>
            val vs = it.toArray.sortBy(_._2).map(_._3)
            val n = vs.length
            if (n < 3) Iterator.empty
            else {
              // exact OLS on t = 1..n: all t-moments are integers; the
              // v-moments are sums of decimal-exact doubles accumulated
              // in BigDecimal so partitioning can never reorder them
              // valueOf = shortest-string decimal, which for these
              // scale-4-exact daily sums IS the DECIMAL(30,8) cast the
              // oracle applies per term
              var sv = java.math.BigDecimal.ZERO
              var stv = java.math.BigDecimal.ZERO
              var i = 0
              while (i < n) {
                val bd = java.math.BigDecimal.valueOf(vs(i))
                sv = sv.add(bd)
                stv = stv.add(bd.multiply(
                  java.math.BigDecimal.valueOf(i + 1L)))
                i += 1
              }
              val nL = n.toLong
              val st = nL * (nL + 1) / 2
              val stt = nL * (nL + 1) * (2 * nL + 1) / 6
              val b = (nL * stv.doubleValue() - st * sv.doubleValue()) /
                (nL * stt - st * st).toDouble
              val a = (sv.doubleValue() - b * st) / nL
              var ses = 2.0d * vs(0) - (a + b)
              i = 1
              while (i < n) {
                val z = 2.0d * vs(i) - (a + b * (i + 1))
                ses = 0.5d * z + 0.5d * ses
                i += 1
              }
              Iterator.single((uid, nL, b, ses,
                0.5d * ses + 0.5d * (a + b * (n + 1))))
            }
          }
          .toDF("user_id", "n_days", "slope", "ses_theta", "forecast")
          .orderBy($"user_id")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT user_id, date_trunc('day', ts) AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT user_id, v,
             |    row_number() OVER (PARTITION BY user_id ORDER BY day)
             |      AS rn
             |  FROM daily),
             |mom AS (
             |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(v AS DECIMAL(30,8))) AS DOUBLE) AS sv,
             |    CAST(SUM(CAST(v AS DECIMAL(30,8)) * rn) AS DOUBLE) AS stv
             |  FROM idx GROUP BY user_id HAVING COUNT(*) >= 3),
             |ab AS (
             |  SELECT user_id, n,
             |    (n * stv - (n*(n+1)//2) * sv) /
             |      CAST(n * (n*(n+1)*(2*n+1)//6)
             |        - (n*(n+1)//2) * (n*(n+1)//2) AS DOUBLE) AS b,
             |    sv, n*(n+1)//2 AS st
             |  FROM mom),
             |ab2 AS (SELECT user_id, n, b,
             |    (sv - b * st) / CAST(n AS DOUBLE) AS a FROM ab),
             |ses AS (
             |  SELECT i.user_id, 1 AS rn,
             |    2.0 * i.v - (ab2.a + ab2.b) AS s
             |  FROM idx i JOIN ab2 ON ab2.user_id = i.user_id
             |  WHERE i.rn = 1
             |  UNION ALL
             |  SELECT ses.user_id, ses.rn + 1,
             |    0.5 * (2.0 * i.v - (ab2.a + ab2.b * (ses.rn + 1)))
             |      + 0.5 * ses.s
             |  FROM ses
             |  JOIN idx i ON i.user_id = ses.user_id
             |    AND i.rn = ses.rn + 1
             |  JOIN ab2 ON ab2.user_id = ses.user_id)
             |SELECT ab2.user_id, ab2.n AS n_days, ab2.b AS slope,
             |  ses.s AS ses_theta,
             |  0.5 * ses.s + 0.5 * (ab2.a + ab2.b * (ab2.n + 1))
             |    AS forecast
             |FROM ses JOIN ab2 ON ab2.user_id = ses.user_id
             |  AND ses.rn = ab2.n
             |ORDER BY ab2.user_id""".stripMargin)),

    // Allan variance of the daily event-count series at τ ∈ {1,2,4}:
    // non-overlapping τ-day block means, AVAR(τ) = Σ(ȳ_{k+1}−ȳ_k)² /
    // (2(M−1)) — the clock-stability statistic that separates white noise
    // (slope −1) from random walk (slope +1), here the burstiness-
    // stability probe of event arrival. Complete blocks only; the τ
    // fan-out is a sanctioned 3-row cross; all frames after the daily agg
    // are ≤|days|.
    Q("stats_allan_variance",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .select(datediff($"day", lit("2024-01-01").cast("date"))
            .cast("long").as("t"), $"c")
          .localCheckpoint()
        val taus = Seq(1, 2, 4).toDF("tau")
        val blocks = daily.crossJoin(broadcast(taus))
          .groupBy($"tau", expr("t div tau").as("blk"))
          .agg(count(lit(1)).as("nb"), sum($"c").cast("long").as("sc"))
          .filter($"nb" === $"tau")
          .select($"tau", $"blk",
            ($"sc".cast("double") / $"tau".cast("double")).as("ybar"))
          .localCheckpoint()
        blocks.select($"tau", $"blk", $"ybar")
          .join(blocks.select($"tau", ($"blk" - 1).as("blk"),
            $"ybar".as("ynext")), Seq("tau", "blk"))
          .groupBy($"tau")
          .agg(count(lit(1)).as("m_pairs"),
            dsum(($"ynext" - $"ybar") * ($"ynext" - $"ybar"), 8).as("sd"))
          .select($"tau", ($"m_pairs" + 1).as("m_blocks"),
            round($"sd" / (lit(2.0d) * $"m_pairs"), 6).as("avar"))
          .orderBy($"tau")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS t,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |taus AS (SELECT unnest([1, 2, 4]) AS tau),
             |blocks AS (
             |  SELECT tau, t // tau AS blk, COUNT(*) AS nb,
             |    CAST(SUM(c) AS BIGINT) AS sc
             |  FROM daily CROSS JOIN taus
             |  GROUP BY tau, t // tau
             |  HAVING COUNT(*) = tau),
             |yb AS (SELECT tau, blk,
             |    CAST(sc AS DOUBLE) / CAST(tau AS DOUBLE) AS ybar
             |  FROM blocks),
             |pairs AS (
             |  SELECT a.tau, b.ybar - a.ybar AS d
             |  FROM yb a JOIN yb b ON b.tau = a.tau AND b.blk = a.blk + 1)
             |SELECT tau, CAST(COUNT(*) + 1 AS BIGINT) AS m_blocks,
             |  round(CAST(SUM(CAST(d * d AS DECIMAL(30,8))) AS DOUBLE)
             |    / (2.0 * COUNT(*)), 6) AS avar
             |FROM pairs GROUP BY tau ORDER BY tau""".stripMargin)),

    // Hurst exponent by rescaled-range analysis of the daily event-count
    // series: per window size n ∈ {4,8,16}, split into complete blocks,
    // R = range of the within-block cumulative deviation (block-keyed
    // window cumsum), S = population std (decimal-exact moments),
    // H = OLS slope of ln(R/S) on ln(n) over the three points — the
    // long-range-dependence probe (H≈0.5 memoryless, H→1 trending).
    // Every frame after the daily agg is ≤|days|·3 rows.
    Q("stats_hurst_rs",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .select(datediff($"day", lit("2024-01-01").cast("date"))
            .cast("long").as("t"), $"c")
          .localCheckpoint()
        val sizes = Seq(4, 8, 16).toDF("wn")
        val blk = daily.crossJoin(broadcast(sizes))
          .select($"wn", expr("t div wn").as("blk"), $"t", $"c")
        val complete = blk.groupBy($"wn", $"blk")
          .agg(count(lit(1)).as("nb"), sum($"c").cast("long").as("sc"),
            sum($"c" * $"c").cast("long").as("scc"))
          .filter($"nb" === $"wn")
          .select($"wn", $"blk", $"sc", $"scc",
            ($"sc".cast("double") / $"wn".cast("double")).as("mu"),
            sqrt((($"wn" * $"scc" - $"sc" * $"sc").cast("double")) /
              ($"wn" * $"wn").cast("double")).as("sd"))
          .localCheckpoint()
        val w = Window.partitionBy($"wn", $"blk").orderBy($"t")
        val cum = blk.join(complete.select($"wn", $"blk", $"mu", $"sd"),
            Seq("wn", "blk"))
          .withColumn("cumdev",
            sum($"c".cast("double") - $"mu").over(w))
        val rs = cum.groupBy($"wn", $"blk", $"sd")
          .agg((max($"cumdev") - min($"cumdev")).as("r"))
          .filter($"sd" > 0.0d)
          .groupBy($"wn")
          .agg(count(lit(1)).as("m"), dsum($"r" / $"sd", 8).as("srs"))
          .select($"wn", $"m", ($"srs" / $"m").as("mean_rs"))
          .localCheckpoint()
        val fit = rs.agg(count(lit(1)).as("k"),
            dsum(log($"wn".cast("double")), 12).as("sx"),
            dsum(log($"mean_rs"), 12).as("sy"),
            dsum(log($"wn".cast("double")) * log($"mean_rs"), 12).as("sxy"),
            dsum(log($"wn".cast("double")) * log($"wn".cast("double")), 12)
              .as("sxx"))
          .select((($"k" * $"sxy" - $"sx" * $"sy") /
            ($"k" * $"sxx" - $"sx" * $"sx")).as("hurst"))
        rs.crossJoin(broadcast(fit))
          .select($"wn", $"m".as("m_blocks"),
            round($"mean_rs", 6).as("mean_rs"),
            round($"hurst", 6).as("hurst"))
          .orderBy($"wn")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS t,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |sizes AS (SELECT unnest([4, 8, 16]) AS wn),
             |blk AS (
             |  SELECT wn, t // wn AS blk, t, c FROM daily
             |  CROSS JOIN sizes),
             |complete AS (
             |  SELECT wn, blk, COUNT(*) AS nb,
             |    CAST(SUM(c) AS BIGINT) AS sc,
             |    CAST(SUM(c * c) AS BIGINT) AS scc
             |  FROM blk GROUP BY wn, blk HAVING COUNT(*) = wn),
             |stats AS (
             |  SELECT wn, blk,
             |    CAST(sc AS DOUBLE) / CAST(wn AS DOUBLE) AS mu,
             |    sqrt(CAST(wn * scc - sc * sc AS DOUBLE)
             |      / CAST(wn * wn AS DOUBLE)) AS sd
             |  FROM complete),
             |cum AS (
             |  SELECT b.wn, b.blk, s.sd,
             |    SUM(CAST(b.c AS DOUBLE) - s.mu)
             |      OVER (PARTITION BY b.wn, b.blk ORDER BY b.t)
             |      AS cumdev
             |  FROM blk b JOIN stats s ON s.wn = b.wn AND s.blk = b.blk),
             |rs AS (
             |  SELECT wn, CAST(COUNT(*) AS BIGINT) AS m,
             |    CAST(SUM(CAST(r / sd AS DECIMAL(30,8))) AS DOUBLE)
             |      / COUNT(*) AS mean_rs
             |  FROM (
             |    SELECT wn, blk, sd,
             |      MAX(cumdev) - MIN(cumdev) AS r
             |    FROM cum GROUP BY wn, blk, sd)
             |  WHERE sd > 0 GROUP BY wn),
             |fit AS (
             |  SELECT
             |    (COUNT(*) * CAST(SUM(CAST(ln(CAST(wn AS DOUBLE))
             |        * ln(mean_rs) AS DECIMAL(30,12))) AS DOUBLE)
             |      - CAST(SUM(CAST(ln(CAST(wn AS DOUBLE))
             |          AS DECIMAL(30,12))) AS DOUBLE)
             |        * CAST(SUM(CAST(ln(mean_rs) AS DECIMAL(30,12)))
             |            AS DOUBLE))
             |    / (COUNT(*) * CAST(SUM(CAST(ln(CAST(wn AS DOUBLE))
             |        * ln(CAST(wn AS DOUBLE)) AS DECIMAL(30,12)))
             |          AS DOUBLE)
             |      - CAST(SUM(CAST(ln(CAST(wn AS DOUBLE))
             |          AS DECIMAL(30,12))) AS DOUBLE)
             |        * CAST(SUM(CAST(ln(CAST(wn AS DOUBLE))
             |            AS DECIMAL(30,12))) AS DOUBLE)) AS hurst
             |  FROM rs)
             |SELECT wn, m AS m_blocks, round(mean_rs, 6) AS mean_rs,
             |  round(hurst, 6) AS hurst
             |FROM rs, fit ORDER BY wn""".stripMargin))
  )
}
