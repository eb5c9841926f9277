package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDSL._
import graft.llm.{TextFunctions => TF}

/** Statistical / graph / experimentation analytics, second half — split from
  * [[Analytics]] (file-size hygiene, round 11; query names and plans are
  * unchanged). Same determinism contract as every family ([[QueryDSL]]):
  * decimal-exact moments, identical double expression trees on both engines,
  * total ORDER BY.
  *
  * Reference anchor: the reference's task archetypes end at opaque subprocess
  * transforms (`/root/reference/xetl/models/task.py:319-328`); these are the
  * engine-native analyses users would otherwise shell out for.
  */
object Analyticsb {

  val queries: Seq[Q] = Seq(

    // Benford first-digit audit (fraud / synthetic-data detection): the digit
    // comes from the DECIMAL STRING rendering (decimal→string is identical
    // across engines; a log10-based extraction would hash-diverge on
    // transcendental rounding). Map-only digit extraction + one 9-row rollup;
    // the share is a single double division per output row.
    Q("dq_benford_first_digit",
      (s, dir) => {
        import s.implicits._
        val d = substring($"o_totalprice".cast("decimal(18,2)").cast("string"), 1, 1)
        t(s, dir, "orders")
          .filter($"o_totalprice" > 0)
          .groupBy(d.cast("int").as("digit"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share",
            $"n".cast("double") / sum($"n").over(Window.partitionBy()))
          .orderBy($"digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
             |    AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM orders WHERE o_totalprice > 0)
             |SELECT digit, COUNT(*) AS n,
             |  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
             |FROM d GROUP BY digit ORDER BY digit""".stripMargin)),

    // Islands-and-gaps over an id sequence (completeness audit: "which ranges
    // of orderkeys are missing?"): the classic lead-minus-current formulation on
    // the DISTINCT key frame — one shuffle for distinct, one ordered window over
    // keys only. Emits each gap's [from, to] and width; total ORDER BY start.
    Q("dq_sequence_gaps",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"k")
        t(s, dir, "orders")
          // a sparse slice so real gaps exist at every scale factor
          .filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F")
          .select(($"o_orderkey" % 1000).as("k")).distinct()
          .withColumn("nxt", lead($"k", 1).over(w))
          .filter($"nxt" - $"k" > 1)
          .select(($"k" + 1).as("gap_from"), ($"nxt" - 1).as("gap_to"),
            ($"nxt" - $"k" - 1).as("gap_width"))
          .orderBy($"gap_from")
      },
      Some("""WITH ks AS (
             |  SELECT DISTINCT o_orderkey % 1000 AS k FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'),
             |g AS (
             |  SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM ks)
             |SELECT k + 1 AS gap_from, nxt - 1 AS gap_to,
             |  nxt - k - 1 AS gap_width
             |FROM g WHERE nxt - k > 1 ORDER BY gap_from""".stripMargin)),

    // Burst detection: each day's event count against its own trailing-7-day
    // mean (exact integer counts; the ratio is ONE double division). The window
    // runs over the tiny per-day aggregate — the fact table is touched once.
    // Flag = integer cross-multiplication (n * 2 > trailing_sum), so the boolean
    // is never at the mercy of double rounding.
    Q("events_burst_days",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"day").rowsBetween(-7, -1)
        t(s, dir, "events")
          .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n"))
          .withColumn("trail_n", sum($"n").over(w))
          .withColumn("trail_days", count($"n").over(w))
          .filter($"trail_days" >= 3)
          .select($"day", $"n",
            ($"n".cast("double") * $"trail_days" / $"trail_n").as("burst_ratio"),
            ($"n" * $"trail_days" > $"trail_n" * 2).as("is_burst"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1),
             |tr AS (
             |  SELECT day, n,
             |    SUM(n) OVER (ORDER BY day
             |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_n,
             |    COUNT(n) OVER (ORDER BY day
             |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_days
             |  FROM daily)
             |SELECT day, n,
             |  CAST(n AS DOUBLE) * trail_days / trail_n AS burst_ratio,
             |  n * trail_days > trail_n * 2 AS is_burst
             |FROM tr WHERE trail_days >= 3 ORDER BY day""".stripMargin)),

    // EWMA smoothing over the per-user daily series: a FIXED 8-tap exponential
    // kernel (α = 0.5) written as explicit lag() taps with a left-associated
    // weighted sum, normalized by the weight mass of the taps actually present.
    // The recursive EWMA definition cannot run distributed (each row depends on
    // the previous result); the windowed-kernel form is the standard scale-out
    // approximation — per-key parallel, one shuffle on user_id, identical IEEE
    // expression trees on both engines. Daily sums go through decimal first.
    Q("events_ewma_smooth",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables(s, dir, "events")
          .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
          .agg(dsum($"value").as("v"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val weights = (0 to 7).map(j => math.pow(0.5, j))
        val taps = (0 to 7).map(j => lag($"v", j).over(w))
        val num = taps.zip(weights).map { case (x, wt) =>
          coalesce(x, lit(0.0d)) * lit(wt) }.reduceLeft(_ + _)
        val den = taps.zip(weights).map { case (x, wt) =>
          when(x.isNotNull, lit(wt)).otherwise(lit(0.0d)) }.reduceLeft(_ + _)
        daily.select($"user_id", $"day", $"v",
            round((num / den), 6).as("ewma"))
          .orderBy($"user_id", $"day")
      },
      Some {
        val weights = (0 to 7).map(j => math.pow(0.5, j))
        val num = weights.zipWithIndex.map { case (wt, j) =>
          s"COALESCE(lag(v, $j) OVER w, 0.0) * $wt" }
          .reduceLeft((a, b) => s"($a + $b)")
        val den = weights.zipWithIndex.map { case (wt, j) =>
          s"CASE WHEN lag(v, $j) OVER w IS NOT NULL THEN $wt ELSE 0.0 END" }
          .reduceLeft((a, b) => s"($a + $b)")
        s"""WITH daily AS (
           |  SELECT user_id, date_trunc('day', ts) AS day,
           |    ${sqlDsum("value")} AS v
           |  FROM events GROUP BY 1, 2)
           |SELECT user_id, day, v, round(($num) / ($den), 6) AS ewma
           |FROM daily
           |WINDOW w AS (PARTITION BY user_id ORDER BY day)
           |ORDER BY user_id, day""".stripMargin
      }),

    // Winsorization (outlier clamping at exact p05/p95): thresholds come from the
    // exact interpolated percentile (quantile_cont semantics, as in
    // agg_percentile_cont), broadcast back onto the rows, and the clamped mean is
    // decimal-exact. Two passes over the grouped column — the unavoidable shape
    // for EXACT thresholds; the 100 TB variant swaps in the mergeable KLL sketch
    // thresholds (approx_kll_quantiles) with the same join structure.
    Q("feat_winsorize",
      (s, dir) => {
        import s.implicits._
        val th = t(s, dir, "orders")
          .groupBy($"o_orderstatus".as("st"))
          .agg(expr("percentile(o_totalprice, array(0.05D, 0.95D))").as("qs"))
          .select($"st", element_at($"qs", 1).as("p05"),
            element_at($"qs", 2).as("p95"))
        t(s, dir, "orders")
          .join(broadcast(th), $"o_orderstatus" === $"st")
          .select($"o_orderstatus",
            $"o_totalprice",
            least(greatest($"o_totalprice", $"p05"), $"p95").as("wv"),
            ($"o_totalprice" < $"p05").as("lo"),
            ($"o_totalprice" > $"p95").as("hi"),
            $"p05", $"p95")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum($"lo".cast("long")).as("n_clamped_low"),
            sum($"hi".cast("long")).as("n_clamped_high"),
            min($"p05").as("p05"), max($"p95").as("p95"),
            davg($"o_totalprice").as("mean_raw"),
            davg($"wv").as("mean_winsorized"))
          .orderBy($"o_orderstatus")
      },
      Some(s"""WITH th AS (
              |  SELECT o_orderstatus AS st,
              |    quantile_cont(o_totalprice, 0.05) AS p05,
              |    quantile_cont(o_totalprice, 0.95) AS p95
              |  FROM orders GROUP BY 1),
              |j AS (
              |  SELECT o_orderstatus, o_totalprice,
              |    least(greatest(o_totalprice, p05), p95) AS wv,
              |    o_totalprice < p05 AS lo, o_totalprice > p95 AS hi, p05, p95
              |  FROM orders JOIN th ON o_orderstatus = st)
              |SELECT o_orderstatus, COUNT(*) AS n,
              |  CAST(SUM(CAST(lo AS BIGINT)) AS BIGINT) AS n_clamped_low,
              |  CAST(SUM(CAST(hi AS BIGINT)) AS BIGINT) AS n_clamped_high,
              |  MIN(p05) AS p05, MAX(p95) AS p95,
              |  ${sqlDavg("o_totalprice")} AS mean_raw,
              |  ${sqlDavg("wv")} AS mean_winsorized
              |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Chi-square independence test (event_type × user cohort): the contingency
    // table INCLUDING empty cells (full cross of the two tiny margins — a
    // PLANS.md-style bounded densification), expected counts from exact integer
    // margin products, per-cell contributions summed through DECIMAL so the
    // statistic is partitioning-independent. The margins/cells are aggregates;
    // nothing driver-side.
    Q("events_chi_square",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables(s, dir, "events")
          .select($"event_type", ($"user_id" % 3).as("cohort"))
        val cells = ev.groupBy($"event_type", $"cohort").agg(count(lit(1)).as("o"))
        val rowM = ev.groupBy($"event_type").agg(count(lit(1)).as("rt"))
        val colM = ev.groupBy($"cohort").agg(count(lit(1)).as("ct"))
        val tot = ev.agg(count(lit(1)).as("n"))
        val grid = rowM.crossJoin(colM).crossJoin(tot)
          .join(cells, Seq("event_type", "cohort"), "left")
          .select($"event_type", $"cohort", $"rt", $"ct", $"n",
            coalesce($"o", lit(0L)).as("o"))
        val e = ($"rt" * $"ct").cast("double") / $"n"
        val contrib = (($"o" - e) * ($"o" - e)) / e
        grid.agg(
            sum(contrib.cast("decimal(30,12)")).cast("double").as("chi2"),
            countDistinct($"event_type").as("nr"),
            countDistinct($"cohort").as("nc"),
            count(lit(1)).as("n_cells"))
          .select(round($"chi2", 6).as("chi2"),
            (($"nr" - 1) * ($"nc" - 1)).as("dof"),
            $"n_cells")
      },
      Some("""WITH ev AS (SELECT event_type, user_id % 3 AS cohort FROM events),
             |cells AS (SELECT event_type, cohort, count(*) AS o
             |          FROM ev GROUP BY 1, 2),
             |rm AS (SELECT event_type, count(*) AS rt FROM ev GROUP BY 1),
             |cm AS (SELECT cohort, count(*) AS ct FROM ev GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM ev),
             |grid AS (
             |  SELECT rm.event_type, cm.cohort, rt, ct, n,
             |    COALESCE(cells.o, 0) AS o
             |  FROM rm CROSS JOIN cm CROSS JOIN tot
             |  LEFT JOIN cells ON cells.event_type = rm.event_type
             |                 AND cells.cohort = cm.cohort)
             |SELECT
             |  round(CAST(SUM(CAST(
             |    ((o - CAST(rt * ct AS DOUBLE) / n) *
             |     (o - CAST(rt * ct AS DOUBLE) / n)) /
             |      (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(30,12))) AS DOUBLE), 6)
             |    AS chi2,
             |  (count(DISTINCT event_type) - 1) * (count(DISTINCT cohort) - 1) AS dof,
             |  count(*) AS n_cells
             |FROM grid""".stripMargin)),

    // CUPED variance reduction (controlled-experiment metric adjustment): the
    // pre-period covariate x (first half of the month) adjusts the post-period
    // metric y via θ = cov(x,y)/var(x), computed from decimal-exact global
    // moments (the agg_regression_ols machinery); the per-arm CUPED mean is then
    // mean(y) − θ·(mean(x) − x̄). Two aggregations (per-user, then per-arm) plus
    // one broadcast of the 1-row moment frame — nothing driver-side, nothing
    // quadratic; identical IEEE finish trees on both engines.
    Q("events_ab_cuped",
      (s, dir) => {
        import s.implicits._
        val users = graft.Tables(s, dir, "events")
          .groupBy($"user_id")
          .agg(
            dsum(when(dayofmonth($"ts") <= 15, $"value").otherwise(lit(0.0d))).as("x"),
            dsum(when(dayofmonth($"ts") > 15, $"value").otherwise(lit(0.0d))).as("y"))
          .select($"user_id", ($"user_id" % 2).as("arm"),
            $"x".cast("decimal(18,4)").as("xd"), $"y".cast("decimal(18,4)").as("yd"))
        val mom = users.agg(count(lit(1)).as("n"),
          sum($"xd").cast("double").as("sx"),
          sum($"xd" * $"xd").cast("double").as("sxx"),
          sum($"yd").cast("double").as("sy"),
          sum($"xd" * $"yd").cast("double").as("sxy"))
        val theta = ($"sxy" - $"sx" * $"sy" / $"n") /
          ($"sxx" - $"sx" * $"sx" / $"n")
        users.groupBy($"arm")
          .agg(count(lit(1)).as("n_users"),
            sum($"xd").cast("double").as("ax"),
            sum($"yd").cast("double").as("ay"))
          .crossJoin(broadcast(mom))
          .select($"arm", $"n_users",
            round($"ay" / $"n_users", 6).as("mean_raw"),
            round($"ay" / $"n_users" -
              theta * ($"ax" / $"n_users" - $"sx" / $"n"), 6).as("mean_cuped"),
            round(theta, 6).as("theta"))
          .orderBy($"arm")
      },
      Some("""WITH u AS (
             |  SELECT user_id, user_id % 2 AS arm,
             |    CAST(CAST(SUM(CAST(CASE WHEN dayofmonth(ts) <= 15 THEN value
             |      ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS DECIMAL(18,4)) AS xd,
             |    CAST(CAST(SUM(CAST(CASE WHEN dayofmonth(ts) > 15 THEN value
             |      ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS DECIMAL(18,4)) AS yd
             |  FROM events GROUP BY user_id),
             |m AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(xd) AS DOUBLE) AS sx, CAST(SUM(xd * xd) AS DOUBLE) AS sxx,
             |    CAST(SUM(yd) AS DOUBLE) AS sy, CAST(SUM(xd * yd) AS DOUBLE) AS sxy
             |  FROM u),
             |a AS (
             |  SELECT arm, COUNT(*) AS n_users,
             |    CAST(SUM(xd) AS DOUBLE) AS ax, CAST(SUM(yd) AS DOUBLE) AS ay
             |  FROM u GROUP BY arm)
             |SELECT arm, n_users,
             |  round(ay / n_users, 6) AS mean_raw,
             |  round(ay / n_users -
             |    ((sxy - sx * sy / n) / (sxx - sx * sx / n)) *
             |      (ax / n_users - sx / n), 6) AS mean_cuped,
             |  round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS theta
             |FROM a CROSS JOIN m ORDER BY arm""".stripMargin)),

    // Quantile normalization across sources (batch-effect removal): each value is
    // replaced by the POOLED distribution's value at its within-source percentile.
    // The pooled quantile grid is 101 exact interpolated quantiles (one bounded
    // aggregate, broadcast back), the within-source rank is a per-source window —
    // so the whole transform is one window + one broadcast join; no global sort
    // of the corpus.
    Q("feat_quantile_normalize",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"source", $"n_chars")
        val pr = percent_rank().over(
          Window.partitionBy($"source").orderBy($"n_chars", $"doc_id"))
        val ranked = docs.select($"doc_id", $"source", $"n_chars",
          round(pr * 100, 0).cast("int").as("centile"))
        val gridArr = (0 to 100).map(i => s"${i / 100.0}D").mkString(", ")
        val grid = docs
          .agg(expr(s"percentile(n_chars, array($gridArr))").as("qs"))
          .select(posexplode($"qs").as(Seq("centile", "qval")))
        ranked.join(broadcast(grid), Seq("centile"))
          .select($"doc_id", $"source", $"n_chars", round($"qval", 6).as("normalized"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
             |r AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(round(percent_rank() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) * 100, 0) AS INTEGER) AS centile
             |  FROM d),
             |qs AS (
             |  SELECT quantile_cont(n_chars,
             |    list_transform(generate_series(0, 100), i -> i / 100.0)) AS q
             |  FROM d),
             |g AS (
             |  SELECT i - 1 AS centile, q[i] AS qval
             |  FROM qs, generate_series(1, 101) t(i))
             |SELECT doc_id, source, n_chars, round(qval, 6) AS normalized
             |FROM r JOIN g USING (centile)
             |ORDER BY doc_id""".stripMargin)),

    // ISO-week calendar rollup: ISO week number plus the ISO WEEK-YEAR (the year
    // of that week's Thursday — weeks 52/53/1 straddle January 1, so the plain
    // calendar year mislabels boundary weeks). Spark has no isoyear(); the
    // Thursday trick derives it from arithmetic only, so both engines agree
    // exactly. One map-side-combined rollup on (iso_year, iso_week).
    Q("events_iso_week_rollup",
      (s, dir) => {
        import s.implicits._
        val d = $"o_orderdate".cast("date")
        val isoDow = ((dayofweek(d) + lit(5)) % 7) + 1
        val thursday = date_add(d, lit(4) - isoDow)
        t(s, dir, "orders")
          .groupBy(year(thursday).as("iso_year"), weekofyear(d).as("iso_week"))
          .agg(count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("sum_price"),
            min(d).as("first_day"))
          .orderBy($"iso_year", $"iso_week")
      },
      Some(s"""SELECT
              |  CAST(isoyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_year,
              |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
              |  COUNT(*) AS n_orders,
              |  ${sqlDsum("o_totalprice")} AS sum_price,
              |  MIN(CAST(o_orderdate AS DATE)) AS first_day
              |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Weighted single-source shortest path (Bellman-Ford relaxations as joins):
    // the Pregel-style companion of graph_bfs_hops for WEIGHTED edges — each
    // round joins the current distance frame to the edge list, takes the per-node
    // MIN candidate, and folds it in; localCheckpoint cuts the growing lineage
    // exactly like graph_pagerank. Distances stay DECIMAL throughout, so min()
    // comparisons and the final values are engine-exact (no float-accumulation
    // order sensitivity). 4 rounds bound the plan; the oracle unrolls the same
    // 4 relaxations as chained CTEs.
    Q("graph_shortest_path_weighted",
      (s, dir) => {
        import s.implicits._
        val edges = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", $"l_quantity")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .filter($"c_nationkey" =!= $"s_nationkey")
          .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .agg(min($"l_quantity".cast("decimal(18,2)")).as("w"))
          .localCheckpoint()
        val nodes = edges.select($"src".as("node"))
          .union(edges.select($"dst".as("node"))).distinct()
        val dist0 = nodes.withColumn("d",
          when($"node" === 0, lit(BigDecimal(0)).cast("decimal(18,2)")))
        // Fixpoint early-exit (FixpointLoop doc): the reached set (d not null)
        // only grows and each reached d is monotone non-increasing, in EXACT
        // decimal(18,2) arithmetic — an unchanged (non-null count, exact sum)
        // signature pins the table; bit-identical to 4 fixed relax rounds.
        val dist = graft.ops.FixpointLoop.iterate(dist0, 4,
          Seq(count($"d"), sum($"d"))) { prev =>
          val best = prev.filter($"d".isNotNull)
            .join(edges, $"node" === $"src")
            .groupBy($"dst".as("bnode")).agg(min($"d" + $"w").as("best"))
          prev.join(best, $"node" === $"bnode", "left")
            .select($"node",
              when($"d".isNull, $"best")
                .when($"best".isNull, $"d")
                .when($"best" < $"d", $"best")
                .otherwise($"d").as("d"))
            .localCheckpoint()
        }
        dist.select($"node", $"d".cast("double").as("dist")).orderBy($"node")
      },
      Some {
        def relax(prev: String, i: Int): String =
          s"""r$i AS (
             |  SELECT e.dst AS bnode, MIN($prev.d + e.w) AS best
             |  FROM $prev JOIN e ON e.src = $prev.node
             |  WHERE $prev.d IS NOT NULL GROUP BY 1),
             |d$i AS (
             |  SELECT p.node,
             |    CASE WHEN p.d IS NULL THEN r.best
             |         WHEN r.best IS NULL THEN p.d
             |         WHEN r.best < p.d THEN r.best ELSE p.d END AS d
             |  FROM $prev p LEFT JOIN r$i r ON p.node = r.bnode)""".stripMargin
        s"""WITH e AS (
           |  SELECT c_nationkey AS src, s_nationkey AS dst,
           |    MIN(CAST(l_quantity AS DECIMAL(18,2))) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey GROUP BY 1, 2),
           |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |d0 AS (SELECT node,
           |  CASE WHEN node = 0 THEN CAST(0 AS DECIMAL(18,2)) END AS d FROM n),
           |${relax("d0", 1)},
           |${relax("d1", 2)},
           |${relax("d2", 3)},
           |${relax("d3", 4)}
           |SELECT node, CAST(d AS DOUBLE) AS dist FROM d4 ORDER BY node""".stripMargin
      }),

    // Event-type co-occurrence / association mining (support + lift): the "market
    // basket" is a (user, hour) cell; pair candidates come from a SELF-JOIN on
    // the basket key (equi — per-basket fanout is bounded by the type vocabulary,
    // never corpus-quadratic), margins and the basket total from two cheap
    // rollups. Lift's integer cross-products stay exact; the final ratio is one
    // double division, rounded.
    Q("events_type_cooccurrence",
      (s, dir) => {
        import s.implicits._
        val baskets = graft.Tables(s, dir, "events")
          .select($"user_id", date_trunc("hour", $"ts").as("minute"), $"event_type")
          .distinct()
        val pairs = baskets.as("a")
          .join(baskets.as("b"),
            $"a.user_id" === $"b.user_id" && $"a.minute" === $"b.minute" &&
              $"a.event_type" < $"b.event_type")
          .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
          .agg(count(lit(1)).as("n_pair"))
        val margins = baskets.groupBy($"event_type").agg(count(lit(1)).as("n_type"))
        val total = baskets.select($"user_id", $"minute").distinct()
          .agg(count(lit(1)).as("n_baskets"))
        pairs
          .join(broadcast(margins.select($"event_type".as("type_a"), $"n_type".as("na"))),
            Seq("type_a"))
          .join(broadcast(margins.select($"event_type".as("type_b"), $"n_type".as("nb"))),
            Seq("type_b"))
          .crossJoin(broadcast(total))
          .select($"type_a", $"type_b", $"n_pair",
            round(($"n_pair" * $"n_baskets").cast("double") / ($"na" * $"nb"), 6)
              .as("lift"))
          .orderBy($"type_a", $"type_b")
      },
      Some("""WITH baskets AS (
             |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS minute, event_type
             |  FROM events),
             |pairs AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    count(*) AS n_pair
             |  FROM baskets a JOIN baskets b
             |    ON a.user_id = b.user_id AND a.minute = b.minute
             |   AND a.event_type < b.event_type
             |  GROUP BY 1, 2),
             |m AS (SELECT event_type, count(*) AS n_type FROM baskets GROUP BY 1),
             |tot AS (SELECT count(*) AS n_baskets FROM
             |        (SELECT DISTINCT user_id, minute FROM baskets))
             |SELECT type_a, type_b, n_pair,
             |  round(CAST(n_pair * n_baskets AS DOUBLE) / (ma.n_type * mb.n_type), 6)
             |    AS lift
             |FROM pairs
             |JOIN m ma ON ma.event_type = type_a
             |JOIN m mb ON mb.event_type = type_b
             |CROSS JOIN tot
             |ORDER BY type_a, type_b""".stripMargin)),

    // Longest consecutive-day streak per user — the gaps-and-islands MAX-run
    // readout (sessionize finds the islands; this ranks them). The island id is
    // the classic day_number − row_number difference: constant within a
    // consecutive run, strictly increasing across gaps. Two key-partitioned
    // aggregations; no self-joins.
    Q("events_streak_longest",
      (s, dir) => {
        import s.implicits._
        val days = graft.Tables(s, dir, "events")
          .select($"user_id", $"ts".cast("date").as("day")).distinct()
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val runs = days
          .withColumn("grp",
            datediff($"day", lit("2024-01-01").cast("date")) -
              row_number().over(w))
          .groupBy($"user_id", $"grp")
          .agg(count(lit(1)).as("run_len"), min($"day").as("run_start"))
        runs.groupBy($"user_id")
          .agg(max($"run_len").as("longest_streak"),
            sum($"run_len").as("active_days"),
            count(lit(1)).as("n_runs"))
          .orderBy($"user_id")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |runs AS (
             |  SELECT user_id,
             |    datediff('day', DATE '2024-01-01', day) -
             |      row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp,
             |    day
             |  FROM days),
             |r2 AS (
             |  SELECT user_id, grp, count(*) AS run_len FROM runs
             |  GROUP BY user_id, grp)
             |SELECT user_id, MAX(run_len) AS longest_streak,
             |  CAST(SUM(run_len) AS BIGINT) AS active_days,
             |  count(*) AS n_runs
             |FROM r2 GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Shannon-entropy behavioral diversity per user: −Σ p·ln p over the user's
    // event-type distribution. Each type's contribution goes through DECIMAL
    // before the per-user sum (an unordered double sum would be partitioning-
    // dependent); p is an exact integer ratio. High entropy = diversified usage;
    // 0 = single-type users.
    Q("events_entropy_diversity",
      (s, dir) => {
        import s.implicits._
        val cnt = graft.Tables(s, dir, "events")
          .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy($"user_id").agg(sum($"c").as("n"))
        val p = $"c".cast("double") / $"n"
        cnt.join(tot, Seq("user_id"))
          .select($"user_id", $"n",
            (-(p * log(p))).cast("decimal(30,12)").as("e"))
          .groupBy($"user_id")
          .agg(max($"n").as("n_events"),
            round(sum($"e").cast("double"), 9).as("entropy"))
          .orderBy($"user_id")
      },
      Some("""WITH cnt AS (
             |  SELECT user_id, event_type, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n
             |        FROM cnt GROUP BY 1),
             |e AS (
             |  SELECT cnt.user_id, n,
             |    CAST(-((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))
             |      AS DECIMAL(30,12)) AS e
             |  FROM cnt JOIN tot ON cnt.user_id = tot.user_id)
             |SELECT user_id, MAX(n) AS n_events,
             |  round(CAST(SUM(e) AS DOUBLE), 9) AS entropy
             |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Growth accounting (daily user lifecycle states): each active user-day is
    // NEW (first ever), RETAINED (active the day before) or RESURRECTED (gap
    // > 1 day); a user CHURNS on the day after an activity run ends (bounded to
    // the observed horizon). Two per-user windows (lag + lead over distinct
    // active days), one day-level rollup — the standard DAU decomposition, no
    // self-joins, no calendar cross.
    Q("events_lifecycle_states",
      (s, dir) => {
        import s.implicits._
        val days = graft.Tables(s, dir, "events")
          .select($"user_id", $"ts".cast("date").as("day")).distinct()
        val horizon = days.agg(max($"day").as("max_day"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val marked = days
          .withColumn("prev", lag($"day", 1).over(w))
          .withColumn("next", lead($"day", 1).over(w))
        val active = marked.select($"day",
          when($"prev".isNull, "new")
            .when(datediff($"day", $"prev") === 1, "retained")
            .otherwise("resurrected").as("state"))
        val churn = marked
          .filter($"next".isNull || datediff($"next", $"day") > 1)
          .select(date_add($"day", 1).as("day"), lit("churned").as("state"))
          .crossJoin(broadcast(horizon))
          .filter($"day" <= $"max_day")
          .select($"day", $"state")
        active.unionByName(churn)
          .groupBy($"day")
          .agg(
            sum(when($"state" === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when($"state" === "retained", 1L).otherwise(0L)).as("n_retained"),
            sum(when($"state" === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
            sum(when($"state" === "churned", 1L).otherwise(0L)).as("n_churned"))
          .orderBy($"day")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |h AS (SELECT MAX(day) AS max_day FROM days),
             |m AS (
             |  SELECT user_id, day,
             |    lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev,
             |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
             |  FROM days),
             |active AS (
             |  SELECT day,
             |    CASE WHEN prev IS NULL THEN 'new'
             |         WHEN datediff('day', prev, day) = 1 THEN 'retained'
             |         ELSE 'resurrected' END AS state
             |  FROM m),
             |churn AS (
             |  SELECT day + 1 AS day, 'churned' AS state
             |  FROM m CROSS JOIN h
             |  WHERE (next IS NULL OR datediff('day', day, next) > 1)
             |    AND day + 1 <= max_day),
             |u AS (SELECT * FROM active UNION ALL SELECT * FROM churn)
             |SELECT day,
             |  CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_new,
             |  CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_retained,
             |  CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_resurrected,
             |  CAST(SUM(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_churned
             |FROM u GROUP BY day ORDER BY day""".stripMargin)),

    // Day-of-week seasonality index: each weekday's event rate relative to the
    // overall daily mean (index 1.0 = flat). Counts stay integers until a single
    // cross-multiplied double ratio — daily means never materialize separately,
    // so the index is engine-exact before rounding. ISO weekday via arithmetic
    // (Spark has no isodow; same trick as the ISO-week rollup).
    Q("events_seasonality_dow",
      (s, dir) => {
        import s.implicits._
        val d = $"ts".cast("date")
        val daily = graft.Tables(s, dir, "events")
          .groupBy(d.as("day")).agg(count(lit(1)).as("n"))
          .select($"day", $"n", (((dayofweek($"day") + lit(5)) % 7) + 1).as("dow"))
        val byDow = daily.groupBy($"dow")
          .agg(sum($"n").as("events"), count(lit(1)).as("days"))
        val tot = daily.agg(sum($"n").as("tot_events"), count(lit(1)).as("tot_days"))
        byDow.crossJoin(broadcast(tot))
          .select($"dow", $"events", $"days",
            round(($"events" * $"tot_days").cast("double") /
              ($"days" * $"tot_events"), 9).as("seasonality_index"))
          .orderBy($"dow")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |  FROM events GROUP BY 1),
             |byDow AS (
             |  SELECT isodow(day) AS dow, CAST(SUM(n) AS BIGINT) AS events,
             |    count(*) AS days
             |  FROM daily GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_events,
             |               count(*) AS tot_days FROM daily)
             |SELECT CAST(dow AS INTEGER) AS dow, events, days,
             |  round(CAST(events * tot_days AS DOUBLE) / (days * tot_events), 9)
             |    AS seasonality_index
             |FROM byDow CROSS JOIN tot ORDER BY dow""".stripMargin)),

    // Degree distribution of the nation trade graph: out/in degrees per node
    // from one aggregation each, then the degree histogram (how many nodes have
    // degree k) — the first diagnostic of any graph workload's skew before
    // running pagerank/BFS on it.
    Q("graph_degree_distribution",
      (s, dir) => {
        import s.implicits._
        // one shipping week only — the full-period graph is complete (every
        // nation trades with every nation) and its histogram is a single row
        val e = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-03-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1997-03-08").cast("timestamp"))
          .select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .filter($"src" =!= $"dst")
          .distinct()
        val outDeg = e.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
        outDeg.groupBy($"deg")
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy($"deg")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |    AND l_shipdate >= TIMESTAMP '1997-03-01'
             |    AND l_shipdate <  TIMESTAMP '1997-03-08'),
             |d AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src)
             |SELECT deg, count(*) AS n_nodes
             |FROM d GROUP BY deg ORDER BY deg""".stripMargin)),

    // 30-day ROLLING Pearson correlation between two daily series (count vs
    // quantity): the windowed form of agg_corr_exact. The raw table collapses to
    // the daily grain first (the only full-data pass — map-side combinable), so
    // the unpartitioned ordered window only ever sees |days| rows regardless of
    // corpus size; moments are decimal window sums (exact, associative) and the
    // correlation readout is the identical IEEE double tree on both engines.
    // Partial leading windows are skipped (n = 30) so every emitted row has a
    // full frame — no 0/0 NaN boundary to diverge on.
    Q("win_rolling_corr",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "lineitem")
          .groupBy(to_date($"l_shipdate").as("day"))
          .agg(count(lit(1)).cast("decimal(18,2)").as("x"),
            sum($"l_quantity".cast("decimal(18,2)")).as("y"))
        val w = Window.orderBy($"day").rowsBetween(-29, 0)
        val n = count(lit(1)).over(w).cast("double")
        daily.select($"day", n.as("n"),
            sum($"x").over(w).cast("double").as("sx"),
            sum($"x" * $"x").over(w).cast("double").as("sxx"),
            sum($"y").over(w).cast("double").as("sy"),
            sum($"y" * $"y").over(w).cast("double").as("syy"),
            sum($"x" * $"y").over(w).cast("double").as("sxy"))
          .filter($"n" === 30.0d)
          .select($"day",
            (($"n" * $"sxy" - $"sx" * $"sy") /
              sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
                   ($"n" * $"syy" - $"sy" * $"sy"))).as("corr30"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(l_shipdate AS DATE) AS day,
             |    CAST(COUNT(*) AS DECIMAL(18,2)) AS x,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS y
             |  FROM lineitem GROUP BY 1),
             |w AS (
             |  SELECT day,
             |    CAST(COUNT(*) OVER win AS DOUBLE) AS n,
             |    CAST(SUM(x) OVER win AS DOUBLE) AS sx,
             |    CAST(SUM(x*x) OVER win AS DOUBLE) AS sxx,
             |    CAST(SUM(y) OVER win AS DOUBLE) AS sy,
             |    CAST(SUM(y*y) OVER win AS DOUBLE) AS syy,
             |    CAST(SUM(x*y) OVER win AS DOUBLE) AS sxy
             |  FROM daily
             |  WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING
             |                 AND CURRENT ROW))
             |SELECT day,
             |  (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy)) AS corr30
             |FROM w WHERE n = 30.0 ORDER BY day""".stripMargin)),

    // Autocorrelation function of the daily event-count series at lags 1..7 —
    // the time-series diagnostic behind seasonality detection. The series is the
    // aggregated daily frame (|days| rows); the 7 lags come from a map-side
    // generator (explode of a literal array — no join, no BNLJ), then each lag
    // pairs via ONE equi-join on the shifted date. Decimal-exact sums,
    // identical double readout (the agg_corr_exact discipline).
    Q("events_autocorr_lag",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).cast("decimal(18,2)").as("c"))
        val nD = $"n_pairs".cast("double")
        daily.select($"day", $"c",
            explode(array((1 to 7).map(lit): _*)).as("k"))
          .join(daily.select($"day".as("pday"), $"c".as("pc")),
            date_sub($"day", $"k") === $"pday")
          .select($"k", $"c".as("x"), $"pc".as("y"))
          .groupBy($"k")
          .agg(count(lit(1)).as("n_pairs"),
            sum($"x").cast("double").as("sx"),
            sum($"x" * $"x").cast("double").as("sxx"),
            sum($"y").cast("double").as("sy"),
            sum($"y" * $"y").cast("double").as("syy"),
            sum($"x" * $"y").cast("double").as("sxy"))
          .select($"k", $"n_pairs",
            ((nD * $"sxy" - $"sx" * $"sy") /
              sqrt((nD * $"sxx" - $"sx" * $"sx") *
                   (nD * $"syy" - $"sy" * $"sy"))).as("autocorr"))
          .orderBy($"k")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS DECIMAL(18,2)) AS c
             |  FROM events GROUP BY 1),
             |lagged AS (
             |  SELECT day, c, unnest([1, 2, 3, 4, 5, 6, 7]) AS k FROM daily),
             |pairs AS (
             |  SELECT l.k, l.c AS x, p.c AS y
             |  FROM lagged l JOIN daily p ON p.day = l.day - l.k),
             |g AS (
             |  SELECT k, COUNT(*) AS n_pairs,
             |    CAST(SUM(x) AS DOUBLE) AS sx,
             |    CAST(SUM(x*x) AS DOUBLE) AS sxx,
             |    CAST(SUM(y) AS DOUBLE) AS sy,
             |    CAST(SUM(y*y) AS DOUBLE) AS syy,
             |    CAST(SUM(x*y) AS DOUBLE) AS sxy
             |  FROM pairs GROUP BY k)
             |SELECT k, n_pairs,
             |  (CAST(n_pairs AS DOUBLE)*sxy - sx*sy) /
             |    sqrt((CAST(n_pairs AS DOUBLE)*sxx - sx*sx) *
             |         (CAST(n_pairs AS DOUBLE)*syy - sy*sy)) AS autocorr
             |FROM g ORDER BY k""".stripMargin)),

    // Zipf-law fit over the corpus vocabulary: OLS of ln(frequency) on ln(rank)
    // for the top-200 tokens — the standard corpus-health diagnostic (natural
    // text slopes ≈ −1; generated/templated text diverges). Reuses the
    // text_vocab_build rank pipeline (one token-count shuffle; the top-200 frame
    // is tiny), then one closed-form regression readout — ln() and the double
    // combination are identical expression trees on both engines, sums go
    // through decimal at scale 9 (|ln| ≤ 12, far under the rounding-divergence
    // threshold).
    Q("text_zipf_fit",
      (s, dir) => {
        import s.implicits._
        val nD = $"n_ranks".cast("double")
        val slope = (nD * $"sxy" - $"sx" * $"sy") /
          (nD * $"sxx" - $"sx" * $"sx")
        t(s, dir, "documents")
          .select(explode(TF.tokens($"text")).as("token"))
          .groupBy($"token").agg(count(lit(1)).as("n"))
          // top-200 via distributed TakeOrdered FIRST (per-partition top-k +
          // merge); the single-partition rank window then runs over 200 rows,
          // never the full vocabulary rollup
          .orderBy($"n".desc, $"token").limit(200)
          .withColumn("r", row_number().over(Window.orderBy($"n".desc, $"token")))
          .select(log($"r".cast("double")).as("x"),
            log($"n".cast("double")).as("y"))
          .agg(count(lit(1)).as("n_ranks"),
            dsum($"x", 9).as("sx"), dsum($"x" * $"x", 9).as("sxx"),
            dsum($"y", 9).as("sy"), dsum($"y" * $"y", 9).as("syy"),
            dsum($"x" * $"y", 9).as("sxy"))
          .select($"n_ranks", slope.as("slope"),
            (($"sy" - slope * $"sx") / nD).as("intercept"),
            (((nD * $"sxy" - $"sx" * $"sy") * (nD * $"sxy" - $"sx" * $"sy")) /
              ((nD * $"sxx" - $"sx" * $"sx") *
               (nD * $"syy" - $"sy" * $"sy"))).as("r2"))
      },
      Some(s"""WITH t AS (
              |  SELECT unnest(${duckToks("text")}) AS token FROM documents),
              |c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token),
              |rk AS (
              |  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token)
              |              AS DOUBLE)) AS x,
              |    ln(CAST(n AS DOUBLE)) AS y
              |  FROM c
              |  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, token) <= 200),
              |g AS (
              |  SELECT COUNT(*) AS n_ranks,
              |    ${sqlDsum("x", 9)} AS sx, ${sqlDsum("x*x", 9)} AS sxx,
              |    ${sqlDsum("y", 9)} AS sy, ${sqlDsum("y*y", 9)} AS syy,
              |    ${sqlDsum("x*y", 9)} AS sxy
              |  FROM rk)
              |SELECT n_ranks,
              |  (CAST(n_ranks AS DOUBLE)*sxy - sx*sy) /
              |    (CAST(n_ranks AS DOUBLE)*sxx - sx*sx) AS slope,
              |  (sy - ((CAST(n_ranks AS DOUBLE)*sxy - sx*sy) /
              |         (CAST(n_ranks AS DOUBLE)*sxx - sx*sx)) * sx) /
              |    CAST(n_ranks AS DOUBLE) AS intercept,
              |  ((CAST(n_ranks AS DOUBLE)*sxy - sx*sy) *
              |   (CAST(n_ranks AS DOUBLE)*sxy - sx*sy)) /
              |    ((CAST(n_ranks AS DOUBLE)*sxx - sx*sx) *
              |     (CAST(n_ranks AS DOUBLE)*syy - sy*sy)) AS r2
              |FROM g""".stripMargin)),

    // Geospatial nearest-center assignment (haversine): every point joins its
    // closest of k facility centers — the geodesic twin of the k-means assign
    // step. The 25 centers collapse to ONE sorted array row (a sanctioned
    // single-row scalar cross; at 100 TB this is a broadcast variable, never a
    // pair explosion) and the per-point argmin is a map-side HOF over that
    // array — no point ever shuffles. Coordinates are derived deterministically
    // from keys (the synthetic schema carries no geo columns); the great-circle
    // formula is the identical libm double tree on both engines (fn_trig
    // precedent), and ties break on center key via the struct sort.
    Q("geo_nearest_center",
      (s, dir) => {
        import s.implicits._
        val centers = t(s, dir, "nation")
          .select($"n_nationkey".cast("double").as("ck"),
            (lit(-60.0d) + lit(5.5d) * $"n_nationkey").as("clat"),
            (lit(-170.0d) + lit(13.7d) * $"n_nationkey").as("clon"))
          .agg(sort_array(collect_list(struct($"ck", $"clat", $"clon")))
            .as("cs"))
        t(s, dir, "supplier")
          .select($"s_suppkey",
            (lit(-85.0d) + ($"s_suppkey" * 7919L % 1700L) / 10.0d).as("plat"),
            (lit(-180.0d) + ($"s_suppkey" * 104729L % 3599L) / 10.0d).as("plon"))
          .crossJoin(centers)
          .withColumn("best", expr(
            // degree→radian via one explicit multiply by the π/180 double
            // literal: radians() associates differently across engines
            // (Java's toRadians is x/180*π) and would drift a ULP
            """array_sort(transform(cs, c -> struct(
              |  2.0D * 6371.0D * asin(sqrt(
              |    sin((c.clat - plat) * 0.017453292519943295D / 2.0D) *
              |    sin((c.clat - plat) * 0.017453292519943295D / 2.0D) +
              |    cos(plat * 0.017453292519943295D) *
              |    cos(c.clat * 0.017453292519943295D) *
              |    sin((c.clon - plon) * 0.017453292519943295D / 2.0D) *
              |    sin((c.clon - plon) * 0.017453292519943295D / 2.0D)))
              |    AS dist_km,
              |  c.ck AS ck)))[0]""".stripMargin))
          .groupBy($"best.ck".as("center_key"))
          .agg(count(lit(1)).as("n_points"),
            min($"best.dist_km").as("min_km"),
            max($"best.dist_km").as("max_km"))
          .orderBy($"center_key")
      },
      Some("""WITH centers AS (
             |  SELECT CAST(n_nationkey AS DOUBLE) AS ck,
             |    -60.0 + 5.5 * n_nationkey AS clat,
             |    -170.0 + 13.7 * n_nationkey AS clon
             |  FROM nation),
             |pts AS (
             |  SELECT s_suppkey,
             |    -85.0 + (s_suppkey * 7919 % 1700) / 10.0 AS plat,
             |    -180.0 + (s_suppkey * 104729 % 3599) / 10.0 AS plon
             |  FROM supplier),
             |d AS (
             |  SELECT s_suppkey, ck,
             |    2.0 * 6371.0 * asin(sqrt(
             |      sin((clat - plat) * 0.017453292519943295 / 2.0) *
             |      sin((clat - plat) * 0.017453292519943295 / 2.0) +
             |      cos(plat * 0.017453292519943295) *
             |      cos(clat * 0.017453292519943295) *
             |      sin((clon - plon) * 0.017453292519943295 / 2.0) *
             |      sin((clon - plon) * 0.017453292519943295 / 2.0))) AS dist_km
             |  FROM pts CROSS JOIN centers),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY s_suppkey
             |    ORDER BY dist_km, ck) AS rn FROM d)
             |SELECT ck AS center_key, COUNT(*) AS n_points,
             |  MIN(dist_km) AS min_km, MAX(dist_km) AS max_km
             |FROM r WHERE rn = 1 GROUP BY ck ORDER BY center_key""".stripMargin)),

    // Common-neighbor link prediction over the undirected trade graph: for every
    // NON-adjacent node pair, count shared neighbors and score Jaccard overlap
    // of the neighborhoods — the classic "who should be connected" graph query.
    // Candidate pairs come from an equi-join of the adjacency list with itself
    // ON THE SHARED NEIGHBOR (never an all-pairs cross); existing edges drop via
    // an anti-join; degrees broadcast back. At 100 TB the shared-neighbor join
    // is the standard scalable shape, with hub skew bounded by degree-capping
    // the adjacency list first (not needed at this graph's size).
    Q("graph_link_prediction",
      (s, dir) => {
        import s.implicits._
        val raw = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-06-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-06-08").cast("timestamp"))
          .select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y"))
          .filter($"x" =!= $"y")
        val ue = raw.select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
          .distinct().localCheckpoint()
        val nbrs = ue.select($"a".as("u"), $"b".as("v"))
          .unionByName(ue.select($"b".as("u"), $"a".as("v")))
        val deg = nbrs.groupBy($"u").agg(count(lit(1)).as("d"))
        val cand = nbrs.select($"u".as("u1"), $"v".as("w"))
          .join(nbrs.select($"u".as("u2"), $"v".as("w2")),
            $"w" === $"w2" && $"u1" < $"u2")
          .groupBy($"u1", $"u2").agg(count(lit(1)).as("common_cnt"))
          .join(ue, $"u1" === $"a" && $"u2" === $"b", "left_anti")
        cand
          .join(broadcast(deg.select($"u".as("u1"), $"d".as("d1"))), Seq("u1"))
          .join(broadcast(deg.select($"u".as("u2"), $"d".as("d2"))), Seq("u2"))
          .select($"u1", $"u2", $"common_cnt",
            ($"common_cnt".cast("double") /
              ($"d1" + $"d2" - $"common_cnt")).as("jaccard"))
          .orderBy($"common_cnt".desc, $"u1", $"u2").limit(20)
      },
      Some("""WITH raw AS (
             |  SELECT c_nationkey AS x, s_nationkey AS y
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |    AND l_shipdate >= TIMESTAMP '1997-06-01'
             |    AND l_shipdate <  TIMESTAMP '1997-06-08'),
             |ue AS (
             |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw),
             |nbrs AS (
             |  SELECT a AS u, b AS v FROM ue
             |  UNION ALL SELECT b AS u, a AS v FROM ue),
             |deg AS (SELECT u, count(*) AS d FROM nbrs GROUP BY u),
             |cand AS (
             |  SELECT n1.u AS u1, n2.u AS u2, count(*) AS common_cnt
             |  FROM nbrs n1 JOIN nbrs n2 ON n1.v = n2.v AND n1.u < n2.u
             |  GROUP BY n1.u, n2.u),
             |nonadj AS (
             |  SELECT c.* FROM cand c
             |  WHERE NOT EXISTS (SELECT 1 FROM ue
             |                    WHERE ue.a = c.u1 AND ue.b = c.u2))
             |SELECT u1, u2, common_cnt,
             |  CAST(common_cnt AS DOUBLE) / (d1.d + d2.d - common_cnt) AS jaccard
             |FROM nonadj
             |JOIN deg d1 ON d1.u = u1
             |JOIN deg d2 ON d2.u = u2
             |ORDER BY common_cnt DESC, u1, u2 LIMIT 20""".stripMargin)),

    // Community detection via synchronous weighted label propagation (LPA), 3
    // unrolled rounds over the undirected trade graph of a 3-day shipping
    // window (the full-year graph is near-complete and LPA correctly collapses
    // it to one community — the sparse slice is what has structure: 5
    // communities over 25 nations at sf0.01): each node adopts the
    // label with the largest incident edge-weight sum among its neighbors
    // (ties to the smallest label — the determinism rule that makes sync LPA
    // hashable; async LPA is order-dependent by construction). Each round is
    // ONE key-partitioned join + two grouped aggregations — the Pregel shape in
    // plain DataFrames, like graph_pagerank; no driver-side state. At 100 TB
    // the per-round shuffle carries |E| (neighbor,label) pairs keyed by node —
    // hub skew is bounded by the same degree-capping as graph_link_prediction.
    Q("graph_label_propagation",
      (s, dir) => {
        import s.implicits._
        val raw = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-06-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-06-04").cast("timestamp"))
          .select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .filter($"c_nationkey" =!= $"s_nationkey")
          .groupBy($"c_nationkey".as("x"), $"s_nationkey".as("y"))
          .agg(count(lit(1)).as("w"))
        val und = raw.select($"x".as("u"), $"y".as("v"), $"w")
          .unionByName(raw.select($"y".as("u"), $"x".as("v"), $"w"))
          .groupBy($"u", $"v").agg(sum($"w").as("w"))
          .localCheckpoint() // 25-node edge list: cut the 4-join lineage once
        var labels = und.select($"u".as("node")).distinct()
          .withColumn("lbl", $"node")
        for (_ <- 1 to 3) {
          labels = und.join(labels, $"v" === $"node")
            .groupBy($"u", $"lbl").agg(sum($"w").as("wsum"))
            .groupBy($"u")
            .agg(min(struct((-$"wsum").as("nw"), $"lbl".as("l"))).as("m"))
            .select($"u".as("node"), $"m.l".as("lbl"))
        }
        labels.orderBy($"node")
      },
      Some {
        val round = (k: Int) =>
          s"""l$k AS (
             |  SELECT u AS node, lbl FROM (
             |    SELECT e.u, l.lbl,
             |      ROW_NUMBER() OVER (PARTITION BY e.u
             |        ORDER BY SUM(e.w) DESC, l.lbl) AS rn
             |    FROM und e JOIN l${k - 1} l ON l.node = e.v
             |    GROUP BY e.u, l.lbl) WHERE rn = 1)""".stripMargin
        s"""WITH raw AS (
           |  SELECT c_nationkey AS x, s_nationkey AS y, COUNT(*) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey
           |    AND l_shipdate >= TIMESTAMP '1997-06-01'
           |    AND l_shipdate <  TIMESTAMP '1997-06-04'
           |  GROUP BY 1, 2),
           |und AS (
           |  SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
           |    SELECT x AS u, y AS v, w FROM raw
           |    UNION ALL SELECT y, x, w FROM raw)
           |  GROUP BY 1, 2),
           |l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT node, lbl FROM l3 ORDER BY node""".stripMargin
      }),

    // k-core peeling (k = 3), 3 synchronous rounds over the same 3-day trade
    // slice: each round drops nodes of degree < k and the edges touching them;
    // what survives 3 rounds approximates the 3-core (the full core is the
    // fixpoint — bounded rounds keep the oracle an unrolled CTE chain, the
    // same contract as BFS/pagerank/LPA). Each round is one degree count +
    // one semi-join — Pregel-by-joins; at 100 TB both legs are key-partitioned
    // equi-joins over the shrinking edge set.
    Q("graph_kcore",
      (s, dir) => {
        import s.implicits._
        val raw = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-06-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-06-04").cast("timestamp"))
          .select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .filter($"c_nationkey" =!= $"s_nationkey")
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y"))
        val edges0 = raw
          .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
          .distinct()
          .select($"a".as("u"), $"b".as("v"))
          .unionByName(raw.select(least($"x", $"y").as("a"),
            greatest($"x", $"y").as("b")).distinct()
            .select($"b".as("u"), $"a".as("v")))
          .localCheckpoint()
        // Fixpoint early-exit (FixpointLoop doc): peeling only removes edges,
        // so an unchanged count pins the edge set — identical to 3 fixed rounds.
        val edges = graft.ops.FixpointLoop.iterate(edges0, 3,
          Seq(count(lit(1)))) { prev =>
          val keep = prev.groupBy($"u").agg(count(lit(1)).as("d"))
            .filter($"d" >= 3).select($"u".as("kn"))
          prev
            .join(keep, $"u" === $"kn", "left_semi")
            .join(keep.select($"kn".as("kn2")), $"v" === $"kn2", "left_semi")
            .localCheckpoint()
        }
        edges.groupBy($"u".as("node")).agg(count(lit(1)).as("core_degree"))
          .orderBy($"node")
      },
      Some {
        val round = (k: Int) =>
          s"""keep$k AS (
             |  SELECT u FROM e${k - 1} GROUP BY u HAVING COUNT(*) >= 3),
             |e$k AS (
             |  SELECT e.u, e.v FROM e${k - 1} e
             |  JOIN keep$k ku ON ku.u = e.u
             |  JOIN keep$k kv ON kv.u = e.v)""".stripMargin
        s"""WITH raw AS (
           |  SELECT DISTINCT least(c_nationkey, s_nationkey) AS a,
           |    greatest(c_nationkey, s_nationkey) AS b
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey
           |    AND l_shipdate >= TIMESTAMP '1997-06-01'
           |    AND l_shipdate <  TIMESTAMP '1997-06-04'),
           |e0 AS (
           |  SELECT a AS u, b AS v FROM raw
           |  UNION ALL SELECT b, a FROM raw),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT u AS node, COUNT(*) AS core_degree
           |FROM e3 GROUP BY u ORDER BY node""".stripMargin
      })
  )

  private def duckToks(textExpr: String) = Analytics.duckToks(textExpr)
}
