package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Analytics wave 15 — nonparametric tests, sequential detection, and
  * clustering evaluation: the distribution-free inference layer on top of
  * the parametric battery (ANOVA/Bartlett/Breusch–Pagan) already in place.
  *
  *  - Kruskal–Wallis H across k groups (the rank ANOVA — Mann–Whitney's
  *    k-sample generalization, which the corpus lacked)
  *  - Wilcoxon signed-rank for paired per-user readouts
  *  - two-sided standardized CUSUM drift detector (the mean-shift
  *    companion to drift_page_hinkley)
  *  - Wald–Wolfowitz runs test for randomness of the daily series
  *  - silhouette score over the exact-distance bounded sample — the
  *    clustering-quality readout sim_kmeans_lloyd had no grader for
  *
  * Scale posture: ranks come from [[QueryDSL.bandedRowNumber]] (band
  * spines, never a corpus single-partition window); daily-series recursions
  * run on the ≤31-row calendar rollup (the sanctioned drift_page_hinkley
  * class); the silhouette cross is a deliberately bounded 150-vector sample
  * (the sim_cosine_topk sanction shape). Determinism: rank sums are exact
  * longs; group-term double sums are ulp-noise-bounded and read out at
  * round-6; distances accumulate in DECIMAL(30,12); the CUSUM max(0,·)
  * recursion is algebraized to cumsum − running-min so both engines
  * evaluate identical window algebra.
  */
object Analytics15 {

  private val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
  private val DEC4 = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 4)

  val queries: Seq[Q] = Seq(

    // Kruskal–Wallis H over order priorities on o_totalprice. Unique-tiebreak
    // ranks (value, orderkey) from the banded global rank — the synthetic
    // prices are continuous so midrank tie correction is vacuous, and the
    // unique ranking makes the rank-sum frame exactly reproducible. With
    // unique ranks SST is the closed form N(N²−1)/12, so
    // H = 12·SSB/(N(N+1)) with SSB = Σ n_g(R̄_g − (N+1)/2)² — rank sums are
    // exact longs, the 5 group terms are pinned IEEE doubles, and their
    // sum-order ulp noise is ~1e-14 against the round-6 readout.
    Q("stats_kruskal_wallis",
      (s, dir) => {
        import s.implicits._
        val ranked = bandedRowNumber(
          t(s, dir, "orders")
            .select($"o_orderpriority", $"o_totalprice", $"o_orderkey"),
          floor($"o_totalprice" / 5000.0d),
          Seq($"o_totalprice", $"o_orderkey"), "rk", "__n")
        // Group rank sums grow as O(N²): accumulate in DECIMAL(38,0) on
        // both engines (the stats_mann_whitney precedent) so they cannot
        // silently wrap an i64 at very large N. The decimal→double readout
        // is identical to the old long→double path at any N where the long
        // path was valid.
        val DEC38 = org.apache.spark.sql.types.DataTypes
          .createDecimalType(38, 0)
        val g = ranked.groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_g"),
            sum($"rk".cast(DEC38)).cast(DEC38).as("rsum"))
          .select($"o_orderpriority".as[String], $"n_g".as[Long],
            $"rsum".as[java.math.BigDecimal])
        g.groupByKey(_ => 0)
          .mapGroups { (_, it) =>
            val rows = it.toArray.sortBy(_._1)
            val n = rows.map(_._2).sum
            val rbar = (n + 1).toDouble / 2.0d
            var ssb = 0.0d
            rows.foreach { case (_, ng, rsum) =>
              val dev = rsum.doubleValue / ng.toDouble - rbar
              ssb += ng.toDouble * (dev * dev)
            }
            (n, rows.length.toLong,
              12.0d * ssb / (n.toDouble * (n + 1).toDouble))
          }
          .toDF("n_total", "k_groups", "h_raw")
          .select($"n_total", $"k_groups", round($"h_raw", 6).as("h_stat"))
      },
      Some("""WITH rk AS (
             |  SELECT o_orderpriority,
             |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
             |  FROM orders),
             |g AS (
             |  SELECT o_orderpriority, COUNT(*) AS n_g,
             |    CAST(SUM(CAST(rk AS DECIMAL(38,0))) AS DECIMAL(38,0))
             |      AS rsum
             |  FROM rk GROUP BY 1),
             |t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             |             COUNT(*) AS k_groups FROM g)
             |SELECT n AS n_total, k_groups,
             |  round(12.0 * SUM(CAST(n_g AS DOUBLE) *
             |      ((CAST(rsum AS DOUBLE) / CAST(n_g AS DOUBLE)
             |          - (CAST(n AS DOUBLE) + 1.0) / 2.0) *
             |       (CAST(rsum AS DOUBLE) / CAST(n_g AS DOUBLE)
             |          - (CAST(n AS DOUBLE) + 1.0) / 2.0))) /
             |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)), 6)
             |    AS h_stat
             |FROM g CROSS JOIN t GROUP BY n, k_groups""".stripMargin)),

    // Wilcoxon signed-rank over paired per-user readouts: purchase-value sum
    // vs click-value sum (both exact DECIMAL(30,4) sums, so the paired diff
    // and its sign are exact), zero diffs dropped per the standard
    // procedure, |diff| ranked by the banded global rank with a user_id
    // tiebreak. W⁺/W⁻ are exact rank sums; the normal approximation
    // z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24) is small-integer-exact algebra
    // into one sqrt.
    Q("stats_wilcoxon_signed_rank",
      (s, dir) => {
        import s.implicits._
        val per = graft.Tables.events(s, dir)
          .groupBy($"user_id")
          .agg(sum(when($"event_type" === "purchase", $"value")
              .otherwise(0.0d).cast(DEC4)).as("pv"),
            sum(when($"event_type" === "click", $"value")
              .otherwise(0.0d).cast(DEC4)).as("cv"))
          .withColumn("diff", $"pv" - $"cv")
          .filter($"diff" =!= 0)
          .withColumn("absdiff", abs($"diff"))
        val ranked = bandedRowNumber(per, floor($"absdiff" / 500),
          Seq($"absdiff", $"user_id"), "rk", "__n")
        // n(n+1)(2n+1) is computed in DOUBLE, not BIGINT: the integer
        // product overflows i64 near n≈1.66M (silent wrap on Spark, error
        // on DuckDB). For n below 2^17 the double products are exact
        // integers, so the readout is bit-identical to the old long path.
        val nd = $"n".cast("double")
        ranked.agg(count(lit(1)).as("n"),
            sum(when($"diff" > 0, $"rk").otherwise(0L)).as("w_plus"),
            sum(when($"diff" < 0, $"rk").otherwise(0L)).as("w_minus"))
          .select($"n", $"w_plus", $"w_minus",
            round(($"w_plus".cast("double") -
              nd * (nd + 1.0d) / 4.0d) /
              sqrt(nd * (nd + 1.0d) * (nd * 2.0d + 1.0d) /
                24.0d), 6).as("z"))
      },
      Some("""WITH per AS (
             |  SELECT user_id,
             |    SUM(CASE WHEN event_type = 'purchase'
             |        THEN CAST(value AS DECIMAL(30,4))
             |        ELSE CAST(0.0 AS DECIMAL(30,4)) END) AS pv,
             |    SUM(CASE WHEN event_type = 'click'
             |        THEN CAST(value AS DECIMAL(30,4))
             |        ELSE CAST(0.0 AS DECIMAL(30,4)) END) AS cv
             |  FROM events GROUP BY 1),
             |d AS (
             |  SELECT user_id, pv - cv AS diff, abs(pv - cv) AS absdiff
             |  FROM per WHERE pv - cv <> 0),
             |rk AS (
             |  SELECT diff,
             |    row_number() OVER (ORDER BY absdiff, user_id) AS rk
             |  FROM d)
             |SELECT COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN diff > 0 THEN rk ELSE 0 END) AS BIGINT)
             |    AS w_plus,
             |  CAST(SUM(CASE WHEN diff < 0 THEN rk ELSE 0 END) AS BIGINT)
             |    AS w_minus,
             |  round((CAST(SUM(CASE WHEN diff > 0 THEN rk ELSE 0 END)
             |      AS DOUBLE) -
             |      CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE)
             |        + 1.0) / 4.0) /
             |    sqrt(CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE)
             |        + 1.0) * (2.0 * CAST(COUNT(*) AS DOUBLE) + 1.0)
             |      / 24.0), 6) AS z
             |FROM rk""".stripMargin)),

    // Two-sided standardized CUSUM on the daily event counts: z-scores
    // against the frame's own moments (scale-free, so the k=0.25 slack and
    // h=2 alarm are meaningful at every SF — measured excursions 2.2–4.2
    // across sf0.001..0.1). The max(0, S+z−k) recursion is algebraized:
    // S_t = D_t − min(0, min_{j≤t} D_j) with D_t = Σ(±z−k) — pure
    // cumsum/running-min window algebra on the ≤31-row daily frame (the
    // sanctioned drift_page_hinkley class), identical on both engines.
    Q("drift_cusum_detector",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("sc", sum($"c").over(wAll))
          .withColumn("ssc", sum($"c" * $"c").over(wAll))
          .withColumn("mu", $"sc".cast("double") / $"n".cast("double"))
          .withColumn("sigma",
            sqrt(($"ssc".cast("double") -
              $"sc".cast("double") * $"sc".cast("double") /
                $"n".cast("double")) / $"n".cast("double")))
          .withColumn("z", ($"c".cast("double") - $"mu") / $"sigma")
          .withColumn("dp", sum($"z" - 0.25d).over(w))
          .withColumn("dn", sum(-$"z" - 0.25d).over(w))
          .withColumn("sp", $"dp" - least(min($"dp").over(w), lit(0.0d)))
          .withColumn("sn", $"dn" - least(min($"dn").over(w), lit(0.0d)))
          .select($"day", $"c".cast("long").as("n_events"),
            round($"sp", 6).as("cusum_pos"),
            round($"sn", 6).as("cusum_neg"),
            ($"sp" > 2.0d || $"sn" > 2.0d).as("alarm"))
          .orderBy($"day")
      },
      Some("""WITH d AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1),
             |z AS (
             |  SELECT day, c,
             |    (CAST(c AS DOUBLE) - mu) / sigma AS z
             |  FROM (
             |    SELECT day, c,
             |      CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             |      sqrt((CAST(ssc AS DOUBLE) -
             |        CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) /
             |          CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS sigma
             |    FROM (
             |      SELECT day, c, COUNT(*) OVER wa AS n,
             |        SUM(c) OVER wa AS sc, SUM(c * c) OVER wa AS ssc
             |      FROM d
             |      WINDOW wa AS (ORDER BY day ROWS BETWEEN UNBOUNDED
             |        PRECEDING AND UNBOUNDED FOLLOWING)))),
             |cs AS (
             |  SELECT day, c,
             |    SUM(z - 0.25) OVER w AS dp,
             |    SUM(-z - 0.25) OVER w AS dn
             |  FROM z
             |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW)),
             |sres AS (
             |  SELECT day, c,
             |    dp - least(MIN(dp) OVER w, 0.0) AS sp,
             |    dn - least(MIN(dn) OVER w, 0.0) AS sn
             |  FROM cs
             |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW))
             |SELECT day, CAST(c AS BIGINT) AS n_events,
             |  round(sp, 6) AS cusum_pos, round(sn, 6) AS cusum_neg,
             |  (sp > 2.0 OR sn > 2.0) AS alarm
             |FROM sres ORDER BY day""".stripMargin)),

    // Wald–Wolfowitz runs test on the daily above/below-mean sign sequence —
    // "is the series random or trending/oscillating". Signs compare each
    // exact daily count to the exact-rational frame mean; R counts sign
    // changes through a lag on the ≤31-row daily frame; E[R] and Var[R] are
    // small-integer-exact rationals into one sqrt, read out at round-6.
    Q("stats_runs_test",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"day")
        val wAll = Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val flagged = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("mu",
            sum($"c").over(wAll).cast("double") /
              count(lit(1)).over(wAll).cast("double"))
          .withColumn("above", $"c".cast("double") > $"mu")
          .withColumn("chg",
            when(lag($"above", 1).over(w).isNull, 1L)
              .when($"above" =!= lag($"above", 1).over(w), 1L)
              .otherwise(0L))
        flagged.agg(count(lit(1)).as("n_days"),
            sum(when($"above", 1L).otherwise(0L)).as("n_above"),
            sum(when(!$"above", 1L).otherwise(0L)).as("n_below"),
            sum($"chg").as("runs"))
          .withColumn("e_runs",
            lit(2.0d) * ($"n_above" * $"n_below").cast("double") /
              $"n_days".cast("double") + 1.0d)
          .withColumn("v_runs",
            (lit(2.0d) * ($"n_above" * $"n_below").cast("double") *
              (lit(2.0d) * ($"n_above" * $"n_below").cast("double") -
                $"n_days".cast("double"))) /
              (($"n_days" * $"n_days").cast("double") *
                ($"n_days" - 1).cast("double")))
          .select($"n_days", $"n_above", $"n_below", $"runs",
            round($"e_runs", 6).as("e_runs"),
            round(($"runs".cast("double") - $"e_runs") / sqrt($"v_runs"), 6)
              .as("z"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1),
             |f AS (
             |  SELECT day, c,
             |    CAST(c AS DOUBLE) >
             |      (CAST(SUM(c) OVER wa AS DOUBLE) /
             |       CAST(COUNT(*) OVER wa AS DOUBLE)) AS above
             |  FROM d
             |  WINDOW wa AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND UNBOUNDED FOLLOWING)),
             |chg AS (
             |  SELECT above,
             |    CASE WHEN lag(above) OVER (ORDER BY day) IS NULL THEN 1
             |         WHEN above <> lag(above) OVER (ORDER BY day) THEN 1
             |         ELSE 0 END AS chg
             |  FROM f),
             |agg AS (
             |  SELECT COUNT(*) AS n_days,
             |    CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_above,
             |    CAST(SUM(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_below,
             |    CAST(SUM(chg) AS BIGINT) AS runs
             |  FROM chg)
             |SELECT n_days, n_above, n_below, runs,
             |  round(2.0 * CAST(n_above * n_below AS DOUBLE) /
             |    CAST(n_days AS DOUBLE) + 1.0, 6) AS e_runs,
             |  round((CAST(runs AS DOUBLE) -
             |      (2.0 * CAST(n_above * n_below AS DOUBLE) /
             |       CAST(n_days AS DOUBLE) + 1.0)) /
             |    sqrt((2.0 * CAST(n_above * n_below AS DOUBLE) *
             |        (2.0 * CAST(n_above * n_below AS DOUBLE) -
             |         CAST(n_days AS DOUBLE))) /
             |      (CAST(n_days * n_days AS DOUBLE) *
             |       CAST(n_days - 1 AS DOUBLE))), 6) AS z
             |FROM agg""".stripMargin)),

    // Silhouette score per label cluster over the bounded 150-vector sample
    // (the sim_cosine_topk sanction shape — the cross is O(150²), never
    // corpus-scaled). Distances are exact: ‖x−y‖² = x·x + y·y − 2x·y from
    // the decimal-exact codegen'd dot, one correctly-rounded sqrt per pair;
    // per-vector a/b means and the per-label silhouette mean accumulate in
    // DECIMAL(30,12). The readout grades sim_kmeans_lloyd's label
    // structure: s≈0 would mean the labels carry no geometry.
    Q("sim_silhouette_eval",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings").filter($"vec_id" < 150)
          .select($"vec_id", $"label", $"embedding",
            graft.llm.Similarity.dotExact($"embedding", $"embedding").as("ss"))
          // r15 persist-sizing rule: a 1-row-group scan caches as ONE
          // partition, serializing the whole 150-squared exact-distance cross
          .repartition(s.sparkContext.defaultParallelism, $"vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = e.select($"vec_id".as("i"), $"label".as("li"),
            $"embedding".as("vi"), $"ss".as("ssi"))
          .crossJoin(e.select($"vec_id".as("j"), $"label".as("lj"),
            $"embedding".as("vj"), $"ss".as("ssj")))
          .filter($"i" =!= $"j")
          .select($"i", $"li", $"lj",
            sqrt(greatest($"ssi" + $"ssj" -
              lit(2.0d) * graft.llm.Similarity.dotExact($"vi", $"vj"),
              lit(0.0d))).as("dist"))
        val md = pairs.groupBy($"i", $"li", $"lj")
          .agg((sum($"dist".cast(DEC)).cast("double") / count(lit(1)))
            .as("mdist"))
        // a and b in ONE pass over md (round 15): the old a/b split consumed
        // md twice, and with no materialization between them the whole
        // 150² cross-join + grouped-mean subtree executed TWICE (plans do
        // not share unreferenced common subtrees). max(when(li=lj)) picks
        // the unique own-label mean; the isNotNull filters reproduce the
        // old inner join (a vector needs both an own-label and an
        // other-label mean). Values and tie-handling unchanged.
        val res = md.groupBy($"i")
          .agg(max(when($"li" === $"lj", struct($"li", $"mdist"))).as("am"),
            min(when($"li" =!= $"lj", $"mdist")).as("b"))
          .filter($"am".isNotNull && $"b".isNotNull)
          .select($"i", $"am.li".as("li"),
            (($"b" - $"am.mdist") / greatest($"am.mdist", $"b")).as("sil"))
          .groupBy($"li")
          .agg(count(lit(1)).as("n_vecs"),
            round(sum($"sil".cast(DEC)).cast("double") / count(lit(1)), 6)
              .as("avg_silhouette"))
          .select($"li".as("label"), $"n_vecs", $"avg_silhouette")
          .orderBy($"label")
        e.unpersist()
        res
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings WHERE vec_id < 150),
             |ss AS (
             |  SELECT vec_id, label,
             |    CAST(SUM(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE) AS ss
             |  FROM flat GROUP BY 1, 2),
             |dots AS (
             |  SELECT a.vec_id AS i, b.vec_id AS j,
             |    CAST(SUM(CAST(a.v * b.v AS DECIMAL(30,12))) AS DOUBLE)
             |      AS dot
             |  FROM flat a JOIN flat b
             |    ON b.pos = a.pos AND b.vec_id <> a.vec_id
             |  GROUP BY 1, 2),
             |dist AS (
             |  SELECT d.i, si.label AS li, sj.label AS lj,
             |    sqrt(greatest(si.ss + sj.ss - 2.0 * d.dot, 0.0)) AS dist
             |  FROM dots d
             |  JOIN ss si ON si.vec_id = d.i
             |  JOIN ss sj ON sj.vec_id = d.j),
             |md AS (
             |  SELECT i, li, lj,
             |    CAST(SUM(CAST(dist AS DECIMAL(30,12))) AS DOUBLE) /
             |      COUNT(*) AS mdist
             |  FROM dist GROUP BY 1, 2, 3),
             |ab AS (
             |  SELECT a.i, a.li, a.mdist AS a, b.b
             |  FROM (SELECT i, li, mdist FROM md WHERE li = lj) a
             |  JOIN (SELECT i, MIN(mdist) AS b FROM md
             |        WHERE li <> lj GROUP BY 1) b ON b.i = a.i)
             |SELECT li AS label, COUNT(*) AS n_vecs,
             |  round(CAST(SUM(CAST((b - a) / greatest(a, b)
             |    AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*), 6)
             |    AS avg_silhouette
             |FROM ab GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
