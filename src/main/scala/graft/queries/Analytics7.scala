package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Round-10 wave eight: data-skipping audit, spectral flatness, co-purchase
  * projection, growth accounting — same contract as every family
  * (scale-shaped plans, decimal-exact cross-partition reductions, total
  * ORDER BY, DuckDB oracle per query). */
object Analytics7 {

  /** The oracle-side mirror of `Multimodal.dftCoef256`: 256 rows of
    * (m, cos·10¹², sin·10¹²) as BIGINT VALUES. */
  private[queries] def dftCoefValues: String =
    (0 until 256).map { m =>
      val c = BigDecimal(math.cos(2.0 * math.Pi * m / 256))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue.longValueExact
      val sn = BigDecimal(math.sin(2.0 * math.Pi * m / 256))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue.longValueExact
      s"($m, CAST($c AS BIGINT), CAST($sn AS BIGINT))"
    }.mkString(",\n    ")

  val queries: Seq[Q] = Seq(

    // Zone-map / min-max pruning audit: bucket lineitem into monthly
    // "files" by ORDER date (the partition an ingest-time writer would
    // produce), collect each file's SHIP-date zone map, and report which
    // files a ship-date range predicate could skip — the data-skipping
    // effectiveness diagnostic behind "should we re-sort this table".
    // Ship date trails order date by a bounded lag, so pruning is
    // partial, not trivial: the query months overlap several files.
    // One co-keyed join + one grouped pass; the audit frame is |months|.
    Q("scale_minmax_pruning_audit",
      (s, dir) => {
        import s.implicits._
        val lo = lit("1995-06-01").cast("date")
        val hi = lit("1995-08-31").cast("date")
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_shipdate")
          .join(t(s, dir, "orders")
            .select($"o_orderkey".as("l_orderkey"),
              date_format($"o_orderdate", "yyyy-MM").as("file_month")),
            Seq("l_orderkey"))
          .groupBy($"file_month")
          .agg(count(lit(1)).as("n_rows"),
            min($"l_shipdate").as("min_ship"),
            max($"l_shipdate").as("max_ship"),
            sum(when($"l_shipdate".between(lo, hi), 1L).otherwise(0L))
              .cast("long").as("n_matching"))
          .select($"file_month", $"n_rows", $"min_ship", $"max_ship",
            ($"max_ship" < lo || $"min_ship" > hi).as("prunable"),
            $"n_matching")
          .orderBy($"file_month")
      },
      Some("""WITH f AS (
             |  SELECT strftime(o.o_orderdate, '%Y-%m') AS file_month,
             |    COUNT(*) AS n_rows,
             |    MIN(l.l_shipdate) AS min_ship,
             |    MAX(l.l_shipdate) AS max_ship,
             |    CAST(SUM(CASE WHEN l.l_shipdate BETWEEN DATE '1995-06-01'
             |      AND DATE '1995-08-31' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_matching
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  GROUP BY 1)
             |SELECT file_month, n_rows, min_ship, max_ship,
             |  max_ship < DATE '1995-06-01'
             |    OR min_ship > DATE '1995-08-31' AS prunable,
             |  n_matching
             |FROM f ORDER BY file_month""".stripMargin)),

    // Spectral flatness (Wiener entropy) of each recording: DFT powers at
    // bins 1..8 over the first 256 samples through the real WAV decode —
    // every s·coef product uses the PINNED ×10¹²-scaled integer
    // coefficient table (cos/sin(2πm/256) at 12 decimals; index
    // m = k·i mod 256, so 8 bins need one table) and pure-Long
    // accumulation, so both engines reach bit-identical powers — then
    // flatness = geometric/arithmetic mean of the powers, the
    // tonal-vs-noise discriminator. ln/exp run on bit-identical inputs;
    // round-6 sits far above their ulp.
    Q("multimodal_audio_spectral_flatness",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        val powers = Multimodal.dftBinPowers(s,
            Multimodal.syntheticAudio(s,
              t(s, dir, "documents").filter($"doc_id" < 100)), nBins = 8)
          .toDF()
        powers.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bins"),
            sum(log($"power").cast("decimal(30,12)")).cast("double")
              .as("lsum"),
            sum($"power".cast("decimal(30,6)")).cast("double").as("psum"),
            // unrounded: powers ~1e9 sit past round()'s cross-engine
            // agreement range, but a*a+b*b on identical doubles hashes
            // exactly (the identical-recursion contract)
            min($"power").as("p_min"),
            max($"power").as("p_max"))
          .select($"doc_id", $"n_bins", $"p_min", $"p_max",
            round(exp($"lsum" / $"n_bins") / ($"psum" / $"n_bins"), 6)
              .as("flatness"))
          .orderBy($"doc_id")
      },
      Some {
        s"""WITH coefs(m, cosv, sinv) AS (VALUES
           |    $dftCoefValues),
           |dims AS (
           |  SELECT doc_id FROM documents WHERE doc_id < 100),
           |sm AS (SELECT doc_id, unnest(range(0, 256)) AS i FROM dims),
           |ks AS (SELECT doc_id, i, unnest(range(1, 9)) AS k FROM sm),
           |v AS (
           |  SELECT doc_id, k,
           |    CAST((doc_id*37 + i*13) % 2048 - 1024 AS BIGINT) AS s,
           |    cosv, sinv
           |  FROM ks JOIN coefs ON coefs.m = (k * i) % 256),
           |bp AS (
           |  SELECT doc_id, k,
           |    CAST(CAST(SUM(s * cosv) AS DOUBLE) / 1e12 AS DOUBLE) AS a,
           |    CAST(CAST(SUM(s * sinv) AS DOUBLE) / 1e12 AS DOUBLE) AS b
           |  FROM v GROUP BY doc_id, k),
           |p AS (SELECT doc_id, k, a * a + b * b AS power FROM bp)
           |SELECT doc_id, COUNT(*) AS n_bins,
           |  MIN(power) AS p_min,
           |  MAX(power) AS p_max,
           |  round(exp(CAST(SUM(CAST(ln(power) AS DECIMAL(30,12)))
           |      AS DOUBLE) / COUNT(*)) /
           |    (CAST(SUM(CAST(power AS DECIMAL(30,6))) AS DOUBLE)
           |      / COUNT(*)), 6) AS flatness
           |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Bipartite co-purchase projection (market-basket co-occurrence):
    // project the order–part bipartite graph onto parts — part pairs that
    // appear in the same order, with support counts, top 30 by support.
    // The pair expansion is bounded by ORDER SIZE (≤7 lineitems per order
    // ⇒ ≤21 pairs), never by the catalog — the only safe way to build a
    // co-occurrence graph at 100 TB. Oriented pairs (a<b) count each edge
    // once; one self-equi-join on the order key.
    Q("graph_copurchase_projection",
      (s, dir) => {
        import s.implicits._
        // Round 15 (the agg_basket_assoc_rules idiom, guide §2.4): ONE
        // shuffle to per-order part lists, then MAP-SIDE pair expansion via
        // nested HOFs — the self-equi-join shuffled the fact twice and ran
        // its probe in the single-row-group scan task. Multiset semantics
        // preserved exactly: for each element x, every element y with x < y
        // (value comparison over the collected list, duplicates kept) yields
        // one (x, y) — the same multiset of pairs the join's pa < pb filter
        // produced. The projection hash-repartitions by the group key, so
        // collect + explode run at defaultParallelism on any file layout.
        val grouped = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_partkey")
          .repartition(s.sparkContext.defaultParallelism, $"l_orderkey")
          .groupBy($"l_orderkey")
          .agg(collect_list($"l_partkey").as("arr"))
        val pairsArr = flatten(transform($"arr", x =>
          transform(filter($"arr", y => x < y),
            y => struct(x.as("pa"), y.as("pb")))))
        grouped.select(explode(pairsArr).as("p"))
          .groupBy($"p.pa".as("pa"), $"p.pb".as("pb"))
          .agg(count(lit(1)).as("support"))
          .orderBy($"support".desc, $"pa", $"pb")
          .limit(30)
      },
      Some("""WITH pairs AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
             |SELECT pa, pb, COUNT(*) AS support
             |FROM pairs GROUP BY pa, pb
             |ORDER BY support DESC, pa, pb LIMIT 30""".stripMargin)),

    // Growth accounting of the daily active-user base: split each day's
    // actives into new (first day ever), resurrected (returning after a
    // ≥7-day absence), and returning — the decomposition every growth
    // dashboard runs. First-seen via a per-user min; previous-active-day
    // via lag over the user-day frame (user-keyed window); day rollup last.
    Q("events_growth_accounting",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val userDays = graft.Tables.events(s, dir)
          .select($"user_id", to_date($"ts").as("day")).distinct()
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val tagged = userDays
          .withColumn("prev_day", lag($"day", 1).over(w))
          .withColumn("cls",
            when($"prev_day".isNull, "new")
              .when(datediff($"day", $"prev_day") >= 7, "resurrected")
              .otherwise("returning"))
        tagged.groupBy($"day")
          .agg(count(lit(1)).as("n_active"),
            sum(when($"cls" === "new", 1L).otherwise(0L)).cast("long")
              .as("n_new"),
            sum(when($"cls" === "resurrected", 1L).otherwise(0L))
              .cast("long").as("n_resurrected"),
            sum(when($"cls" === "returning", 1L).otherwise(0L)).cast("long")
              .as("n_returning"))
          .orderBy($"day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |  FROM events),
             |tagged AS (
             |  SELECT day,
             |    CASE
             |      WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day)
             |        IS NULL THEN 'new'
             |      WHEN day - lag(day) OVER (PARTITION BY user_id
             |        ORDER BY day) >= 7 THEN 'resurrected'
             |      ELSE 'returning' END AS cls
             |  FROM ud)
             |SELECT day, COUNT(*) AS n_active,
             |  CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_new,
             |  CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_resurrected,
             |  CAST(SUM(CASE WHEN cls = 'returning' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_returning
             |FROM tagged GROUP BY day ORDER BY day""".stripMargin)),

    // Durbin–Watson autocorrelation test on the residuals of the daily
    // event-count trend regression: OLS y = a + b·t with all four moment
    // sums as EXACT longs (t ≤ 31, counts — every product fits), so a and
    // b are single identical divisions; then DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² over
    // decimal-exact residual sums — the "are the residuals independent"
    // gate on any trend fit. Consecutive-lag via a t+1 equi self-join;
    // every frame after the daily agg is ≤|days| rows.
    Q("stats_durbin_watson",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("y"))
          .select(datediff($"day", lit("2024-01-01").cast("date"))
            .cast("long").as("t"), $"y")
          .localCheckpoint()
        val m = daily.agg(count(lit(1)).as("n"),
          sum($"t").as("st"), sum($"y").as("sy"),
          sum($"t" * $"y").as("sty"), sum($"t" * $"t").as("stt"))
          .select($"n",
            (($"n" * $"sty" - $"st" * $"sy").cast("double") /
              ($"n" * $"stt" - $"st" * $"st").cast("double")).as("b"),
            $"st", $"sy")
          .select($"n", $"b",
            (($"sy".cast("double") - $"b" * $"st".cast("double")) /
              $"n".cast("double")).as("a"))
        val e = daily.crossJoin(broadcast(m))
          .select($"t",
            ($"y".cast("double") - $"a" - $"b" * $"t".cast("double"))
              .as("e"))
          .localCheckpoint()
        val num = e
          .join(e.select(($"t" + 1).as("t"), $"e".as("e_prev")), Seq("t"))
          .agg(dsum(($"e" - $"e_prev") * ($"e" - $"e_prev"), 8).as("num"))
        val den = e.agg(dsum($"e" * $"e", 8).as("den"))
        m.crossJoin(broadcast(num)).crossJoin(broadcast(den))
          .select($"n", round($"b", 6).as("slope"),
            round($"a", 6).as("intercept"),
            round($"num" / $"den", 6).as("dw"))
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS t,
             |    CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(t*y) AS BIGINT) AS sty,
             |    CAST(SUM(t*t) AS BIGINT) AS stt
             |  FROM daily),
             |co AS (
             |  SELECT n,
             |    CAST(n*sty - st*sy AS DOUBLE) /
             |      CAST(n*stt - st*st AS DOUBLE) AS b, st, sy
             |  FROM m),
             |co2 AS (SELECT n, b,
             |    (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE)) /
             |      CAST(n AS DOUBLE) AS a FROM co),
             |e AS (
             |  SELECT t,
             |    CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE) AS e
             |  FROM daily, co2),
             |num AS (
             |  SELECT ${sqlDsum("(c.e - p.e) * (c.e - p.e)", 8)} AS num
             |  FROM e c JOIN e p ON c.t = p.t + 1),
             |den AS (SELECT ${sqlDsum("e * e", 8)} AS den FROM e)
             |SELECT n, round(b, 6) AS slope, round(a, 6) AS intercept,
             |  round(num / den, 6) AS dw
             |FROM co2, num, den""".stripMargin)),

    // Mann–Kendall trend test + Sen's slope on the daily event-count
    // series: S = Σ_{i<j} sign(y_j − y_i) with the tie-corrected variance
    // (both exact integer arithmetic until the final z division), and the
    // Sen estimator = exact median of the C(n,2) pairwise slopes (selected
    // by position over the bounded pair frame, averaging the two middle
    // values when even). The nonparametric companion of the DW/OLS pair —
    // no distributional assumption, ties handled exactly. The pairwise
    // lattice is quadratic in DAYS by definition, never in events.
    Q("stats_mann_kendall",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("y"))
          .select(datediff($"day", lit("2024-01-01").cast("date"))
            .cast("long").as("t"), $"y")
          .localCheckpoint()
        val pairs = daily.select($"t".as("ti"), $"y".as("yi"))
          .join(daily.select($"t".as("tj"), $"y".as("yj")), $"ti" < $"tj")
          .select(
            when($"yj" > $"yi", 1L).when($"yj" < $"yi", -1L).otherwise(0L)
              .as("sgn"),
            (($"yj" - $"yi").cast("double") /
              ($"tj" - $"ti").cast("double")).as("slope"))
          .localCheckpoint()
        val sAgg = pairs.agg(sum($"sgn").as("s_stat"),
          count(lit(1)).as("n_pairs"))
        val ties = daily.groupBy($"y").agg(count(lit(1)).as("tt"))
          .agg(sum($"tt" * ($"tt" - 1) * (lit(2) * $"tt" + 5)).as("tie_term"),
            sum($"tt").as("n"))
        val ranked = pairs
          .withColumn("r", row_number().over(
            Window.orderBy($"slope", $"sgn")))
        val med = ranked.crossJoin(broadcast(
            pairs.agg(count(lit(1)).as("m"))))
          .filter($"r" === expr("(m + 1) div 2") ||
            $"r" === expr("m div 2 + 1"))
          .agg(dsum($"slope", 8).as("ssum"), count(lit(1)).as("k"))
          .select(($"ssum" / $"k").as("sen_slope"))
        sAgg.crossJoin(broadcast(ties)).crossJoin(broadcast(med))
          .select($"n", $"s_stat",
            (($"n" * ($"n" - 1) * (lit(2) * $"n" + 5) - $"tie_term")
              .cast("double") / 18.0d).as("var_s"),
            $"sen_slope")
          .select($"n", $"s_stat", round($"var_s", 6).as("var_s"),
            round(
              when($"s_stat" > 0, ($"s_stat" - 1).cast("double") /
                sqrt($"var_s"))
              .when($"s_stat" < 0, ($"s_stat" + 1).cast("double") /
                sqrt($"var_s"))
              .otherwise(0.0d), 6).as("z"),
            round($"sen_slope", 6).as("sen_slope"))
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS t,
             |    CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |pairs AS (
             |  SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
             |      ELSE 0 END AS sgn,
             |    CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
             |      AS slope
             |  FROM daily a JOIN daily b ON a.t < b.t),
             |sa AS (SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat,
             |    CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs),
             |ties AS (
             |  SELECT CAST(SUM(tt*(tt-1)*(2*tt+5)) AS BIGINT) AS tie_term,
             |    CAST(SUM(tt) AS BIGINT) AS n
             |  FROM (SELECT COUNT(*) AS tt FROM daily GROUP BY y)),
             |ranked AS (
             |  SELECT slope, row_number() OVER (ORDER BY slope, sgn) AS r,
             |    COUNT(*) OVER () AS m
             |  FROM pairs),
             |med AS (
             |  SELECT ${sqlDsum("slope", 8)} / COUNT(*) AS sen_slope
             |  FROM ranked WHERE r = (m + 1) // 2 OR r = m // 2 + 1),
             |v AS (
             |  SELECT n, s_stat,
             |    CAST(n*(n-1)*(2*n+5) - tie_term AS DOUBLE) / 18 AS var_s,
             |    sen_slope
             |  FROM sa, ties, med)
             |SELECT n, s_stat, round(var_s, 6) AS var_s,
             |  round(CASE WHEN s_stat > 0
             |      THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
             |    WHEN s_stat < 0
             |      THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
             |    ELSE 0 END, 6) AS z,
             |  round(sen_slope, 6) AS sen_slope
             |FROM v""".stripMargin)),

    // Yule–Walker AR(2) fit of the demeaned daily event-count series:
    // autocorrelations r₁, r₂ from decimal-exact demeaned products, the
    // closed-form φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²), and the
    // in-sample one-step residual RMS — the cheapest "does an AR model
    // explain this series" probe, and the natural consumer of the
    // Ljung–Box gate. Lags via t+k equi self-joins; every frame after the
    // daily agg is ≤|days| rows.
    Q("stats_yule_walker_ar2",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .select(datediff($"day", lit("2024-01-01").cast("date"))
            .cast("long").as("t"), $"c")
          .localCheckpoint()
        val mean = daily.agg(sum($"c").cast("long").as("sc"),
          count(lit(1)).cast("long").as("nd"))
        val dm = daily.crossJoin(broadcast(mean))
          .select($"t", $"nd",
            ($"c".cast("double") - $"sc".cast("double") / $"nd").as("cd"))
          .localCheckpoint()
        val s0 = dm.agg(dsum($"cd" * $"cd", 8).as("s0"),
          max($"nd").as("n"))
        def lagSum(k: Int) = dm.select($"t", $"cd")
          .join(dm.select(($"t" + k).as("t"), $"cd".as("cdk")), Seq("t"))
          .agg(dsum($"cd" * $"cdk", 8).as(s"s$k"))
        val rs = s0.crossJoin(broadcast(lagSum(1)))
          .crossJoin(broadcast(lagSum(2)))
          .select($"n", ($"s1" / $"s0").as("r1"), ($"s2" / $"s0").as("r2"))
          .select($"n", $"r1", $"r2",
            ($"r1" * (lit(1.0d) - $"r2") /
              (lit(1.0d) - $"r1" * $"r1")).as("phi1"),
            (($"r2" - $"r1" * $"r1") /
              (lit(1.0d) - $"r1" * $"r1")).as("phi2"))
        val resid = dm.select($"t", $"cd")
          .join(dm.select(($"t" + 1).as("t"), $"cd".as("l1")), Seq("t"))
          .join(dm.select(($"t" + 2).as("t"), $"cd".as("l2")), Seq("t"))
          .crossJoin(broadcast(rs))
          .select(($"cd" - $"phi1" * $"l1" - $"phi2" * $"l2").as("e"))
          .agg((dsum($"e" * $"e", 8) / count(lit(1))).as("mse"))
        rs.crossJoin(broadcast(resid))
          .select($"n", round($"r1", 6).as("r1"), round($"r2", 6).as("r2"),
            round($"phi1", 6).as("phi1"), round($"phi2", 6).as("phi2"),
            round(sqrt($"mse"), 6).as("rms_resid"))
      },
      Some(s"""WITH daily AS (
             |  SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS t,
             |    CAST(COUNT(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(SUM(c) AS BIGINT) AS sc,
             |    CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
             |dm AS (SELECT t, nd,
             |    CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / nd AS cd
             |  FROM daily, m),
             |s0 AS (SELECT ${sqlDsum("cd * cd", 8)} AS s0, MAX(nd) AS n
             |  FROM dm),
             |l1 AS (SELECT ${sqlDsum("a.cd * b.cd", 8)} AS s1
             |  FROM dm a JOIN dm b ON a.t = b.t + 1),
             |l2 AS (SELECT ${sqlDsum("a.cd * b.cd", 8)} AS s2
             |  FROM dm a JOIN dm b ON a.t = b.t + 2),
             |rs AS (
             |  SELECT n, s1 / s0 AS r1, s2 / s0 AS r2 FROM s0, l1, l2),
             |co AS (
             |  SELECT n, r1, r2,
             |    r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
             |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
             |  FROM rs),
             |resid AS (
             |  SELECT ${sqlDsum("e * e", 8)} / COUNT(*) AS mse
             |  FROM (
             |    SELECT a.cd - co.phi1 * b.cd - co.phi2 * c2.cd AS e
             |    FROM dm a JOIN dm b ON a.t = b.t + 1
             |      JOIN dm c2 ON a.t = c2.t + 2
             |      CROSS JOIN co))
             |SELECT n, round(r1, 6) AS r1, round(r2, 6) AS r2,
             |  round(phi1, 6) AS phi1, round(phi2, 6) AS phi2,
             |  round(sqrt(mse), 6) AS rms_resid
             |FROM co, resid""".stripMargin)),

    // McNemar paired-proportion test with continuity correction: did the
    // purchase propensity of the SAME user panel change between week 1 and
    // week 2 of January — the paired design that a two-sample test gets
    // wrong. Panel = users active in days 1–14; discordant counts b
    // (week-1-only purchasers) and c (week-2-only) drive
    // χ² = (|b−c|−1)²/(b+c). Pure integer until the final division; three
    // user-keyed shuffles, output is the 2×2 table + statistic.
    Q("stats_mcnemar",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
          .filter(to_date($"ts") < lit("2024-01-15").cast("date"))
          .select($"user_id", to_date($"ts").as("day"), $"event_type")
        val panel = ev.groupBy($"user_id")
          .agg(
            max(when($"event_type" === "purchase" &&
              $"day" < lit("2024-01-08").cast("date"), 1).otherwise(0))
              .as("y1"),
            max(when($"event_type" === "purchase" &&
              $"day" >= lit("2024-01-08").cast("date"), 1).otherwise(0))
              .as("y2"))
        panel.agg(
            sum(when($"y1" === 0 && $"y2" === 0, 1L).otherwise(0L))
              .cast("long").as("n00"),
            sum(when($"y1" === 0 && $"y2" === 1, 1L).otherwise(0L))
              .cast("long").as("n01"),
            sum(when($"y1" === 1 && $"y2" === 0, 1L).otherwise(0L))
              .cast("long").as("n10"),
            sum(when($"y1" === 1 && $"y2" === 1, 1L).otherwise(0L))
              .cast("long").as("n11"))
          .select($"n00", $"n01", $"n10", $"n11",
            round(((abs($"n10" - $"n01") - 1) * (abs($"n10" - $"n01") - 1))
              .cast("double") / ($"n10" + $"n01").cast("double"), 6)
              .as("chi2_cc"))
      },
      Some("""WITH panel AS (
             |  SELECT user_id,
             |    MAX(CASE WHEN event_type = 'purchase'
             |      AND CAST(ts AS DATE) < DATE '2024-01-08'
             |      THEN 1 ELSE 0 END) AS y1,
             |    MAX(CASE WHEN event_type = 'purchase'
             |      AND CAST(ts AS DATE) >= DATE '2024-01-08'
             |      THEN 1 ELSE 0 END) AS y2
             |  FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-15'
             |  GROUP BY user_id),
             |c AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN y1 = 0 AND y2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00,
             |    CAST(SUM(CASE WHEN y1 = 0 AND y2 = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(SUM(CASE WHEN y1 = 1 AND y2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(SUM(CASE WHEN y1 = 1 AND y2 = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11
             |  FROM panel)
             |SELECT n00, n01, n10, n11,
             |  round(CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)
             |    AS DOUBLE) / CAST(n10 + n01 AS DOUBLE), 6) AS chi2_cc
             |FROM c""".stripMargin)),

    // Cohen's kappa between two cheap document-quality raters — "long by
    // chars" (n_chars > 306) vs "long by words" (count > 56): the
    // inter-annotator-agreement statistic every labeling pipeline reports,
    // κ = (p_o − p_e)/(1 − p_e) from the exact 2×2 confusion counts.
    // Chance agreement from the marginals; pure integer until the final
    // divisions. One grouped pass over documents; 1-row output.
    Q("stats_cohens_kappa",
      (s, dir) => {
        import s.implicits._
        val r = t(s, dir, "documents")
          .select(($"n_chars" > 306).cast("int").as("a"),
            (size(split($"text", " ")) > 56).cast("int").as("b"))
        r.agg(count(lit(1)).as("n"),
            sum(when($"a" === 1 && $"b" === 1, 1L).otherwise(0L))
              .cast("long").as("n11"),
            sum(when($"a" === 1 && $"b" === 0, 1L).otherwise(0L))
              .cast("long").as("n10"),
            sum(when($"a" === 0 && $"b" === 1, 1L).otherwise(0L))
              .cast("long").as("n01"),
            sum(when($"a" === 0 && $"b" === 0, 1L).otherwise(0L))
              .cast("long").as("n00"))
          .select($"n", $"n11", $"n10", $"n01", $"n00",
            (($"n11" + $"n00").cast("double") / $"n").as("po"),
            ((($"n11" + $"n10") * ($"n11" + $"n01") +
              ($"n01" + $"n00") * ($"n10" + $"n00")).cast("double") /
              ($"n" * $"n").cast("double")).as("pe"))
          .select($"n", $"n11", $"n10", $"n01", $"n00",
            round($"po", 6).as("po"), round($"pe", 6).as("pe"),
            round(($"po" - $"pe") / (lit(1.0d) - $"pe"), 6).as("kappa"))
      },
      Some("""WITH r AS (
             |  SELECT CAST(n_chars > 306 AS INT) AS a,
             |    CAST(len(string_split(text, ' ')) > 56 AS INT) AS b
             |  FROM documents),
             |c AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(CASE WHEN a=1 AND b=1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11,
             |    CAST(SUM(CASE WHEN a=1 AND b=0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(SUM(CASE WHEN a=0 AND b=1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(SUM(CASE WHEN a=0 AND b=0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM r),
             |p AS (
             |  SELECT n, n11, n10, n01, n00,
             |    CAST(n11 + n00 AS DOUBLE) / n AS po,
             |    CAST((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00) AS DOUBLE)
             |      / CAST(n*n AS DOUBLE) AS pe
             |  FROM c)
             |SELECT n, n11, n10, n01, n00, round(po, 6) AS po,
             |  round(pe, 6) AS pe,
             |  round((po - pe) / (1.0 - pe), 6) AS kappa
             |FROM p""".stripMargin)),

    // Murphy decomposition of the Brier score: forecast each user's
    // day-15 purchase probability as their days-1–14 per-active-day
    // purchase rate (num/den — EXACT integer bin keys), outcome = did
    // they purchase on Jan 15. Brier = REL − RES + UNC holds exactly when
    // bins are the distinct forecast values, which (num, den) gives for
    // free — reliability (calibration), resolution (discrimination), and
    // irreducible uncertainty, the full forecast-quality triptych. All
    // bin frames ≤14² rows; single-row scalar crosses only.
    Q("stats_brier_decomposition",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
        val act = ev.filter(to_date($"ts") < lit("2024-01-15").cast("date"))
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1).otherwise(0))
            .as("pur"))
        val fc = act.groupBy($"user_id")
          .agg(sum($"pur").cast("long").as("num"),
            count(lit(1)).cast("long").as("den"))
        val out = ev.filter(to_date($"ts") === lit("2024-01-15").cast("date")
            && $"event_type" === "purchase")
          .select($"user_id").distinct().withColumn("o", lit(1L))
        val panel = fc.join(out, Seq("user_id"), "left")
          .select($"user_id", $"num", $"den",
            ($"num".cast("double") / $"den".cast("double")).as("p"),
            coalesce($"o", lit(0L)).as("o"))
          .localCheckpoint()
        val tot = panel.agg(count(lit(1)).as("nn"),
          sum($"o").cast("long").as("so"))
          .select($"nn", ($"so".cast("double") / $"nn").as("obar"))
        val bins = panel.groupBy($"num", $"den")
          .agg(count(lit(1)).as("nk"), sum($"o").cast("long").as("ok"))
          .select($"nk",
            ($"num".cast("double") / $"den".cast("double")).as("pk"),
            ($"ok".cast("double") / $"nk").as("obk"))
        val brier = panel
          .agg((dsum(($"p" - $"o") * ($"p" - $"o"), 8) / count(lit(1)))
            .as("brier"))
        val relres = bins.crossJoin(broadcast(tot))
          .agg(
            (dsum($"nk" * ($"pk" - $"obk") * ($"pk" - $"obk"), 8) /
              max($"nn")).as("reliability"),
            (dsum($"nk" * ($"obk" - $"obar") * ($"obk" - $"obar"), 8) /
              max($"nn")).as("resolution"))
        relres.crossJoin(broadcast(tot)).crossJoin(broadcast(brier))
          .select($"nn".as("n"), round($"brier", 6).as("brier"),
            round($"reliability", 6).as("reliability"),
            round($"resolution", 6).as("resolution"),
            round($"obar" * (lit(1.0d) - $"obar"), 6).as("uncertainty"))
      },
      Some(s"""WITH act AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS pur
             |  FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-15'
             |  GROUP BY 1, 2),
             |fc AS (
             |  SELECT user_id, CAST(SUM(pur) AS BIGINT) AS num,
             |    CAST(COUNT(*) AS BIGINT) AS den
             |  FROM act GROUP BY user_id),
             |outc AS (
             |  SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS o FROM events
             |  WHERE event_type = 'purchase'
             |    AND CAST(ts AS DATE) = DATE '2024-01-15'),
             |panel AS (
             |  SELECT fc.user_id, num, den,
             |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS p,
             |    COALESCE(o, 0) AS o
             |  FROM fc LEFT JOIN outc ON fc.user_id = outc.user_id),
             |tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             |    CAST(SUM(o) AS DOUBLE) / COUNT(*) AS obar
             |  FROM panel),
             |bins AS (
             |  SELECT COUNT(*) AS nk,
             |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pk,
             |    CAST(SUM(o) AS DOUBLE) / COUNT(*) AS obk
             |  FROM panel GROUP BY num, den),
             |brier AS (
             |  SELECT ${sqlDsum("(p - o) * (p - o)", 8)} / COUNT(*)
             |    AS brier
             |  FROM panel),
             |relres AS (
             |  SELECT
             |    ${sqlDsum("nk * (pk - obk) * (pk - obk)", 8)} / MAX(nn)
             |      AS reliability,
             |    ${sqlDsum("nk * (obk - obar) * (obk - obar)", 8)} / MAX(nn)
             |      AS resolution
             |  FROM bins, tot)
             |SELECT nn AS n, round(brier, 6) AS brier,
             |  round(reliability, 6) AS reliability,
             |  round(resolution, 6) AS resolution,
             |  round(obar * (1.0 - obar), 6) AS uncertainty
             |FROM relres, tot, brier""".stripMargin)),

    // Expected-calibration-error table for the same day-15 purchase
    // forecaster: 10 equal-width confidence bins, per-bin mean confidence
    // vs empirical accuracy, the |gap| and its N-weighted contribution —
    // the reliability-diagram table (and Σ weighted_gap = ECE). Bin
    // assignment is exact (floor on an identical double); all bin frames
    // are ≤10 rows.
    Q("dq_calibration_ece",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
        val act = ev.filter(to_date($"ts") < lit("2024-01-15").cast("date"))
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1).otherwise(0))
            .as("pur"))
        val fc = act.groupBy($"user_id")
          .agg(sum($"pur").cast("long").as("num"),
            count(lit(1)).cast("long").as("den"))
        val out = ev.filter(to_date($"ts") === lit("2024-01-15").cast("date")
            && $"event_type" === "purchase")
          .select($"user_id").distinct().withColumn("o", lit(1L))
        val panel = fc.join(out, Seq("user_id"), "left")
          .select(($"num".cast("double") / $"den".cast("double")).as("p"),
            coalesce($"o", lit(0L)).as("o"))
          .select(least(floor($"p" * 10).cast("int"), lit(9)).as("bin"),
            $"p", $"o")
          .localCheckpoint()
        val tot = panel.agg(count(lit(1)).cast("long").as("nn"))
        panel.groupBy($"bin")
          .agg(count(lit(1)).cast("long").as("n_bin"),
            (dsum($"p", 8) / count(lit(1))).as("conf"),
            (sum($"o").cast("double") / count(lit(1))).as("acc"))
          .crossJoin(broadcast(tot))
          .select($"bin", $"n_bin", round($"conf", 6).as("conf"),
            round($"acc", 6).as("acc"),
            round(abs($"acc" - $"conf"), 6).as("abs_gap"),
            round($"n_bin".cast("double") / $"nn" * abs($"acc" - $"conf"),
              6).as("weighted_gap"))
          .orderBy($"bin")
      },
      Some(s"""WITH act AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS pur
             |  FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-15'
             |  GROUP BY 1, 2),
             |fc AS (
             |  SELECT user_id, CAST(SUM(pur) AS BIGINT) AS num,
             |    CAST(COUNT(*) AS BIGINT) AS den
             |  FROM act GROUP BY user_id),
             |outc AS (
             |  SELECT DISTINCT user_id, CAST(1 AS BIGINT) AS o FROM events
             |  WHERE event_type = 'purchase'
             |    AND CAST(ts AS DATE) = DATE '2024-01-15'),
             |panel AS (
             |  SELECT LEAST(CAST(floor(
             |      CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10) AS INT),
             |      9) AS bin,
             |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS p,
             |    COALESCE(o, 0) AS o
             |  FROM fc LEFT JOIN outc ON fc.user_id = outc.user_id),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM panel)
             |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_bin,
             |  round(${sqlDsum("p", 8)} / COUNT(*), 6) AS conf,
             |  round(CAST(SUM(o) AS DOUBLE) / COUNT(*), 6) AS acc,
             |  round(abs(CAST(SUM(o) AS DOUBLE) / COUNT(*) -
             |    ${sqlDsum("p", 8)} / COUNT(*)), 6) AS abs_gap,
             |  round(CAST(COUNT(*) AS DOUBLE) / MAX(nn) *
             |    abs(CAST(SUM(o) AS DOUBLE) / COUNT(*) -
             |      ${sqlDsum("p", 8)} / COUNT(*)), 6) AS weighted_gap
             |FROM panel, tot GROUP BY bin ORDER BY bin""".stripMargin)),

    // Cochran's Q test for K=3 related binary treatments on one panel:
    // did each user click / view / purchase within the first two days —
    // the "are these K success rates equal on the SAME subjects" test
    // (the K-treatment generalization of McNemar). Time-windowed to
    // days 1–2 so the indicators actually vary (the saturation pitfall:
    // over the full month every flag is 1). Pure integer sums —
    // Q = (k−1)(k·ΣG² − (ΣG)²)/(k·ΣL − ΣL²) — until the final division.
    Q("stats_cochran_q",
      (s, dir) => {
        import s.implicits._
        val panel = graft.Tables.events(s, dir)
          .filter(to_date($"ts") < lit("2024-01-03").cast("date"))
          .groupBy($"user_id")
          .agg(max(when($"event_type" === "click", 1L).otherwise(0L))
            .as("a"),
            max(when($"event_type" === "view", 1L).otherwise(0L)).as("b"),
            max(when($"event_type" === "purchase", 1L).otherwise(0L))
              .as("c"))
        panel.agg(count(lit(1)).cast("long").as("n"),
            sum($"a").cast("long").as("g_click"),
            sum($"b").cast("long").as("g_view"),
            sum($"c").cast("long").as("g_purchase"),
            sum($"a" + $"b" + $"c").cast("long").as("sl"),
            sum(($"a" + $"b" + $"c") * ($"a" + $"b" + $"c")).cast("long")
              .as("sl2"))
          .select($"n", $"g_click", $"g_view", $"g_purchase",
            round(lit(2).cast("double") *
              (lit(3) * ($"g_click" * $"g_click" + $"g_view" * $"g_view" +
                $"g_purchase" * $"g_purchase") -
                ($"g_click" + $"g_view" + $"g_purchase") *
                ($"g_click" + $"g_view" + $"g_purchase")).cast("double") /
              (lit(3) * $"sl" - $"sl2").cast("double"), 6).as("q_stat"))
      },
      Some("""WITH panel AS (
             |  SELECT user_id,
             |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             |      AS a,
             |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      AS b,
             |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS c
             |  FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-03'
             |  GROUP BY user_id),
             |s AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(a) AS BIGINT) AS g_click,
             |    CAST(SUM(b) AS BIGINT) AS g_view,
             |    CAST(SUM(c) AS BIGINT) AS g_purchase,
             |    CAST(SUM(a + b + c) AS BIGINT) AS sl,
             |    CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sl2
             |  FROM panel)
             |SELECT n, g_click, g_view, g_purchase,
             |  round(2.0 * CAST(3 * (g_click*g_click + g_view*g_view +
             |      g_purchase*g_purchase) -
             |      (g_click + g_view + g_purchase) *
             |      (g_click + g_view + g_purchase) AS DOUBLE) /
             |    CAST(3 * sl - sl2 AS DOUBLE), 6) AS q_stat
             |FROM s""".stripMargin)),

  )
}
