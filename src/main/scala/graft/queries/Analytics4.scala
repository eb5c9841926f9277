package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Round-10 analytics wave: personalized PageRank, rank-based two-sample
  * testing, experiment-assignment auditing, and partial autocorrelation —
  * each the standard production companion of an operator family already in
  * the corpus (PageRank → topic-sensitive restart; Welch/KS → nonparametric
  * Mann-Whitney; chi-square → sample-ratio-mismatch; ACF → PACF).
  *
  * Same contract as every family: scale-shaped plans (bounded broadcasts,
  * banded global ranks, no all-pairs), decimal-exact reductions where sums
  * cross partitions, total ORDER BY, and a DuckDB oracle per query. */
object Analytics4 {

  val queries: Seq[Q] = Seq(

    // Personalized PageRank (topic-sensitive restart: teleport mass lands on a
    // SEED set, not uniformly): 5 synchronous iterations over the 25-node
    // customer-nation → supplier-nation trade graph, seeded by the EUROPE
    // nations. Same Pregel-by-joins shape as graph_pagerank — one
    // key-partitioned join + grouped decimal sum per round, rank state never
    // leaves the cluster — plus a seed-share column attached up front (the
    // |seeds| count is a single-row broadcast cross, the sanctioned scalar
    // fan-in). At 100 TB the per-iteration cost is one shuffle of the edge
    // frame; the seed set rides along as a column, so personalization is free.
    Q("graph_personalized_pagerank",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .agg(count(lit(1)).as("w"))
        val ow = e.groupBy($"src".as("osrc")).agg(sum($"w").as("ow"))
        val ew = e.join(ow, $"src" === $"osrc")
          .select($"src", $"dst", ($"w" / $"ow").as("frac"))
          .localCheckpoint() // 25-node edge list: cut the 4-join lineage once
        val seeds = t(s, dir, "nation")
          .join(t(s, dir, "region").filter($"r_name" === "EUROPE"),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey".as("seed"))
        val nSeeds = seeds.agg(count(lit(1)).as("n_seeds"))
        val nodes = ew.select($"src".as("node"))
          .union(ew.select($"dst".as("node"))).distinct()
          .join(seeds, $"node" === $"seed", "left")
          .crossJoin(broadcast(nSeeds))
          .select($"node",
            when($"seed".isNotNull, lit(1.0d) / $"n_seeds")
              .otherwise(lit(0.0d)).as("sshare"))
          .localCheckpoint()
        var ranks = nodes.select($"node", $"sshare".as("pr"))
        for (_ <- 1 to 5) {
          val inflow = ew.join(ranks, $"src" === $"node")
            .select($"dst", ($"pr" * $"frac").cast("decimal(30,12)").as("c"))
            .groupBy($"dst").agg(sum($"c").cast("double").as("inflow"))
          ranks = nodes.join(inflow, $"node" === $"dst", "left")
            .select($"node", $"sshare",
              (lit(0.15d) * $"sshare" +
                lit(0.85d) * coalesce($"inflow", lit(0.0d))).as("pr"))
            .select($"node", $"sshare", $"pr")
        }
        ranks.select($"node", round($"pr", 12).as("ppr"))
          .orderBy($"node")
      },
      Some {
        val iter = (k: Int) =>
          s"""r$k AS (SELECT n.node,
             |  0.15 * n.sshare + 0.85 * COALESCE(i.inflow, 0.0) AS pr
             |  FROM n LEFT JOIN (
             |    SELECT ew.dst,
             |      CAST(SUM(CAST(r.pr * ew.frac AS DECIMAL(30,12))) AS DOUBLE)
             |        AS inflow
             |    FROM ew JOIN r${k - 1} r ON ew.src = r.node GROUP BY ew.dst) i
             |  ON n.node = i.dst)""".stripMargin
        s"""WITH e AS (
           |  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1),
           |ew AS (SELECT e.src, e.dst, e.w / ow.ow AS frac
           |       FROM e JOIN ow ON e.src = ow.src),
           |seeds AS (SELECT n_nationkey AS seed FROM nation
           |          JOIN region ON n_regionkey = r_regionkey
           |          WHERE r_name = 'EUROPE'),
           |ns AS (SELECT COUNT(*) AS n_seeds FROM seeds),
           |n AS (SELECT node,
           |        CASE WHEN seed IS NOT NULL THEN 1.0 / n_seeds
           |             ELSE 0.0 END AS sshare
           |      FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) v
           |      LEFT JOIN seeds ON v.node = seeds.seed CROSS JOIN ns),
           |r0 AS (SELECT node, sshare AS pr FROM n),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT node, round(pr, 12) AS ppr FROM r5 ORDER BY node""".stripMargin
      }),

    // Mann-Whitney U (Wilcoxon rank-sum): the nonparametric two-sample test
    // beside Welch (means) and KS (distributions) — urgent vs low-priority
    // order values, binned to thousands so ties are REAL and the tie
    // correction demonstrably bites. Global average ranks come from the
    // banded two-level rank (bandedRowNumber: the only single-partition leg
    // is the |bins| band spine), tie-averaged per value group as
    // (min+max)/2 — no single-reducer rank over the fact frame. Every
    // accumulation is integer/decimal until the final z readout (round 9, the
    // OLS FMA-guard discipline).
    Q("stats_mann_whitney",
      (s, dir) => {
        import s.implicits._
        val v = t(s, dir, "orders")
          .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
          .select(when($"o_orderpriority" === "1-URGENT", 1)
              .otherwise(2).as("g"),
            floor($"o_totalprice" / 1000).cast("long").as("v"),
            $"o_orderkey")
        val ranked = bandedRowNumber(v, $"v", Seq($"v", $"o_orderkey"),
          "rn", "ntot")
        val byVal = ranked.groupBy($"v")
          .agg(min($"rn").as("mn"), max($"rn").as("mx"),
            count(lit(1)).as("nt"),
            sum(when($"g" === 1, 1L).otherwise(0L)).as("n1v"))
        val agg = byVal.agg(
          sum($"n1v").cast("long").as("n1"),
          sum($"nt" - $"n1v").cast("long").as("n2"),
          (sum(($"n1v" * ($"mn" + $"mx")).cast("decimal(38,0)"))
            .cast("double") / 2.0d).as("r1"),
          sum(($"nt" * $"nt" * $"nt" - $"nt").cast("decimal(38,0)"))
            .cast("double").as("ties"))
        val n = ($"n1" + $"n2").cast("double")
        val u1 = $"r1" - $"n1".cast("double") * ($"n1" + 1).cast("double") / 2.0d
        val mu = $"n1".cast("double") * $"n2".cast("double") / 2.0d
        val varU = $"n1".cast("double") * $"n2".cast("double") / 12.0d *
          ((n + 1.0d) - $"ties" / (n * (n - 1.0d)))
        agg.select($"n1", $"n2", u1.as("u1"),
          round((u1 - mu) / sqrt(varU), 9).as("z"))
      },
      Some("""WITH v AS (
             |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END
             |      AS g,
             |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS v, o_orderkey
             |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |r AS (SELECT g, v,
             |    row_number() OVER (ORDER BY v, o_orderkey) AS rn FROM v),
             |byv AS (SELECT v, MIN(rn) AS mn, MAX(rn) AS mx, COUNT(*) AS nt,
             |    SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1v
             |  FROM r GROUP BY v),
             |s AS (SELECT
             |    CAST(SUM(n1v) AS BIGINT) AS n1,
             |    CAST(SUM(nt - n1v) AS BIGINT) AS n2,
             |    CAST(SUM(CAST(n1v * (mn + mx) AS DECIMAL(38,0))) AS DOUBLE)
             |      / 2.0 AS r1,
             |    CAST(SUM(CAST(nt*nt*nt - nt AS DECIMAL(38,0))) AS DOUBLE)
             |      AS ties
             |  FROM byv)
             |SELECT n1, n2,
             |  r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 AS u1,
             |  round((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
             |      - CAST(n1 AS DOUBLE) * n2 / 2.0) /
             |    sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
             |      ((CAST(n1 + n2 AS DOUBLE) + 1.0)
             |        - ties / (CAST(n1 + n2 AS DOUBLE)
             |                  * (CAST(n1 + n2 AS DOUBLE) - 1.0)))), 9) AS z
             |FROM s""".stripMargin)),

    // Sample-ratio-mismatch audit (the first gate of every A/B readout: a
    // biased assignment invalidates everything downstream): users are
    // deterministically bucketed 50/50 by md5(user_id), observed counts go
    // through the 1-df chi-square, and the SRM verdict is an INTEGER
    // cross-multiplied compare against the 3.8415 critical value — no
    // floating-point boundary. One distinct-shuffle on user_id, a 2-row
    // rollup, a 1-row readout: at 100 TB this is a single pruned scan.
    Q("dq_srm_check",
      (s, dir) => {
        import s.implicits._
        val users = t(s, dir, "events").select($"user_id").distinct()
          .select($"user_id",
            (conv(substring(md5($"user_id".cast("string")), 1, 6), 16, 10)
              .cast("long") % 2).cast("int").as("arm"))
        val c = users.groupBy($"arm").agg(count(lit(1)).as("n"))
        val w = c.agg(
          sum(when($"arm" === 0, $"n").otherwise(0L)).cast("long").as("n0"),
          sum(when($"arm" === 1, $"n").otherwise(0L)).cast("long").as("n1"))
        val d = $"n0" - $"n1"
        w.select($"n0", $"n1",
          round(($"n0" - $"n1").cast("double") * ($"n0" - $"n1")
            / ($"n0" + $"n1"), 9).as("chi2"),
          // chi2 > 3.8415 <=> 10000*(n0-n1)^2 > 38415*(n0+n1), all integer
          (d * d * 10000L > ($"n0" + $"n1") * 38415L).as("srm_flag"))
      },
      Some(s"""WITH u AS (
              |  SELECT DISTINCT user_id FROM events),
              |b AS (
              |  SELECT user_id,
              |    CAST(${sqlHexInt("md5(CAST(user_id AS VARCHAR))", 1, 6)}
              |      % 2 AS INTEGER) AS arm
              |  FROM u),
              |w AS (SELECT
              |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n0,
              |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS n1
              |  FROM b)
              |SELECT n0, n1,
              |  round(CAST(n0 - n1 AS DOUBLE) * (n0 - n1) / (n0 + n1), 9)
              |    AS chi2,
              |  (n0 - n1) * (n0 - n1) * 10000 > (n0 + n1) * 38415 AS srm_flag
              |FROM w""".stripMargin)),

    // Partial autocorrelation (Durbin-Levinson to lag 3) of the daily event
    // count series — the AR-order diagnostic next to events_autocorr_lag's
    // ACF: PACF cuts off where the AR process actually ends, which raw ACF
    // can't show. Lags pair via equi-joins on shifted dates (the ACF shape),
    // pivot to one row, then the DL recursion is pure scalar arithmetic —
    // identical expression trees on both engines, round(9) on the readouts
    // (nested-division FMA guard). |days|-grain frame throughout; at 100 TB
    // the only corpus-sized stage is the daily rollup.
    Q("events_pacf",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).cast("decimal(18,2)").as("c"))
        val nD = $"n_pairs".cast("double")
        val acf = daily.select($"day", $"c",
            explode(array((1 to 3).map(lit): _*)).as("k"))
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
          .select($"k",
            ((nD * $"sxy" - $"sx" * $"sy") /
              sqrt((nD * $"sxx" - $"sx" * $"sx") *
                   (nD * $"syy" - $"sy" * $"sy"))).as("r"))
        val piv = acf.agg(
          max(when($"k" === 1, $"r")).as("r1"),
          max(when($"k" === 2, $"r")).as("r2"),
          max(when($"k" === 3, $"r")).as("r3"))
        // Durbin-Levinson: phi11 = r1; phi22 = (r2-r1^2)/(1-r1^2);
        // phi21 = r1*(1-phi22); phi33 = (r3 - phi21*r2 - phi22*r1)
        //                              / (1 - phi21*r1 - phi22*r2)
        val phi22 = ($"r2" - $"r1" * $"r1") / (lit(1.0d) - $"r1" * $"r1")
        val phi21 = $"r1" * (lit(1.0d) - phi22)
        val phi33 = ($"r3" - phi21 * $"r2" - phi22 * $"r1") /
          (lit(1.0d) - phi21 * $"r1" - phi22 * $"r2")
        piv.select(round($"r1", 9).as("r1"), round($"r2", 9).as("r2"),
          round($"r3", 9).as("r3"),
          round($"r1", 9).as("pacf1"), round(phi22, 9).as("pacf2"),
          round(phi33, 9).as("pacf3"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS DECIMAL(18,2)) AS c
             |  FROM events GROUP BY 1),
             |lagged AS (
             |  SELECT day, c, unnest([1, 2, 3]) AS k FROM daily),
             |pairs AS (
             |  SELECT l.k, l.c AS x, p.c AS y
             |  FROM lagged l JOIN daily p ON p.day = l.day - l.k),
             |g AS (
             |  SELECT k, COUNT(*) AS n_pairs,
             |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(x*x) AS DOUBLE) AS sxx,
             |    CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(y*y) AS DOUBLE) AS syy,
             |    CAST(SUM(x*y) AS DOUBLE) AS sxy
             |  FROM pairs GROUP BY k),
             |a AS (
             |  SELECT k,
             |    (CAST(n_pairs AS DOUBLE)*sxy - sx*sy) /
             |      sqrt((CAST(n_pairs AS DOUBLE)*sxx - sx*sx) *
             |           (CAST(n_pairs AS DOUBLE)*syy - sy*sy)) AS r
             |  FROM g),
             |p AS (SELECT
             |    MAX(CASE WHEN k = 1 THEN r END) AS r1,
             |    MAX(CASE WHEN k = 2 THEN r END) AS r2,
             |    MAX(CASE WHEN k = 3 THEN r END) AS r3
             |  FROM a),
             |dl AS (SELECT r1, r2, r3,
             |    (r2 - r1*r1) / (1.0 - r1*r1) AS phi22
             |  FROM p),
             |dl2 AS (SELECT r1, r2, r3, phi22,
             |    r1 * (1.0 - phi22) AS phi21
             |  FROM dl)
             |SELECT round(r1, 9) AS r1, round(r2, 9) AS r2,
             |  round(r3, 9) AS r3,
             |  round(r1, 9) AS pacf1, round(phi22, 9) AS pacf2,
             |  round((r3 - phi21*r2 - phi22*r1) /
             |        (1.0 - phi21*r1 - phi22*r2), 9) AS pacf3
             |FROM dl2""".stripMargin)),

    // Johnson-Lindenstrauss random projection (64 -> 16 dims with
    // deterministic md5-derived ±1 signs — the Achlioptas construction, no
    // RNG state) plus the audit that justifies it: pairwise squared-distance
    // distortion over the bounded probe set. Projection is a map-side 16-way
    // fan-out of the flattened (vec_id, pos, v) frame collapsed by decimal
    // sums (float x ±1 products are exact in double, so the reduction is
    // bit-stable at any partitioning); the audit pairs probe vectors via an
    // equi-join on dimension position, never a cross. At 100 TB: one linear
    // pass to project, and downstream ANN runs 4x cheaper per distance.
    Q("embed_random_projection",
      (s, dir) => {
        import s.implicits._
        val flat = t(s, dir, "embeddings")
          .select($"vec_id", posexplode($"embedding").as(Seq("pos", "vf")))
          .select($"vec_id", $"pos", $"vf".cast("double").as("v"))
          .localCheckpoint()
        val proj = flat
          .select($"vec_id", $"pos", $"v",
            explode(array((0 until 16).map(lit): _*)).as("j"))
          .withColumn("sgn",
            (conv(substring(md5(concat($"pos".cast("string"), lit(":"),
              $"j".cast("string"))), 1, 6), 16, 10)
              .cast("long") % 2 * 2 - 1).cast("double"))
          .groupBy($"vec_id", $"j")
          .agg((sum(($"v" * $"sgn").cast("decimal(30,12)"))
            .cast("double") / 4.0d).as("p")) // / sqrt(16)
        val probes = flat.filter($"vec_id" < 20)
        val dOrig = probes.as("a")
          .join(probes.as("b"),
            $"a.pos" === $"b.pos" && $"a.vec_id" < $"b.vec_id")
          .groupBy($"a.vec_id".as("id1"), $"b.vec_id".as("id2"))
          .agg(sum((($"a.v" - $"b.v") * ($"a.v" - $"b.v"))
            .cast("decimal(30,12)")).cast("double").as("d2_orig"))
        val pp = proj.filter($"vec_id" < 20)
        val dProj = pp.as("a")
          .join(pp.as("b"), $"a.j" === $"b.j" && $"a.vec_id" < $"b.vec_id")
          .groupBy($"a.vec_id".as("p1"), $"b.vec_id".as("p2"))
          .agg(sum((($"a.p" - $"b.p") * ($"a.p" - $"b.p"))
            .cast("decimal(30,12)")).cast("double").as("d2_proj"))
        dOrig.join(dProj, $"id1" === $"p1" && $"id2" === $"p2")
          .select($"id1", $"id2", round($"d2_orig", 9).as("d2_orig"),
            round($"d2_proj", 9).as("d2_proj"),
            round($"d2_proj" / $"d2_orig", 6).as("distortion"))
          .orderBy($"id1", $"id2")
      },
      Some(s"""WITH flat AS (
              |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
              |         generate_subscripts(embedding, 1) - 1 AS pos
              |  FROM embeddings),
              |fan AS (
              |  SELECT vec_id, pos, v, unnest(range(16)) AS j FROM flat),
              |proj AS (
              |  SELECT vec_id, j,
              |    CAST(SUM(CAST(v * (${sqlHexInt(
                     "md5(CAST(pos AS VARCHAR) || ':' || CAST(j AS VARCHAR))",
                     1, 6)} % 2 * 2 - 1) AS DECIMAL(30,12))) AS DOUBLE) / 4.0
              |      AS p
              |  FROM fan GROUP BY 1, 2),
              |d_orig AS (
              |  SELECT a.vec_id AS id1, b.vec_id AS id2,
              |    CAST(SUM(CAST((a.v - b.v) * (a.v - b.v) AS DECIMAL(30,12)))
              |      AS DOUBLE) AS d2_orig
              |  FROM flat a JOIN flat b
              |    ON a.pos = b.pos AND a.vec_id < b.vec_id
              |  WHERE a.vec_id < 20 AND b.vec_id < 20 GROUP BY 1, 2),
              |d_proj AS (
              |  SELECT a.vec_id AS id1, b.vec_id AS id2,
              |    CAST(SUM(CAST((a.p - b.p) * (a.p - b.p) AS DECIMAL(30,12)))
              |      AS DOUBLE) AS d2_proj
              |  FROM proj a JOIN proj b
              |    ON a.j = b.j AND a.vec_id < b.vec_id
              |  WHERE a.vec_id < 20 AND b.vec_id < 20 GROUP BY 1, 2)
              |SELECT o.id1, o.id2, round(o.d2_orig, 9) AS d2_orig,
              |  round(p.d2_proj, 9) AS d2_proj,
              |  round(p.d2_proj / o.d2_orig, 6) AS distortion
              |FROM d_orig o JOIN d_proj p ON o.id1 = p.id1 AND o.id2 = p.id2
              |ORDER BY o.id1, o.id2""".stripMargin)),

    // Exact permutation test on the experiment readout (the assumption-free
    // significance check beside Welch's t: no normality, no variance model):
    // 64 md5-derived label permutations per user — deterministic, identical
    // on every engine and retry, no RNG state — each scoring the same
    // mean-difference statistic, p = share of permuted |diffs| >= |observed|.
    // Shape: the per-user metric frame fans out x65 map-side (explode of a
    // literal array), collapses to a 130-row (b, arm) rollup in decimal, and
    // the readout is scalar arithmetic — the fact table is read once. The
    // observed split reuses dq_srm_check's md5 assignment.
    Q("stats_permutation_test",
      (s, dir) => {
        import s.implicits._
        val perUser = t(s, dir, "events")
          .filter($"event_type" === "purchase" &&
            $"ts" < lit("2024-01-16").cast("timestamp"))
          .groupBy($"user_id").agg(count(lit(1)).as("m"))
        // b = 0 is the OBSERVED assignment; b = 1..64 are permutations
        val fan = perUser
          .select($"user_id", $"m",
            explode(array((0 to 64).map(lit): _*)).as("b"))
          .withColumn("arm",
            (conv(substring(md5(concat($"user_id".cast("string"),
              when($"b" === 0, lit(""))
                .otherwise(concat(lit(":"), $"b".cast("string"))))),
              1, 6), 16, 10).cast("long") % 2).cast("int"))
        val byArm = fan.groupBy($"b", $"arm")
          .agg(count(lit(1)).as("n"), sum($"m").cast("long").as("sm"))
        val diffs = byArm.groupBy($"b").agg(
          (sum(when($"arm" === 1, $"sm").otherwise(0L)).cast("double") /
            sum(when($"arm" === 1, $"n").otherwise(0L)) -
           sum(when($"arm" === 0, $"sm").otherwise(0L)).cast("double") /
            sum(when($"arm" === 0, $"n").otherwise(0L))).as("diff"))
        val obs = diffs.filter($"b" === 0)
          .select($"diff".as("obs_diff")).localCheckpoint()
        diffs.filter($"b" > 0).crossJoin(broadcast(obs))
          .agg(count(lit(1)).as("n_perms"),
            sum(when(abs($"diff") >= abs($"obs_diff"), 1L).otherwise(0L))
              .cast("long").as("n_extreme"),
            round(first($"obs_diff"), 9).as("obs_diff"))
          .select($"n_perms", $"n_extreme", $"obs_diff",
            round(($"n_extreme" + 1).cast("double") / ($"n_perms" + 1), 6)
              .as("p_value"))
      },
      Some(s"""WITH pu AS (
              |  SELECT user_id, COUNT(*) AS m FROM events
              |  WHERE event_type = 'purchase'
              |    AND ts < TIMESTAMP '2024-01-16'
              |  GROUP BY user_id),
              |fan AS (
              |  SELECT user_id, m, unnest(range(65)) AS b FROM pu),
              |arms AS (
              |  SELECT b, m,
              |    ${sqlHexInt("md5(CAST(user_id AS VARCHAR) || " +
                   "CASE WHEN b = 0 THEN '' ELSE ':' || CAST(b AS VARCHAR) " +
                   "END)", 1, 6)} % 2 AS arm
              |  FROM fan),
              |byarm AS (
              |  SELECT b, arm, COUNT(*) AS n, CAST(SUM(m) AS BIGINT) AS sm
              |  FROM arms GROUP BY 1, 2),
              |diffs AS (
              |  SELECT b,
              |    CAST(SUM(CASE WHEN arm = 1 THEN sm ELSE 0 END) AS DOUBLE) /
              |      SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) -
              |    CAST(SUM(CASE WHEN arm = 0 THEN sm ELSE 0 END) AS DOUBLE) /
              |      SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS diff
              |  FROM byarm GROUP BY b),
              |obs AS (SELECT diff AS obs_diff FROM diffs WHERE b = 0)
              |SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
              |  CAST(SUM(CASE WHEN abs(diff) >= abs(obs_diff) THEN 1 ELSE 0
              |    END) AS BIGINT) AS n_extreme,
              |  round(ANY_VALUE(obs_diff), 9) AS obs_diff,
              |  round(CAST(SUM(CASE WHEN abs(diff) >= abs(obs_diff) THEN 1
              |    ELSE 0 END) + 1 AS DOUBLE) / (COUNT(*) + 1), 6) AS p_value
              |FROM diffs, obs WHERE b > 0""".stripMargin)),

    // Seasonal-naive forecast backtest with MASE (the scale-free forecast
    // accuracy metric that makes models comparable across series): train on
    // the first 23 days, forecast the last 7 as y[d-7], score MASE =
    // MAE(forecast) / MAE(in-train one-step naive). Numerators accumulate as
    // exact integers (daily counts), one double division at the readout —
    // engine-identical. The whole query runs on the |days| grain frame;
    // the only corpus-sized stage is the daily rollup.
    Q("events_forecast_mase",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c")).localCheckpoint()
        val split = lit("2024-01-24").cast("date")
        val fc = daily.filter($"day" >= split).as("t")
          .join(daily.as("p"), $"p.day" === date_sub($"t.day", 7))
          .select(abs($"t.c" - $"p.c").as("ae"))
          .agg(count(lit(1)).as("n_test"),
            sum($"ae").cast("long").as("sum_ae"))
        val naive = daily.filter($"day" < split).as("t")
          .join(daily.as("p"), $"p.day" === date_sub($"t.day", 1))
          .filter($"p.day" < split)
          .select(abs($"t.c" - $"p.c").as("ae"))
          .agg(count(lit(1)).as("n_naive"),
            sum($"ae").cast("long").as("sum_naive"))
        fc.crossJoin(broadcast(naive))
          .select($"n_test", $"sum_ae", $"n_naive", $"sum_naive",
            round(($"sum_ae".cast("double") / $"n_test") /
              ($"sum_naive".cast("double") / $"n_naive"), 9).as("mase"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1),
             |fc AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             |    CAST(SUM(abs(t.c - p.c)) AS BIGINT) AS sum_ae
             |  FROM daily t JOIN daily p ON p.day = t.day - 7
             |  WHERE t.day >= DATE '2024-01-24'),
             |nv AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_naive,
             |    CAST(SUM(abs(t.c - p.c)) AS BIGINT) AS sum_naive
             |  FROM daily t JOIN daily p ON p.day = t.day - 1
             |  WHERE t.day < DATE '2024-01-24' AND p.day < DATE '2024-01-24')
             |SELECT n_test, sum_ae, n_naive, sum_naive,
             |  round((CAST(sum_ae AS DOUBLE) / n_test) /
             |        (CAST(sum_naive AS DOUBLE) / n_naive), 9) AS mase
             |FROM fc, nv""".stripMargin))
  )
}
