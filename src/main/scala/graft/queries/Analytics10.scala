package graft.queries

import org.apache.spark.sql.functions._

import QueryDSL._

/** Round-11 wave two: sequential decoders (2-state Viterbi scores), graph
  * robustness (percolation sweep), distributional goodness-of-fit
  * (Anderson-Darling uniformity) and data-mixing planning (temperature
  * sweep) — same contract as every family (scale-shaped plans,
  * decimal-exact cross-partition reductions, total ORDER BY, DuckDB oracle
  * per query). */
object Analytics10 {

  val queries: Seq[Q] = Seq(

    // Two-state Viterbi forward scores over the global daily event-count
    // series: emission cost |c_t − μ_s| against data-derived integer
    // level means (μ = 0.95/1.05 of the global daily mean via integer
    // division — scale-independent), switch penalty 5, min-plus recursion
    // δ_t(s) = e + min(stay, switch+5). Everything is INTEGER arithmetic,
    // so the DuckDB recursive CTE steps the exact same values (the
    // events_kalman_filter identical-recursion contract, min-plus instead
    // of IEEE). Output: per-day forward scores + the pointwise MAP state.
    // The series collapses to ≤|days| rows before the single bounded
    // typed fold — no driver state, no corpus-sized group.
    Q("events_hmm_viterbi",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .as("d"))
          .agg(count(lit(1)).as("c"))
          .select($"d".cast("long"), $"c".cast("long"))
          .as[(Long, Long)]
        daily.groupByKey(_ => 0)
          .flatMapGroups { (_, it) =>
            val xs = it.toArray.sortBy(_._1)
            val total = xs.map(_._2).sum
            val tn = xs.length.toLong
            val muLo = (19L * total) / (20L * tn)
            val muHi = (21L * total) / (20L * tn) + 1L
            var dLo = math.abs(xs(0)._2 - muLo)
            var dHi = math.abs(xs(0)._2 - muHi)
            xs.iterator.zipWithIndex.map { case ((d, c), i) =>
              if (i > 0) {
                val eLo = math.abs(c - muLo)
                val eHi = math.abs(c - muHi)
                val nLo = eLo + math.min(dLo, dHi + 5)
                val nHi = eHi + math.min(dHi, dLo + 5)
                dLo = nLo; dHi = nHi
              }
              (d, c, dLo, dHi,
                if (dLo <= dHi) "low" else "high", muLo, muHi)
            }
          }
          .toDF("d", "c", "delta_low", "delta_high", "map_state",
            "mu_low", "mu_high")
          .orderBy($"d")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
             |      AS d, COUNT(*) AS c
             |  FROM events GROUP BY 1),
             |idx AS (
             |  SELECT d, c, row_number() OVER (ORDER BY d) AS rn FROM daily),
             |mu AS (
             |  SELECT (19 * SUM(c)) // (20 * COUNT(*)) AS mu_lo,
             |         (21 * SUM(c)) // (20 * COUNT(*)) + 1 AS mu_hi
             |  FROM daily),
             |vit AS (
             |  SELECT rn, d, c,
             |    abs(c - mu_lo) AS dlo, abs(c - mu_hi) AS dhi,
             |    mu_lo, mu_hi
             |  FROM idx CROSS JOIN mu WHERE rn = 1
             |  UNION ALL
             |  SELECT i.rn, i.d, i.c,
             |    abs(i.c - v.mu_lo) + least(v.dlo, v.dhi + 5),
             |    abs(i.c - v.mu_hi) + least(v.dhi, v.dlo + 5),
             |    v.mu_lo, v.mu_hi
             |  FROM vit v JOIN idx i ON i.rn = v.rn + 1)
             |SELECT d, CAST(c AS BIGINT) AS c,
             |  CAST(dlo AS BIGINT) AS delta_low,
             |  CAST(dhi AS BIGINT) AS delta_high,
             |  CASE WHEN dlo <= dhi THEN 'low' ELSE 'high' END AS map_state,
             |  CAST(mu_lo AS BIGINT) AS mu_low, CAST(mu_hi AS BIGINT) AS mu_high
             |FROM vit ORDER BY d""".stripMargin)),

    // Bond-percolation sweep of the weighted week trade graph: keep edges
    // with weight (distinct trade orders) ≥ w for w ∈ {1, 2, 3}, run
    // min-label connected components on each filtered graph, and report
    // surviving edges, component count over ALL nations (pruned nations
    // count as singletons) and the giant-component share — the robustness
    // curve of a supply network. Three bounded CC runs over a ≤25-node
    // graph, each round checkpointed; the thresholds are plain filters,
    // never a cross.
    Q("graph_percolation_sweep",
      (s, dir) => {
        import s.implicits._
        val w = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-03-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1997-03-08").cast("timestamp"))
          .select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .filter($"c_nationkey" =!= $"s_nationkey")
          .select(least($"c_nationkey", $"s_nationkey").cast("long").as("src"),
            greatest($"c_nationkey", $"s_nationkey").cast("long").as("dst"),
            $"l_orderkey")
          .distinct()
          .groupBy($"src", $"dst").agg(count(lit(1)).as("weight"))
          .localCheckpoint()
        val nNations = t(s, dir, "nation").count() // 25-row dim, metadata-cheap
        // The 3 threshold legs are independent and each runs an EAGER CC loop
        // (per-round localCheckpoint barriers). Sequentially, every leg's
        // scheduler-bound rounds leave the other 31 cores idle — submit the
        // legs from a small thread pool instead so their jobs back-fill each
        // other (guide §2.6 "overlap independent jobs"; FIFO scheduling keeps
        // the back-fill shape). Results are unchanged: legs never interact,
        // and the final union orders by threshold.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val legs = Seq(1, 2, 3).map { thr =>
          scala.concurrent.Future {
            val e = w.filter($"weight" >= thr).select($"src", $"dst")
            val cc = graft.ops.ConnectedComponents.run(e)
            val sizes = cc.groupBy($"component").agg(count(lit(1)).as("sz"))
            val agg = sizes.agg(count(lit(1)).as("n_comp_edges"),
              coalesce(max($"sz"), lit(0L)).as("giant"),
              coalesce(sum($"sz"), lit(0L)).as("n_in_edges"))
            agg.crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
              .select(lit(thr).as("threshold"), $"n_edges",
                ($"n_comp_edges" + (lit(nNations) - $"n_in_edges"))
                  .cast("long").as("n_components"),
                $"giant".cast("long").as("giant_size"),
                round($"giant".cast("double") / nNations.toDouble, 6)
                  .as("giant_share"))
          }
        }
        val rows =
          try legs.map(scala.concurrent.Await.result(_,
            scala.concurrent.duration.Duration.Inf))
          finally pool.shutdown()
        rows.reduce(_ unionAll _).orderBy($"threshold")
      },
      Some {
        def leg(thr: Int) =
          s"""sel$thr AS (SELECT src, dst FROM wedges WHERE weight >= $thr),
             |sym$thr AS (SELECT src AS a, dst AS b FROM sel$thr
             |            UNION SELECT dst, src FROM sel$thr),
             |reach$thr(v, lab) AS (
             |  SELECT a, a FROM sym$thr
             |  UNION
             |  SELECT e.b, r.lab FROM reach$thr r JOIN sym$thr e ON e.a = r.v),
             |comp$thr AS (SELECT v, MIN(lab) AS component FROM reach$thr
             |             GROUP BY v),
             |sz$thr AS (SELECT component, COUNT(*) AS sz FROM comp$thr
             |           GROUP BY component),
             |row$thr AS (
             |  SELECT $thr AS threshold,
             |    (SELECT COUNT(*) FROM sel$thr) AS n_edges,
             |    (SELECT COUNT(*) FROM sz$thr) +
             |      ((SELECT COUNT(*) FROM nation) -
             |       COALESCE((SELECT SUM(sz) FROM sz$thr), 0))
             |      AS n_components,
             |    COALESCE((SELECT MAX(sz) FROM sz$thr), 0) AS giant_size,
             |    round(CAST(COALESCE((SELECT MAX(sz) FROM sz$thr), 0) AS DOUBLE)
             |      / (SELECT COUNT(*) FROM nation), 6) AS giant_share)"""
            .stripMargin
        s"""WITH RECURSIVE
           |e0 AS (
           |  SELECT DISTINCT least(c_nationkey, s_nationkey) AS src,
           |    greatest(c_nationkey, s_nationkey) AS dst, l_orderkey
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey
           |    AND l_shipdate >= TIMESTAMP '1997-03-01'
           |    AND l_shipdate <  TIMESTAMP '1997-03-08'),
           |wedges AS (SELECT src, dst, COUNT(*) AS weight FROM e0
           |           GROUP BY 1, 2),
           |${leg(1)},
           |${leg(2)},
           |${leg(3)}
           |SELECT threshold, CAST(n_edges AS BIGINT) AS n_edges,
           |  CAST(n_components AS BIGINT) AS n_components,
           |  CAST(giant_size AS BIGINT) AS giant_size, giant_share
           |FROM (SELECT * FROM row1 UNION ALL SELECT * FROM row2
           |      UNION ALL SELECT * FROM row3)
           |ORDER BY threshold""".stripMargin
      }),

    // Anderson-Darling uniformity test of the md5-derived unit interval —
    // the tail-sensitive companion to the runs/KS tests already in the
    // stats family (A² weights the CDF extremes, exactly where hash bias
    // would hide). u is an exact dyadic rational from 12 md5 nibbles (+½
    // ulp, so ln(u) and ln(1−u) are finite), the order statistic rank
    // comes from the banded global row-number (no single-reducer sort),
    // and the pairing trick folds the classic (2i−1)(ln u_(i) +
    // ln(1−u_(n+1−i))) sum into ONE pass: per row, (2r−1)·ln u +
    // (2(n−r)+1)·ln(1−u). Decimal-exact sums; flag at the 5% critical
    // value 2.492.
    Q("stats_anderson_darling_uniform",
      (s, dir) => {
        import s.implicits._
        val scale16 = math.pow(16.0, 12)
        val u0 = t(s, dir, "orders")
          .select(conv(substring(md5($"o_orderkey".cast("string")), 1, 12),
            16, 10).cast("long").as("h"))
          .select((($"h".cast("double") + 0.5d) / scale16).as("u"))
        val ranked = bandedRowNumber(u0, floor($"u" * 64).cast("long"),
          Seq($"u"), "r", "n")
        ranked
          .select((((lit(2L) * $"r" - 1L).cast("double")) * log($"u") +
            ((lit(2L) * ($"n" - $"r") + 1L).cast("double")) *
              log(lit(1.0d) - $"u")).as("term"), $"n")
          .groupBy($"n").agg(dsum($"term", 9).as("ssum"))
          .select($"n".as("n_rows"),
            round(-$"n".cast("double") - $"ssum" / $"n".cast("double"), 6)
              .as("a_squared"),
            ((-$"n".cast("double") - $"ssum" / $"n".cast("double")) >
              2.492d).as("reject_uniform"))
      },
      Some(s"""WITH u0 AS (
              |  SELECT (CAST(${sqlHexInt("md5(CAST(o_orderkey AS VARCHAR))", 1, 12)}
              |      AS DOUBLE) + 0.5) / 281474976710656.0 AS u
              |  FROM orders),
              |rk AS (
              |  SELECT u, row_number() OVER (ORDER BY u) AS r,
              |    COUNT(*) OVER () AS n
              |  FROM u0),
              |terms AS (
              |  SELECT n, CAST(2 * r - 1 AS DOUBLE) * ln(u) +
              |    CAST(2 * (n - r) + 1 AS DOUBLE) * ln(1.0 - u) AS term
              |  FROM rk),
              |g AS (SELECT n, ${sqlDsum("term", 9)} AS ssum FROM terms
              |      GROUP BY n)
              |SELECT n AS n_rows,
              |  round(-CAST(n AS DOUBLE) - ssum / CAST(n AS DOUBLE), 6)
              |    AS a_squared,
              |  (-CAST(n AS DOUBLE) - ssum / CAST(n AS DOUBLE)) > 2.492
              |    AS reject_uniform
              |FROM g""".stripMargin)),

    // Temperature-sampling planning table: at τ ∈ {0.3, 0.7, 1.0} the
    // source weights p_i ∝ n_i^τ (the multilingual-mixing knob — low τ
    // upsamples small sources); report each sweep point's mixture entropy,
    // effective source count exp(H) and the top source's share — the
    // numbers a data-mixing decision actually needs, next to the existing
    // single-τ weight op. Per-source token counts are one rollup;
    // each sweep point is a projection over the ≤|sources| frame with the
    // normalizer attached by a per-τ equi-join on the constant τ key.
    Q("sample_temperature_entropy",
      (s, dir) => {
        import s.implicits._
        import graft.llm.{TextFunctions => TF}
        val counts = t(s, dir, "documents")
          .select($"source", explode(TF.tokens($"text")).as("w"))
          .groupBy($"source").agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val taus = Seq(0.3d, 0.7d, 1.0d)
        val weighted = taus.map(tau => counts.select(lit(tau).as("tau"),
          $"source", pow($"n".cast("double"), tau).as("wgt")))
          .reduce(_ unionAll _)
        val z = weighted.groupBy($"tau")
          .agg(sum($"wgt".cast("decimal(30,9)")).cast("double").as("z"))
        weighted.join(z, "tau")
          .select($"tau", ($"wgt" / $"z").as("p"))
          .groupBy($"tau")
          .agg(count(lit(1)).as("n_sources"),
            (-sum(($"p" * log($"p")).cast("decimal(30,12)")).cast("double"))
              .as("h"),
            max($"p").as("top_share"))
          .select($"tau", $"n_sources", round($"h", 6).as("entropy_nats"),
            round(exp($"h"), 4).as("effective_sources"),
            round($"top_share", 6).as("top_source_share"))
          .orderBy($"tau")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, unnest(${Llm.duckToks("text")}) AS w
              |  FROM documents),
              |counts AS (SELECT source, COUNT(*) AS n FROM toks GROUP BY 1),
              |sweep AS (
              |  SELECT tau, source, pow(CAST(n AS DOUBLE), tau) AS wgt
              |  FROM counts CROSS JOIN
              |    (SELECT unnest([0.3, 0.7, 1.0]) AS tau)),
              |z AS (SELECT tau, CAST(SUM(CAST(wgt AS DECIMAL(30,9)))
              |        AS DOUBLE) AS z
              |      FROM sweep GROUP BY tau),
              |p AS (SELECT s.tau, s.wgt / z.z AS p
              |      FROM sweep s JOIN z ON z.tau = s.tau),
              |g AS (
              |  SELECT tau, COUNT(*) AS n_sources,
              |    -CAST(SUM(CAST(p * ln(p) AS DECIMAL(30,12))) AS DOUBLE) AS h,
              |    MAX(p) AS top_share
              |  FROM p GROUP BY tau)
              |SELECT tau, n_sources, round(h, 6) AS entropy_nats,
              |  round(exp(h), 4) AS effective_sources,
              |  round(top_share, 6) AS top_source_share
              |FROM g ORDER BY tau""".stripMargin))
  )
}
