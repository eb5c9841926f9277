package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDSL._

/** Round-11 wave three: embedding-geometry audit (isotropy), storage-layout
  * presortedness, robust outlier fences, and the dedup threshold-sweep
  * planning table — same contract as every family (scale-shaped plans,
  * decimal-exact cross-partition reductions, total ORDER BY, DuckDB oracle
  * per query). */
object Analytics11 {

  val queries: Seq[Q] = Seq(

    // Embedding isotropy audit — the geometry health-check run before any
    // cosine-based retrieval is trusted (a common-mean-dominated or
    // few-axis space makes cosine scores meaningless): per-dimension first
    // and second moments from ONE posexplode pass (d×(Σv, Σv²), decimal-
    // exact), reduced to ‖μ‖², the covariance trace, the mean-dominance
    // ratio ‖μ‖²/E‖v‖² (Mu & Viswanath's all-but-the-top motivation), the
    // top axis-variance share, and the participation ratio (Σvar)²/Σvar²
    // — the axis-aligned effective dimensionality. At 100 TB this is one
    // map-side-combined d-cell aggregation; nothing downstream exceeds d
    // rows.
    Q("embed_isotropy_audit",
      (s, dir) => {
        import s.implicits._
        val dims = t(s, dir, "embeddings")
          .select($"vec_id", posexplode($"embedding").as(Seq("p", "v")))
          .select($"p", $"v".cast("double").as("v"))
          .groupBy($"p")
          .agg(count(lit(1)).as("n"), dsum($"v", 12).as("sv"),
            dsum($"v" * $"v", 12).as("svv"))
          .select($"p", $"n",
            ($"sv" / $"n".cast("double")).as("mu"),
            ($"svv" / $"n".cast("double") -
              ($"sv" / $"n".cast("double")) * ($"sv" / $"n".cast("double")))
              .as("varp"))
          .localCheckpoint()
        dims
          .agg(count(lit(1)).as("d"), max($"n").cast("long").as("n_vectors"),
            sum(($"mu" * $"mu").cast("decimal(30,12)")).cast("double")
              .as("mu_norm2"),
            sum($"varp".cast("decimal(30,12)")).cast("double").as("trace"),
            max($"varp").as("max_var"),
            sum(($"varp" * $"varp").cast("decimal(30,12)")).cast("double")
              .as("var2"))
          .select($"d", $"n_vectors",
            round($"mu_norm2", 8).as("mean_norm2"),
            round($"trace", 8).as("cov_trace"),
            round($"mu_norm2" / ($"mu_norm2" + $"trace"), 6)
              .as("mean_dominance"),
            round($"max_var" / $"trace", 6).as("top_axis_share"),
            round(($"trace" * $"trace") / $"var2", 4)
              .as("participation_ratio"))
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS p
             |  FROM embeddings),
             |dims AS (
             |  SELECT p, COUNT(*) AS n,
             |    CAST(SUM(CAST(v AS DECIMAL(30,12))) AS DOUBLE) AS sv,
             |    CAST(SUM(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE) AS svv
             |  FROM flat GROUP BY p),
             |m AS (
             |  SELECT p, n, sv / n AS mu,
             |    svv / n - (sv / n) * (sv / n) AS varp
             |  FROM dims),
             |g AS (
             |  SELECT COUNT(*) AS d, CAST(MAX(n) AS BIGINT) AS n_vectors,
             |    CAST(SUM(CAST(mu * mu AS DECIMAL(30,12))) AS DOUBLE)
             |      AS mu_norm2,
             |    CAST(SUM(CAST(varp AS DECIMAL(30,12))) AS DOUBLE) AS trace,
             |    MAX(varp) AS max_var,
             |    CAST(SUM(CAST(varp * varp AS DECIMAL(30,12))) AS DOUBLE)
             |      AS var2
             |  FROM m)
             |SELECT d, n_vectors, round(mu_norm2, 8) AS mean_norm2,
             |  round(trace, 8) AS cov_trace,
             |  round(mu_norm2 / (mu_norm2 + trace), 6) AS mean_dominance,
             |  round(max_var / trace, 6) AS top_axis_share,
             |  round((trace * trace) / var2, 4) AS participation_ratio
             |FROM g""".stripMargin)),

    // Presortedness audit of the natural (orderkey, linenumber) record order
    // vs the ship-date column, per order month: descents WITHIN each order's
    // line sequence (the deterministic adjacency — cross-order adjacency
    // depends on physical row order, which a distributed scan does not
    // define), run count, and a sortedness score — the "will zone maps
    // work without an explicit sort" planning signal. One order-partitioned
    // lag window, one month rollup, pure integers.
    Q("scale_sort_run_audit",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_shipdate",
            date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
          // (orderkey, linenumber) is NOT unique in the synthetic data —
          // break lag-order ties by the compared value itself, which makes
          // the descent count permutation-invariant hence deterministic
          .withColumn("prev", lag($"l_shipdate", 1).over(
            Window.partitionBy($"l_orderkey")
              .orderBy($"l_linenumber", $"l_shipdate")))
        li.groupBy($"ship_month")
          .agg(count(lit(1)).as("n_lines"),
            sum(when($"prev".isNotNull && $"prev" > $"l_shipdate", 1L)
              .otherwise(0L)).as("descents"),
            sum(when($"prev".isNotNull, 1L).otherwise(0L)).as("adjacencies"))
          .select($"ship_month", $"n_lines", $"descents", $"adjacencies",
            ($"descents" + when($"adjacencies" > 0, 0L).otherwise(0L))
              .as("runs_minus_groups"),
            round(when($"adjacencies" > 0,
              lit(1.0d) - $"descents".cast("double") /
                $"adjacencies".cast("double")), 6).as("sortedness"))
          .drop("runs_minus_groups")
          .orderBy($"ship_month")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_linenumber, l_shipdate,
             |    strftime(l_shipdate, '%Y-%m') AS ship_month,
             |    lag(l_shipdate) OVER (PARTITION BY l_orderkey
             |      ORDER BY l_linenumber, l_shipdate) AS prev
             |  FROM lineitem)
             |SELECT ship_month, COUNT(*) AS n_lines,
             |  CAST(SUM(CASE WHEN prev IS NOT NULL AND prev > l_shipdate
             |    THEN 1 ELSE 0 END) AS BIGINT) AS descents,
             |  CAST(SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS adjacencies,
             |  round(CASE WHEN SUM(CASE WHEN prev IS NOT NULL THEN 1
             |      ELSE 0 END) > 0 THEN
             |    1.0 - CAST(SUM(CASE WHEN prev IS NOT NULL AND
             |        prev > l_shipdate THEN 1 ELSE 0 END) AS DOUBLE) /
             |      CAST(SUM(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)
             |        AS DOUBLE)
             |    END, 6) AS sortedness
             |FROM li GROUP BY ship_month ORDER BY ship_month""".stripMargin)),

    // Tukey-fence outlier census per event type: exact interpolated
    // quartiles (the same percentile machinery both engines agree on
    // bit-for-bit), 1.5×IQR fences broadcast back by an equi-join on the
    // type key, and the low/high outlier counts plus rate — the robust
    // alternative to z-score flagging that survives heavy tails. Two
    // key-partitioned passes, no global sort, no cross.
    Q("stats_tukey_fences",
      (s, dir) => {
        import s.implicits._
        val fences = graft.Tables.events(s, dir)
          .groupBy($"event_type")
          .agg(expr("percentile(value, array(0.25D, 0.75D))").as("qs"))
          .select($"event_type",
            element_at($"qs", 1).as("q1"), element_at($"qs", 2).as("q3"))
          .select($"event_type", $"q1", $"q3",
            ($"q1" - lit(1.5d) * ($"q3" - $"q1")).as("lo_fence"),
            ($"q3" + lit(1.5d) * ($"q3" - $"q1")).as("hi_fence"))
        graft.Tables.events(s, dir)
          .select($"event_type", $"value")
          .join(fences, "event_type")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            first($"q1").as("f_q1"), first($"q3").as("f_q3"),
            sum(when($"value" < $"lo_fence", 1L).otherwise(0L)).as("n_low"),
            sum(when($"value" > $"hi_fence", 1L).otherwise(0L)).as("n_high"))
          .select($"event_type", $"n", round($"f_q1", 6).as("q1"),
            round($"f_q3", 6).as("q3"), $"n_low", $"n_high",
            round(($"n_low" + $"n_high").cast("double") / $"n".cast("double"), 6)
              .as("outlier_rate"))
          .orderBy($"event_type")
      },
      Some("""WITH f AS (
             |  SELECT event_type,
             |    quantile_cont(value, 0.25) AS q1,
             |    quantile_cont(value, 0.75) AS q3
             |  FROM events GROUP BY event_type),
             |j AS (
             |  SELECT e.event_type, e.value, f.q1, f.q3,
             |    f.q1 - 1.5 * (f.q3 - f.q1) AS lo_fence,
             |    f.q3 + 1.5 * (f.q3 - f.q1) AS hi_fence
             |  FROM events e JOIN f USING (event_type))
             |SELECT event_type, COUNT(*) AS n,
             |  round(ANY_VALUE(q1), 6) AS q1, round(ANY_VALUE(q3), 6) AS q3,
             |  CAST(SUM(CASE WHEN value < lo_fence THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_low,
             |  CAST(SUM(CASE WHEN value > hi_fence THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_high,
             |  round(CAST(SUM(CASE WHEN value < lo_fence OR value > hi_fence
             |      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             |    AS outlier_rate
             |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Dedup threshold-sweep planning table: exact 3-gram Jaccard over the
    // df-capped candidate space (shingle in 2..50 docs — the production
    // stop-phrase cap; never all-pairs), then per threshold θ ∈
    // {0.3, 0.5, 0.7}: qualifying pairs and removed docs under the
    // keep-smallest-id rule — the table a curator reads before committing
    // to a near-dup threshold. Thresholds {0.02, 0.05, 0.9} bracket the
    // corpus's actual Jaccard landscape (a dense boilerplate floor at
    // ~0.01-0.03, a clean gap, and the exact-duplicate cluster at ≥0.95 —
    // the bimodal shape real web corpora show). Conditional sums over ONE
    // pair frame, stacked to 3 rows in a projection.
    Q("dedup_threshold_sweep",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").filter($"doc_id" < 300)
        val sh = graft.llm.Dedup.shingleFrame(docs, "doc_id", "text", shingleN = 3)
          .localCheckpoint()
        val capped = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
          .filter($"df".between(2, 50)).select("shingle")
        val shc = sh.join(capped, "shingle")
        val sizes = sh.groupBy($"doc_id").agg(countDistinct($"shingle").as("sz"))
        val inter = shc.select($"shingle", $"doc_id".as("id1")).distinct()
          .join(shc.select($"shingle", $"doc_id".as("id2")).distinct(), "shingle")
          .filter($"id1" < $"id2")
          .groupBy($"id1", $"id2").agg(count(lit(1)).as("shared"))
        val jacc = inter
          .join(sizes.select($"doc_id".as("id1"), $"sz".as("sz1")), "id1")
          .join(sizes.select($"doc_id".as("id2"), $"sz".as("sz2")), "id2")
          .select($"id1", $"id2", ($"shared".cast("double") /
            ($"sz1" + $"sz2" - $"shared").cast("double")).as("j"))
        val row = jacc.agg(count(lit(1)).as("n_candidates"),
          sum(when($"j" >= 0.02d, 1L).otherwise(0L)).as("p3"),
          sum(when($"j" >= 0.05d, 1L).otherwise(0L)).as("p5"),
          sum(when($"j" >= 0.9d, 1L).otherwise(0L)).as("p7"),
          countDistinct(when($"j" >= 0.02d, $"id2")).as("r3"),
          countDistinct(when($"j" >= 0.05d, $"id2")).as("r5"),
          countDistinct(when($"j" >= 0.9d, $"id2")).as("r7"))
        row.select(expr(
          "stack(3, 0.02D, n_candidates, p3, r3, 0.05D, n_candidates, p5, r5, " +
            "0.9D, n_candidates, p7, r7)")
          .as(Seq("threshold", "n_candidates", "pairs_over", "docs_removed")))
          .orderBy($"threshold")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, ${Llm.duckToks("text")} AS tk
              |  FROM documents WHERE doc_id < 300),
              |shing AS (
              |  SELECT DISTINCT doc_id,
              |    unnest(CASE WHEN len(tk) >= 3
              |      THEN list_distinct(list_transform(range(1, len(tk) - 1),
              |             i -> array_to_string(tk[i:i+2], ' ')))
              |      ELSE [] END) AS shingle
              |  FROM toks),
              |capped AS (SELECT shingle FROM shing GROUP BY shingle
              |           HAVING COUNT(*) BETWEEN 2 AND 50),
              |shc AS (SELECT s.doc_id, s.shingle
              |        FROM shing s JOIN capped USING (shingle)),
              |sizes AS (SELECT doc_id, COUNT(DISTINCT shingle) AS sz
              |          FROM shing GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
              |  FROM shc a JOIN shc b
              |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |jacc AS (
              |  SELECT i.id1, i.id2,
              |    CAST(i.shared AS DOUBLE) /
              |      CAST(z1.sz + z2.sz - i.shared AS DOUBLE) AS j
              |  FROM inter i
              |  JOIN sizes z1 ON z1.doc_id = i.id1
              |  JOIN sizes z2 ON z2.doc_id = i.id2),
              |row0 AS (
              |  SELECT COUNT(*) AS n_candidates,
              |    SUM(CASE WHEN j >= 0.02 THEN 1 ELSE 0 END) AS p3,
              |    SUM(CASE WHEN j >= 0.05 THEN 1 ELSE 0 END) AS p5,
              |    SUM(CASE WHEN j >= 0.9 THEN 1 ELSE 0 END) AS p7,
              |    COUNT(DISTINCT CASE WHEN j >= 0.02 THEN id2 END) AS r3,
              |    COUNT(DISTINCT CASE WHEN j >= 0.05 THEN id2 END) AS r5,
              |    COUNT(DISTINCT CASE WHEN j >= 0.9 THEN id2 END) AS r7
              |  FROM jacc)
              |SELECT threshold, n_candidates, pairs_over, docs_removed
              |FROM (
              |  SELECT 0.02 AS threshold, n_candidates,
              |    CAST(p3 AS BIGINT) AS pairs_over,
              |    CAST(r3 AS BIGINT) AS docs_removed FROM row0
              |  UNION ALL
              |  SELECT 0.05, n_candidates, CAST(p5 AS BIGINT),
              |    CAST(r5 AS BIGINT) FROM row0
              |  UNION ALL
              |  SELECT 0.9, n_candidates, CAST(p7 AS BIGINT),
              |    CAST(r7 AS BIGINT) FROM row0)
              |ORDER BY threshold""".stripMargin))
  )
}
