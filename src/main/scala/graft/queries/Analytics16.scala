package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Analytics wave 16 — privacy auditing, motif discovery, and probabilistic
  * record linkage: three classics the corpus still lacked.
  *
  *  - t-closeness (the third privacy bar after dq_k_anonymity and
  *    dq_l_diversity): ordered-EMD distance between each QI class's
  *    sensitive-attribute distribution and the global one
  *  - matrix profile over the daily series (nearest-neighbor distance per
  *    z-normalized subsequence — the motif/discord readout)
  *  - Fellegi–Sunter probabilistic linkage: Laplace-smoothed m/u
  *    probabilities from an injected-duplicate match set, log-likelihood
  *    agreement weights per field, pattern-level scores
  *
  * Scale posture: t-closeness is two keyed rollups + a 10-level
  * explode-densified grid (windows partitioned BY GROUP — never global);
  * the matrix profile runs on the ≤31-row calendar rollup with pair
  * distances reduced over an (i,j,pos) EQUI-join, not a cross; F-S pairs
  * come from the O(n·w) sorted-neighborhood generator. Determinism: counts
  * and Laplace rationals are exact; ln runs on engine-identical quotients
  * and is quantized (Analytics12 rule); per-group cumulative sums run over
  * 10-row bucket frames in pinned order; z-normalized distances accumulate
  * in DECIMAL(30,12).
  */
object Analytics16 {

  private val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)

  val queries: Seq[Q] = Seq(

    // t-closeness over QI = (nation, segment), sensitive = acctbal decile
    // (fixed-width 1100-unit buckets — no ranking pass). For an ORDERED
    // attribute the Earth-Mover's distance has the closed form
    // EMD = Σᵢ|Σ_{j≤i}(p_j − q_j)| / (m−1). The 10-level grid densifies via
    // explode(sequence(0,9)) on the group frame (equi joins only); the
    // cumulative runs per group (partitioned window, 10 rows each). The
    // global distribution attaches through the sanctioned single-row cross.
    Q("dq_t_closeness",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").select($"c_nationkey", $"c_mktsegment",
          least(floor(($"c_acctbal" + 1000.0d) / 1100.0d), lit(9.0d))
            .cast("int").as("bkt"))
        val gcnt = c.groupBy($"bkt").agg(count(lit(1)).as("gc"))
          .withColumn("__k", lit(1))
        val gtot = c.agg(count(lit(1)).as("gn")).withColumn("__k", lit(1))
        val q = gcnt.join(broadcast(gtot), "__k")
          .select($"bkt", ($"gc".cast("double") / $"gn".cast("double"))
            .as("qp"))
        val grp = c.groupBy($"c_nationkey", $"c_mktsegment")
          .agg(count(lit(1)).as("n"))
        val grid = grp.select($"c_nationkey", $"c_mktsegment", $"n",
          explode(sequence(lit(0), lit(9))).as("bkt"))
        val cls = c.groupBy($"c_nationkey", $"c_mktsegment", $"bkt")
          .agg(count(lit(1)).as("cc"))
        val w = Window.partitionBy($"c_nationkey", $"c_mktsegment")
          .orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(cls, Seq("c_nationkey", "c_mktsegment", "bkt"), "left")
          .na.fill(0L, Seq("cc"))
          .join(broadcast(q), "bkt")
          .withColumn("cum",
            sum($"cc".cast("double") / $"n".cast("double") - $"qp").over(w))
          .groupBy($"c_nationkey", $"c_mktsegment")
          .agg(first($"n").as("class_size"),
            (sum(abs($"cum").cast(DEC)).cast("double") / 9.0d).as("emd"))
          .select($"c_nationkey", $"c_mktsegment", $"class_size",
            round($"emd", 9).as("emd"),
            ($"emd" > 0.2d).as("t_violation"))
          .orderBy($"c_nationkey", $"c_mktsegment")
      },
      Some("""WITH c AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(least(floor((c_acctbal + 1000.0) / 1100.0), 9.0)
             |      AS INT) AS bkt
             |  FROM customer),
             |q AS (
             |  SELECT bkt, CAST(COUNT(*) AS DOUBLE) /
             |    CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS qp
             |  FROM c GROUP BY 1),
             |grp AS (
             |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |  FROM c GROUP BY 1, 2),
             |grid AS (
             |  SELECT c_nationkey, c_mktsegment, n,
             |    CAST(unnest(range(0, 10)) AS INT) AS bkt
             |  FROM grp),
             |cls AS (
             |  SELECT c_nationkey, c_mktsegment, bkt, COUNT(*) AS cc
             |  FROM c GROUP BY 1, 2, 3),
             |cum AS (
             |  SELECT g.c_nationkey, g.c_mktsegment, g.n,
             |    SUM(CAST(COALESCE(cl.cc, 0) AS DOUBLE) /
             |          CAST(g.n AS DOUBLE) - q.qp)
             |      OVER (PARTITION BY g.c_nationkey, g.c_mktsegment
             |            ORDER BY g.bkt
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum
             |  FROM grid g
             |  LEFT JOIN cls cl ON cl.c_nationkey = g.c_nationkey
             |    AND cl.c_mktsegment = g.c_mktsegment AND cl.bkt = g.bkt
             |  JOIN q ON q.bkt = g.bkt),
             |e AS (
             |  SELECT c_nationkey, c_mktsegment, n AS class_size,
             |    CAST(SUM(CAST(abs(cum) AS DECIMAL(30,12))) AS DOUBLE) / 9.0
             |      AS emd
             |  FROM cum GROUP BY 1, 2, 3)
             |SELECT c_nationkey, c_mktsegment, class_size,
             |  round(emd, 9) AS emd, emd > 0.2 AS t_violation
             |FROM e ORDER BY 1, 2""".stripMargin)),

    // Matrix profile (STOMP readout) over the daily event counts: for each
    // z-normalized length-7 subsequence, the Euclidean distance to its
    // nearest non-trivial neighbor (exclusion zone |i−j| ≥ 4) and that
    // neighbor's index — the motif/discord detector. Subsequences unfold via
    // explode(0..6) on the day index (equi algebra); pair distances reduce
    // over an (i,j,pos) EQUI-join on pos, never a cross; per-window moments
    // are exact integer sums. Everything lives on the ≤31-row daily frame.
    Q("events_matrix_profile",
      (s, dir) => {
        import s.implicits._
        val m = 7
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .withColumn("idx",
            row_number().over(Window.orderBy($"day")).cast("long") - 1)
          .withColumn("nd", count(lit(1)).over(
            Window.orderBy($"day").rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
        val unf = daily
          .select($"idx", $"c", $"nd", explode(sequence(lit(0), lit(m - 1)))
            .as("k"))
          .select(($"idx" - $"k").as("i"), $"k".as("pos"), $"c", $"nd")
          .filter($"i" >= 0 && $"i" <= $"nd" - m)
        val stats = unf.groupBy($"i")
          .agg(sum($"c").as("sc"), sum($"c" * $"c").as("ssc"))
          .select($"i", ($"sc".cast("double") / m).as("mu"),
            sqrt(($"ssc".cast("double") -
              $"sc".cast("double") * $"sc".cast("double") / m) / m)
              .as("sigma"))
        val z = unf.join(broadcast(stats), "i")
          .select($"i", $"pos",
            (($"c".cast("double") - $"mu") / $"sigma").as("z"))
        val d2 = z.select($"i", $"pos", $"z")
          .join(z.select($"i".as("j"), $"pos", $"z".as("zj")), "pos")
          .filter(abs($"i" - $"j") >= 4)
          .groupBy($"i", $"j")
          .agg(sum((($"z" - $"zj") * ($"z" - $"zj")).cast(DEC))
            .cast("double").as("dd"))
        d2.groupBy($"i")
          .agg(min(struct(sqrt($"dd").as("d"), $"j")).as("nn"))
          .select($"i".as("window_start"),
            round($"nn.d", 6).as("mp_dist"), $"nn.j".as("nn_index"))
          .orderBy($"window_start")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1),
             |ix AS (
             |  SELECT c, row_number() OVER (ORDER BY day) - 1 AS idx,
             |    COUNT(*) OVER () AS nd
             |  FROM daily),
             |unf AS (
             |  SELECT idx - k AS i, k AS pos, c, nd FROM (
             |    SELECT idx, c, nd, unnest(range(0, 7)) AS k FROM ix)
             |  WHERE idx - k >= 0 AND idx - k <= nd - 7),
             |stats AS (
             |  SELECT i, CAST(SUM(c) AS DOUBLE) / 7 AS mu,
             |    sqrt((CAST(SUM(c * c) AS DOUBLE) -
             |      CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE) / 7) / 7)
             |      AS sigma
             |  FROM unf GROUP BY 1),
             |z AS (
             |  SELECT u.i, u.pos,
             |    (CAST(u.c AS DOUBLE) - st.mu) / st.sigma AS z
             |  FROM unf u JOIN stats st ON st.i = u.i),
             |d2 AS (
             |  SELECT a.i, b.i AS j,
             |    CAST(SUM(CAST((a.z - b.z) * (a.z - b.z) AS DECIMAL(30,12)))
             |      AS DOUBLE) AS dd
             |  FROM z a JOIN z b ON b.pos = a.pos AND abs(a.i - b.i) >= 4
             |  GROUP BY 1, 2),
             |nn AS (
             |  SELECT i, sqrt(dd) AS d, j,
             |    row_number() OVER (PARTITION BY i ORDER BY sqrt(dd), j)
             |      AS rn
             |  FROM d2)
             |SELECT i AS window_start, round(d, 6) AS mp_dist,
             |  j AS nn_index
             |FROM nn WHERE rn = 1 ORDER BY window_start""".stripMargin)),

    // Fellegi–Sunter probabilistic record linkage with an HONEST injected
    // match set (the LlmExt2 fixture-injection discipline: the synthetic
    // customers have no true duplicates, so 40 deterministic clones
    // (c_custkey < 40 over 0-based custkeys = keys 0..39) — name
    // suffixed 'x', balance nudged — make the m-probabilities genuinely
    // informative rather than vacuously equal to u). Candidate pairs come
    // from the O(n·w) sorted-neighborhood generator (clones sort adjacent
    // to their originals by construction); the match indicator is the
    // clone-prefix relation. Per field f ∈ {nation, segment, balance-bucket}
    // the Laplace-smoothed m_f/u_f are exact rationals; agreement weights
    // ln(m/u) and disagreement weights ln((1−m)/(1−u)) are quantized, and
    // each of the 8 agreement patterns reads out its pair count and summed
    // log-likelihood weight.
    Q("dedup_fellegi_sunter",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "customer")
          .select($"c_custkey", $"c_name", $"c_nationkey", $"c_mktsegment",
            $"c_acctbal")
        val clones = base.filter($"c_custkey" < 40)
          .select(($"c_custkey" + 10000000L).as("c_custkey"),
            concat($"c_name", lit("x")).as("c_name"),
            $"c_nationkey", $"c_mktsegment",
            ($"c_acctbal" + 0.5d).as("c_acctbal"))
        val all = base.unionByName(clones)
          .withColumn("bkt",
            least(floor(($"c_acctbal" + 1000.0d) / 1100.0d), lit(9.0d))
              .cast("int"))
        val ranked = bandedRowNumber(all, substring($"c_name", 10, 6),
          Seq($"c_name"), "rk", "__n")
          .localCheckpoint()
        val pairs = ranked.select($"c_name".as("name_a"),
            $"c_nationkey".as("na"), $"c_mktsegment".as("sa"),
            $"bkt".as("ba"), ($"rk" + 1).as("nbr"))
          .join(ranked.select($"c_name".as("name_b"),
            $"c_nationkey".as("nb"), $"c_mktsegment".as("sb"),
            $"bkt".as("bb"), $"rk".as("nbr")), "nbr")
          .select(
            ($"name_b" === concat($"name_a", lit("x"))).as("is_match"),
            ($"na" === $"nb").as("ag_nation"),
            ($"sa" === $"sb").as("ag_segment"),
            ($"ba" === $"bb").as("ag_balance"))
          .localCheckpoint()
        def rate(agree: Column, in: Column): Column =
          (sum(when(agree && in, 1L).otherwise(0L)) + lit(1L))
            .cast("double") /
            (sum(when(in, 1L).otherwise(0L)) + lit(2L)).cast("double")
        val mu = pairs.agg(
          rate($"ag_nation", $"is_match").as("m_n"),
          rate($"ag_nation", !$"is_match").as("u_n"),
          rate($"ag_segment", $"is_match").as("m_s"),
          rate($"ag_segment", !$"is_match").as("u_s"),
          rate($"ag_balance", $"is_match").as("m_b"),
          rate($"ag_balance", !$"is_match").as("u_b"))
          .withColumn("__k", lit(1))
        def w(agree: Column, m: Column, u: Column): Column =
          when(agree, round(log(m / u), 6))
            .otherwise(round(log((lit(1.0d) - m) / (lit(1.0d) - u)), 6))
        pairs.groupBy($"ag_nation", $"ag_segment", $"ag_balance")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when($"is_match", 1L).otherwise(0L)).as("n_matches"))
          .withColumn("__k", lit(1))
          .join(broadcast(mu), "__k")
          .select($"ag_nation", $"ag_segment", $"ag_balance", $"n_pairs",
            $"n_matches",
            round(w($"ag_nation", $"m_n", $"u_n") +
              w($"ag_segment", $"m_s", $"u_s") +
              w($"ag_balance", $"m_b", $"u_b"), 6).as("fs_weight"))
          .orderBy($"ag_nation", $"ag_segment", $"ag_balance")
      },
      Some("""WITH base AS (
             |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
             |    c_acctbal
             |  FROM customer),
             |allr AS (
             |  SELECT *,
             |    CAST(least(floor((c_acctbal + 1000.0) / 1100.0), 9.0)
             |      AS INT) AS bkt
             |  FROM (
             |    SELECT * FROM base
             |    UNION ALL
             |    SELECT c_custkey + 10000000, c_name || 'x', c_nationkey,
             |      c_mktsegment, c_acctbal + 0.5
             |    FROM base WHERE c_custkey < 40)),
             |ranked AS (
             |  SELECT c_name, c_nationkey, c_mktsegment, bkt,
             |    row_number() OVER (ORDER BY c_name) AS rk
             |  FROM allr),
             |pairs AS (
             |  SELECT b.c_name = a.c_name || 'x' AS is_match,
             |    a.c_nationkey = b.c_nationkey AS ag_nation,
             |    a.c_mktsegment = b.c_mktsegment AS ag_segment,
             |    a.bkt = b.bkt AS ag_balance
             |  FROM ranked a JOIN ranked b ON b.rk = a.rk + 1),
             |mu AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN ag_nation AND is_match THEN 1 ELSE 0
             |      END) + 1 AS DOUBLE) /
             |      CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) + 2
             |        AS DOUBLE) AS m_n,
             |    CAST(SUM(CASE WHEN ag_nation AND NOT is_match THEN 1
             |      ELSE 0 END) + 1 AS DOUBLE) /
             |      CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) + 2
             |        AS DOUBLE) AS u_n,
             |    CAST(SUM(CASE WHEN ag_segment AND is_match THEN 1 ELSE 0
             |      END) + 1 AS DOUBLE) /
             |      CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) + 2
             |        AS DOUBLE) AS m_s,
             |    CAST(SUM(CASE WHEN ag_segment AND NOT is_match THEN 1
             |      ELSE 0 END) + 1 AS DOUBLE) /
             |      CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) + 2
             |        AS DOUBLE) AS u_s,
             |    CAST(SUM(CASE WHEN ag_balance AND is_match THEN 1 ELSE 0
             |      END) + 1 AS DOUBLE) /
             |      CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) + 2
             |        AS DOUBLE) AS m_b,
             |    CAST(SUM(CASE WHEN ag_balance AND NOT is_match THEN 1
             |      ELSE 0 END) + 1 AS DOUBLE) /
             |      CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) + 2
             |        AS DOUBLE) AS u_b
             |  FROM pairs)
             |SELECT ag_nation, ag_segment, ag_balance,
             |  COUNT(*) AS n_pairs,
             |  CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_matches,
             |  round(
             |    (CASE WHEN ag_nation THEN round(ln(m_n / u_n), 6)
             |      ELSE round(ln((1.0 - m_n) / (1.0 - u_n)), 6) END) +
             |    (CASE WHEN ag_segment THEN round(ln(m_s / u_s), 6)
             |      ELSE round(ln((1.0 - m_s) / (1.0 - u_s)), 6) END) +
             |    (CASE WHEN ag_balance THEN round(ln(m_b / u_b), 6)
             |      ELSE round(ln((1.0 - m_b) / (1.0 - u_b)), 6) END), 6)
             |    AS fs_weight
             |FROM pairs CROSS JOIN mu
             |GROUP BY 1, 2, 3,
             |  m_n, u_n, m_s, u_s, m_b, u_b
             |ORDER BY 1, 2, 3""".stripMargin))
  )
}
