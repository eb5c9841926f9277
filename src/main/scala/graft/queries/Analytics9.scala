package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDSL._
import graft.llm.{TextFunctions => TF}

/** Round-11 wave one: corpus-law diagnostics (Heaps' vocabulary growth,
  * compression-redundancy proxy, MATTR lexical diversity, Simpson
  * concentration), categorical-association and multiple-testing statistics
  * (Theil's U, exact sign test + Benjamini-Hochberg), dispersion (Fano
  * factor), and a dictionary-encoding storage audit — same contract as every
  * family (scale-shaped plans, decimal-exact cross-partition reductions,
  * total ORDER BY, DuckDB oracle per query). */
object Analytics9 {

  /** Exact binomial tail Σ_{j≥k} C(n,j) for n ≤ 7, emitted as an identical
    * CASE expression on both engines (keyed by n*16+k). The sign-test
    * p-value tail/2^n is then IEEE-exact: power-of-two denominator, small
    * integer numerator. */
  private val binomTailCase: String = {
    def comb(n: Int, j: Int): Long =
      (1 to j).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
    val whens = (for { n <- 0 to 7; k <- 0 to n } yield
      s"WHEN ${n * 16 + k} THEN ${(k to n).map(comb(n, _)).sum}").mkString(" ")
    s"CASE n_pairs * 16 + k_greater $whens ELSE 0 END"
  }

  val queries: Seq[Q] = Seq(

    // Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β measured at four fixed
    // document prefixes (doc_id < 32/64/128/256 — absolute cutoffs, no
    // data-dependent scalars), β/K by closed-form OLS of ln V on ln n over
    // the four points, expanded inline from one projection. Natural text
    // sits at β ≈ 0.4-0.6; templated/generated corpora diverge — the
    // vocabulary-side twin of the Zipf slope check. Plan: one token explode
    // feeding (a) per-token first-doc (vocab leg) and (b) per-doc counts
    // (token-count leg), each collapsing to ONE row of conditional sums;
    // the two 1-row legs merge via a sanctioned single-row cross. At 100 TB
    // both legs are map-side-combined shuffles on token/doc — no global
    // sort, no window.
    Q("text_heaps_law_fit",
      (s, dir) => {
        import s.implicits._
        // trigram-shingle vocabulary, not unigrams: the synthetic corpus has
        // only ~31 distinct tokens (the hash-collision-audit fixture
        // precedent), so the unigram V(n) saturates instantly and beta
        // degenerates to 0 — trigram vocabulary keeps growing corpus-wide.
        // Trigrams come from the map-side ngrams HOF (one array transform
        // per doc), not a window pass — zero shuffles before the rollups.
        // The token array is STAGED as a real column first: HOF lambdas
        // re-evaluate free subexpressions per position, so an inline
        // tokens() would re-run the regex split once per trigram (the
        // shingleFrame staging rule — measured 30× slower inline).
        val toks = t(s, dir, "documents")
          .select($"doc_id", TF.tokens($"text").as("tk"))
          .select($"doc_id", explode(TF.ngrams($"tk", 3)).as("w"))
        val cuts = Seq(32, 64, 128, 256)
        // conditional one-row aggregates: V_c = tokens first seen before the
        // cutoff; N_c = token occurrences before the cutoff
        val vrow = toks.groupBy($"w").agg(min($"doc_id").as("fd"))
          .agg(sum(when($"fd" < cuts(0), 1L).otherwise(0L)).as("v0"),
            sum(when($"fd" < cuts(1), 1L).otherwise(0L)).as("v1"),
            sum(when($"fd" < cuts(2), 1L).otherwise(0L)).as("v2"),
            sum(when($"fd" < cuts(3), 1L).otherwise(0L)).as("v3"))
        val nrow = toks
          .agg(sum(when($"doc_id" < cuts(0), 1L).otherwise(0L)).as("n0"),
            sum(when($"doc_id" < cuts(1), 1L).otherwise(0L)).as("n1"),
            sum(when($"doc_id" < cuts(2), 1L).otherwise(0L)).as("n2"),
            sum(when($"doc_id" < cuts(3), 1L).otherwise(0L)).as("n3"))
        val both = vrow.crossJoin(broadcast(nrow))
        val xs = (0 to 3).map(i => log(col(s"n$i").cast("double")))
        val ys = (0 to 3).map(i => log(col(s"v$i").cast("double")))
        val sx = xs.reduce(_ + _); val sy = ys.reduce(_ + _)
        val sxx = xs.map(x => x * x).reduce(_ + _)
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.reduce(_ + _)
        val beta = (lit(4.0d) * sxy - sx * sy) / (lit(4.0d) * sxx - sx * sx)
        both.select($"n0", $"v0", $"n3".as("n_cut256"), $"v3".as("v_cut256"),
          round(beta, 6).as("beta"),
          round(exp(sy / 4.0d - beta * (sx / 4.0d)), 6).as("k_coef"))
          .withColumnRenamed("n0", "n_cut32").withColumnRenamed("v0", "v_cut32")
      },
      Some(s"""WITH tk0 AS (
              |  SELECT doc_id, ${Llm.duckToks("text")} AS tk FROM documents),
              |toks AS (
              |  SELECT doc_id,
              |    unnest(CASE WHEN len(tk) >= 3
              |      THEN list_transform(range(1, len(tk) - 1),
              |             i -> array_to_string(tk[i:i+2], ' '))
              |      ELSE [] END) AS w
              |  FROM tk0),
              |vrow AS (
              |  SELECT
              |    SUM(CASE WHEN fd < 32 THEN 1 ELSE 0 END) AS v0,
              |    SUM(CASE WHEN fd < 64 THEN 1 ELSE 0 END) AS v1,
              |    SUM(CASE WHEN fd < 128 THEN 1 ELSE 0 END) AS v2,
              |    SUM(CASE WHEN fd < 256 THEN 1 ELSE 0 END) AS v3
              |  FROM (SELECT w, MIN(doc_id) AS fd FROM toks GROUP BY w)),
              |nrow AS (
              |  SELECT
              |    SUM(CASE WHEN doc_id < 32 THEN 1 ELSE 0 END) AS n0,
              |    SUM(CASE WHEN doc_id < 64 THEN 1 ELSE 0 END) AS n1,
              |    SUM(CASE WHEN doc_id < 128 THEN 1 ELSE 0 END) AS n2,
              |    SUM(CASE WHEN doc_id < 256 THEN 1 ELSE 0 END) AS n3
              |  FROM toks),
              |b AS (SELECT * FROM vrow CROSS JOIN nrow),
              |f AS (
              |  SELECT CAST(n0 AS BIGINT) AS n_cut32, CAST(v0 AS BIGINT) AS v_cut32,
              |    CAST(n3 AS BIGINT) AS n_cut256, CAST(v3 AS BIGINT) AS v_cut256,
              |    ln(CAST(n0 AS DOUBLE)) + ln(CAST(n1 AS DOUBLE)) +
              |      ln(CAST(n2 AS DOUBLE)) + ln(CAST(n3 AS DOUBLE)) AS sx,
              |    ln(CAST(v0 AS DOUBLE)) + ln(CAST(v1 AS DOUBLE)) +
              |      ln(CAST(v2 AS DOUBLE)) + ln(CAST(v3 AS DOUBLE)) AS sy,
              |    ln(CAST(n0 AS DOUBLE))*ln(CAST(n0 AS DOUBLE)) +
              |      ln(CAST(n1 AS DOUBLE))*ln(CAST(n1 AS DOUBLE)) +
              |      ln(CAST(n2 AS DOUBLE))*ln(CAST(n2 AS DOUBLE)) +
              |      ln(CAST(n3 AS DOUBLE))*ln(CAST(n3 AS DOUBLE)) AS sxx,
              |    ln(CAST(n0 AS DOUBLE))*ln(CAST(v0 AS DOUBLE)) +
              |      ln(CAST(n1 AS DOUBLE))*ln(CAST(v1 AS DOUBLE)) +
              |      ln(CAST(n2 AS DOUBLE))*ln(CAST(v2 AS DOUBLE)) +
              |      ln(CAST(n3 AS DOUBLE))*ln(CAST(v3 AS DOUBLE)) AS sxy
              |  FROM b)
              |SELECT n_cut32, v_cut32, n_cut256, v_cut256,
              |  round((4.0*sxy - sx*sy) / (4.0*sxx - sx*sx), 6) AS beta,
              |  round(exp(sy/4.0 - ((4.0*sxy - sx*sy) / (4.0*sxx - sx*sx))
              |    * (sx/4.0)), 6) AS k_coef
              |FROM f""".stripMargin)),

    // Compression-redundancy proxy per source: token-bigram distinct ratio
    // and entropy rate — the cheap stand-in for "would gzip shrink this?"
    // that production quality filters use to drop templated/boilerplate
    // text. repeat_mass = 1 − distinct/total bigram occurrences; the
    // entropy-rate redundancy 1 − H/log2(D) is the normalized distance from
    // a uniform bigram distribution. One bigram shuffle (per-doc lead
    // window, doc-partitioned), one source rollup; Σ c·log2(c) goes through
    // decimal so partitioning can't reorder the double sum.
    Q("text_compression_proxy",
      (s, dir) => {
        import s.implicits._
        val bg = t(s, dir, "documents")
          .select($"source", $"doc_id",
            posexplode(TF.tokens($"text")).as(Seq("pos", "w")))
          .withColumn("w2",
            lead($"w", 1).over(Window.partitionBy($"doc_id").orderBy($"pos")))
          .filter($"w2".isNotNull)
          .groupBy($"source", $"w", $"w2").agg(count(lit(1)).as("c"))
        bg.groupBy($"source")
          .agg(sum($"c").cast("long").as("n_bigrams"),
            count(lit(1)).as("distinct_bigrams"),
            dsum($"c".cast("double") * log(2.0, $"c".cast("double")), 6)
              .as("clog"))
          .select($"source", $"n_bigrams", $"distinct_bigrams",
            round(lit(1.0d) - $"distinct_bigrams".cast("double") /
              $"n_bigrams".cast("double"), 6).as("repeat_mass"),
            round(log(2.0, $"n_bigrams".cast("double")) -
              $"clog" / $"n_bigrams".cast("double"), 6).as("entropy_bits"),
            round(lit(1.0d) -
              (log(2.0, $"n_bigrams".cast("double")) -
                $"clog" / $"n_bigrams".cast("double")) /
              log(2.0, $"distinct_bigrams".cast("double")), 6)
              .as("redundancy"))
          .orderBy($"source")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, doc_id, unnest(${Llm.duckToks("text")}) AS w,
              |    generate_subscripts(${Llm.duckToks("text")}, 1) AS pos
              |  FROM documents),
              |bg0 AS (
              |  SELECT source, w, lead(w) OVER (PARTITION BY doc_id
              |    ORDER BY pos) AS w2
              |  FROM toks),
              |bg AS (
              |  SELECT source, w, w2, COUNT(*) AS c FROM bg0
              |  WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
              |g AS (
              |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_bigrams,
              |    COUNT(*) AS distinct_bigrams,
              |    ${sqlDsum("CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))", 6)}
              |      AS clog
              |  FROM bg GROUP BY source)
              |SELECT source, n_bigrams, distinct_bigrams,
              |  round(1.0 - CAST(distinct_bigrams AS DOUBLE) /
              |    CAST(n_bigrams AS DOUBLE), 6) AS repeat_mass,
              |  round(log2(CAST(n_bigrams AS DOUBLE)) -
              |    clog / CAST(n_bigrams AS DOUBLE), 6) AS entropy_bits,
              |  round(1.0 - (log2(CAST(n_bigrams AS DOUBLE)) -
              |      clog / CAST(n_bigrams AS DOUBLE)) /
              |    log2(CAST(distinct_bigrams AS DOUBLE)), 6) AS redundancy
              |FROM g ORDER BY source""".stripMargin)),

    // MATTR lexical diversity (moving-average type-token ratio, the
    // length-robust replacement for raw TTR): tokens chunked into fixed
    // 50-token windows per document (stride = width, so chunks are disjoint
    // group-bys, not sliding windows), TTR = distinct/50 per full chunk,
    // averaged per source with an exact decimal mean. Short/templated text
    // scores low; the chunking makes the score comparable across document
    // lengths — the classic TTR-vs-length artifact this exists to remove.
    Q("text_mattr",
      (s, dir) => {
        import s.implicits._
        val chunks = t(s, dir, "documents")
          .select($"source", $"doc_id",
            posexplode(TF.tokens($"text")).as(Seq("pos", "w")))
          .groupBy($"source", $"doc_id", ($"pos" / 50).cast("long").as("chunk"))
          .agg(count(lit(1)).as("n"), countDistinct($"w").as("d"))
          .filter($"n" === 50)
        chunks.groupBy($"source")
          .agg(count(lit(1)).as("n_chunks"),
            round(davg($"d".cast("double") / 50.0d, 8), 6).as("mattr"),
            round(min($"d").cast("double") / 50.0d, 6).as("min_ttr"),
            round(max($"d").cast("double") / 50.0d, 6).as("max_ttr"))
          .orderBy($"source")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, doc_id, unnest(${Llm.duckToks("text")}) AS w,
              |    generate_subscripts(${Llm.duckToks("text")}, 1) - 1 AS pos
              |  FROM documents),
              |ch AS (
              |  SELECT source, doc_id, pos // 50 AS chunk,
              |    COUNT(*) AS n, COUNT(DISTINCT w) AS d
              |  FROM toks GROUP BY 1, 2, 3),
              |full_ch AS (SELECT * FROM ch WHERE n = 50)
              |SELECT source, COUNT(*) AS n_chunks,
              |  round(${sqlDavg("CAST(d AS DOUBLE) / 50.0", 8)}, 6) AS mattr,
              |  round(CAST(MIN(d) AS DOUBLE) / 50.0, 6) AS min_ttr,
              |  round(CAST(MAX(d) AS DOUBLE) / 50.0, 6) AS max_ttr
              |FROM full_ch GROUP BY source ORDER BY source""".stripMargin)),

    // Simpson concentration / inverse-Simpson diversity of the unigram
    // distribution per source: λ = Σ nᵢ(nᵢ−1) / (N(N−1)) — the probability
    // two random tokens coincide — computed entirely in exact integer
    // moments (token counts are integers; the squares fit LONG with orders
    // of magnitude to spare), one double division at the end. 1/λ is the
    // "effective vocabulary size" quality signal (low = repetitive corpus).
    Q("text_simpson_diversity",
      (s, dir) => {
        import s.implicits._
        val lam = $"pairsum".cast("double") /
          ($"n".cast("double") * ($"n" - 1).cast("double"))
        t(s, dir, "documents")
          .select($"source", explode(TF.tokens($"text")).as("w"))
          .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
          .groupBy($"source")
          .agg(sum($"c").cast("long").as("n"), count(lit(1)).as("vocab"),
            sum($"c" * ($"c" - 1)).cast("long").as("pairsum"))
          .select($"source", $"n".as("n_tokens"), $"vocab",
            round(lam, 8).as("simpson"),
            round(lit(1.0d) / lam, 4).as("inv_simpson"))
          .orderBy($"source")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, unnest(${Llm.duckToks("text")}) AS w
              |  FROM documents),
              |c AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
              |g AS (
              |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
              |    COUNT(*) AS vocab,
              |    CAST(SUM(c * (c - 1)) AS BIGINT) AS pairsum
              |  FROM c GROUP BY source)
              |SELECT source, n AS n_tokens, vocab,
              |  round(CAST(pairsum AS DOUBLE) /
              |    (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 8) AS simpson,
              |  round((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) /
              |    CAST(pairsum AS DOUBLE), 4) AS inv_simpson
              |FROM g ORDER BY source""".stripMargin)),

    // Theil's uncertainty coefficient U(event_type | weekday): the
    // entropy-based association measure (0 = weekday tells nothing about
    // type, 1 = fully determined) — unlike Cramér's V it is asymmetric and
    // reads as "% of type-entropy explained". Weekday is a pure integer
    // datediff % 7 (both engines' dayofweek() disagree on numbering, so
    // neither is used). One joint shuffle to the ≤7×|types| frame; the two
    // corpus scalars (N, H(type)) attach via sanctioned single-row crosses;
    // p·ln p sums are decimal-exact at scale 12.
    Q("stats_theil_u",
      (s, dir) => {
        import s.implicits._
        val joint = graft.Tables.events(s, dir)
          .select((datediff(to_date($"ts"), lit("2024-01-01").cast("date")) % 7)
            .as("dow"), $"event_type")
          .groupBy($"dow", $"event_type").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val nrow = joint.agg(sum($"c").cast("long").as("n"))
        val tmarg = joint.groupBy($"event_type").agg(sum($"c").cast("long").as("ct"))
        val htype = tmarg.crossJoin(broadcast(nrow))
          .agg(sum((($"ct".cast("double") / $"n".cast("double")) *
            log($"ct".cast("double") / $"n".cast("double")))
            .cast("decimal(30,12)")).cast("double").as("neg_h_type"))
        val dmarg = joint.groupBy($"dow").agg(sum($"c").cast("long").as("nd"))
        val hcond = joint.join(dmarg, "dow").crossJoin(broadcast(nrow))
          .agg(sum((($"c".cast("double") / $"n".cast("double")) *
            log($"c".cast("double") / $"nd".cast("double")))
            .cast("decimal(30,12)")).cast("double").as("neg_h_cond"))
        htype.crossJoin(broadcast(hcond)).crossJoin(broadcast(nrow))
          .select($"n".as("n_events"),
            round(-$"neg_h_type", 6).as("h_type"),
            round(-$"neg_h_cond", 6).as("h_cond"),
            round(($"neg_h_cond" - $"neg_h_type") / (-$"neg_h_type"), 6)
              .as("theil_u"))
      },
      Some("""WITH joint AS (
             |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
             |      AS dow, event_type, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |nrow AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM joint),
             |tmarg AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS ct
             |          FROM joint GROUP BY 1),
             |htype AS (
             |  SELECT CAST(SUM(CAST((CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) *
             |      ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             |      AS DECIMAL(30,12))) AS DOUBLE) AS neg_h_type
             |  FROM tmarg CROSS JOIN nrow),
             |dmarg AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS nd
             |          FROM joint GROUP BY 1),
             |hcond AS (
             |  SELECT CAST(SUM(CAST((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
             |      ln(CAST(c AS DOUBLE) / CAST(nd AS DOUBLE))
             |      AS DECIMAL(30,12))) AS DOUBLE) AS neg_h_cond
             |  FROM joint JOIN dmarg USING (dow) CROSS JOIN nrow)
             |SELECT n AS n_events,
             |  round(-neg_h_type, 6) AS h_type,
             |  round(-neg_h_cond, 6) AS h_cond,
             |  round((neg_h_cond - neg_h_type) / (-neg_h_type), 6) AS theil_u
             |FROM htype CROSS JOIN hcond CROSS JOIN nrow""".stripMargin)),

    // Exact paired sign test (week 1 vs week 2 daily activity per event
    // type) with Benjamini-Hochberg FDR correction across the type family —
    // the multiple-testing discipline every metrics platform needs before
    // declaring "type X grew". The p-value is the EXACT binomial tail
    // Σ_{j≥k} C(n,j) / 2^n with n ≤ 7 — emitted as an identical integer
    // CASE lattice on both engines, so p is IEEE-exact (power-of-two
    // denominator), never an erf approximation. BH runs as a rank window
    // over the limit-bounded type frame; step-up cutoff via a frame max.
    Q("stats_sign_test_bh",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .select($"event_type",
            datediff(to_date($"ts"), lit("2024-01-01").cast("date")).as("d"))
          .filter($"d" >= 0 && $"d" < 14)
          .groupBy($"event_type", $"d").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val w1 = daily.filter($"d" < 7).select($"event_type", $"d", $"c".as("c1"))
        val w2 = daily.filter($"d" >= 7)
          .select($"event_type", ($"d" - 7).as("d"), $"c".as("c2"))
        val tests = w1.join(w2, Seq("event_type", "d"))
          .filter($"c1" =!= $"c2")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when($"c2" > $"c1", 1L).otherwise(0L)).as("k_greater"))
          .withColumn("p_value",
            expr(binomTailCase).cast("double") / pow(lit(2.0d), $"n_pairs"))
          .orderBy($"event_type").limit(50)
        val ranked = tests
          .withColumn("rk", row_number().over(Window.orderBy($"p_value", $"event_type")))
          .withColumn("m", count(lit(1)).over(Window.partitionBy()))
          .withColumn("bh_threshold",
            round(lit(0.10d) * $"rk".cast("double") / $"m".cast("double"), 6))
          .withColumn("cutoff", max(when($"p_value" <= $"bh_threshold", $"rk")
            .otherwise(0)).over(Window.partitionBy()))
        ranked.select($"event_type", $"n_pairs", $"k_greater",
          round($"p_value", 6).as("p_value"), $"rk".cast("long").as("bh_rank"),
          $"bh_threshold", ($"rk" <= $"cutoff").as("rejected"))
          .orderBy($"event_type")
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type,
              |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
              |    COUNT(*) AS c
              |  FROM events
              |  WHERE datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
              |    BETWEEN 0 AND 13
              |  GROUP BY 1, 2),
              |pairs AS (
              |  SELECT w1.event_type, w1.c AS c1, w2.c AS c2
              |  FROM (SELECT * FROM daily WHERE d < 7) w1
              |  JOIN (SELECT event_type, d - 7 AS d, c FROM daily
              |        WHERE d >= 7) w2
              |    ON w1.event_type = w2.event_type AND w1.d = w2.d
              |  WHERE w1.c <> w2.c),
              |tests AS (
              |  SELECT event_type, COUNT(*) AS n_pairs,
              |    CAST(SUM(CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS k_greater
              |  FROM pairs GROUP BY event_type),
              |pv AS (
              |  SELECT event_type, n_pairs, k_greater,
              |    CAST($binomTailCase AS DOUBLE) / pow(2.0, n_pairs) AS p_value
              |  FROM tests),
              |ranked AS (
              |  SELECT *, row_number() OVER (ORDER BY p_value, event_type) AS rk,
              |    COUNT(*) OVER () AS m
              |  FROM pv),
              |thr AS (
              |  SELECT *, round(0.10 * CAST(rk AS DOUBLE) /
              |      CAST(m AS DOUBLE), 6) AS bh_threshold
              |  FROM ranked),
              |cut AS (
              |  SELECT *, MAX(CASE WHEN p_value <= bh_threshold THEN rk
              |    ELSE 0 END) OVER () AS cutoff
              |  FROM thr)
              |SELECT event_type, n_pairs, k_greater,
              |  round(p_value, 6) AS p_value, CAST(rk AS BIGINT) AS bh_rank,
              |  bh_threshold, rk <= cutoff AS rejected
              |FROM cut ORDER BY event_type""".stripMargin)),

    // Fano factor (variance-to-mean dispersion) of the daily event-count
    // series per type: the standard over/under-dispersion probe vs the
    // Poisson null (Fano ≈ 1). Counts are integers, so Σc and Σc² are EXACT
    // long moments — the variance is two integer sums and three double ops,
    // bit-identical on both engines. One shuffle to the day×type rollup,
    // one to the per-type frame.
    Q("events_fano_factor",
      (s, dir) => {
        import s.implicits._
        val nD = $"n_days".cast("double")
        val mean = $"sc".cast("double") / nD
        val varp = ($"scc".cast("double") -
          $"sc".cast("double") * $"sc".cast("double") / nD) / nD
        graft.Tables.events(s, dir)
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_days"), sum($"c").cast("long").as("sc"),
            sum($"c" * $"c").cast("long").as("scc"))
          .select($"event_type", $"n_days",
            round(mean, 6).as("mean_daily"),
            round(varp, 6).as("var_daily"),
            round(varp / mean, 6).as("fano"),
            (varp > mean).as("overdispersed"))
          .orderBy($"event_type")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
             |  FROM events GROUP BY 1, 2),
             |g AS (
             |  SELECT event_type, COUNT(*) AS n_days,
             |    CAST(SUM(c) AS BIGINT) AS sc,
             |    CAST(SUM(c * c) AS BIGINT) AS scc
             |  FROM daily GROUP BY event_type)
             |SELECT event_type, n_days,
             |  round(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
             |    AS mean_daily,
             |  round((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) *
             |      CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)) /
             |    CAST(n_days AS DOUBLE), 6) AS var_daily,
             |  round(((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) *
             |      CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)) /
             |    CAST(n_days AS DOUBLE)) /
             |    (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)), 6) AS fano,
             |  ((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) *
             |      CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)) /
             |    CAST(n_days AS DOUBLE)) >
             |    (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
             |    AS overdispersed
             |FROM g ORDER BY event_type""".stripMargin)),

    // Dictionary-encoding storage audit for low-cardinality string columns
    // (the parquet/ORC encoding every warehouse leans on): per column,
    // plain vs dictionary-encoded byte estimates from the value-frequency
    // rollup alone — dict bytes = Σ len(distinct) + 4B/entry, code width =
    // bit-length of (cardinality−1) via bin(), encoded = ⌈n·bits/8⌉ + dict.
    // Pure integer arithmetic end-to-end; three audited columns union to a
    // 3-row report. The per-column rollup is ONE map-side-combined shuffle
    // on the value — the same pass a real encoder makes.
    Q("scale_dict_encoding_audit",
      (s, dir) => {
        import s.implicits._
        def audit(df: org.apache.spark.sql.DataFrame, c: String,
            label: String) = df
          .groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          .agg(sum($"cnt").cast("long").as("n_rows"),
            count(lit(1)).as("n_distinct"),
            sum(length($"v").cast("long") * $"cnt").cast("long")
              .as("plain_bytes"),
            (sum(length($"v").cast("long")).cast("long") +
              lit(4L) * count(lit(1))).as("dict_bytes"))
          .select(lit(label).as("column_name"), $"n_rows", $"n_distinct",
            $"plain_bytes", $"dict_bytes",
            length(bin($"n_distinct" - 1)).cast("long").as("code_bits"))
        val rows = audit(graft.Tables.events(s, dir), "event_type",
            "events.event_type")
          .unionAll(audit(t(s, dir, "orders"), "o_orderpriority",
            "orders.o_orderpriority"))
          .unionAll(audit(t(s, dir, "part"), "p_brand", "part.p_brand"))
        rows.select($"column_name", $"n_rows", $"n_distinct", $"plain_bytes",
          $"dict_bytes", $"code_bits",
          // `div` not `/`: Spark's `/` on integer columns yields DOUBLE
          expr("(n_rows * code_bits + 7) div 8 + dict_bytes").cast("long")
            .as("encoded_bytes"))
          .withColumn("compression_ratio",
            round($"encoded_bytes".cast("double") /
              $"plain_bytes".cast("double"), 6))
          .orderBy($"column_name")
      },
      Some("""WITH a AS (
             |  SELECT 'events.event_type' AS column_name, event_type AS v
             |  FROM events
             |  UNION ALL
             |  SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
             |  UNION ALL
             |  SELECT 'part.p_brand', p_brand FROM part),
             |c AS (SELECT column_name, v, COUNT(*) AS cnt
             |      FROM a GROUP BY 1, 2),
             |g AS (
             |  SELECT column_name, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             |    COUNT(*) AS n_distinct,
             |    CAST(SUM(length(v) * cnt) AS BIGINT) AS plain_bytes,
             |    CAST(SUM(length(v)) + 4 * COUNT(*) AS BIGINT) AS dict_bytes,
             |    CAST(length(bin(COUNT(*) - 1)) AS BIGINT) AS code_bits
             |  FROM c GROUP BY column_name)
             |SELECT column_name, n_rows, n_distinct, plain_bytes, dict_bytes,
             |  code_bits,
             |  CAST((n_rows * code_bits + 7) // 8 + dict_bytes AS BIGINT)
             |    AS encoded_bytes,
             |  round(CAST((n_rows * code_bits + 7) // 8 + dict_bytes
             |      AS DOUBLE) / CAST(plain_bytes AS DOUBLE), 6)
             |    AS compression_ratio
             |FROM g ORDER BY column_name""".stripMargin)),

    // Gamma-0.5 brightening codec stage through the real BMP decode: the
    // exposure-correction LUT o = ⌊√(lv·255)⌋ — integer square root, NOT a
    // pow(1/γ) whose final ulp differs across libm builds — applied per
    // pixel; output hashes distinct levels, range, and the (x+2y)-weighted
    // checksum. The oracle rebuilds the LUT from the closed-form pixel
    // formula with no decoder, so a decode or LUT bug is a hash mismatch.
    Q("multimodal_image_gamma_lut",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.gammaStats(s,
            Multimodal.syntheticImages(s,
              t(s, dir, "documents").filter($"doc_id" < 60)))
          .toDF()
          .orderBy($"doc_id")
      },
      Some {
        val gray =
          """((doc_id*31 + x*7 + y*13) % 256
            | + (doc_id*31 + x*7 + y*13 + 101) % 256
            | + (doc_id*31 + x*7 + y*13 + 202) % 256)""".stripMargin
            .replaceAll("\\s+", " ")
        s"""WITH dims AS (
           |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
           |  FROM documents WHERE doc_id < 60),
           |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
           |xy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
           |px AS (SELECT doc_id, x, y,
           |         CAST(floor(sqrt((($gray) // 3) * 255.0)) AS INTEGER) AS o
           |       FROM xy)
           |SELECT doc_id, COUNT(*) AS n_pix,
           |  COUNT(DISTINCT o) AS n_levels_out,
           |  CAST(MIN(o) AS INTEGER) AS min_out,
           |  CAST(MAX(o) AS INTEGER) AS max_out,
           |  CAST(SUM((x + 2*y) * o) AS BIGINT) AS wsum_out
           |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Clipping audit through the real WAV/RIFF decode: count samples at or
    // beyond |s| ≥ 1000, the longest CONSECUTIVE clipped run (the audible
    // artifact — isolated peaks are benign, runs are not) and the first
    // clipped index, all in one decode pass. The oracle finds the same runs
    // with gaps-and-islands SQL over the closed-form sample formula —
    // docs that never clip still report (0, 0, −1).
    Q("multimodal_wav_clipping",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.clipStats(s,
            Multimodal.syntheticAudio(s,
              t(s, dir, "documents").filter($"doc_id" < 100)), 1000)
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n
             |  FROM documents WHERE doc_id < 100),
             |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
             |v AS (SELECT doc_id, i,
             |        (doc_id*37 + i*13) % 2048 - 1024 AS s
             |      FROM sm),
             |c AS (
             |  SELECT doc_id, i,
             |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
             |      AS island
             |  FROM v WHERE abs(s) >= 1000),
             |runs AS (
             |  SELECT doc_id, island, COUNT(*) AS len, MIN(i) AS start_i
             |  FROM c GROUP BY 1, 2),
             |agg AS (
             |  SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_clipped,
             |    CAST(MAX(len) AS BIGINT) AS max_clip_run,
             |    CAST(MIN(start_i) AS BIGINT) AS first_clip_idx
             |  FROM runs GROUP BY doc_id)
             |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_samples,
             |  coalesce(a.n_clipped, 0) AS n_clipped,
             |  coalesce(a.max_clip_run, 0) AS max_clip_run,
             |  coalesce(a.first_clip_idx, -1) AS first_clip_idx
             |FROM dims d LEFT JOIN agg a ON a.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Entity-resolution blocking audit: before any pairwise near-dup or ER
    // comparison runs, the blocking key decides the candidate-pair bill —
    // Σ b(b−1)/2 over block sizes vs the n(n−1)/2 all-pairs worst case.
    // Three real strategies over documents (text 8-char prefix, length
    // bucket, first-token initial+length) audited side by side: block
    // count, biggest block, candidate pairs, and the reduction ratio. Pure
    // integer arithmetic; one value-rollup shuffle per strategy (n comes
    // from the same rollup — no corpus-scalar cross at all).
    Q("dedup_blocking_audit",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"text")
          .localCheckpoint()
        def audit(keyed: org.apache.spark.sql.DataFrame, label: String) = keyed
          .groupBy($"k").agg(count(lit(1)).as("b"))
          .agg(sum($"b").cast("long").as("n_docs"),
            count(lit(1)).as("n_blocks"), max($"b").cast("long").as("max_block"),
            sum($"b" * ($"b" - 1)).cast("long").as("pairs2"))
          .select(lit(label).as("strategy"), $"n_docs", $"n_blocks",
            $"max_block", expr("pairs2 div 2").as("candidate_pairs"),
            round($"pairs2".cast("double") /
              ($"n_docs".cast("double") * ($"n_docs" - 1).cast("double")), 8)
              .as("reduction_ratio"))
        val byPrefix = audit(docs.select(substring($"text", 1, 8).as("k")),
          "text_prefix8")
        val byLen = audit(docs.select((length($"text") / 64).cast("long")
          .as("k")), "len_bucket64")
        val byInitial = audit(docs.select(
          concat(substring($"text", 1, 1),
            (length($"text") / 128).cast("long").cast("string")).as("k")),
          "initial_plus_lenbucket")
        byPrefix.unionAll(byLen).unionAll(byInitial).orderBy($"strategy")
      },
      Some("""WITH keyed AS (
             |  SELECT 'text_prefix8' AS strategy, substring(text, 1, 8) AS k
             |  FROM documents
             |  UNION ALL
             |  SELECT 'len_bucket64', CAST(length(text) // 64 AS VARCHAR)
             |  FROM documents
             |  UNION ALL
             |  SELECT 'initial_plus_lenbucket',
             |    substring(text, 1, 1) || CAST(length(text) // 128 AS VARCHAR)
             |  FROM documents),
             |b AS (SELECT strategy, k, COUNT(*) AS b FROM keyed GROUP BY 1, 2),
             |g AS (
             |  SELECT strategy, CAST(SUM(b) AS BIGINT) AS n_docs,
             |    COUNT(*) AS n_blocks, CAST(MAX(b) AS BIGINT) AS max_block,
             |    CAST(SUM(b * (b - 1)) AS BIGINT) AS pairs2
             |  FROM b GROUP BY strategy)
             |SELECT strategy, n_docs, n_blocks, max_block,
             |  CAST(pairs2 // 2 AS BIGINT) AS candidate_pairs,
             |  round(CAST(pairs2 AS DOUBLE) /
             |    (CAST(n_docs AS DOUBLE) * CAST(n_docs - 1 AS DOUBLE)), 8)
             |    AS reduction_ratio
             |FROM g ORDER BY strategy""".stripMargin)),

    // Rich-club coefficient φ(k) of the one-week nation trade graph: among
    // nodes of degree > k, the density of induced edges vs the complete
    // graph on them — "do the hubs trade preferentially with each other?".
    // Degrees and the induced-edge counts come from two equi-joins of the
    // undirected edge list to its endpoint degrees; the three k thresholds
    // are conditional sums in ONE row, stacked to the 3-row report (a
    // projection, not a join), with the node-side counts attached by a
    // sanctioned single-row cross.
    Q("graph_rich_club",
      (s, dir) => {
        import s.implicits._
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
          .select(least($"c_nationkey", $"s_nationkey").as("u"),
            greatest($"c_nationkey", $"s_nationkey").as("v"))
          .filter($"u" =!= $"v")
          .distinct()
          .localCheckpoint()
        val deg = e.select($"u".as("node")).unionAll(e.select($"v".as("node")))
          .groupBy($"node").agg(count(lit(1)).as("deg"))
        val ks = Seq(2, 4, 6)
        val nCols = ks.map(k =>
          sum(when($"deg" > k, 1L).otherwise(0L)).as(s"n$k"))
        val nodeRow = deg.agg(nCols.head, nCols.tail: _*)
        val withDeg = e
          .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
          .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
        val mCols = ks.map(k =>
          sum(when($"du" > k && $"dv" > k, 1L).otherwise(0L)).as(s"m$k"))
        val edgeRow = withDeg.agg(mCols.head, mCols.tail: _*)
        nodeRow.crossJoin(broadcast(edgeRow))
          .select(expr(ks.map(k =>
            s"$k, n$k, m$k").mkString("stack(3, ", ", ", ")"))
            .as(Seq("k", "n_rich", "m_within")))
          .select($"k", $"n_rich", $"m_within",
            // guard n_rich <= 1: the complete-graph denominator is 0 and
            // IEEE inf/NaN round-trips differently across engines
            when($"n_rich" > 1,
              round($"m_within".cast("double") * 2.0d /
                ($"n_rich".cast("double") * ($"n_rich" - 1).cast("double")), 6))
              .as("phi"))
          .orderBy($"k")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT least(c_nationkey, s_nationkey) AS u,
             |    greatest(c_nationkey, s_nationkey) AS v
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |    AND l_shipdate >= TIMESTAMP '1997-03-01'
             |    AND l_shipdate <  TIMESTAMP '1997-03-08'),
             |deg AS (
             |  SELECT node, COUNT(*) AS deg FROM (
             |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
             |  GROUP BY node),
             |nrow AS (
             |  SELECT SUM(CASE WHEN deg > 2 THEN 1 ELSE 0 END) AS n2,
             |    SUM(CASE WHEN deg > 4 THEN 1 ELSE 0 END) AS n4,
             |    SUM(CASE WHEN deg > 6 THEN 1 ELSE 0 END) AS n6
             |  FROM deg),
             |wd AS (
             |  SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
             |  FROM e JOIN deg du ON du.node = e.u
             |         JOIN deg dv ON dv.node = e.v),
             |mrow AS (
             |  SELECT
             |    SUM(CASE WHEN du > 2 AND dv > 2 THEN 1 ELSE 0 END) AS m2,
             |    SUM(CASE WHEN du > 4 AND dv > 4 THEN 1 ELSE 0 END) AS m4,
             |    SUM(CASE WHEN du > 6 AND dv > 6 THEN 1 ELSE 0 END) AS m6
             |  FROM wd),
             |stacked AS (
             |  SELECT 2 AS k, CAST(n2 AS BIGINT) AS n_rich,
             |    CAST(m2 AS BIGINT) AS m_within FROM nrow CROSS JOIN mrow
             |  UNION ALL
             |  SELECT 4, CAST(n4 AS BIGINT), CAST(m4 AS BIGINT)
             |  FROM nrow CROSS JOIN mrow
             |  UNION ALL
             |  SELECT 6, CAST(n6 AS BIGINT), CAST(m6 AS BIGINT)
             |  FROM nrow CROSS JOIN mrow)
             |SELECT k, n_rich, m_within,
             |  CASE WHEN n_rich > 1 THEN
             |    round(CAST(m_within AS DOUBLE) * 2.0 /
             |      (CAST(n_rich AS DOUBLE) * CAST(n_rich - 1 AS DOUBLE)), 6)
             |  END AS phi
             |FROM stacked ORDER BY k""".stripMargin)),

    // Granger-style lag-1 predictive test between the daily click and
    // purchase count series, BOTH directions: unrestricted OLS
    // y_t = a + b·y_{t−1} + c·x_{t−1} vs restricted (own lag only), F on
    // the RSS drop. Every moment is a sum of products of small INTEGER
    // daily counts — exact longs — so the closed-form 2×2 normal-equation
    // solve and F ratio are identical IEEE trees on both engines. The
    // series frame is ≤|days| after one conditional-count shuffle; lags are
    // equi self-joins on day arithmetic, never windows.
    Q("stats_granger_lag1",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            .as("d"))
          .agg(sum(when($"event_type" === "click", 1L).otherwise(0L)).as("ck"),
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("pu"))
          .localCheckpoint()
        val lagged = daily.as("t")
          .join(daily.select(($"d" + 1).as("d"), $"ck".as("ck1"),
            $"pu".as("pu1")), "d")
        def direction(label: String, y: String, z1: String, z2: String) = {
          val m = lagged.agg(count(lit(1)).as("n"),
            sum(col(y)).cast("long").as("sy"),
            sum(col(z1)).cast("long").as("s1"),
            sum(col(z2)).cast("long").as("s2"),
            sum(col(y) * col(y)).cast("long").as("syy"),
            sum(col(z1) * col(z1)).cast("long").as("s11"),
            sum(col(z2) * col(z2)).cast("long").as("s22"),
            sum(col(y) * col(z1)).cast("long").as("sy1"),
            sum(col(y) * col(z2)).cast("long").as("sy2"),
            sum(col(z1) * col(z2)).cast("long").as("s12"))
          val nD = $"n".cast("double")
          val c11 = $"s11".cast("double") - $"s1".cast("double") * $"s1".cast("double") / nD
          val c22 = $"s22".cast("double") - $"s2".cast("double") * $"s2".cast("double") / nD
          val c12 = $"s12".cast("double") - $"s1".cast("double") * $"s2".cast("double") / nD
          val c1y = $"sy1".cast("double") - $"s1".cast("double") * $"sy".cast("double") / nD
          val c2y = $"sy2".cast("double") - $"s2".cast("double") * $"sy".cast("double") / nD
          val cyy = $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double") / nD
          val det = c11 * c22 - c12 * c12
          val b1 = (c22 * c1y - c12 * c2y) / det
          val b2 = (c11 * c2y - c12 * c1y) / det
          val rssU = cyy - b1 * c1y - b2 * c2y
          val rssR = cyy - (c1y / c11) * c1y
          m.select(lit(label).as("direction"), $"n",
            round(b1, 6).as("own_lag_coef"),
            round(b2, 6).as("cross_lag_coef"),
            round(rssR, 4).as("rss_restricted"),
            round(rssU, 4).as("rss_unrestricted"),
            round((rssR - rssU) / (rssU / (nD - 3.0d)), 6).as("f_stat"))
        }
        direction("click_causes_purchase", "pu", "pu1", "ck1")
          .unionAll(direction("purchase_causes_click", "ck", "ck1", "pu1"))
          .orderBy($"direction")
      },
      Some {
        def dirSql(label: String, y: String, z1: String, z2: String) =
          s"""SELECT '$label' AS direction, n,
             |  round((c22*c1y - c12*c2y) / (c11*c22 - c12*c12), 6)
             |    AS own_lag_coef,
             |  round((c11*c2y - c12*c1y) / (c11*c22 - c12*c12), 6)
             |    AS cross_lag_coef,
             |  round(cyy - (c1y/c11)*c1y, 4) AS rss_restricted,
             |  round(cyy - ((c22*c1y - c12*c2y)/(c11*c22 - c12*c12))*c1y
             |    - ((c11*c2y - c12*c1y)/(c11*c22 - c12*c12))*c2y, 4)
             |    AS rss_unrestricted,
             |  round(((cyy - (c1y/c11)*c1y) -
             |      (cyy - ((c22*c1y - c12*c2y)/(c11*c22 - c12*c12))*c1y
             |         - ((c11*c2y - c12*c1y)/(c11*c22 - c12*c12))*c2y)) /
             |    ((cyy - ((c22*c1y - c12*c2y)/(c11*c22 - c12*c12))*c1y
             |         - ((c11*c2y - c12*c1y)/(c11*c22 - c12*c12))*c2y) /
             |     (CAST(n AS DOUBLE) - 3.0)), 6) AS f_stat
             |FROM (
             |  SELECT n,
             |    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n AS c11,
             |    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/n AS c22,
             |    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s2 AS DOUBLE)/n AS c12,
             |    CAST(sy1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(sy AS DOUBLE)/n AS c1y,
             |    CAST(sy2 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(sy AS DOUBLE)/n AS c2y,
             |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n AS cyy
             |  FROM (
             |    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             |      CAST(SUM($y) AS BIGINT) AS sy, CAST(SUM($z1) AS BIGINT) AS s1,
             |      CAST(SUM($z2) AS BIGINT) AS s2,
             |      CAST(SUM($y*$y) AS BIGINT) AS syy,
             |      CAST(SUM($z1*$z1) AS BIGINT) AS s11,
             |      CAST(SUM($z2*$z2) AS BIGINT) AS s22,
             |      CAST(SUM($y*$z1) AS BIGINT) AS sy1,
             |      CAST(SUM($y*$z2) AS BIGINT) AS sy2,
             |      CAST(SUM($z1*$z2) AS BIGINT) AS s12
             |    FROM lagged))""".stripMargin
        s"""WITH daily AS (
           |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
           |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ck,
           |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pu
           |  FROM events GROUP BY 1),
           |lagged AS (
           |  SELECT t.d, t.ck, t.pu, p.ck AS ck1, p.pu AS pu1
           |  FROM daily t JOIN daily p ON p.d + 1 = t.d),
           |a AS (${dirSql("click_causes_purchase", "pu", "pu1", "ck1")}),
           |b AS (${dirSql("purchase_causes_click", "ck", "ck1", "pu1")})
           |SELECT CAST(n AS BIGINT) AS n, direction, own_lag_coef, cross_lag_coef,
           |  rss_restricted, rss_unrestricted, f_stat
           |FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
           |ORDER BY direction""".stripMargin
      }),

    // Partition-layout planner audit: per ship month, row count, a
    // fixed-row-width byte estimate, the 128 MB-target file count
    // (⌈bytes/target⌉ in pure integer math), the month's share of the
    // table, and its skew vs the mean month — the planning table behind
    // "how many output files should this dynamic-partition write produce".
    // One month rollup; the mean attaches via a sanctioned single-row cross.
    Q("scale_partition_plan_audit",
      (s, dir) => {
        import s.implicits._
        val rowBytes = 120L
        val target = 134217728L
        val m = t(s, dir, "lineitem")
          .groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_rows"))
          .localCheckpoint()
        val tot = m.agg(sum($"n_rows").cast("long").as("t_rows"),
          count(lit(1)).as("n_months"))
        m.crossJoin(broadcast(tot))
          .select($"month", $"n_rows",
            ($"n_rows" * rowBytes).as("est_bytes"),
            expr(s"(n_rows * $rowBytes + $target - 1) div $target")
              .as("n_files"),
            round($"n_rows".cast("double") / $"t_rows".cast("double"), 6)
              .as("share"),
            round($"n_rows".cast("double") /
              ($"t_rows".cast("double") / $"n_months".cast("double")), 6)
              .as("skew_vs_mean"))
          .orderBy($"month")
      },
      Some("""WITH m AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
             |    COUNT(*) AS n_rows
             |  FROM lineitem GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t_rows,
             |               COUNT(*) AS n_months FROM m)
             |SELECT month, n_rows, CAST(n_rows * 120 AS BIGINT) AS est_bytes,
             |  CAST((n_rows * 120 + 134217727) // 134217728 AS BIGINT)
             |    AS n_files,
             |  round(CAST(n_rows AS DOUBLE) / CAST(t_rows AS DOUBLE), 6)
             |    AS share,
             |  round(CAST(n_rows AS DOUBLE) /
             |    (CAST(t_rows AS DOUBLE) / CAST(n_months AS DOUBLE)), 6)
             |    AS skew_vs_mean
             |FROM m CROSS JOIN tot ORDER BY month""".stripMargin)),

    // Deterministic k-fold split audit (md5(doc_id) % 5 — the same
    // hash-deterministic assignment the sampling family uses, no RNG
    // state): per (fold, lang) document counts plus each fold's total and
    // the within-fold language share — the stratification-balance check run
    // before any train/val split is trusted. Fold totals attach by an
    // equi-join on fold, not a cross.
    Q("sample_kfold_assign",
      (s, dir) => {
        import s.implicits._
        val folded = t(s, dir, "documents")
          .select((conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10)
            .cast("long") % 5).as("fold"), $"lang")
          .groupBy($"fold", $"lang").agg(count(lit(1)).as("n_docs"))
        val totals = folded.groupBy($"fold")
          .agg(sum($"n_docs").cast("long").as("fold_total"))
        folded.join(totals, "fold")
          .select($"fold", $"lang", $"n_docs", $"fold_total",
            round($"n_docs".cast("double") / $"fold_total".cast("double"), 6)
              .as("share"))
          .orderBy($"fold", $"lang")
      },
      Some(s"""WITH folded AS (
              |  SELECT ${sqlHexInt("md5(CAST(doc_id AS VARCHAR))", 1, 6)} % 5
              |      AS fold, lang, COUNT(*) AS n_docs
              |  FROM documents GROUP BY 1, 2),
              |tot AS (SELECT fold, CAST(SUM(n_docs) AS BIGINT) AS fold_total
              |        FROM folded GROUP BY fold)
              |SELECT fold, lang, n_docs, fold_total,
              |  round(CAST(n_docs AS DOUBLE) / CAST(fold_total AS DOUBLE), 6)
              |    AS share
              |FROM folded JOIN tot USING (fold)
              |ORDER BY fold, lang""".stripMargin)),

    // 4×4 tile texture map through the real BMP decode: per tile, the
    // distinct-grayscale-level count (integer texture witness: flat tile =
    // 1 level), level sum and extrema; ragged edge tiles keep their true
    // pixel count. The oracle rebuilds every tile from the closed-form
    // pixel formula — a tiling or decode bug shifts some tile's sum and
    // breaks the hash. Bounded (≤ tiles/doc) output rows.
    Q("multimodal_image_tile_stats",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.tileStats(s,
            Multimodal.syntheticImages(s,
              t(s, dir, "documents").filter($"doc_id" < 40)))
          .toDF()
          .orderBy($"doc_id", $"ty", $"tx")
      },
      Some {
        val gray =
          """((doc_id*31 + x*7 + y*13) % 256
            | + (doc_id*31 + x*7 + y*13 + 101) % 256
            | + (doc_id*31 + x*7 + y*13 + 202) % 256)""".stripMargin
            .replaceAll("\\s+", " ")
        s"""WITH dims AS (
           |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
           |  FROM documents WHERE doc_id < 40),
           |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
           |xy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
           |px AS (SELECT doc_id, x, y, y // 4 AS ty, x // 4 AS tx,
           |         ($gray) // 3 AS lv
           |       FROM xy)
           |SELECT doc_id, CAST(ty AS INTEGER) AS ty, CAST(tx AS INTEGER) AS tx,
           |  COUNT(*) AS n_px, COUNT(DISTINCT lv) AS n_levels,
           |  CAST(SUM(lv) AS BIGINT) AS sum_lv,
           |  CAST(MIN(lv) AS INTEGER) AS min_lv,
           |  CAST(MAX(lv) AS INTEGER) AS max_lv
           |FROM px GROUP BY doc_id, ty, tx
           |ORDER BY doc_id, ty, tx""".stripMargin
      }),

    // Amplitude envelope through the real WAV decode: per-100-sample frame
    // peaks reduced to the global peak, the attack frame (first ≥ 90% of
    // peak — integer 9/10 comparison, no float threshold) and the last
    // frame still ≥ half peak — the onset/decay gate of audio curation.
    // The oracle recomputes the frame-peak series from the closed-form
    // sample formula with a grouped max.
    Q("multimodal_audio_envelope",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.envelopeStats(s,
            // GATED source: every third 200-sample block attenuated 16× so
            // the envelope has real quiet valleys — the ungated sawtooth
            // peaks in every frame and attack/decay degenerate
            Multimodal.syntheticGatedAudio(s,
              t(s, dir, "documents").filter($"doc_id" < 100)))
          .toDF()
          .select($"doc_id", $"n_frames", $"global_peak".cast("int")
            .as("global_peak"), $"attack_frame", $"last_half_frame")
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n
             |  FROM documents WHERE doc_id < 100),
             |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
             |v AS (SELECT doc_id, i // 100 AS f,
             |        abs(CASE WHEN (i // 200) % 3 = 2
             |          THEN ((doc_id*37 + i*13) % 2048 - 1024) // 16
             |          ELSE (doc_id*37 + i*13) % 2048 - 1024 END) AS a
             |      FROM sm),
             |fp AS (SELECT doc_id, f, MAX(a) AS peak FROM v GROUP BY 1, 2),
             |g AS (SELECT doc_id, MAX(peak) AS global_peak,
             |        COUNT(*) AS n_frames FROM fp GROUP BY doc_id)
             |SELECT g.doc_id, g.n_frames,
             |  CAST(g.global_peak AS INTEGER) AS global_peak,
             |  CAST(MIN(CASE WHEN fp.peak * 10 >= g.global_peak * 9
             |    THEN fp.f END) AS BIGINT) AS attack_frame,
             |  CAST(MAX(CASE WHEN fp.peak * 2 >= g.global_peak
             |    THEN fp.f END) AS BIGINT) AS last_half_frame
             |FROM g JOIN fp ON fp.doc_id = g.doc_id
             |GROUP BY g.doc_id, g.n_frames, g.global_peak
             |ORDER BY g.doc_id""".stripMargin))
  )
}
