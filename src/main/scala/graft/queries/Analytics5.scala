package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Round-10 wave two: smoothing-kernel codec stage, cardinality estimation,
  * corpus dispersion, and spectral period detection — same contract as every
  * family (scale-shaped plans, decimal-exact cross-partition reductions,
  * total ORDER BY, DuckDB oracle per query). */
object Analytics5 {

  val queries: Seq[Q] = Seq(

    // 3×3 box blur over the decoded BMP corpus — the smoothing-kernel
    // archetype next to multimodal_image_sobel's edge kernel: blur(x,y) =
    // (sum of the 9 grayscale neighbors) div 9, integer truncating division,
    // per-image sum / max / position-weighted checksum (any addressing
    // mistake — offset, border, transpose — flips the hash). The kernel
    // runs inside the one codec-stage pass with direct neighbor indexing;
    // the oracle recomputes every neighbor from the closed-form synthetic
    // pixel formula, so decode + kernel addressing are pinned end to end.
    Q("multimodal_image_boxblur",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.boxBlurStats(s,
            Multimodal.syntheticImages(s,
              t(s, dir, "documents").filter($"doc_id" < 60)))
          .toDF()
          .orderBy($"doc_id")
      },
      Some {
        def g(xe: String, ye: String) =
          s"""((doc_id*31 + ($xe)*7 + ($ye)*13) % 256
             | + (doc_id*31 + ($xe)*7 + ($ye)*13 + 101) % 256
             | + (doc_id*31 + ($xe)*7 + ($ye)*13 + 202) % 256)""".stripMargin
             .replaceAll("\\s+", " ")
        val nine = Seq(("x-1", "y-1"), ("x", "y-1"), ("x+1", "y-1"),
          ("x-1", "y"), ("x", "y"), ("x+1", "y"),
          ("x-1", "y+1"), ("x", "y+1"), ("x+1", "y+1"))
          .map { case (xe, ye) => g(xe, ye) }.mkString(" + ")
        s"""WITH dims AS (
           |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
           |  FROM documents WHERE doc_id < 60),
           |xs AS (SELECT doc_id, h, unnest(range(1, w - 1)) AS x FROM dims),
           |xy AS (SELECT doc_id, x, unnest(range(1, h - 1)) AS y FROM xs),
           |b AS (
           |  SELECT doc_id, x, y, ($nine) // 9 AS blur
           |  FROM xy)
           |SELECT doc_id, COUNT(*) AS n_interior,
           |  CAST(SUM(blur) AS BIGINT) AS sum_blur,
           |  CAST(MAX(blur) AS BIGINT) AS max_blur,
           |  CAST(SUM((x + 2*y) * blur) AS BIGINT) AS wsum_blur
           |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Linear counting (Whang et al.): the pre-HLL cardinality estimator that
    // is EXACT to compute (bitmap occupancy is deterministic integer work,
    // unlike HLL's harmonic means) — hash each key into m = 65536 buckets,
    // count occupied, estimate n ≈ m·ln(m / empty). Pinned against the exact
    // distinct count with the relative error in the output; m is sized for
    // the supplier domain through sf1+ (estimator breaks when the bitmap
    // saturates — that is a sizing decision, not a scale flaw). One
    // distinct-shuffle on the bucket id: at 100 TB the bitmap is the
    // 65536-value bucket rollup, never the fact table.
    Q("agg_linear_counting",
      (s, dir) => {
        import s.implicits._
        val keys = t(s, dir, "lineitem").select($"l_suppkey")
        val occ = keys.select(
            (conv(substring(md5($"l_suppkey".cast("string")), 1, 6), 16, 10)
              .cast("long") % 65536).as("bucket"))
          .agg(countDistinct($"bucket").as("occupied"))
        val exact = keys.agg(countDistinct($"l_suppkey").as("n_exact"))
        occ.crossJoin(broadcast(exact))
          .select(lit(65536L).as("m"), $"occupied", $"n_exact",
            round(lit(65536.0d) *
              log(lit(65536.0d) / (lit(65536L) - $"occupied")), 6)
              .as("n_est"),
            round((lit(65536.0d) *
              log(lit(65536.0d) / (lit(65536L) - $"occupied"))
              - $"n_exact") / $"n_exact", 6).as("rel_err"))
      },
      Some(s"""WITH b AS (
              |  SELECT DISTINCT
              |    ${sqlHexInt("md5(CAST(l_suppkey AS VARCHAR))", 1, 6)}
              |      % 65536 AS bucket
              |  FROM lineitem),
              |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS occupied FROM b),
              |x AS (SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
              |        AS n_exact FROM lineitem)
              |SELECT CAST(65536 AS BIGINT) AS m, occupied, n_exact,
              |  round(65536.0 * ln(65536.0 / (65536 - occupied)), 6)
              |    AS n_est,
              |  round((65536.0 * ln(65536.0 / (65536 - occupied)) - n_exact)
              |    / n_exact, 6) AS rel_err
              |FROM o, x""".stripMargin)),

    // Token burstiness (corpus-linguistics dispersion: a token appearing 40
    // times in 4 documents behaves differently from one appearing 40 times
    // in 40 — bursty terms are topical/template signals, spread terms are
    // function words): per token, document frequency, total occurrences,
    // occurrences-per-containing-doc, and a bursty flag decided by INTEGER
    // cross-multiplication (total·10 >= 15·df ⟺ burst >= 1.5 — no float
    // boundary). Top 30 by total via distributed TakeOrdered.
    Q("text_burstiness",
      (s, dir) => {
        import s.implicits._
        val perDoc = t(s, dir, "documents")
          .select($"doc_id",
            explode(graft.llm.TextFunctions.tokens($"text")).as("token"))
          .groupBy($"token", $"doc_id").agg(count(lit(1)).as("c"))
        perDoc.groupBy($"token")
          .agg(count(lit(1)).as("df"), sum($"c").cast("long").as("total"))
          .select($"token", $"df", $"total",
            round($"total".cast("double") / $"df", 6).as("burst"),
            ($"total" * 10L >= $"df" * 15L).as("bursty"))
          .orderBy($"total".desc, $"token").limit(30)
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(${Llm.duckToks("text")}) AS token
              |  FROM documents),
              |pd AS (SELECT token, doc_id, COUNT(*) AS c
              |       FROM toks GROUP BY 1, 2),
              |g AS (SELECT token, COUNT(*) AS df,
              |        CAST(SUM(c) AS BIGINT) AS total
              |      FROM pd GROUP BY token)
              |SELECT token, df, total,
              |  round(CAST(total AS DOUBLE) / df, 6) AS burst,
              |  total * 10 >= df * 15 AS bursty
              |FROM g ORDER BY total DESC, token LIMIT 30""".stripMargin)),

    // Spectral period detection over the daily event-count series: DFT power
    // (Σc·cos)² + (Σc·sin)² at candidate periods 2..10 days. The Fourier
    // coefficients are PINNED LITERALS (cos/sin precomputed in Scala,
    // rounded to 12 decimals, embedded identically in the Spark plan and the
    // oracle SQL — the multimodal_audio_goertzel no-runtime-libm
    // discipline), products accumulate in decimal, and the power readout
    // rounds to 2 decimals (1e8-magnitude doubles sit too close to a
    // 6-decimal grid — the round-large-values-coarsely rule). The series is
    // DEMEANED first so DC/trend mass cannot leak into the long periods.
    Q("events_period_detect",
      (s, dir) => {
        import s.implicits._
        val coefs = (for {
          p <- 2 to 10
          tt <- 0 until 30
        } yield (p, tt,
          BigDecimal(math.cos(2.0 * math.Pi * tt / p))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(math.sin(2.0 * math.Pi * tt / p))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("p", "tt", "cosv", "sinv")
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("c"))
          .select(datediff($"day", lit("2024-01-01").cast("date")).as("tt"),
            $"c")
        // demean first (exact integer mean components): an un-demeaned DFT
        // leaks the DC/trend mass into every long period and buries the
        // real cycle. The 1-row mean attaches via the sanctioned broadcast
        // cross; the demeaned value stays an exact ratio of integers.
        val mean = daily.agg(sum($"c").cast("long").as("sc"),
          count(lit(1)).cast("long").as("nd"))
        daily.crossJoin(broadcast(mean))
          .select($"tt",
            ($"c".cast("double") - $"sc".cast("double") / $"nd").as("cd"))
          .join(broadcast(coefs), Seq("tt"))
          .groupBy($"p")
          .agg(
            sum(($"cd" * $"cosv").cast("decimal(30,8)")).cast("double")
              .as("a"),
            sum(($"cd" * $"sinv").cast("decimal(30,8)")).cast("double")
              .as("b"))
          .select($"p", round($"a" * $"a" + $"b" * $"b", 2).as("power"))
          .orderBy($"p")
      },
      Some {
        val rows = (for {
          p <- 2 to 10
          tt <- 0 until 30
        } yield {
          val c = BigDecimal(math.cos(2.0 * math.Pi * tt / p))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
          val sn = BigDecimal(math.sin(2.0 * math.Pi * tt / p))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
          s"($p, $tt, CAST('$c' AS DOUBLE), CAST('$sn' AS DOUBLE))"
        }).mkString(",\n    ")
        s"""WITH coefs(p, tt, cosv, sinv) AS (VALUES
           |    $rows),
           |daily AS (
           |  SELECT CAST(ts AS DATE) - DATE '2024-01-01' AS tt,
           |    COUNT(*) AS c
           |  FROM events GROUP BY 1),
           |m AS (SELECT CAST(SUM(c) AS BIGINT) AS sc,
           |        CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
           |dm AS (SELECT tt,
           |    CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / nd AS cd
           |  FROM daily, m),
           |g AS (
           |  SELECT p,
           |    CAST(SUM(CAST(cd * cosv AS DECIMAL(30,8))) AS DOUBLE) AS a,
           |    CAST(SUM(CAST(cd * sinv AS DECIMAL(30,8))) AS DOUBLE) AS b
           |  FROM dm JOIN coefs USING (tt) GROUP BY p)
           |SELECT p, round(a * a + b * b, 2) AS power
           |FROM g ORDER BY p""".stripMargin
      }),

    // Jarque–Bera normality statistic per lineitem line number: JB =
    // n·(S²/6 + K²/24) from skewness S and EXCESS kurtosis K, themselves from
    // exact decimal raw moments (the agg_skew_kurtosis machinery — shifted
    // x − 25 powers recast to tight exact decimals, decimal sums, one shared
    // double finish). Seven groups of differing n, so the statistic actually
    // varies; one grouped fact pass, 7-row finish — scales like any agg.
    Q("stats_jarque_bera",
      (s, dir) => {
        import s.implicits._
        val xd = ($"l_quantity" - 25.0d).cast("decimal(9,2)")
        val x2 = (xd * xd).cast("decimal(9,4)")
        val x3 = (x2 * xd).cast("decimal(12,6)")
        val x4 = x2 * x2
        val mean = $"s1" / $"n"
        val m2 = $"s2" / $"n" - mean * mean
        val m3 = $"s3" / $"n" - lit(3.0) * mean * ($"s2" / $"n") +
          lit(2.0) * mean * mean * mean
        val m4 = $"s4" / $"n" - lit(4.0) * mean * ($"s3" / $"n") +
          lit(6.0) * mean * mean * ($"s2" / $"n") -
          lit(3.0) * mean * mean * mean * mean
        val sk = m3 / (m2 * sqrt(m2))
        val ku = m4 / (m2 * m2) - lit(3.0)
        t(s, dir, "lineitem")
          .groupBy($"l_linenumber")
          .agg(count(lit(1)).as("n"),
            sum(xd).cast("double").as("s1"),
            sum(x2).cast("double").as("s2"),
            sum(x3).cast("double").as("s3"),
            sum(x4).cast("double").as("s4"))
          .select($"l_linenumber", $"n",
            round($"n" * (sk * sk / lit(6.0) + ku * ku / lit(24.0)), 4)
              .as("jb"))
          .orderBy($"l_linenumber")
      },
      Some("""WITH v AS (
             |  SELECT l_linenumber,
             |    CAST(l_quantity - 25.0 AS DECIMAL(9,2)) AS xd
             |  FROM lineitem),
             |p AS (
             |  SELECT l_linenumber, xd,
             |    CAST(xd * xd AS DECIMAL(9,4)) AS x2
             |  FROM v),
             |q AS (
             |  SELECT l_linenumber, xd, x2,
             |    CAST(x2 * xd AS DECIMAL(12,6)) AS x3,
             |    x2 * x2 AS x4
             |  FROM p),
             |c AS (
             |  SELECT l_linenumber, COUNT(*) AS n,
             |    CAST(SUM(xd) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
             |    CAST(SUM(x3) AS DOUBLE) AS s3, CAST(SUM(x4) AS DOUBLE) AS s4
             |  FROM q GROUP BY l_linenumber),
             |f AS (
             |  SELECT l_linenumber, n,
             |    (s3 / n - 3.0 * (s1 / n) * (s2 / n) +
             |     2.0 * (s1 / n) * (s1 / n) * (s1 / n)) /
             |      ((s2 / n - (s1 / n) * (s1 / n)) *
             |       sqrt(s2 / n - (s1 / n) * (s1 / n))) AS sk,
             |    (s4 / n - 4.0 * (s1 / n) * (s3 / n) +
             |     6.0 * (s1 / n) * (s1 / n) * (s2 / n) -
             |     3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
             |      ((s2 / n - (s1 / n) * (s1 / n)) *
             |       (s2 / n - (s1 / n) * (s1 / n))) - 3.0 AS ku
             |  FROM c)
             |SELECT l_linenumber, n,
             |  round(n * (sk * sk / 6.0 + ku * ku / 24.0), 4) AS jb
             |FROM f ORDER BY l_linenumber""".stripMargin)),

    // Edge reciprocity on the heavy-trade nation backbone (directed edges =
    // customer-nation → supplier-nation pairs with ≥120 lineitems): per source
    // nation, how many out-edges have the reverse edge also in the backbone.
    // Reciprocity is THE directed-graph health metric PageRank/HITS assume
    // away. The backbone is one grouped fact pass (≤|nations|² rows); the
    // reverse lookup is an equi-join of that bounded frame to itself on the
    // swapped key — hash-partitionable at any scale, no cross.
    Q("graph_reciprocity",
      (s, dir) => {
        import s.implicits._
        val edges = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .filter($"src" =!= $"dst")
          .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
          .filter($"w" >= 120)
          .select($"src", $"dst")
          // bounded ≤|V|² backbone feeds two consumers (itself + its
          // reverse) — checkpoint so the fact-table lineage runs once
          .localCheckpoint()
        val rev = edges.select($"dst".as("r_src"), $"src".as("r_dst"),
          lit(1L).as("has_rev"))
        edges.join(rev, $"src" === $"r_src" && $"dst" === $"r_dst", "left")
          .groupBy($"src")
          .agg(count(lit(1)).as("out_deg"),
            sum(coalesce($"has_rev", lit(0L))).cast("long").as("n_recip"))
          .select($"src", $"out_deg", $"n_recip",
            round($"n_recip".cast("double") / $"out_deg", 6).as("recip_ratio"))
          .orderBy($"src")
      },
      Some("""WITH e AS (
             |  SELECT c_nationkey AS src, s_nationkey AS dst
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 120),
             |j AS (
             |  SELECT e.src, e.dst,
             |    CASE WHEN r.src IS NULL THEN 0 ELSE 1 END AS has_rev
             |  FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src)
             |SELECT src, COUNT(*) AS out_deg,
             |  CAST(SUM(has_rev) AS BIGINT) AS n_recip,
             |  round(CAST(SUM(has_rev) AS DOUBLE) / COUNT(*), 6)
             |    AS recip_ratio
             |FROM j GROUP BY src ORDER BY src""".stripMargin)),

    // Per-document lexical-richness profile: token count N, type count V,
    // hapax count V(1), and Yule's K = 10⁴·(Σ m²·V(m) − N)/N² over the
    // frequency spectrum — the classic vocabulary-richness characteristic
    // that is (unlike TTR) length-insensitive. The numerator stays INTEGER
    // (Σm² is a sum of exact squares) until one final division. Two
    // token-keyed aggs, both map-side-combinable — scales like word count.
    Q("text_yule_k",
      (s, dir) => {
        import s.implicits._
        val freq = t(s, dir, "documents").filter($"doc_id" < 40)
          .select($"doc_id",
            explode(graft.llm.TextFunctions.tokens($"text")).as("token"))
          .groupBy($"doc_id", $"token").agg(count(lit(1)).as("m"))
        freq.groupBy($"doc_id")
          .agg(sum($"m").cast("long").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when($"m" === 1, 1L).otherwise(0L)).cast("long").as("hapax"),
            sum($"m" * $"m").cast("long").as("sum_m2"))
          .select($"doc_id", $"n_tokens", $"n_types", $"hapax",
            round(lit(10000.0d) *
              ($"sum_m2" - $"n_tokens").cast("double") /
              ($"n_tokens".cast("double") * $"n_tokens"), 6).as("yule_k"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(${Llm.duckToks("text")}) AS token
              |  FROM documents WHERE doc_id < 40),
              |f AS (SELECT doc_id, token, COUNT(*) AS m
              |      FROM toks GROUP BY 1, 2),
              |g AS (
              |  SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_tokens,
              |    COUNT(*) AS n_types,
              |    CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS hapax,
              |    CAST(SUM(m * m) AS BIGINT) AS sum_m2
              |  FROM f GROUP BY doc_id)
              |SELECT doc_id, n_tokens, n_types, hapax,
              |  round(10000.0 * (sum_m2 - n_tokens) /
              |    (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS yule_k
              |FROM g ORDER BY doc_id""".stripMargin)),

    // Bayer 4×4 ordered dithering through the real BMP decode: 1-bit output
    // via the index-matrix threshold cross-multiplied into integers
    // (32·gray > 765·(2B+1) ⟺ gray/765 > (B+0.5)/16 — no float boundary).
    // Per-image on-pixel count + (x+2y)-weighted checksum pins the matrix
    // addressing; the oracle recomputes every pixel from the closed-form
    // synthetic formula with the same pinned matrix as a VALUES table.
    Q("multimodal_image_dither",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.ditherStats(s,
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
        s"""WITH bayer(by, bx, bv) AS (VALUES
           |  (0,0,0),(0,1,8),(0,2,2),(0,3,10),
           |  (1,0,12),(1,1,4),(1,2,14),(1,3,6),
           |  (2,0,3),(2,1,11),(2,2,1),(2,3,9),
           |  (3,0,15),(3,1,7),(3,2,13),(3,3,5)),
           |dims AS (
           |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
           |  FROM documents WHERE doc_id < 60),
           |xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
           |xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
           |px AS (
           |  SELECT doc_id, x, y,
           |    CASE WHEN 32 * ($gray) > 765 * (2 * bv + 1)
           |      THEN 1 ELSE 0 END AS onbit
           |  FROM xy JOIN bayer ON bayer.by = y % 4 AND bayer.bx = x % 4)
           |SELECT doc_id, COUNT(*) AS n_pix,
           |  CAST(SUM(onbit) AS BIGINT) AS n_on,
           |  CAST(SUM((x + 2*y) * onbit) AS BIGINT) AS wsum_on
           |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Local clustering coefficient per node on the heavy-trade undirected
    // backbone (≥120-lineitem nation pairs, either direction): cc(v) =
    // 2·T(v)/(d(v)·(d(v)−1)) with per-node triangle counts from the
    // wedge-enumerate + close equi-joins (adjacency self-join on the center
    // vertex, then a semi-close against the oriented edge list — the
    // per-vertex companion of graph_triangle_count's global a<b<c count).
    // The backbone is one grouped fact pass; every leg after it is an
    // equi-join over ≤|V|²-bounded frames. Exact integer ratio inputs.
    Q("graph_clustering_coeff",
      (s, dir) => {
        import s.implicits._
        val dir0 = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .filter($"src" =!= $"dst")
          .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
          .filter($"w" >= 120)
        // bounded ≤|V|² undirected backbone feeds four consumers (adj twice,
        // deg, the triangle close) — checkpoint so the fact-table lineage
        // runs once instead of re-expanding per consumer
        val und = dir0.select(least($"src", $"dst").as("a"),
            greatest($"src", $"dst").as("b")).distinct().localCheckpoint()
        val adj = und.select($"a".as("v"), $"b".as("u"))
          .union(und.select($"b".as("v"), $"a".as("u")))
        val deg = adj.groupBy($"v").agg(count(lit(1)).as("deg"))
        val tri = adj.select($"v", $"u".as("u1"))
          .join(adj.select($"v", $"u".as("u2")), Seq("v"))
          .filter($"u1" < $"u2")
          .join(und, $"u1" === $"a" && $"u2" === $"b")
          .groupBy($"v").agg(count(lit(1)).as("tri"))
        deg.join(tri, Seq("v"), "left")
          .select($"v", $"deg",
            coalesce($"tri", lit(0L)).cast("long").as("tri"),
            when($"deg" >= 2,
              round(lit(2.0d) * coalesce($"tri", lit(0L)) /
                ($"deg" * ($"deg" - 1)).cast("double"), 6))
              .as("cc"))
          .orderBy($"v")
      },
      Some("""WITH e AS (
             |  SELECT c_nationkey AS src, s_nationkey AS dst
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 120),
             |und AS (SELECT DISTINCT least(src, dst) AS a,
             |          greatest(src, dst) AS b FROM e),
             |adj AS (SELECT a AS v, b AS u FROM und
             |        UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT v, COUNT(*) AS deg FROM adj GROUP BY v),
             |tri AS (
             |  SELECT a1.v AS v, COUNT(*) AS tri
             |  FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.u < a2.u
             |  JOIN und ON und.a = a1.u AND und.b = a2.u
             |  GROUP BY a1.v)
             |SELECT deg.v, deg,
             |  CAST(coalesce(tri, 0) AS BIGINT) AS tri,
             |  CASE WHEN deg >= 2 THEN
             |    round(2.0 * coalesce(tri, 0) /
             |      CAST(deg * (deg - 1) AS DOUBLE), 6) END AS cc
             |FROM deg LEFT JOIN tri ON deg.v = tri.v
             |ORDER BY deg.v""".stripMargin)),

    // Inter-arrival gap statistics per event type: per-user consecutive-event
    // gaps (lag over the user partition, the sessionize window), attributed
    // to the LATER event's type, then per-type count / exact-integer mean /
    // min / max / positional low-median of the millisecond gaps. The window
    // partitions by user (hash-distributable); the median picks by
    // row_number over the per-type gap frame — keyed windows only.
    Q("events_interarrival_stats",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val gaps = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("gap_ms",
            unix_millis($"ts") - unix_millis(lag($"ts", 1).over(w)))
          .filter($"gap_ms".isNotNull)
        val wm = Window.partitionBy($"event_type")
          .orderBy($"gap_ms", $"user_id", $"event_id")
        gaps
          .withColumn("rn", row_number().over(wm))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy($"event_type")))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_gaps"),
            round(sum($"gap_ms").cast("double") / count(lit(1)), 4)
              .as("mean_ms"),
            min($"gap_ms").as("min_ms"),
            max($"gap_ms").as("max_ms"),
            max(when($"rn" === floor(($"cnt" + 1) / 2), $"gap_ms"))
              .as("median_low_ms"))
          .orderBy($"event_type")
      },
      Some("""WITH g AS (
             |  SELECT event_type, user_id, event_id,
             |    epoch_ms(ts) - epoch_ms(lag(ts) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
             |  FROM events),
             |f AS (SELECT * FROM g WHERE gap_ms IS NOT NULL),
             |r AS (
             |  SELECT event_type, gap_ms,
             |    ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY gap_ms, user_id, event_id) AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
             |  FROM f)
             |SELECT event_type, COUNT(*) AS n_gaps,
             |  round(CAST(SUM(gap_ms) AS DOUBLE) / COUNT(*), 4) AS mean_ms,
             |  MIN(gap_ms) AS min_ms, MAX(gap_ms) AS max_ms,
             |  MAX(CASE WHEN rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
             |    THEN gap_ms END) AS median_low_ms
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Kendall's tau-b between daily event volume and daily active users over
    // the 30-day series: all-pairs concordance with INTEGER counts
    // (concordant / discordant / x-ties / y-ties decided by sign products,
    // no float comparisons), tau-b's tie-corrected denominator as one final
    // sqrt. The pair space is the bounded 30-row day frame crossed with
    // itself (i<j) — a sanctioned bounded BNLJ over an aggregate, never the
    // fact table; the fact-sized work is the one groupBy(day).
    Q("stats_kendall_tau",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("x"),
            countDistinct($"user_id").as("y"))
          .localCheckpoint()
        val d1 = daily.select($"day".as("day1"), $"x".as("x1"), $"y".as("y1"))
        val d2 = daily.select($"day".as("day2"), $"x".as("x2"), $"y".as("y2"))
        val pairs = d1.join(d2, $"day1" < $"day2")
          .select((($"x2" - $"x1") * ($"y2" - $"y1")).as("prod"),
            ($"x1" === $"x2").as("tx"), ($"y1" === $"y2").as("ty"))
        pairs.agg(
            count(lit(1)).as("n0"),
            sum(when($"prod" > 0, 1L).otherwise(0L)).cast("long")
              .as("concordant"),
            sum(when($"prod" < 0, 1L).otherwise(0L)).cast("long")
              .as("discordant"),
            sum(when($"tx", 1L).otherwise(0L)).cast("long").as("ties_x"),
            sum(when($"ty", 1L).otherwise(0L)).cast("long").as("ties_y"))
          .select($"n0", $"concordant", $"discordant", $"ties_x", $"ties_y",
            round(($"concordant" - $"discordant").cast("double") /
              sqrt((($"n0" - $"ties_x") * ($"n0" - $"ties_y"))
                .cast("double")), 6).as("tau_b"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS dy, COUNT(*) AS x,
             |    COUNT(DISTINCT user_id) AS y
             |  FROM events GROUP BY 1),
             |p AS (
             |  SELECT (d2.x - d1.x) * (d2.y - d1.y) AS prod,
             |    d1.x = d2.x AS tx, d1.y = d2.y AS ty
             |  FROM daily d1 JOIN daily d2 ON d1.dy < d2.dy),
             |a AS (
             |  SELECT COUNT(*) AS n0,
             |    CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS concordant,
             |    CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS discordant,
             |    CAST(SUM(CASE WHEN tx THEN 1 ELSE 0 END) AS BIGINT)
             |      AS ties_x,
             |    CAST(SUM(CASE WHEN ty THEN 1 ELSE 0 END) AS BIGINT)
             |      AS ties_y
             |  FROM p)
             |SELECT n0, concordant, discordant, ties_x, ties_y,
             |  round(CAST(concordant - discordant AS DOUBLE) /
             |    sqrt(CAST((n0 - ties_x) * (n0 - ties_y) AS DOUBLE)), 6)
             |    AS tau_b
             |FROM a""".stripMargin)),

    // Otsu's threshold through the real BMP decode: per-image 256-level
    // grayscale histogram (bounded per-record state inside the codec pass),
    // between-class-variance argmax written as the exact integer rational
    // (S0·w1 − S1·w0)²/(w0·w1) — numerator and denominator both exactly
    // representable, one correctly-rounded IEEE division, ties to the lowest
    // level. The output hashes integer WITNESSES of the argmax (t_opt, w0,
    // S0) rather than the variance float; the oracle rebuilds the whole
    // scan from the closed-form pixel formula and picks by
    // ROW_NUMBER(crit DESC, t ASC).
    Q("multimodal_image_otsu",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.otsuStats(s,
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
           |xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
           |xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
           |px AS (SELECT doc_id, ($gray) // 3 AS lv FROM xy),
           |tot AS (SELECT doc_id, COUNT(*) AS n, SUM(lv) AS s_tot
           |        FROM px GROUP BY doc_id),
           |hist AS (SELECT doc_id, lv, COUNT(*) AS c, SUM(lv) AS s
           |         FROM px GROUP BY doc_id, lv),
           |th AS (SELECT doc_id, n, s_tot, unnest(range(0, 255)) AS t
           |       FROM tot),
           |cum AS (
           |  SELECT th.doc_id, th.t, th.n, th.s_tot,
           |    CAST(coalesce(SUM(h.c), 0) AS BIGINT) AS w0,
           |    CAST(coalesce(SUM(h.s), 0) AS BIGINT) AS s0
           |  FROM th LEFT JOIN hist h
           |    ON h.doc_id = th.doc_id AND h.lv <= th.t
           |  GROUP BY th.doc_id, th.t, th.n, th.s_tot),
           |crit AS (
           |  SELECT doc_id, n, t, w0, s0,
           |    CAST((s0 * (n - w0) - (s_tot - s0) * w0) *
           |         (s0 * (n - w0) - (s_tot - s0) * w0) AS DOUBLE) /
           |      (w0 * (n - w0)) AS crit
           |  FROM cum WHERE w0 > 0 AND w0 < n),
           |pick AS (
           |  SELECT doc_id, n, t, w0, s0,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id
           |      ORDER BY crit DESC, t ASC) AS rn
           |  FROM crit)
           |SELECT doc_id, n AS n_pix, t AS t_opt, w0, s0
           |FROM pick WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }),

    // One-way ANOVA across the 7 line-number groups of l_quantity: F =
    // (SSB/(k−1))/(SSW/(n−k)) and η² = SSB/SST, with per-group n/Σx/Σx² kept
    // EXACT (shifted decimal sums), the per-group s1²/n term recast to
    // decimal before the k-row second-level sum (partitioning-independent —
    // the chi-square contrib discipline), and one shared double finish.
    // Two-level agg: fact-sized work is the one grouped pass.
    Q("stats_anova_oneway",
      (s, dir) => {
        import s.implicits._
        val xd = ($"l_quantity" - 25.0d).cast("decimal(9,2)")
        val g = t(s, dir, "lineitem")
          .groupBy($"l_linenumber")
          .agg(count(lit(1)).as("ni"),
            sum(xd).as("s1"),
            sum((xd * xd).cast("decimal(9,4)")).as("s2"))
          .select($"ni", $"s1", $"s2",
            (($"s1".cast("double") * $"s1".cast("double")) / $"ni")
              .cast("decimal(30,12)").as("term"))
        g.agg(count(lit(1)).as("k"),
            sum($"ni").cast("long").as("n"),
            sum($"s1").cast("double").as("s1_all"),
            sum($"s2").cast("double").as("s2_all"),
            sum($"term").cast("double").as("term_all"))
          .select($"k", $"n",
            round((($"term_all" - $"s1_all" * $"s1_all" / $"n") /
                ($"k" - 1)) /
              (($"s2_all" - $"term_all") / ($"n" - $"k")), 6).as("f_stat"),
            round(($"term_all" - $"s1_all" * $"s1_all" / $"n") /
              ($"s2_all" - $"s1_all" * $"s1_all" / $"n"), 6).as("eta_sq"))
      },
      Some("""WITH v AS (
             |  SELECT l_linenumber,
             |    CAST(l_quantity - 25.0 AS DECIMAL(9,2)) AS xd
             |  FROM lineitem),
             |g AS (
             |  SELECT l_linenumber, COUNT(*) AS ni, SUM(xd) AS s1,
             |    SUM(CAST(xd * xd AS DECIMAL(9,4))) AS s2
             |  FROM v GROUP BY l_linenumber),
             |h AS (
             |  SELECT ni, s1, s2,
             |    CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / ni
             |      AS DECIMAL(30,12)) AS term
             |  FROM g),
             |a AS (
             |  SELECT COUNT(*) AS k, CAST(SUM(ni) AS BIGINT) AS n,
             |    CAST(SUM(s1) AS DOUBLE) AS s1_all,
             |    CAST(SUM(s2) AS DOUBLE) AS s2_all,
             |    CAST(SUM(term) AS DOUBLE) AS term_all
             |  FROM h)
             |SELECT k, n,
             |  round(((term_all - s1_all * s1_all / n) / (k - 1)) /
             |    ((s2_all - term_all) / (n - k)), 6) AS f_stat,
             |  round((term_all - s1_all * s1_all / n) /
             |    (s2_all - s1_all * s1_all / n), 6) AS eta_sq
             |FROM a""".stripMargin)),

    // Cramér's V association strength between event type and ISO day-of-week:
    // the chi-square contingency machinery (full densified grid from the two
    // tiny margins — bounded crosses — expected counts from exact integer
    // margin products, decimal contribution sums) finished with the
    // normalization V = √(χ²/(n·min(r−1, c−1))) that makes effect sizes
    // comparable across tables. Margins are aggregates; nothing driver-side.
    Q("stats_cramers_v",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
          .select($"event_type",
            (((dayofweek(to_date($"ts")) + lit(5)) % 7) + 1).as("dow"))
        val cells = ev.groupBy($"event_type", $"dow").agg(count(lit(1)).as("o"))
        val rowM = ev.groupBy($"event_type").agg(count(lit(1)).as("rt"))
        val colM = ev.groupBy($"dow").agg(count(lit(1)).as("ct"))
        val tot = ev.agg(count(lit(1)).as("n"))
        val grid = rowM.crossJoin(colM).crossJoin(tot)
          .join(cells, Seq("event_type", "dow"), "left")
          .select($"rt", $"ct", $"n", coalesce($"o", lit(0L)).as("o"))
        val e = ($"rt" * $"ct").cast("double") / $"n"
        val contrib = (($"o" - e) * ($"o" - e)) / e
        val dims = rowM.agg(count(lit(1)).as("nr"))
          .crossJoin(colM.agg(count(lit(1)).as("nc")))
        grid.agg(
            sum(contrib.cast("decimal(30,12)")).cast("double").as("chi2"),
            count(lit(1)).as("n_cells"),
            max($"n").as("n"))
          .crossJoin(broadcast(dims))
          .select($"nr", $"nc", $"n", $"n_cells",
            round($"chi2", 6).as("chi2"),
            round(sqrt($"chi2" /
              ($"n" * least($"nr" - 1, $"nc" - 1).cast("double"))), 6)
              .as("cramers_v"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow
             |  FROM events),
             |cells AS (SELECT event_type, dow, count(*) AS o
             |          FROM ev GROUP BY 1, 2),
             |rm AS (SELECT event_type, count(*) AS rt FROM ev GROUP BY 1),
             |cm AS (SELECT dow, count(*) AS ct FROM ev GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM ev),
             |grid AS (
             |  SELECT rt, ct, n, COALESCE(cells.o, 0) AS o
             |  FROM rm CROSS JOIN cm CROSS JOIN tot
             |  LEFT JOIN cells ON cells.event_type = rm.event_type
             |                 AND cells.dow = cm.dow),
             |a AS (
             |  SELECT
             |    CAST(SUM(CAST(
             |      ((o - CAST(rt * ct AS DOUBLE) / n) *
             |       (o - CAST(rt * ct AS DOUBLE) / n)) /
             |        (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(30,12)))
             |      AS DOUBLE) AS chi2,
             |    MAX(n) AS n, COUNT(*) AS n_cells
             |  FROM grid),
             |d AS (
             |  SELECT (SELECT COUNT(*) FROM rm) AS nr,
             |         (SELECT COUNT(*) FROM cm) AS nc)
             |SELECT nr, nc, CAST(n AS BIGINT) AS n, n_cells,
             |  round(chi2, 6) AS chi2,
             |  round(sqrt(chi2 /
             |    (n * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 6)
             |    AS cramers_v
             |FROM a CROSS JOIN d""".stripMargin)),

    // IQR-fence outlier report per event type on the right-skewed value
    // field: positional low-quartiles (rank floor((cnt+1)/4) /
    // floor(3(cnt+1)/4) — engine-identical integer positions, no
    // interpolation; the picked quartiles are RAW data doubles, bit-equal
    // in both engines), Tukey upper fence q3 + 1.5·IQR evaluated with the
    // identical IEEE expression on both sides, outlier count / rate / worst
    // value. (The lower fence is structurally empty on a ≥0 right-skewed
    // field — reporting it would be a constant-zero column, so the report
    // is one-sided by design.) Keyed windows; 5-row quartile frame
    // broadcast back onto the fact.
    Q("dq_outlier_iqr",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"event_type")
          .orderBy($"value", $"event_id")
        val ranked = graft.Tables.events(s, dir)
          .select($"event_type", $"value", $"event_id")
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy($"event_type")))
        val quart = ranked.groupBy($"event_type")
          .agg(max(when($"rn" === greatest(lit(1L),
              floor(($"cnt" + 1) / 4)), $"value")).as("q1"),
            max(when($"rn" === floor(($"cnt" + 1) * 3 / 4),
              $"value")).as("q3"))
        ranked.join(broadcast(quart), Seq("event_type"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            max($"q1").as("q1"), max($"q3").as("q3"),
            sum(when($"value" > $"q3" + lit(1.5d) * ($"q3" - $"q1"), 1L)
              .otherwise(0L)).cast("long").as("n_out"),
            max(when($"value" > $"q3" + lit(1.5d) * ($"q3" - $"q1"),
              $"value")).as("max_out"))
          .select($"event_type", $"n", $"q1", $"q3", $"n_out",
            round($"n_out".cast("double") / $"n", 6).as("outlier_rate"),
            $"max_out")
          .orderBy($"event_type")
      },
      Some("""WITH r AS (
             |  SELECT event_type, value,
             |    ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY value, event_id) AS rn,
             |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
             |  FROM events),
             |q AS (
             |  SELECT event_type,
             |    MAX(CASE WHEN rn = greatest(1,
             |      CAST(floor((cnt + 1) / 4) AS BIGINT))
             |      THEN value END) AS q1,
             |    MAX(CASE WHEN rn = CAST(floor((cnt + 1) * 3 / 4) AS BIGINT)
             |      THEN value END) AS q3
             |  FROM r GROUP BY event_type)
             |SELECT r.event_type, COUNT(*) AS n,
             |  MAX(q1) AS q1, MAX(q3) AS q3,
             |  CAST(SUM(CASE WHEN value > q3 + 1.5 * (q3 - q1)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
             |  round(CAST(SUM(CASE WHEN value > q3 + 1.5 * (q3 - q1)
             |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             |    AS outlier_rate,
             |  MAX(CASE WHEN value > q3 + 1.5 * (q3 - q1)
             |    THEN value END) AS max_out
             |FROM r JOIN q ON r.event_type = q.event_type
             |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin)),

    // Strict local-maxima peak detection through the real WAV decode:
    // s(i) > s(i−1) ∧ s(i) > s(i+1) ∧ s(i) ≥ 512 over the interior samples —
    // pure integer comparisons, per-record O(1) kernel state, with the
    // index-sum checksum pinning peak POSITIONS (the mod-ramp's wrap points)
    // and not just their count. The oracle re-evaluates all three neighbors
    // from the closed-form sample formula.
    Q("multimodal_audio_peak_detect",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.peakStats(s,
            Multimodal.syntheticAudio(s,
              t(s, dir, "documents").filter($"doc_id" < 100)),
            thresh = 512)
          .toDF()
          .orderBy($"doc_id")
      },
      Some {
        def smp(e: String) = s"(doc_id*37 + ($e)*13) % 2048 - 1024"
        s"""WITH dims AS (
           |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n
           |  FROM documents WHERE doc_id < 100),
           |sm AS (SELECT doc_id, n, unnest(range(1, n - 1)) AS i FROM dims),
           |v AS (SELECT doc_id, n, i,
           |        ${smp("i")} AS s_i, ${smp("i - 1")} AS s_m, ${smp("i + 1")} AS s_p
           |      FROM sm),
           |pk AS (SELECT doc_id, n, i, s_i FROM v
           |       WHERE s_i > s_m AND s_i > s_p AND s_i >= 512)
           |SELECT doc_id, ANY_VALUE(n) AS n_samples, COUNT(*) AS n_peaks,
           |  CAST(SUM(i) AS BIGINT) AS sum_peak_idx,
           |  CAST(MAX(s_i) AS INTEGER) AS max_peak
           |FROM pk GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Matryoshka prefix-energy audit per label: L2 norm of the FIRST 16 of
    // 64 dimensions through the decimal-exact codegen'd dot
    // (vec_dot_exact(v,v) → one IEEE sqrt — bit-equal to the oracle's
    // DECIMAL(30,12) sum), per-row norms recast to decimal before the group
    // mean. The full-vector norm is uniformly 1 on this corpus (normalized
    // embeddings — auditing it would prove nothing); the PREFIX norm is the
    // quantity Matryoshka truncation actually spends, and it varies per
    // vector. Map-only norm pass + one grouped reduction — scales linearly.
    Q("embed_norm_audit",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Similarity
        t(s, dir, "embeddings")
          .select($"label",
            Similarity.normExact(slice($"embedding", 1, 16)).as("nrm"))
          .groupBy($"label")
          .agg(count(lit(1)).as("n_vecs"),
            sum($"nrm".cast("decimal(30,12)")).cast("double").as("nrm_sum"),
            min($"nrm").as("mn"), max($"nrm").as("mx"))
          .select($"label", $"n_vecs",
            round($"nrm_sum" / $"n_vecs", 6).as("mean_norm"),
            round($"mn", 6).as("min_norm"),
            round($"mx", 6).as("max_norm"))
          .orderBy($"label")
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, label, unnest(embedding) AS v,
             |         generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |norms AS (
             |  SELECT vec_id, ANY_VALUE(label) AS label,
             |    sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
             |      AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
             |  FROM flat WHERE pos <= 16 GROUP BY vec_id)
             |SELECT label, COUNT(*) AS n_vecs,
             |  round(CAST(SUM(CAST(nrm AS DECIMAL(30,12))) AS DOUBLE)
             |    / COUNT(*), 6) AS mean_norm,
             |  round(MIN(nrm), 6) AS min_norm,
             |  round(MAX(nrm), 6) AS max_norm
             |FROM norms GROUP BY label ORDER BY label""".stripMargin)),

    // Per-state transition entropy of the user event chain (the Markov
    // uncertainty profile: which states have predictable successors), plus
    // each state's contribution to the corpus entropy rate (empirical state
    // frequency × state entropy). Transition counts from the one lag() pass
    // over user partitions; per-row p·log₂p terms recast to decimal before
    // both reductions; the 1-row grand total attaches via the sanctioned
    // scalar cross. All log magnitudes are O(1), so round-6 is far outside
    // any engine's ulp on log2.
    Q("events_transition_entropy",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val trans = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type", $"event_type")
          .agg(count(lit(1)).as("nij"))
          // bounded ≤|states|² transition frame feeds three consumers —
          // checkpoint so the fact-sized lag pass runs once
          .localCheckpoint()
        val states = trans.groupBy($"prev_type")
          .agg(sum($"nij").cast("long").as("ni"),
            count(lit(1)).as("k_out"))
        val ent = trans.join(states, Seq("prev_type"))
          .select($"prev_type", $"ni", $"k_out",
            (($"nij".cast("double") / $"ni") *
              log(2.0, $"nij".cast("double") / $"ni"))
              .cast("decimal(30,12)").as("term"))
          .groupBy($"prev_type")
          .agg(max($"ni").as("ni"), max($"k_out").as("k_out"),
            (-sum($"term").cast("double")).as("h_bits"))
        val tot = ent.agg(sum($"ni").cast("long").as("n_tot"))
        ent.crossJoin(broadcast(tot))
          .select($"prev_type", $"ni", $"k_out",
            round($"h_bits", 6).as("h_bits"),
            round(($"ni".cast("double") / $"n_tot") * $"h_bits", 6)
              .as("rate_contrib"))
          .orderBy($"prev_type")
      },
      Some("""WITH tr AS (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type,
             |    event_type
             |  FROM events),
             |c AS (SELECT prev_type, event_type, COUNT(*) AS nij
             |      FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2),
             |st AS (SELECT prev_type, CAST(SUM(nij) AS BIGINT) AS ni,
             |         COUNT(*) AS k_out
             |       FROM c GROUP BY prev_type),
             |e AS (
             |  SELECT c.prev_type, MAX(ni) AS ni, MAX(k_out) AS k_out,
             |    -CAST(SUM(CAST(
             |      (CAST(nij AS DOUBLE) / ni) *
             |        log2(CAST(nij AS DOUBLE) / ni)
             |      AS DECIMAL(30,12))) AS DOUBLE) AS h_bits
             |  FROM c JOIN st ON c.prev_type = st.prev_type
             |  GROUP BY c.prev_type),
             |t AS (SELECT CAST(SUM(ni) AS BIGINT) AS n_tot FROM e)
             |SELECT prev_type, ni, k_out,
             |  round(h_bits, 6) AS h_bits,
             |  round((CAST(ni AS DOUBLE) / n_tot) * h_bits, 6)
             |    AS rate_contrib
             |FROM e CROSS JOIN t ORDER BY prev_type""".stripMargin)),

    // Held-out bigram-LM perplexity: train add-one-smoothed bigram MLE on
    // even doc_ids, evaluate mean log₂-likelihood and perplexity on odd
    // doc_ids — the model-eval half of the n-gram family (Kneser-Ney built
    // the smoothed model; this scores held-out data with a train/test
    // split, the decontamination-adjacent eval every LM data pipeline
    // runs). Per-bigram log terms recast to decimal before the mean;
    // corpus scalars (V, totals) attach via sanctioned 1-row crosses;
    // unseen contexts fall back to 1/V smoothing mass.
    Q("text_bigram_perplexity",
      (s, dir) => {
        import s.implicits._
        def bigrams(docs: org.apache.spark.sql.DataFrame) = docs
          .select($"doc_id",
            posexplode(graft.llm.TextFunctions.tokens($"text"))
              .as(Seq("pos", "w")))
          .withColumn("w2", lead($"w", 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"doc_id").orderBy($"pos")))
          .filter($"w2".isNotNull)
          .select($"w".as("w1"), $"w2")
        val docs = t(s, dir, "documents")
        val train = bigrams(docs.filter($"doc_id" % 2 === 0))
          .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint()
        val ctx = train.groupBy($"w1").agg(sum($"c12").cast("long").as("c1"))
        val vocab = docs.filter($"doc_id" % 2 === 0)
          .select(explode(graft.llm.TextFunctions.tokens($"text")).as("w"))
          .agg(countDistinct($"w").as("v"))
        val eval0 = bigrams(docs.filter($"doc_id" % 2 === 1))
          .join(train, Seq("w1", "w2"), "left")
          .join(ctx, Seq("w1"), "left")
          .crossJoin(broadcast(vocab))
          .select((coalesce($"c12", lit(0L)) + 1).cast("double")
            ./((coalesce($"c1", lit(0L)) + $"v").cast("double")).as("p"))
        val agg = eval0.agg(count(lit(1)).as("n_eval"),
          sum(log(2.0, $"p").cast("decimal(30,12)")).cast("double")
            .as("logp_sum"))
        agg.crossJoin(broadcast(vocab))
          .crossJoin(broadcast(train.agg(count(lit(1)).as("n_train_bg"))))
          .select($"v".as("v_size"), $"n_train_bg", $"n_eval",
            round($"logp_sum" / $"n_eval", 6).as("avg_log2p"),
            round(pow(lit(2.0d), -round($"logp_sum" / $"n_eval", 6)), 4)
              .as("perplexity"))
      },
      Some(s"""WITH tr_toks AS (
              |  SELECT doc_id, unnest(${Llm.duckToks("text")}) AS w,
              |    generate_subscripts(${Llm.duckToks("text")}, 1) AS pos
              |  FROM documents WHERE doc_id % 2 = 0),
              |tr_bg AS (
              |  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id
              |    ORDER BY pos) AS w2
              |  FROM tr_toks),
              |train AS (SELECT w1, w2, COUNT(*) AS c12 FROM tr_bg
              |          WHERE w2 IS NOT NULL GROUP BY 1, 2),
              |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1
              |        FROM train GROUP BY w1),
              |vocab AS (SELECT COUNT(DISTINCT w) AS v FROM tr_toks),
              |ev_toks AS (
              |  SELECT doc_id, unnest(${Llm.duckToks("text")}) AS w,
              |    generate_subscripts(${Llm.duckToks("text")}, 1) AS pos
              |  FROM documents WHERE doc_id % 2 = 1),
              |ev_bg AS (
              |  SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id
              |    ORDER BY pos) AS w2
              |  FROM ev_toks),
              |ev AS (
              |  SELECT CAST(coalesce(c12, 0) + 1 AS DOUBLE) /
              |         CAST(coalesce(c1, 0) + v AS DOUBLE) AS p
              |  FROM (SELECT * FROM ev_bg WHERE w2 IS NOT NULL) b
              |  LEFT JOIN train USING (w1, w2)
              |  LEFT JOIN ctx USING (w1)
              |  CROSS JOIN vocab),
              |a AS (
              |  SELECT COUNT(*) AS n_eval,
              |    CAST(SUM(CAST(log2(p) AS DECIMAL(30,12))) AS DOUBLE)
              |      AS logp_sum
              |  FROM ev)
              |SELECT v AS v_size,
              |  (SELECT COUNT(*) FROM train) AS n_train_bg, n_eval,
              |  round(logp_sum / n_eval, 6) AS avg_log2p,
              |  round(pow(2.0, -round(logp_sum / n_eval, 6)), 4)
              |    AS perplexity
              |FROM a CROSS JOIN vocab""".stripMargin)),

    // RAKE keyword scores (stopword-delimited co-occurrence): split each
    // document's token stream into phrases at the stopwords {a, the}
    // (gaps-and-islands: pos − rank-among-content-tokens is constant within
    // a phrase), then score each content word by degree(w)/freq(w) where
    // degree sums the lengths of every phrase the occurrence sits in —
    // co-occurring words inflate each other, the RAKE signal. Integer
    // degree/freq, one final ratio; keyed windows only; top 25 by score
    // via distributed TakeOrdered.
    Q("text_rake_keywords",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val toks = t(s, dir, "documents")
          .select($"doc_id",
            posexplode(graft.llm.TextFunctions.tokens($"text"))
              .as(Seq("pos", "w")))
        val content = toks.filter(!$"w".isin("a", "the"))
          .withColumn("grp", $"pos" - row_number().over(
            Window.partitionBy($"doc_id").orderBy($"pos")))
        val phrases = content.groupBy($"doc_id", $"grp")
          .agg(count(lit(1)).as("plen"))
        content.join(phrases, Seq("doc_id", "grp"))
          .groupBy($"w")
          .agg(count(lit(1)).as("freq"),
            sum($"plen").cast("long").as("degree"))
          .select($"w", $"freq", $"degree",
            round($"degree".cast("double") / $"freq", 6).as("rake_score"))
          .orderBy($"rake_score".desc, $"freq".desc, $"w").limit(25)
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(${Llm.duckToks("text")}) AS w,
              |    generate_subscripts(${Llm.duckToks("text")}, 1) AS pos
              |  FROM documents),
              |content AS (
              |  SELECT doc_id, w, pos,
              |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id
              |      ORDER BY pos) AS grp
              |  FROM toks WHERE w NOT IN ('a', 'the')),
              |phrases AS (SELECT doc_id, grp, COUNT(*) AS plen
              |            FROM content GROUP BY 1, 2)
              |SELECT w, COUNT(*) AS freq,
              |  CAST(SUM(plen) AS BIGINT) AS degree,
              |  round(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 6)
              |    AS rake_score
              |FROM content JOIN phrases USING (doc_id, grp)
              |GROUP BY w
              |ORDER BY rake_score DESC, freq DESC, w LIMIT 25""".stripMargin))
  )
}
