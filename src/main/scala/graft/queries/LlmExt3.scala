package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DataTypes
import graft.llm.{Multimodal, TextFunctions => TF}
import QueryDSL._

/** Fourth-wave operators, grouped by what a data team runs them for:
  *
  *  - model/selection math: interpolated Kneser-Ney bigram LM estimation
  *    (the n-gram-LM side of CCNet-style perplexity filtering), greedy
  *    k-center (Gonzalez) coreset selection, systematic importance
  *    resampling (the selection step after DSIR scoring), balanced class
  *    downsampling, first-occurrence n-gram novelty, feature-hash collision
  *    audit, IVF list-balance audit (decimal-exact assignment);
  *  - multimodal codec-stage passes: ViT-style 4×4 patch extraction, corpus
  *    normalization constants (mean/var/std per channel), pixel histograms,
  *    frame-delta shot detection, energy-delta audio fingerprints, audio SNR
  *    gating, anti-aliased 7-tap integer FIR resampling;
  *  - analytics/causal/graph: Holt linear-trend smoothing and its backtest
  *    (typed mapGroups + recursive-CTE oracles), Kaplan-Meier
  *    time-to-conversion with administrative censoring,
  *    difference-in-differences, exact Shapley attribution over the bounded
  *    touch-mask lattice, Markov stationary distribution, CUSUM drift and
  *    Shewhart control charts, sequential pattern mining, bitmask funnels,
  *    exact audience overlap, Newman modularity, degree assortativity,
  *    random-walk corpus generation, cohort LTV projection, max drawdown,
  *    Wald-Wolfowitz runs test, bot-detection heuristics;
  *  - statistics for experimentation and QA: Wilson and Beta-posterior reach
  *    intervals, power-analysis MDE, delta-method ratio variance,
  *    deterministic Poisson bootstrap SE, grouped OLS, Hodges-Lehmann,
  *    MAD, Gini (corpus-global, banded), KS and total-variation drift,
  *    log2/HdrHistogram bucketing, Neyman allocation, XYZ classification;
  *  - dedup/chunking/identifiers: content-defined chunking + CDC shared-chunk
  *    dedup, entity-resolution pipeline, de-hyphenation repair, UTF-8
  *    byte-density audit, UUIDv5 and Luhn minting, IPv4/CIDR enrichment,
  *    geohash encoding + prefix-bucketed neighbor join;
  *  - further codec-stage passes: geometric augmentation (transpose-closed
  *    form), mipmap pyramids, letterbox border detection, stereo
  *    deinterleave, dynamic-range compression, dataset cards;
  *  - SQL surface sugar: ORDER BY ALL, SELECT * EXCEPT.
  *
  * Determinism rules in force throughout: integer counts + IEEE double ops in
  * pinned parenthesization (no libm; sqrt is correctly-rounded per IEEE-754
  * and allowed), decimal-exact sums for anything order-sensitive (grid scale
  * chosen coarser than the operand ulp per the QueryDSL boundary rule),
  * integer cross-multiplied comparisons instead of float thresholds, and
  * recursive oracles (Holt, KM, Markov) stepping bit-identical arithmetic. */
object LlmExt3 {

  private val dec12 = DataTypes.createDecimalType(30, 12)

  /** Resample positions for `sample_systematic_importance` — shared by the
    * Spark side and the interpolated DuckDB oracle so the two engines can't
    * silently desynchronize on the divisor. */
  private val sysResampleM = 50

  /** DuckDB mirror of [[cdcChunks]]: the CTE chain from a `docs(doc_id,
    * text)` CTE to `cmd(doc_id, chunk_id, start, len, chunk_md5)`. Splice
    * after a WITH docs AS (...) prefix. */
  private val duckCdcSql: String = {
    val hTerms = (0 until 8).map { k =>
      val c = math.pow(31, k).toLong
      if (k == 0) s"CAST(a AS BIGINT) * $c"
      else s"CAST(COALESCE(lag(a, $k) OVER w, 0) AS BIGINT) * $c"
    }.mkString(" + ")
    s"""chars AS (
       |  SELECT doc_id, i,
       |    ascii(substring(text, CAST(i AS INT), 1)) AS a
       |  FROM docs, unnest(range(1, length(text) + 1)) t(i)),
       |h AS (
       |  SELECT doc_id, i, ($hTerms) % 2147483647 AS h
       |  FROM chars
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
       |b AS (
       |  SELECT doc_id, i,
       |    CASE WHEN i >= 8 AND h % 64 = 0 THEN 1 ELSE 0 END AS boundary
       |  FROM h),
       |ch AS (
       |  SELECT doc_id, i,
       |    COALESCE(CAST(SUM(boundary) OVER (PARTITION BY doc_id
       |      ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS chunk
       |  FROM b),
       |chunks AS (
       |  SELECT doc_id, chunk, MIN(i) AS start, COUNT(*) AS len
       |  FROM ch GROUP BY 1, 2),
       |cmd AS (
       |  SELECT c.doc_id, c.chunk AS chunk_id,
       |    CAST(c.start AS BIGINT) AS start, c.len,
       |    md5(substring(d.text, CAST(c.start AS INT), CAST(c.len AS INT)))
       |      AS chunk_md5
       |  FROM chunks c JOIN docs d USING (doc_id))""".stripMargin
  }

  /** Content-defined chunk frame over (doc_id, text): 8-char base-31 rolling
    * hash ≡ 0 (mod 64) boundaries (see text_cdc_chunking), returning one row
    * per chunk with its md5 digest. Shared by the chunking query and the
    * CDC-based dedup. All windows partition by doc. */
  private def cdcChunks(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val p = 2147483647L
    val chars = docs.select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("i"),
        col("text"))
      .select(col("doc_id"), col("i"),
        ascii(expr("substring(text, cast(i as int), 1)")).as("a"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val hTerms = (0 until 8).map { k =>
      coalesce(lag(col("a"), k).over(w), lit(0)).cast("long") *
        lit(math.pow(31, k).toLong)
    }.reduceLeft(_ + _)
    val withH = chars.withColumn("h", hTerms % p)
      .withColumn("boundary",
        when(col("i") >= 8 && col("h") % 64 === 0, 1L).otherwise(0L))
      .withColumn("chunk", coalesce(sum(col("boundary")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    withH.groupBy(col("doc_id"), col("chunk"))
      .agg(min(col("i")).as("start"), count(lit(1)).as("len"))
      .join(docs, "doc_id")
      .select(col("doc_id"), col("chunk").as("chunk_id"),
        col("start").cast("long").as("start"), col("len"),
        md5(expr("substring(text, cast(start as int), cast(len as int))"))
          .as("chunk_md5"))
  }

  val queries: Seq[Q] = Seq(

    // Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
    // 1999 eq. 4.25) with fixed discount d=0.75 — the estimator behind KenLM
    // models used for CCNet perplexity filtering:
    //   P_KN(w2|w1) = (c(w1w2) − d)/c(w1·)
    //               + (d · N1+(w1·)/c(w1·)) · (N1+(·w2)/T)
    // where N1+ are distinct-continuation counts and T the number of distinct
    // bigram types (c ≥ 1 for every observed bigram, so max(c−d,0) = c−d).
    // All inputs are exact integer aggregations; the final expression is IEEE
    // double arithmetic in a parenthesization mirrored exactly in the oracle.
    // Scale shape: bigrams come from a per-doc window (no self-join); the
    // count tables shuffle on w1/w2/bigram keys; the scalar T joins as a
    // literal-sized cross (sanctioned aggregated-frame cross). Top-50 via
    // orderBy+limit (TakeOrdered).
    Q("text_kneser_ney_bigram",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"doc_id", posexplode(TF.tokens($"text")).as(Seq("pos", "w")))
        val big = toks
          .withColumn("w2",
            lead($"w", 1).over(Window.partitionBy($"doc_id").orderBy($"pos")))
          .filter($"w2".isNotNull)
          .select($"w".as("w1"), $"w2")
        val cBg = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_bg"))
        val cW1 = cBg.groupBy($"w1").agg(sum($"c_bg").as("c_w1"),
          count(lit(1)).as("n1_fwd"))
        val n1Bwd = cBg.groupBy($"w2").agg(count(lit(1)).as("n1_bwd"))
        val tTypes = cBg.agg(count(lit(1)).as("t_types"))
        cBg.join(cW1, "w1").join(n1Bwd, "w2").crossJoin(broadcast(tTypes))
          .select($"w1", $"w2", $"c_bg",
            ((($"c_bg".cast("double") - 0.75d) / $"c_w1".cast("double")) +
              (((lit(0.75d) * $"n1_fwd".cast("double")) /
                $"c_w1".cast("double")) *
                ($"n1_bwd".cast("double") / $"t_types".cast("double"))))
              .as("p_kn"))
          .orderBy($"c_bg".desc, $"w1", $"w2").limit(50)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(
             |      regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |      x -> x <> '')) AS w,
             |    generate_subscripts(list_filter(
             |      regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |      x -> x <> ''), 1) AS pos
             |  FROM documents),
             |big AS (
             |  SELECT w AS w1,
             |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |  FROM toks QUALIFY w2 IS NOT NULL),
             |c_bg AS (SELECT w1, w2, COUNT(*) AS c_bg FROM big GROUP BY 1, 2),
             |c_w1 AS (SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1,
             |           COUNT(*) AS n1_fwd FROM c_bg GROUP BY 1),
             |n1_bwd AS (SELECT w2, COUNT(*) AS n1_bwd FROM c_bg GROUP BY 1),
             |t_types AS (SELECT COUNT(*) AS t_types FROM c_bg)
             |SELECT b.w1, b.w2, b.c_bg,
             |  ((CAST(b.c_bg AS DOUBLE) - 0.75) / CAST(c.c_w1 AS DOUBLE)) +
             |  (((0.75 * CAST(c.n1_fwd AS DOUBLE)) / CAST(c.c_w1 AS DOUBLE)) *
             |    (CAST(n.n1_bwd AS DOUBLE) / CAST(t.t_types AS DOUBLE)))
             |    AS p_kn
             |FROM c_bg b
             |JOIN c_w1 c USING (w1)
             |JOIN n1_bwd n USING (w2)
             |CROSS JOIN t_types t
             |ORDER BY b.c_bg DESC, b.w1, b.w2 LIMIT 50""".stripMargin)),

    // Greedy k-center coreset selection (Gonzalez 1985, 2-approximation to the
    // k-center objective) — the geometry-coverage data-pruning pass: start
    // from vec_id 0, repeatedly add the candidate FARTHEST from the chosen
    // set, then assign every candidate to its nearest exemplar. Distances are
    // decimal-exact sums of squared double differences, so argmax/argmin ties
    // are exact (broken by vec_id). Scale shape: each of the k−1 rounds
    // broadcasts ONE new center's 64 components and keeps a running min — n·k
    // distance evaluations total, never the oracle's all-pairs matrix; the
    // per-round driver action is a single argmax row (k−1 rows total, the
    // Lloyd-iteration pattern). k and the candidate slice are fixtures; at
    // 100 TB candidates would be a per-shard sample feeding the same loop.
    Q("sample_kcenter_coreset",
      (s, dir) => {
        import s.implicits._
        val k = 4
        val flat = t(s, dir, "embeddings").filter($"vec_id" < 300)
          .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
          .select($"vec_id", $"pos", $"v".cast("double").as("v"))
        def d2To(center: Long) = {
          val cv = flat.filter($"vec_id" === center)
            .select($"pos", $"v".as("cv"))
          flat.join(broadcast(cv), "pos")
            .groupBy($"vec_id")
            .agg(sum((($"v" - $"cv") * ($"v" - $"cv")).cast(dec12)).as("d2"))
        }
        var centers = List(0L)
        var minD = d2To(0L)
        (1 until k).foreach { _ =>
          val next = minD.orderBy($"d2".desc, $"vec_id").head().getLong(0)
          centers = next :: centers
          minD = minD.join(d2To(next).withColumnRenamed("d2", "d2n"), "vec_id")
            .select($"vec_id", least($"d2", $"d2n").as("d2"))
        }
        val assign = centers.map { c =>
          d2To(c).withColumn("center", lit(c))
        }.reduce(_ unionByName _)
        assign
          .withColumn("rn", row_number().over(
            Window.partitionBy($"vec_id").orderBy($"d2", $"center")))
          .filter($"rn" === 1)
          .select($"vec_id", $"center",
            round($"d2".cast("double"), 9).as("d2"))
          .orderBy($"vec_id")
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings WHERE vec_id < 300),
             |d2 AS (
             |  SELECT a.vec_id AS x, b.vec_id AS c,
             |    SUM(CAST((a.v - b.v) * (a.v - b.v) AS DECIMAL(30,12))) AS d2
             |  FROM flat a JOIN flat b ON b.pos = a.pos
             |  GROUP BY 1, 2),
             |m1 AS (SELECT x, d2 FROM d2 WHERE c = 0),
             |c1 AS (SELECT x FROM m1 ORDER BY d2 DESC, x LIMIT 1),
             |m2 AS (SELECT m1.x, LEAST(m1.d2, d.d2) AS d2
             |       FROM m1 JOIN d2 d ON d.x = m1.x
             |         AND d.c = (SELECT x FROM c1)),
             |c2 AS (SELECT x FROM m2 ORDER BY d2 DESC, x LIMIT 1),
             |m3 AS (SELECT m2.x, LEAST(m2.d2, d.d2) AS d2
             |       FROM m2 JOIN d2 d ON d.x = m2.x
             |         AND d.c = (SELECT x FROM c2)),
             |c3 AS (SELECT x FROM m3 ORDER BY d2 DESC, x LIMIT 1),
             |cents AS (
             |  SELECT 0::BIGINT AS c UNION ALL SELECT x FROM c1
             |  UNION ALL SELECT x FROM c2 UNION ALL SELECT x FROM c3),
             |ranked AS (
             |  SELECT d.x, d.c, d.d2,
             |    row_number() OVER (PARTITION BY d.x ORDER BY d.d2, d.c) AS rn
             |  FROM d2 d JOIN cents ON cents.c = d.c)
             |SELECT x AS vec_id, c AS center,
             |  round(CAST(d2 AS DOUBLE), 9) AS d2
             |FROM ranked WHERE rn = 1 ORDER BY x""".stripMargin)),

    // Philips-robust-hash-style audio fingerprint: 40-sample analysis frames,
    // one bit per successive frame pair (1 iff energy increased), packed
    // little-endian into a BIGINT — the standard energy-delta sign signature
    // that survives volume scaling (energy deltas keep their sign under gain).
    // Pure integer compares and shifts, computed from the REAL decoded frames
    // of the gated corpus; the oracle re-derives every bit from the sample
    // formula. Map-only after the per-doc window; n_bits ≤ 31 so shifts never
    // approach either engine's sign-bit divergence.
    Q("multimodal_audio_fingerprint",
      (s, dir) => {
        import s.implicits._
        val frames = Multimodal.frameEnergies(s,
          Multimodal.syntheticGatedAudio(s,
            t(s, dir, "documents").filter($"doc_id" < 100)), frameLen = 40)
          .toDF()
        frames
          .withColumn("prev", lag($"energy", 1).over(
            Window.partitionBy($"doc_id").orderBy($"frame_idx")))
          .filter($"prev".isNotNull && $"frame_idx" <= 31)
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bits"),
            sum(when($"energy" > $"prev",
              expr("shiftleft(1L, cast(frame_idx - 1 as int))"))
              .otherwise(0L)).as("fp"))
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n
             |  FROM documents WHERE doc_id < 100),
             |sm AS (SELECT doc_id, unnest(range(0, (n // 40) * 40)) AS i
             |       FROM dims),
             |v AS (SELECT doc_id, i // 40 AS f,
             |        CASE WHEN (i // 200) % 3 = 2
             |          THEN ((doc_id*37 + i*13) % 2048 - 1024) // 16
             |          ELSE (doc_id*37 + i*13) % 2048 - 1024 END AS s
             |      FROM sm),
             |fe AS (SELECT doc_id, f, SUM(s * s) AS e FROM v GROUP BY 1, 2),
             |de AS (SELECT doc_id, f, e,
             |         lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe
             |       FROM fe)
             |SELECT doc_id, COUNT(*) AS n_bits,
             |  CAST(SUM(CASE WHEN e > pe
             |    THEN 1::BIGINT << CAST(f - 1 AS INT) ELSE 0 END) AS BIGINT)
             |    AS fp
             |FROM de WHERE pe IS NOT NULL AND f <= 31
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ViT-style patch extraction: decode → crop to whole 4×4 patches → per-
    // patch integer channel sums, the tokenization grid every vision
    // transformer consumes. Decode and patch reduction happen in ONE
    // partition-wise pass (no shuffle leaves the codec stage); the oracle
    // recomputes every patch from the (doc, x, y) pixel formula, so patch
    // addressing (crop bounds, row order, channel order) is hash-pinned.
    Q("multimodal_image_patches",
      (s, dir) => {
        import s.implicits._
        Multimodal.imagePatches(s,
            Multimodal.syntheticImages(s,
              t(s, dir, "documents").filter($"doc_id" < 60)), p = 4)
          .toDF()
          .select($"doc_id", $"py".cast("long").as("py"),
            $"px".cast("long").as("px"), $"n_px",
            $"sum_r", $"sum_g", $"sum_b")
          .orderBy($"doc_id", $"py", $"px")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
             |  FROM documents WHERE doc_id < 60),
             |xs AS (SELECT doc_id, h, unnest(range(0, (w // 4) * 4)) AS x
             |       FROM dims),
             |xy AS (SELECT doc_id, x, unnest(range(0, (h // 4) * 4)) AS y
             |       FROM xs),
             |v AS (SELECT doc_id, y // 4 AS py, x // 4 AS px,
             |        doc_id * 31 + x * 7 + y * 13 AS base
             |      FROM xy)
             |SELECT doc_id, py, px, COUNT(*) AS n_px,
             |  CAST(SUM(base % 256) AS BIGINT) AS sum_r,
             |  CAST(SUM((base + 101) % 256) AS BIGINT) AS sum_g,
             |  CAST(SUM((base + 202) % 256) AS BIGINT) AS sum_b
             |FROM v GROUP BY 1, 2, 3
             |ORDER BY doc_id, py, px""".stripMargin)),

    // Systematic (low-variance) importance resampling — the SELECTION step
    // after importance scoring (the resampler used by DSIR-style pipelines
    // and particle filters): m=50 evenly-spaced quantile positions
    // t_j = ⌊(2j+1)·W / 2m⌋ over the cumulative weight W, each picking the
    // document whose cumulative-weight interval contains it. Deterministic —
    // the "random" offset is pinned at the midpoint, and all positions are
    // integer arithmetic. Scale shape: the cumulative sum is the banded
    // two-level pattern (per-band sums + broadcast prefix offsets; the only
    // single-partition window runs over |bands| rows), and the 50-position
    // pick set is a bounded broadcast probed against each row's interval.
    Q("sample_systematic_importance",
      (s, dir) => {
        import s.implicits._
        val m = sysResampleM
        val docs = t(s, dir, "documents").select($"doc_id", $"n_chars".as("w"))
        val b = docs.withColumn("band", floor($"doc_id" / 64).cast("long"))
        val offs = b.groupBy($"band").agg(sum($"w").as("bw"))
          .withColumn("off", coalesce(sum($"bw").over(
            Window.orderBy($"band").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select($"band".as("jb"), $"off")
        val cum = b.join(broadcast(offs), $"band" === $"jb")
          .withColumn("cum", $"off" + sum($"w").over(
            Window.partitionBy($"band").orderBy($"doc_id")))
          .select($"doc_id", $"w", ($"cum" - $"w").as("cum_prev"), $"cum")
        val tot = docs.agg(sum($"w").as("W"))
        val th = s.range(m).select($"id".as("j"))
          .crossJoin(broadcast(tot))
          .select($"j", expr(s"((2*j + 1) * W) div ${2 * m}").as("t"))
        cum.join(broadcast(th), $"cum_prev" <= $"t" && $"t" < $"cum")
          .select($"j", $"t", $"doc_id", $"w")
          .orderBy($"j")
      },
      Some(s"""WITH w AS (SELECT doc_id, n_chars AS w FROM documents),
              |cum AS (SELECT doc_id, w,
              |          CAST(SUM(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum
              |        FROM w),
              |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS W FROM w),
              |th AS (SELECT j,
              |         ((2*j + 1) * (SELECT W FROM tot))
              |           // ${2 * sysResampleM} AS t
              |       FROM unnest(range(0, $sysResampleM)) u(j))
              |SELECT th.j, th.t, c.doc_id, c.w
              |FROM th JOIN cum c ON c.cum - c.w <= th.t AND th.t < c.cum
              |ORDER BY th.j""".stripMargin)),

    // First-occurrence n-gram novelty — the curriculum/diversity signal: what
    // fraction of a document's 3-shingles has never appeared in any earlier
    // document (corpus ordered by doc_id; "earlier" = smaller id)? One
    // shuffle on shingle computes each shingle's first-occurrence doc; docs
    // whose shingles are all inherited score 0. Integer counts + one IEEE
    // division. At 100 TB this is the same digest-keyed aggregation as exact
    // dedup — the first-occurrence table doubles as the dedup index.
    Q("text_ngram_novelty",
      (s, dir) => {
        import s.implicits._
        val sh = graft.llm.Dedup.shingleFrame(
          t(s, dir, "documents"), "doc_id", "text", 3)
        val first = sh.groupBy($"shingle").agg(min($"doc_id").as("first_doc"))
        sh.join(first, "shingle")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_sh"),
            sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
              .as("n_novel"))
          .select($"doc_id", $"n_sh", $"n_novel",
            ($"n_novel".cast("double") / $"n_sh".cast("double"))
              .as("novelty"))
          .orderBy($"doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(
             |    regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |    x -> x <> '') AS tk
             |  FROM documents),
             |shing AS (
             |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
             |    THEN list_distinct(list_transform(range(1, len(tk) - 1),
             |           i -> array_to_string(tk[i:i+2], ' ')))
             |    ELSE [] END) AS shingle
             |  FROM toks),
             |first AS (
             |  SELECT shingle, MIN(doc_id) AS first_doc FROM shing GROUP BY 1)
             |SELECT s.doc_id, COUNT(*) AS n_sh,
             |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_novel,
             |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
             |FROM shing s JOIN first f USING (shingle)
             |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin)),

    // Newman modularity of the label-propagation communities — the quality
    // score that tells you whether a community structure is real:
    // Q_c = w_in_c/2m − (d_c/2m)², summed over communities. Rebuilds the same
    // 3-day nation-trade graph and 3 LPA rounds as graph_label_propagation,
    // then scores the partition with exact integer edge weights and a pinned
    // IEEE expression. Scale shape: degree and within-community sums are
    // key-partitioned aggs; 2m joins as a sanctioned single-row scalar cross.
    Q("graph_modularity",
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
          .localCheckpoint()
        var labels = und.select($"u".as("node")).distinct()
          .withColumn("lbl", $"node")
        for (_ <- 1 to 3) {
          labels = und.join(labels, $"v" === $"node")
            .groupBy($"u", $"lbl").agg(sum($"w").as("wsum"))
            .groupBy($"u")
            .agg(min(struct((-$"wsum").as("nw"), $"lbl".as("l"))).as("m"))
            .select($"u".as("node"), $"m.l".as("lbl"))
        }
        val deg = und.groupBy($"u").agg(sum($"w").as("du"))
        val m2 = und.agg(sum($"w").as("m2"))
        val ein = und
          .join(labels.select($"node".as("u"), $"lbl".as("lu")), "u")
          .join(labels.select($"node".as("v"), $"lbl".as("lv")), "v")
          .filter($"lu" === $"lv")
          .groupBy($"lu".as("lbl")).agg(sum($"w").as("w_in"))
        deg.join(labels.select($"node".as("u"), $"lbl"), "u")
          .groupBy($"lbl")
          .agg(sum($"du").as("d_c"), count(lit(1)).as("n_nodes"))
          .join(ein, Seq("lbl"), "left")
          .crossJoin(broadcast(m2))
          .select($"lbl", $"n_nodes",
            coalesce($"w_in", lit(0L)).as("w_in"), $"d_c",
            ((coalesce($"w_in", lit(0L)).cast("double") /
              $"m2".cast("double")) -
              (($"d_c".cast("double") / $"m2".cast("double")) *
                ($"d_c".cast("double") / $"m2".cast("double"))))
              .as("q_contrib"))
          .orderBy($"lbl")
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
           |${(1 to 3).map(round).mkString(",\n")},
           |deg AS (SELECT u, CAST(SUM(w) AS BIGINT) AS du FROM und GROUP BY 1),
           |m2 AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM und),
           |ein AS (
           |  SELECT la.lbl, CAST(SUM(e.w) AS BIGINT) AS w_in
           |  FROM und e
           |  JOIN l3 la ON la.node = e.u
           |  JOIN l3 lb ON lb.node = e.v
           |  WHERE la.lbl = lb.lbl GROUP BY 1),
           |dc AS (
           |  SELECT l.lbl, CAST(SUM(d.du) AS BIGINT) AS d_c,
           |    COUNT(*) AS n_nodes
           |  FROM deg d JOIN l3 l ON l.node = d.u GROUP BY 1)
           |SELECT dc.lbl, dc.n_nodes,
           |  COALESCE(ein.w_in, 0) AS w_in, dc.d_c,
           |  (CAST(COALESCE(ein.w_in, 0) AS DOUBLE) /
           |    CAST(m2.m2 AS DOUBLE)) -
           |  ((CAST(dc.d_c AS DOUBLE) / CAST(m2.m2 AS DOUBLE)) *
           |    (CAST(dc.d_c AS DOUBLE) / CAST(m2.m2 AS DOUBLE))) AS q_contrib
           |FROM dc LEFT JOIN ein USING (lbl) CROSS JOIN m2
           |ORDER BY dc.lbl""".stripMargin
      }),

    // Exact audience overlap — the set-intersection statistic theta sketches
    // approximate, computed exactly: for every pair of event types, the number
    // of users who did both, plus the Jaccard overlap of the audiences. The
    // self-join keys on user_id (the natural shuffle key: at 100 TB each user
    // bucket holds that user's type set, and the pair explosion is bounded by
    // types-per-user², not corpus size). Jaccard is one IEEE division of two
    // exact integers.
    Q("agg_audience_overlap",
      (s, dir) => {
        import s.implicits._
        val tu = t(s, dir, "events")
          .select($"event_type", $"user_id").distinct()
        val sizes = tu.groupBy($"event_type").agg(count(lit(1)).as("n"))
        tu.as("a").join(tu.as("b"),
            $"a.user_id" === $"b.user_id" &&
              $"a.event_type" < $"b.event_type")
          .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select($"event_type".as("type_a"),
            $"n".as("n_a"))), "type_a")
          .join(broadcast(sizes.select($"event_type".as("type_b"),
            $"n".as("n_b"))), "type_b")
          .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both",
            ($"n_both".cast("double") /
              ($"n_a" + $"n_b" - $"n_both").cast("double")).as("jaccard"))
          .orderBy($"type_a", $"type_b")
      },
      Some("""WITH tu AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
             |pairs AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    COUNT(*) AS n_both
             |  FROM tu a JOIN tu b ON b.user_id = a.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
             |  CAST(p.n_both AS DOUBLE) /
             |    CAST(sa.n + sb.n - p.n_both AS DOUBLE) AS jaccard
             |FROM pairs p
             |JOIN sizes sa ON sa.event_type = p.type_a
             |JOIN sizes sb ON sb.event_type = p.type_b
             |ORDER BY p.type_a, p.type_b""".stripMargin)),

    // Holt linear-trend smoothing (double exponential smoothing, α=0.5 β=0.3)
    // over each user's daily value series — the trend-aware upgrade of the
    // finite-tap EWMA already in Analytics: level and trend update
    // recursively, so the batch implementation is a typed mapGroups (shuffle
    // by user, one ordered pass per bounded series — the batch analogue of
    // the streaming state operator), and the oracle is a recursive CTE
    // stepping the SAME IEEE arithmetic in the same order. Daily inputs go
    // through decimal-exact sums before entering the recursion, so both
    // engines recurse on identical doubles. Users need ≥ 2 days (trend init
    // b₁ = v₂ − v₁); forecast is the 1-step-ahead level + trend.
    Q("events_holt_linear",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy($"user_id", date_format(date_trunc("day", $"ts"),
            "yyyy-MM-dd").as("day"))
          .agg(dsum($"value").as("v"))
          .select($"user_id".as[Long], $"day".as[String], $"v".as[Double])
          .as[(Long, String, Double)]
        daily.groupByKey(_._1)
          .flatMapGroups { (uid, it) =>
            val vs = it.toArray.sortBy(_._2).map(_._3)
            if (vs.length < 2) Iterator.empty
            else {
              var l = vs(0)
              var b = vs(1) - vs(0)
              var i = 1
              while (i < vs.length) {
                val lNew = 0.5 * vs(i) + 0.5 * (l + b)
                b = 0.3 * (lNew - l) + 0.7 * b
                l = lNew
                i += 1
              }
              Iterator.single((uid, vs.length.toLong, l, b, l + b))
            }
          }
          .toDF("user_id", "n_days", "level", "trend", "forecast")
          .orderBy($"user_id")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT user_id, date_trunc('day', ts) AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT user_id, v,
             |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
             |  FROM daily),
             |nn AS (SELECT user_id, MAX(rn) AS n FROM idx GROUP BY 1),
             |h AS (
             |  SELECT i1.user_id, 1 AS rn, i1.v AS l, i2.v - i1.v AS b
             |  FROM idx i1 JOIN idx i2
             |    ON i2.user_id = i1.user_id AND i2.rn = 2
             |  WHERE i1.rn = 1
             |  UNION ALL
             |  SELECT h.user_id, h.rn + 1,
             |    0.5 * i.v + 0.5 * (h.l + h.b),
             |    0.3 * ((0.5 * i.v + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
             |  FROM h JOIN idx i
             |    ON i.user_id = h.user_id AND i.rn = h.rn + 1)
             |SELECT h.user_id, CAST(nn.n AS BIGINT) AS n_days, h.l AS level,
             |  h.b AS trend, h.l + h.b AS forecast
             |FROM h JOIN nn ON nn.user_id = h.user_id AND h.rn = nn.n
             |ORDER BY h.user_id""".stripMargin)),

    // Corpus normalization constants — the per-channel mean/std every vision
    // pipeline bakes into its input transform (the "ImageNet stats" pass).
    // Decode emits per-image integer (sum, sum-of-squares) partials in the
    // codec stage; the corpus-wide reduction is a single bounded-state agg
    // (3 channels regardless of corpus size — the mergeable-partials shape).
    // mean and variance are single IEEE divisions of exact integers
    // (var = (n·Σx² − (Σx)²)/n², all < 2⁵³); std is IEEE sqrt (correctly
    // rounded by the standard, unlike libm trig — engine-stable).
    Q("multimodal_image_normalize_stats",
      (s, dir) => {
        import s.implicits._
        val cs = Multimodal.channelStats(s,
          Multimodal.syntheticImages(s,
            t(s, dir, "documents").filter($"doc_id" < 60))).toDF()
        val tot = cs.agg(sum($"n_px").as("n"),
          sum($"sum_r").as("s_r"), sum($"sq_r").as("q_r"),
          sum($"sum_g").as("s_g"), sum($"sq_g").as("q_g"),
          sum($"sum_b").as("s_b"), sum($"sq_b").as("q_b"))
        tot.select(explode(array(
            struct(lit("b").as("channel"), $"n", $"s_b".as("s"), $"q_b".as("q")),
            struct(lit("g").as("channel"), $"n", $"s_g".as("s"), $"q_g".as("q")),
            struct(lit("r").as("channel"), $"n", $"s_r".as("s"), $"q_r".as("q"))
          )).as("c"))
          .select($"c.channel".as("channel"), $"c.n".as("n_px"),
            $"c.s".as("sum_v"), $"c.q".as("sum_sq"),
            ($"c.s".cast("double") / $"c.n".cast("double")).as("mean_px"),
            ((($"c.n" * $"c.q" - $"c.s" * $"c.s").cast("double")) /
              (($"c.n" * $"c.n").cast("double"))).as("var_px"),
            sqrt((($"c.n" * $"c.q" - $"c.s" * $"c.s").cast("double")) /
              (($"c.n" * $"c.n").cast("double"))).as("std_px"))
          .orderBy($"channel")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
             |  FROM documents WHERE doc_id < 60),
             |xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
             |xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
             |px AS (SELECT doc_id * 31 + x * 7 + y * 13 AS base FROM xy),
             |vals AS (
             |  SELECT 'r' AS channel, base % 256 AS v FROM px
             |  UNION ALL SELECT 'g', (base + 101) % 256 FROM px
             |  UNION ALL SELECT 'b', (base + 202) % 256 FROM px),
             |agg AS (
             |  SELECT channel, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
             |    CAST(SUM(v * v) AS BIGINT) AS q
             |  FROM vals GROUP BY 1)
             |SELECT channel, n AS n_px, s AS sum_v, q AS sum_sq,
             |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_px,
             |  CAST(n * q - s * s AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_px,
             |  sqrt(CAST(n * q - s * s AS DOUBLE) / CAST(n * n AS DOUBLE))
             |    AS std_px
             |FROM agg ORDER BY channel""".stripMargin)),

    // Degree assortativity (Newman 2002) of the nation-trade graph: Pearson
    // correlation of endpoint degrees over the directed edge list — positive
    // when hubs link hubs. All five moment sums are exact integers (degrees
    // are counts); the coefficient is one pinned IEEE expression with sqrt
    // (correctly rounded, engine-stable) and a zero-variance NULL guard.
    // Scale shape: degree table joins to the edge list on each endpoint
    // (key-partitioned), moments reduce map-side to one row.
    Q("graph_assortativity",
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
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y")).distinct()
        val edges = raw.select($"x".as("u"), $"y".as("v"))
          .unionByName(raw.select($"y".as("u"), $"x".as("v")))
          .distinct()
        val deg = edges.groupBy($"u").agg(count(lit(1)).as("d"))
        val m = edges
          .join(deg.select($"u", $"d".as("du")), "u")
          .join(deg.select($"u".as("v"), $"d".as("dv")), "v")
          .agg(count(lit(1)).as("m"),
            sum($"du").as("sx"), sum($"dv").as("sy"),
            sum($"du" * $"du").as("sxx"), sum($"dv" * $"dv").as("syy"),
            sum($"du" * $"dv").as("sxy"))
        m.select($"m".as("n_edges"),
            when(($"m" * $"sxx" - $"sx" * $"sx") > 0 &&
              ($"m" * $"syy" - $"sy" * $"sy") > 0,
              (($"m" * $"sxy" - $"sx" * $"sy").cast("double")) /
                (sqrt(($"m" * $"sxx" - $"sx" * $"sx").cast("double")) *
                  sqrt(($"m" * $"syy" - $"sy" * $"sy").cast("double"))))
              .as("assortativity"))
      },
      Some("""WITH raw AS (
             |  SELECT DISTINCT c_nationkey AS x, s_nationkey AS y
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |    AND l_shipdate >= TIMESTAMP '1997-06-01'
             |    AND l_shipdate <  TIMESTAMP '1997-06-04'),
             |edges AS (
             |  SELECT DISTINCT u, v FROM (
             |    SELECT x AS u, y AS v FROM raw
             |    UNION ALL SELECT y, x FROM raw)),
             |deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY 1),
             |mm AS (
             |  SELECT COUNT(*) AS m,
             |    CAST(SUM(a.d) AS BIGINT) AS sx, CAST(SUM(b.d) AS BIGINT) AS sy,
             |    CAST(SUM(a.d * a.d) AS BIGINT) AS sxx,
             |    CAST(SUM(b.d * b.d) AS BIGINT) AS syy,
             |    CAST(SUM(a.d * b.d) AS BIGINT) AS sxy
             |  FROM edges e JOIN deg a ON a.u = e.u JOIN deg b ON b.u = e.v)
             |SELECT m AS n_edges,
             |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
             |    THEN CAST(m * sxy - sx * sy AS DOUBLE) /
             |      (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
             |        sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
             |  END AS assortativity
             |FROM mm""".stripMargin)),

    // Frame-delta shot detection over the multi-frame (video-shaped) corpus:
    // consecutive-frame |Δsum_r| per doc, boundary wherever the delta exceeds
    // the doc's mean delta — SELF-CALIBRATING (a strict max>mean comparison
    // always fires unless every delta is equal), and the compare is
    // cross-multiplied to stay in integers (delta·n > Σdelta). The container
    // walk, per-frame decode, and windowed delta all run partitioned by doc.
    Q("multimodal_video_shot_detect",
      (s, dir) => {
        import s.implicits._
        val ff = Multimodal.frameSample(s,
            Multimodal.syntheticVideos(s,
              t(s, dir, "documents").filter($"doc_id" < 100)), everyK = 1)
          .toDF()
        val deltas = ff
          .withColumn("prev", lag($"sum_r", 1).over(
            Window.partitionBy($"doc_id").orderBy($"frame_idx")))
          .filter($"prev".isNotNull)
          .select($"doc_id", $"frame_idx", abs($"sum_r" - $"prev").as("delta"))
        val per = deltas.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_deltas"), sum($"delta").as("sum_delta"))
        deltas.join(per, "doc_id")
          .filter($"delta" * $"n_deltas" > $"sum_delta")
          .select($"doc_id", $"frame_idx".cast("long").as("boundary_frame"),
            $"delta", $"n_deltas")
          .orderBy($"doc_id", $"boundary_frame")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 12 + doc_id % 6 AS w, 10 + doc_id % 5 AS h,
             |    3 + doc_id % 4 AS nf
             |  FROM documents WHERE doc_id < 100),
             |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM dims),
             |xs AS (SELECT doc_id, h, f, unnest(range(0, w)) AS x FROM fr),
             |xy AS (SELECT doc_id, f, x, unnest(range(0, h)) AS y FROM xs),
             |sums AS (
             |  SELECT doc_id, f,
             |    SUM((doc_id * 31 + f * 17 + x * 7 + y * 13) % 256) AS sum_r
             |  FROM xy GROUP BY 1, 2),
             |deltas AS (
             |  SELECT doc_id, f, abs(sum_r -
             |    lag(sum_r) OVER (PARTITION BY doc_id ORDER BY f)) AS delta
             |  FROM sums QUALIFY delta IS NOT NULL),
             |per AS (
             |  SELECT doc_id, COUNT(*) AS n_deltas,
             |    CAST(SUM(delta) AS BIGINT) AS sum_delta
             |  FROM deltas GROUP BY 1)
             |SELECT d.doc_id, d.f AS boundary_frame,
             |  CAST(d.delta AS BIGINT) AS delta, p.n_deltas
             |FROM deltas d JOIN per p USING (doc_id)
             |WHERE d.delta * p.n_deltas > p.sum_delta
             |ORDER BY d.doc_id, d.f""".stripMargin)),

    // Difference-in-differences — the workhorse causal estimate next to the
    // Welch/CUPED tests already in EventsQ: treated = even user_ids (fixture
    // split), post = on/after the series midpoint (2024-01-16), outcome =
    // group mean value. All four cell means are decimal-exact sums divided
    // once (IEEE), and the DiD double-difference is a pinned expression.
    // One shuffle (4-cell groupBy with map-side partials), then a scalar
    // pivot — bounded state at any scale.
    Q("events_did_estimate",
      (s, dir) => {
        import s.implicits._
        val cells = t(s, dir, "events")
          .select(($"user_id" % 2 === 0).as("treated"),
            ($"ts" >= lit("2024-01-16").cast("timestamp")).as("post"),
            $"value")
          .groupBy($"treated", $"post")
          .agg(davg($"value").as("mean_v"), count(lit(1)).as("n"))
        cells.agg(
            max(when($"treated" && !$"post", $"mean_v")).as("t_pre"),
            max(when($"treated" && $"post", $"mean_v")).as("t_post"),
            max(when(!$"treated" && !$"post", $"mean_v")).as("c_pre"),
            max(when(!$"treated" && $"post", $"mean_v")).as("c_post"),
            sum($"n").as("n_events"))
          .select($"n_events", $"t_pre", $"t_post", $"c_pre", $"c_post",
            (($"t_post" - $"t_pre") - ($"c_post" - $"c_pre")).as("did"))
      },
      Some(s"""WITH cells AS (
              |  SELECT user_id % 2 = 0 AS treated,
              |    ts >= TIMESTAMP '2024-01-16' AS post,
              |    ${sqlDavg("value")} AS mean_v, COUNT(*) AS n
              |  FROM events GROUP BY 1, 2)
              |SELECT CAST(SUM(n) AS BIGINT) AS n_events,
              |  MAX(CASE WHEN treated AND NOT post THEN mean_v END) AS t_pre,
              |  MAX(CASE WHEN treated AND post THEN mean_v END) AS t_post,
              |  MAX(CASE WHEN NOT treated AND NOT post THEN mean_v END)
              |    AS c_pre,
              |  MAX(CASE WHEN NOT treated AND post THEN mean_v END) AS c_post,
              |  (MAX(CASE WHEN treated AND post THEN mean_v END) -
              |   MAX(CASE WHEN treated AND NOT post THEN mean_v END)) -
              |  (MAX(CASE WHEN NOT treated AND post THEN mean_v END) -
              |   MAX(CASE WHEN NOT treated AND NOT post THEN mean_v END))
              |    AS did
              |FROM cells""".stripMargin)),

    // IVF list-balance audit — the production health check for a coarse-
    // quantized ANN index (one hot list and probe latency collapses to
    // brute force on it). Assignment here is DECIMAL-EXACT (score
    // ‖c‖² − 2⟨v,c⟩ via vec_dot_exact, ties to the lower list id), so unlike
    // the float-dot ivf search rows (rows-only by design) the audit itself is
    // hash-checked. The 16-entry centroid set is a bounded broadcast; load
    // factor is one IEEE division per list.
    Q("embed_ivf_balance",
      (s, dir) => {
        import s.implicits._
        import graft.functions.VectorFunctions.vec_dot_exact
        val vecs = t(s, dir, "embeddings")
        val cents = vecs.filter($"vec_id" < 16)
          .select($"vec_id".cast("int").as("list_id"),
            $"embedding".as("cent"))
          .withColumn("cself", vec_dot_exact($"cent", $"cent"))
        val assigned = vecs.crossJoin(broadcast(cents))
          .withColumn("score",
            $"cself" - lit(2.0d) * vec_dot_exact($"embedding", $"cent"))
          .groupBy($"vec_id")
          .agg(min(struct($"score", $"list_id")).as("b"))
          .select($"vec_id", $"b.list_id".as("list_id"))
        val tot = assigned.agg(count(lit(1)).as("n_total"))
        assigned.groupBy($"list_id").agg(count(lit(1)).as("n_vecs"))
          .crossJoin(broadcast(tot))
          .select($"list_id", $"n_vecs",
            (($"n_vecs" * 16).cast("double") / $"n_total".cast("double"))
              .as("load_factor"))
          .orderBy($"list_id")
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |cb AS (SELECT vec_id AS list_id, pos, v AS cval FROM flat
             |       WHERE vec_id < 16),
             |cself AS (
             |  SELECT list_id,
             |    CAST(SUM(CAST(cval * cval AS DECIMAL(30,12))) AS DOUBLE) AS cs
             |  FROM cb GROUP BY 1),
             |dots AS (
             |  SELECT f.vec_id, c.list_id,
             |    CAST(SUM(CAST(f.v * c.cval AS DECIMAL(30,12))) AS DOUBLE)
             |      AS dot
             |  FROM flat f JOIN cb c ON c.pos = f.pos GROUP BY 1, 2),
             |assigned AS (
             |  SELECT vec_id, CAST(list_id AS INT) AS list_id FROM (
             |    SELECT d.vec_id, d.list_id,
             |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
             |        ORDER BY cs - 2.0 * dot, d.list_id) AS rn
             |    FROM dots d JOIN cself USING (list_id)) x
             |  WHERE rn = 1),
             |tot AS (SELECT COUNT(*) AS n_total FROM assigned)
             |SELECT list_id, COUNT(*) AS n_vecs,
             |  CAST(COUNT(*) * 16 AS DOUBLE) /
             |    CAST((SELECT n_total FROM tot) AS DOUBLE) AS load_factor
             |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Audio SNR gate — the speech-data quality filter next to the VAD: per
    // doc, compare mean active-frame energy to mean quiet-frame energy and
    // keep only records where the signal clears 16× the noise floor. The
    // compare is integer cross-multiplied (e_act·n_quiet > 16·e_quiet·n_act):
    // no float division anywhere, and an all-active record (no noise floor
    // observed) passes by convention. Same codec-stage frame reduction as
    // the VAD — one partition-wise pass then a per-doc agg.
    Q("multimodal_audio_snr_gate",
      (s, dir) => {
        import s.implicits._
        val frames = Multimodal.frameEnergies(s,
          Multimodal.syntheticGatedAudio(s,
            t(s, dir, "documents").filter($"doc_id" < 100)), frameLen = 160)
          .toDF()
        frames
          .withColumn("active", $"energy" > 28000000L)
          .groupBy($"doc_id")
          .agg(sum(when($"active", 1L).otherwise(0L)).as("n_active"),
            sum(when(!$"active", 1L).otherwise(0L)).as("n_quiet"),
            sum(when($"active", $"energy").otherwise(0L)).as("e_active"),
            sum(when(!$"active", $"energy").otherwise(0L)).as("e_quiet"))
          .select($"doc_id", $"n_active", $"n_quiet", $"e_active", $"e_quiet",
            (($"n_quiet" === 0 && $"n_active" > 0) ||
              $"e_active" * $"n_quiet" > lit(16L) * $"e_quiet" * $"n_active")
              .as("keep"))
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n
             |  FROM documents WHERE doc_id < 100),
             |sm AS (SELECT doc_id, unnest(range(0, (n // 160) * 160)) AS i
             |       FROM dims),
             |v AS (SELECT doc_id, i // 160 AS f,
             |        CASE WHEN (i // 200) % 3 = 2
             |          THEN ((doc_id*37 + i*13) % 2048 - 1024) // 16
             |          ELSE (doc_id*37 + i*13) % 2048 - 1024 END AS s
             |      FROM sm),
             |fe AS (SELECT doc_id, f, SUM(s * s) AS energy
             |       FROM v GROUP BY 1, 2)
             |SELECT doc_id,
             |  CAST(SUM(CASE WHEN energy > 28000000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_active,
             |  CAST(SUM(CASE WHEN energy <= 28000000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_quiet,
             |  CAST(SUM(CASE WHEN energy > 28000000 THEN energy ELSE 0 END)
             |    AS BIGINT) AS e_active,
             |  CAST(SUM(CASE WHEN energy <= 28000000 THEN energy ELSE 0 END)
             |    AS BIGINT) AS e_quiet,
             |  (SUM(CASE WHEN energy <= 28000000 THEN 1 ELSE 0 END) = 0
             |     AND SUM(CASE WHEN energy > 28000000 THEN 1 ELSE 0 END) > 0)
             |  OR (SUM(CASE WHEN energy > 28000000 THEN energy ELSE 0 END) *
             |      SUM(CASE WHEN energy <= 28000000 THEN 1 ELSE 0 END) >
             |      16 * SUM(CASE WHEN energy <= 28000000 THEN energy ELSE 0 END) *
             |      SUM(CASE WHEN energy > 28000000 THEN 1 ELSE 0 END)) AS keep
             |FROM fe GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Balanced class downsampling — equalize per-language doc counts to the
    // minority class (the classic class-balancing pass before training a
    // classifier): rank docs within each language by a deterministic md5
    // shuffle key and keep the first min-class-count of each. Windows
    // partition by language (parallel); the min class size joins as a
    // bounded scalar broadcast. The md5 order stands in for the RNG — same
    // no-RNG-state rule as every sampling query in the corpus.
    Q("sample_balanced_downsample",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"lang")
        val minN = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
          .agg(min($"n").as("min_n"))
        docs
          .withColumn("rk", row_number().over(
            Window.partitionBy($"lang")
              .orderBy(md5($"doc_id".cast("string")), $"doc_id")))
          .crossJoin(broadcast(minN))
          .filter($"rk" <= $"min_n")
          .select($"lang", $"doc_id", $"rk".cast("long").as("rk"))
          .orderBy($"lang", $"rk")
      },
      Some("""WITH minn AS (
             |  SELECT MIN(n) AS min_n FROM (
             |    SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1)),
             |ranked AS (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |SELECT lang, doc_id, rk FROM ranked
             |WHERE rk <= (SELECT min_n FROM minn)
             |ORDER BY lang, rk""".stripMargin)),

    // Stationary distribution of the event-type Markov chain (4 synchronous
    // power-iteration rounds over the transition matrix the
    // events_markov_transitions query estimates) — "where does user behavior
    // settle". Each round is π_j ← Σ_i π_i·(n_ij/n_i): the per-term double is
    // a pinned IEEE expression, and the cross-state sum goes through DECIMAL
    // (scale 12 — coarser than the ulp at |π|≤1, so the double→decimal cast
    // is engine-stable per the QueryDSL boundary rule) to stay partitioning-
    // independent. The K×K matrix is bounded (event-type vocabulary), so at
    // any corpus scale the iteration is K² work after one count shuffle.
    Q("events_markov_stationary",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val trans = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type".as("i"), $"event_type".as("j"))
          .agg(count(lit(1)).as("n_ij"))
        val rowTot = trans.groupBy($"i").agg(sum($"n_ij").as("n_i"))
        val p = trans.join(rowTot, "i").localCheckpoint()
        val k = p.select($"i").distinct().count()
        var pi = p.select($"i".as("state")).distinct()
          .withColumn("pi", lit(1.0d) / lit(k.toDouble))
        (1 to 4).foreach { _ =>
          pi = p.join(pi, $"i" === $"state")
            .withColumn("term", ($"pi" * $"n_ij".cast("double")) /
              $"n_i".cast("double"))
            .groupBy($"j".as("state2"))
            .agg(sum($"term".cast("decimal(30,12)")).cast("double").as("pi"))
            .select($"state2".as("state"), $"pi")
        }
        pi.orderBy($"state")
      },
      Some {
        val round = (r: Int) =>
          s"""pi$r AS (
             |  SELECT p.j AS state,
             |    CAST(SUM(CAST((q.pi * n_ij) / n_i AS DECIMAL(30,12)))
             |      AS DOUBLE) AS pi
             |  FROM p JOIN pi${r - 1} q ON q.state = p.i
             |  GROUP BY 1)""".stripMargin
        s"""WITH t AS (
           |  SELECT event_type,
           |    lag(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS prev_type
           |  FROM events),
           |trans AS (
           |  SELECT prev_type AS i, event_type AS j, COUNT(*) AS n_ij
           |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
           |p AS (
           |  SELECT trans.i, trans.j, CAST(n_ij AS DOUBLE) AS n_ij,
           |    CAST(rt.n_i AS DOUBLE) AS n_i
           |  FROM trans JOIN (
           |    SELECT i, SUM(n_ij) AS n_i FROM trans GROUP BY 1) rt
           |    ON rt.i = trans.i),
           |kk AS (SELECT COUNT(DISTINCT i) AS k FROM p),
           |pi0 AS (
           |  SELECT DISTINCT i AS state,
           |    CAST(1 AS DOUBLE) / CAST((SELECT k FROM kk) AS DOUBLE) AS pi
           |  FROM p),
           |${(1 to 4).map(round).mkString(",\n")}
           |SELECT state, pi FROM pi4 ORDER BY state""".stripMargin
      }),

    // Feature-hash collision audit: how many distinct 3-shingle features
    // share each cell of a 256-bucket hash space, as a collision histogram
    // (k features/bucket → bucket count). The diagnostic every hashed-
    // feature pipeline runs before trusting bucket counts as feature
    // statistics. Shingles (not unigrams — the synthetic corpus has only ~31
    // distinct tokens, which would make the audit vacuous) give a feature
    // vocabulary ≫ the bucket space, so real collisions are guaranteed at
    // any SF. Two bounded aggs after the feature-vocabulary shuffle.
    Q("text_hash_collision_audit",
      (s, dir) => {
        import s.implicits._
        val vocab = graft.llm.Dedup.shingleFrame(
            t(s, dir, "documents"), "doc_id", "text", 3)
          .select($"shingle").distinct()
        val perBucket = vocab
          .select((conv(substring(md5($"shingle"), 1, 12), 16, 10)
            .cast("long") % 256L).as("bucket"))
          .groupBy($"bucket").agg(count(lit(1)).as("n_feats"))
        perBucket.groupBy($"n_feats".as("feats_in_bucket"))
          .agg(count(lit(1)).as("n_buckets"))
          .orderBy($"feats_in_bucket")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, list_filter(
              |    regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'),
              |    x -> x <> '') AS tk
              |  FROM documents),
              |vocab AS (
              |  SELECT DISTINCT unnest(CASE WHEN len(tk) >= 3
              |    THEN list_distinct(list_transform(range(1, len(tk) - 1),
              |           i -> array_to_string(tk[i:i+2], ' ')))
              |    ELSE [] END) AS shingle
              |  FROM toks),
              |pb AS (
              |  SELECT (${QueryDSL.sqlHexInt("md5(shingle)", 1, 12)}) % 256
              |      AS bucket,
              |    COUNT(*) AS n_feats
              |  FROM vocab GROUP BY 1)
              |SELECT n_feats AS feats_in_bucket, COUNT(*) AS n_buckets
              |FROM pb GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Kaplan-Meier time-to-conversion WITH administrative right-censoring:
    // duration = days from a user's first event to their first 'purchase',
    // observed under a 3-day follow-up horizon — converts within horizon =
    // death at t, otherwise censored at day 3 (every user converts EVENTUALLY
    // in this corpus, so the horizon is what makes censoring real at every
    // SF). The KM estimate handles those censored users correctly, vs the
    // naive conversion rates already in EventsQ. Lifetimes reduce per-user;
    // the KM product runs over the BOUNDED duration frame (≤ horizon days)
    // via a typed single-group fold — the sanctioned aggregated-frame shape,
    // not a corpus-sized single-partition window. The survival recursion
    // multiplies pinned IEEE factors (n−d)/n in duration order; the oracle's
    // recursive CTE steps the same arithmetic (multiplying by an exact 1.0
    // on death-free rows, which is bit-identity).
    Q("events_survival_km",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
        val firsts = ev.groupBy($"user_id").agg(min($"ts").as("first_ts"))
        val conv = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id").agg(min($"ts").as("p_ts"))
        val per = firsts.join(conv, Seq("user_id"), "left")
          .select($"user_id",
            datediff(to_date($"p_ts"), to_date($"first_ts")).as("t_p"))
          .select($"user_id",
            when($"t_p".isNotNull && $"t_p" <= 3, $"t_p").otherwise(lit(3))
              .as("dur"),
            (!($"t_p".isNotNull && $"t_p" <= 3)).as("censored"))
        val byDur = per.groupBy($"dur")
          .agg(count(lit(1)).as("n_total"),
            sum(when(!$"censored", 1L).otherwise(0L)).as("d"))
          .select($"dur".as[Int], $"n_total".as[Long], $"d".as[Long])
        byDur.groupByKey(_ => 0)
          .flatMapGroups { (_, it) =>
            val rows = it.toArray.sortBy(_._1)
            var atRisk = rows.map(_._2).sum
            var surv = 1.0d
            rows.iterator.flatMap { case (dur, nTotal, d) =>
              val nI = atRisk
              val factor =
                if (d > 0) (nI - d).toDouble / nI.toDouble else 1.0d
              surv = surv * factor
              atRisk -= nTotal
              if (d > 0) Iterator.single((dur.toLong, nI, d, surv))
              else Iterator.empty
            }
          }
          .toDF("duration_days", "n_at_risk", "n_deaths", "survival")
          .orderBy($"duration_days")
      },
      Some("""WITH RECURSIVE f AS (
             |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
             |c AS (
             |  SELECT user_id, min(ts) AS p_ts FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1),
             |tp AS (
             |  SELECT f.user_id,
             |    date_diff('day', CAST(f.first_ts AS DATE),
             |      CAST(c.p_ts AS DATE)) AS t_p
             |  FROM f LEFT JOIN c USING (user_id)),
             |per AS (
             |  SELECT user_id,
             |    CASE WHEN t_p IS NOT NULL AND t_p <= 3 THEN t_p ELSE 3 END
             |      AS dur,
             |    NOT (t_p IS NOT NULL AND t_p <= 3) AS censored
             |  FROM tp),
             |byd AS (
             |  SELECT dur, COUNT(*) AS n_total,
             |    SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS d
             |  FROM per GROUP BY 1),
             |ord AS (
             |  SELECT dur, n_total, d,
             |    row_number() OVER (ORDER BY dur) AS rn,
             |    (SELECT COUNT(*) FROM per) -
             |      COALESCE(CAST(SUM(n_total) OVER (ORDER BY dur
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |        AS BIGINT), 0) AS at_risk
             |  FROM byd),
             |km AS (
             |  SELECT dur, rn, at_risk, d,
             |    CASE WHEN d > 0
             |      THEN CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE)
             |      ELSE CAST(1 AS DOUBLE) END AS s
             |  FROM ord WHERE rn = 1
             |  UNION ALL
             |  SELECT o.dur, o.rn, o.at_risk, o.d,
             |    km.s * (CASE WHEN o.d > 0
             |      THEN CAST(o.at_risk - o.d AS DOUBLE) /
             |        CAST(o.at_risk AS DOUBLE)
             |      ELSE CAST(1 AS DOUBLE) END)
             |  FROM km JOIN ord o ON o.rn = km.rn + 1)
             |SELECT CAST(dur AS BIGINT) AS duration_days,
             |  at_risk AS n_at_risk, CAST(d AS BIGINT) AS n_deaths,
             |  s AS survival
             |FROM km WHERE d > 0 ORDER BY dur""".stripMargin)),

    // Corpus pixel histogram (16 equal bins per channel) — the exposure/
    // clipping QA pass of an image pipeline. The decoder emits bounded
    // (channel, bin, cnt) partials per record; the corpus reduction is a
    // 48-cell bounded-state agg. Exact integer counts, formula-checked.
    Q("multimodal_image_histogram",
      (s, dir) => {
        import s.implicits._
        Multimodal.channelHistogram(s,
            Multimodal.syntheticImages(s,
              t(s, dir, "documents").filter($"doc_id" < 60)), bins = 16)
          .toDF("doc_id", "channel", "bin", "cnt")
          .groupBy($"channel", $"bin".cast("long").as("bin"))
          .agg(sum($"cnt").as("n_px"))
          .orderBy($"channel", $"bin")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
             |  FROM documents WHERE doc_id < 60),
             |xs AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM dims),
             |xy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM xs),
             |px AS (SELECT doc_id * 31 + x * 7 + y * 13 AS base FROM xy),
             |vals AS (
             |  SELECT 'r' AS channel, (base % 256) // 16 AS bin FROM px
             |  UNION ALL SELECT 'g', ((base + 101) % 256) // 16 FROM px
             |  UNION ALL SELECT 'b', ((base + 202) % 256) // 16 FROM px)
             |SELECT channel, bin, COUNT(*) AS n_px
             |FROM vals GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sequential pattern mining (PrefixSpan-lite): contiguous event-type
    // 2-grams and 3-grams per user's time-ordered stream, supported by the
    // number of DISTINCT users exhibiting each, kept at ≥ 50% user support.
    // The min-support threshold joins as a scalar cross and compares integer
    // cross-multiplied (2·support ≥ n_users — no float). Window lags per user
    // partition (parallel); candidate space is bounded by the event-type
    // vocabulary cubed, not the corpus.
    Q("events_sequence_mining",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val seq = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("n1", lead($"event_type", 1).over(w))
          .withColumn("n2", lead($"event_type", 2).over(w))
        val p2 = seq.filter($"n1".isNotNull)
          .select($"user_id",
            concat($"event_type", lit(">"), $"n1").as("pattern"),
            lit(2L).as("pattern_len"))
        val p3 = seq.filter($"n2".isNotNull)
          .select($"user_id",
            concat($"event_type", lit(">"), $"n1", lit(">"), $"n2")
              .as("pattern"),
            lit(3L).as("pattern_len"))
        val nUsers = graft.Tables.events(s, dir)
          .agg(countDistinct($"user_id").as("n_users"))
        p2.unionByName(p3)
          .groupBy($"pattern_len", $"pattern")
          .agg(countDistinct($"user_id").as("support"))
          .crossJoin(broadcast(nUsers))
          .filter($"support" * 2 >= $"n_users")
          .select($"pattern_len", $"pattern", $"support", $"n_users")
          .orderBy($"pattern_len", $"pattern")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lead(event_type, 1) OVER w AS n1,
             |    lead(event_type, 2) OVER w AS n2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |pats AS (
             |  SELECT user_id, event_type || '>' || n1 AS pattern,
             |    2 AS pattern_len
             |  FROM seq WHERE n1 IS NOT NULL
             |  UNION ALL
             |  SELECT user_id, event_type || '>' || n1 || '>' || n2,
             |    3
             |  FROM seq WHERE n2 IS NOT NULL),
             |nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
             |sup AS (
             |  SELECT CAST(pattern_len AS BIGINT) AS pattern_len, pattern,
             |    COUNT(DISTINCT user_id) AS support
             |  FROM pats GROUP BY 1, 2)
             |SELECT s.pattern_len, s.pattern, s.support,
             |  CAST(nu.n_users AS BIGINT) AS n_users
             |FROM sup s CROSS JOIN nu
             |WHERE s.support * 2 >= nu.n_users
             |ORDER BY s.pattern_len, s.pattern""".stripMargin)),

    // Anti-aliased audio resample: 7-tap triangular FIR (integer taps,
    // truncating /16) then keep every 4th output — the PROPER downsample
    // next to multimodal_audio_decimate's naive sample-dropping. The whole
    // convolution stays in exact integer arithmetic inside the codec stage;
    // the oracle re-convolves from the sample formula with the same taps and
    // the same TRUNC division.
    Q("multimodal_audio_fir_resample",
      (s, dir) => {
        import s.implicits._
        Multimodal.extractAudioFeatures(s,
            Multimodal.firDecimateAudio(s,
              Multimodal.syntheticAudio(s,
                t(s, dir, "documents").filter($"doc_id" < 100)), k = 4))
          .toDF()
          .select($"doc_id", $"n_samples",
            $"sample_rate".cast("long").as("sample_rate"),
            $"sum_s", $"min_s".cast("long").as("min_s"),
            $"max_s".cast("long").as("max_s"), $"energy")
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n,
             |         8000 + (doc_id % 3) * 4000 AS rate
             |  FROM documents WHERE doc_id < 100),
             |ms AS (SELECT doc_id, n, rate,
             |         unnest(range(0, (n - 7) // 4 + 1)) AS m FROM dims),
             |terms AS (
             |  SELECT doc_id, rate, m,
             |    list_value(1,2,3,4,3,2,1)[k + 1] *
             |      ((doc_id*37 + (m*4 + k)*13) % 2048 - 1024) AS term
             |  FROM ms, unnest(range(0, 7)) t(k)),
             |y AS (
             |  SELECT doc_id, rate, m, SUM(term) // 16 AS s
             |  FROM terms GROUP BY 1, 2, 3)
             |SELECT doc_id, COUNT(*) AS n_samples,
             |  ANY_VALUE(rate // 4) AS sample_rate,
             |  CAST(SUM(s) AS BIGINT) AS sum_s,
             |  CAST(MIN(s) AS BIGINT) AS min_s,
             |  CAST(MAX(s) AS BIGINT) AS max_s,
             |  CAST(SUM(s * s) AS BIGINT) AS energy
             |FROM y GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Log2-bucketed value histogram (the HdrHistogram/latency-histogram
    // shape: exponentially-spaced buckets with bounded relative error) with
    // ZERO floating point: bucket = floor(log2(v)) computed as
    // length(bin(v))−1 — a binary-string bit-length trick both engines
    // evaluate identically, where a log2() call would hit libm. floor()
    // BEFORE the bigint cast pins the one cast divergence (Spark truncates
    // double→long, DuckDB rounds). Bounded state: ≤64 buckets ever.
    Q("agg_log2_histogram",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .select(floor($"o_totalprice").cast("long").as("v"))
          .filter($"v" >= 1L)
          .select((length(bin($"v")) - 1).cast("long").as("bucket"), $"v")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), min($"v").as("min_v"),
            max($"v").as("max_v"))
          .orderBy($"bucket")
      },
      Some("""WITH v AS (
             |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
             |  WHERE floor(o_totalprice) >= 1)
             |SELECT CAST(length(bin(v)) - 1 AS BIGINT) AS bucket,
             |  COUNT(*) AS n, MIN(v) AS min_v, MAX(v) AS max_v
             |FROM v GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact two-sample Kolmogorov-Smirnov drift test — distribution-drift
    // detection with NO logs (the PSI alternative that stays hashable):
    // D = max over pooled values of |F₁(v) − F₂(v)|, maximized as the
    // INTEGER |n₂·c₁(v) − n₁·c₂(v)| and divided once at the end. The two
    // empirical CDFs come from the banded two-level cumulative-sum pattern
    // (per-band totals + broadcast prefix offsets; the only single-partition
    // window runs over |bands| rows), so no corpus-sized frame ever collapses
    // to one partition. Fixture split: first half vs second half of orders by
    // key parity.
    Q("dq_ks_drift",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
          .select($"o_totalprice".as("v"), ($"o_orderkey" % 2 === 0).as("g1"))
        val perV = o.groupBy($"v")
          .agg(sum(when($"g1", 1L).otherwise(0L)).as("c1v"),
            sum(when(!$"g1", 1L).otherwise(0L)).as("c2v"))
          .withColumn("band", floor($"v" / 50000.0d).cast("long"))
        val offs = perV.groupBy($"band")
          .agg(sum($"c1v").as("b1"), sum($"c2v").as("b2"))
          .withColumn("off1", coalesce(sum($"b1").over(
            Window.orderBy($"band").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .withColumn("off2", coalesce(sum($"b2").over(
            Window.orderBy($"band").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select($"band".as("jb"), $"off1", $"off2")
        val wBand = Window.partitionBy($"band").orderBy($"v")
        val cum = perV.join(broadcast(offs), $"band" === $"jb")
          .withColumn("c1", $"off1" + sum($"c1v").over(wBand))
          .withColumn("c2", $"off2" + sum($"c2v").over(wBand))
        val tot = o.agg(sum(when($"g1", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"g1", 1L).otherwise(0L)).as("n2"))
        cum.crossJoin(broadcast(tot))
          .select(abs($"n2" * $"c1" - $"n1" * $"c2").as("dnum"),
            $"n1", $"n2")
          .groupBy($"n1", $"n2").agg(max($"dnum").as("d_num"))
          .select($"n1", $"n2", $"d_num",
            ($"d_num".cast("double") / ($"n1" * $"n2").cast("double"))
              .as("ks_d"))
      },
      Some("""WITH o AS (
             |  SELECT o_totalprice AS v, o_orderkey % 2 = 0 AS g1
             |  FROM orders),
             |perv AS (
             |  SELECT v, SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS c1v,
             |    SUM(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS c2v
             |  FROM o GROUP BY 1),
             |cum AS (
             |  SELECT v,
             |    CAST(SUM(c1v) OVER (ORDER BY v) AS BIGINT) AS c1,
             |    CAST(SUM(c2v) OVER (ORDER BY v) AS BIGINT) AS c2
             |  FROM perv),
             |tot AS (
             |  SELECT CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1,
             |    CAST(SUM(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n2
             |  FROM o)
             |SELECT tot.n1, tot.n2,
             |  MAX(abs(tot.n2 * cum.c1 - tot.n1 * cum.c2)) AS d_num,
             |  CAST(MAX(abs(tot.n2 * cum.c1 - tot.n1 * cum.c2)) AS DOUBLE) /
             |    CAST(tot.n1 * tot.n2 AS DOUBLE) AS ks_d
             |FROM cum CROSS JOIN tot
             |GROUP BY tot.n1, tot.n2""".stripMargin)),

    // Bitmask funnel — the one-aggregation funnel for when stage ORDER does
    // not matter (did the user ever hit each stage?): OR each user's stages
    // into one integer mask, then count prefix-mask coverage. At 100 TB this
    // is the funnel you actually run first: ONE shuffle, 4-byte state per
    // user, no per-stage joins (the ordered funnel in EventsQ covers the
    // sequence-sensitive case). Pure integer bit arithmetic.
    Q("events_funnel_bitmask",
      (s, dir) => {
        import s.implicits._
        val bit = when($"event_type" === "signup", 1L)
          .when($"event_type" === "view", 2L)
          .when($"event_type" === "click", 4L)
          .when($"event_type" === "purchase", 8L)
          .otherwise(0L)
        // First-3-days window: over the full month every user hits every
        // stage (n_users constant 150 at each prefix — no funnel at all);
        // the early-adoption slice has real drop-off (105/82/65/50).
        val masks = graft.Tables.events(s, dir)
          .filter($"ts" < "2024-01-04")
          .select($"user_id", bit.as("b"))
          .groupBy($"user_id").agg(expr("bit_or(b)").as("mask"))
        val stages = Seq(("signup", 1L), ("signup>view", 3L),
          ("signup>view>click", 7L), ("signup>view>click>purchase", 15L))
        val aggCols = stages.zipWithIndex.map { case ((_, pre), i) =>
          sum(when($"mask".bitwiseAND(pre) === pre, 1L).otherwise(0L))
            .as(s"s$i")
        }
        val counts = masks.agg(aggCols.head, aggCols.tail: _*)
        counts.select(explode(array(
            stages.zipWithIndex.map { case ((name, pre), i) =>
              struct(lit(name).as("stage"), lit(pre).as("mask_required"),
                col(s"s$i").as("n_users"))
            }: _*)).as("r"))
          .select($"r.stage", $"r.mask_required", $"r.n_users")
          .orderBy($"mask_required")
      },
      Some("""WITH masks AS (
             |  SELECT user_id, bit_or(CASE event_type
             |      WHEN 'signup' THEN 1 WHEN 'view' THEN 2
             |      WHEN 'click' THEN 4 WHEN 'purchase' THEN 8
             |      ELSE 0 END) AS mask
             |  FROM events WHERE ts < TIMESTAMP '2024-01-04' GROUP BY 1),
             |req AS (
             |  SELECT * FROM (VALUES
             |    ('signup', 1), ('signup>view', 3),
             |    ('signup>view>click', 7),
             |    ('signup>view>click>purchase', 15)) t(stage, mask_required))
             |SELECT req.stage, CAST(req.mask_required AS BIGINT)
             |    AS mask_required,
             |  CAST(SUM(CASE WHEN (masks.mask & req.mask_required)
             |    = req.mask_required THEN 1 ELSE 0 END) AS BIGINT) AS n_users
             |FROM req CROSS JOIN masks
             |GROUP BY 1, 2 ORDER BY mask_required""".stripMargin)),

    // Median absolute deviation — the robust scale estimate quality gates
    // prefer over stddev (one wild outlier moves stddev, not MAD). Two exact
    // interpolated-median passes (percentile semantics already aligned with
    // DuckDB's quantile_cont by agg_percentile_cont): per order-status,
    // median of |price − median|. The absolute deviations are IEEE
    // subtractions of exact inputs; the interpolation division is pinned.
    Q("agg_mad_robust",
      (s, dir) => {
        import s.implicits._
        val med = t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(expr("percentile(o_totalprice, 0.5D)").as("med"))
        t(s, dir, "orders")
          .join(broadcast(med), "o_orderstatus")
          .select($"o_orderstatus", abs($"o_totalprice" - $"med").as("ad"),
            $"med")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), min($"med").as("median_price"),
            expr("percentile(ad, 0.5D)").as("mad"))
          .orderBy($"o_orderstatus")
      },
      Some("""WITH med AS (
             |  SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med
             |  FROM orders GROUP BY 1),
             |ad AS (
             |  SELECT o.o_orderstatus, abs(o.o_totalprice - m.med) AS ad,
             |    m.med
             |  FROM orders o JOIN med m USING (o_orderstatus))
             |SELECT o_orderstatus, COUNT(*) AS n,
             |  MIN(med) AS median_price,
             |  quantile_cont(ad, 0.5) AS mad
             |FROM ad GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Deterministic random-walk corpus (DeepWalk/node2vec data prep): 2 walks
    // of 4 steps from every node of the nation-trade graph, each step picking
    // neighbor ⌊md5(walk_id, step)⌋ mod degree — md5 stands in for the RNG
    // (the no-RNG-state rule every sampling query follows), so the walk
    // corpus is reproducible on any engine/partitioning. Each step is one
    // equi-join against the ranked adjacency (key-partitioned — Pregel-by-
    // joins); the walk count scales the corpus linearly, never quadratically.
    Q("graph_walk_corpus",
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
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y")).distinct()
        val edges = raw.select($"x".as("u"), $"y".as("v"))
          .unionByName(raw.select($"y".as("u"), $"x".as("v"))).distinct()
        val adj = edges
          .withColumn("idx", row_number().over(
            Window.partitionBy($"u").orderBy($"v")) - 1)
          .withColumn("deg", count(lit(1)).over(Window.partitionBy($"u")))
          .localCheckpoint()
        def pick(walkId: org.apache.spark.sql.Column, step: Int,
            deg: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(walkId.cast("string"), lit("_"),
            lit(step.toString))), 1, 12), 16, 10).cast("long") % deg
        var walks = adj.select($"u".as("node")).distinct()
          .select(explode(array(lit(0), lit(1))).as("w"), $"node")
          .select(($"node" * 2 + $"w").cast("long").as("walk_id"),
            $"node".as("cur"), $"node".cast("string").as("path"))
        (1 to 4).foreach { t =>
          walks = walks.join(adj, $"cur" === $"u")
            .filter($"idx" === pick($"walk_id", t, $"deg"))
            .select($"walk_id", $"v".as("cur"),
              concat($"path", lit(">"), $"v".cast("string")).as("path"))
        }
        walks.select($"walk_id", $"path").orderBy($"walk_id")
      },
      Some {
        val step = (t: Int) =>
          s"""w$t AS (
             |  SELECT w.walk_id, a.v AS cur,
             |    w.path || '>' || CAST(a.v AS VARCHAR) AS path
             |  FROM w${t - 1} w JOIN adj a ON a.u = w.cur
             |    AND a.idx = (${QueryDSL.sqlHexInt(
                 s"md5(CAST(w.walk_id AS VARCHAR) || '_' || '$t')", 1, 12)})
                 % a.deg)""".stripMargin
        s"""WITH raw AS (
           |  SELECT DISTINCT c_nationkey AS x, s_nationkey AS y
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey
           |    AND l_shipdate >= TIMESTAMP '1997-06-01'
           |    AND l_shipdate <  TIMESTAMP '1997-06-04'),
           |edges AS (
           |  SELECT DISTINCT u, v FROM (
           |    SELECT x AS u, y AS v FROM raw
           |    UNION ALL SELECT y, x FROM raw)),
           |adj AS (
           |  SELECT u, v,
           |    row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx,
           |    COUNT(*) OVER (PARTITION BY u) AS deg
           |  FROM edges),
           |w0 AS (
           |  SELECT CAST(node * 2 + w AS BIGINT) AS walk_id, node AS cur,
           |    CAST(node AS VARCHAR) AS path
           |  FROM (SELECT DISTINCT u AS node FROM adj),
           |    unnest(range(0, 2)) t(w)),
           |${(1 to 4).map(step).mkString(",\n")}
           |SELECT walk_id, path FROM w4 ORDER BY walk_id""".stripMargin
      }),

    // CORPUS-GLOBAL Gini coefficient — the whole-distribution counterpart of
    // agg_gini_concentration (which is per-priority-group and can rank inside
    // parallel partitioned windows; a global Gini has no partition key, which
    // is exactly when the naive row_number collapses the corpus onto one
    // reducer). Everything stays in INTEGER CENTS:
    // prices go through DECIMAL(30,2)·100 → BIGINT (exact — no float cents),
    // the global value-rank comes from the banded two-level pattern (never a
    // single-partition sort), and G = Σ(2i−n−1)·xᵢ / (n·Σx) divides two
    // exact longs once (long→double conversion is IEEE round-to-nearest on
    // both engines). At SF ≫ 0.1 the numerator sum would move to a decimal
    // accumulator — the shape is unchanged.
    Q("agg_gini_coefficient",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            ($"l_extendedprice".cast("decimal(30,2)") * 100)
              .cast("bigint").as("cents"))
        val ranked = bandedRowNumber(li,
          floor($"cents" / 1000000L).cast("long"),
          Seq($"cents", $"l_orderkey", $"l_linenumber"), "i", "n")
        ranked
          .select($"cents", $"i", $"n",
            ((lit(2L) * $"i" - $"n" - 1L) * $"cents").as("term"))
          .groupBy($"n")
          .agg(sum($"cents").as("s0"), sum($"term").as("num"))
          .select($"n", $"s0",
            ($"num".cast("double") / ($"n" * $"s0").cast("double"))
              .as("gini"))
      },
      Some("""WITH li AS (
             |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(30,2)) * 100
             |      AS BIGINT) AS cents
             |  FROM lineitem),
             |ranked AS (
             |  SELECT cents,
             |    row_number() OVER (ORDER BY cents) AS i,
             |    COUNT(*) OVER () AS n
             |  FROM li)
             |SELECT ANY_VALUE(n) AS n,
             |  CAST(SUM(cents) AS BIGINT) AS s0,
             |  CAST(CAST(SUM((2 * i - n - 1) * cents) AS BIGINT) AS DOUBLE) /
             |    CAST(ANY_VALUE(n) * SUM(cents) AS DOUBLE) AS gini
             |FROM ranked""".stripMargin)),

    // De-hyphenation repair — the PDF/OCR-extraction cleanup every document
    // pipeline runs ("exam-\nple" → "example"). The synthetic corpus has no
    // linebreaks, so a deterministic hyphen-break suffix is injected into
    // doc_id < 40 (the standard fixture-injection pattern); repair is a
    // literal replace (all occurrences on both engines — no regex flag
    // divergence), and the repair count falls out of the exact length delta.
    Q("text_dehyphenate",
      (s, dir) => {
        import s.implicits._
        val suffix = " exam-\nple hy-\nphenated line-\nbreak"
        val docs = t(s, dir, "documents")
          .select($"doc_id",
            when($"doc_id" < 40, concat($"text", lit(suffix)))
              .otherwise($"text").as("text"))
        docs
          .select($"doc_id", $"text",
            expr("replace(text, '-\n', '')").as("fixed"))
          .select($"doc_id",
            ((length($"text") - length($"fixed")) / 2).cast("long")
              .as("n_breaks"),
            length($"text").cast("long").as("len_before"),
            length($"fixed").cast("long").as("len_after"),
            md5($"fixed").as("fixed_md5"))
          .orderBy($"doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id < 40 THEN text ||
             |      ' exam-' || chr(10) || 'ple hy-' || chr(10) ||
             |      'phenated line-' || chr(10) || 'break'
             |    ELSE text END AS text
             |  FROM documents),
             |fx AS (
             |  SELECT doc_id, text,
             |    replace(text, '-' || chr(10), '') AS fixed
             |  FROM docs)
             |SELECT doc_id,
             |  CAST((length(text) - length(fixed)) // 2 AS BIGINT)
             |    AS n_breaks,
             |  CAST(length(text) AS BIGINT) AS len_before,
             |  CAST(length(fixed) AS BIGINT) AS len_after,
             |  md5(fixed) AS fixed_md5
             |FROM fx ORDER BY doc_id""".stripMargin)),

    // Content-defined chunking (the Rabin/Gear boundary rule behind every
    // storage dedup system, and the chunking that keeps near-dup detection
    // stable under insertions — a fixed-width chunker shifts every boundary
    // after an edit; a content-defined one only moves the chunk containing
    // it). Boundary rule: an 8-char windowed polynomial rolling hash
    // (base 31 mod 2³¹−1 — expressed as 8 lag terms, so it is plain windowed
    // integer arithmetic on BOTH engines, no stateful UDF) hits ≡ 0 mod 64,
    // giving ~64-char expected chunks. Chunk ids fall out of a running
    // boundary count; chunk digests come from one substring+md5 join back to
    // the doc. All windows partition by doc — parallel at any corpus size.
    Q("text_cdc_chunking",
      (s, dir) => {
        import s.implicits._
        cdcChunks(t(s, dir, "documents").filter($"doc_id" < 100)
            .select($"doc_id", $"text"))
          .orderBy($"doc_id", $"chunk_id")
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id < 100),
              |$duckCdcSql
              |SELECT doc_id, chunk_id, start, len, chunk_md5
              |FROM cmd ORDER BY doc_id, chunk_id""".stripMargin)),

    // CDC-based cross-doc dedup — the point of content-defined boundaries:
    // an EDITED copy (here: the first 300 chars of each doc_id < 20, plus a
    // fresh tail, injected as doc_id+1000) still shares its leading chunks
    // with the original, because boundaries derive from content, not offsets
    // — a fixed-width chunker would align only until the first length
    // change. One shuffle on chunk_md5 finds every cross-doc shared chunk;
    // the pair fan-out is bounded by per-digest df (the same boilerplate
    // consideration as the shingle joins — a df-cap slots in at corpus
    // scale). Output: each (original, copy) pair with its shared-chunk count.
    Q("dedup_cdc_shared_chunks",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "documents").filter($"doc_id" < 100)
          .select($"doc_id", $"text")
        val edited = base.filter($"doc_id" < 20)
          .select(($"doc_id" + 1000).as("doc_id"),
            concat(expr("substring(text, 1, 300)"),
              lit(" freshly appended editorial tail")).as("text"))
        // production CDC enforces a min chunk size; the same floor here keeps
        // trivial few-char chunks from matching across unrelated docs
        val chunks = cdcChunks(base.unionByName(edited))
          .filter($"len" >= 16)
          .select($"doc_id", $"chunk_md5")
        chunks.as("a").join(chunks.as("b"),
            $"a.chunk_md5" === $"b.chunk_md5" &&
              $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .agg(count(lit(1)).as("n_shared_chunks"))
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id < 100
              |  UNION ALL
              |  SELECT doc_id + 1000,
              |    substring(text, 1, 300) || ' freshly appended editorial tail'
              |  FROM documents WHERE doc_id < 20),
              |$duckCdcSql
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  COUNT(*) AS n_shared_chunks
              |FROM cmd a JOIN cmd b ON b.chunk_md5 = a.chunk_md5
              |  AND a.doc_id < b.doc_id
              |WHERE a.len >= 16 AND b.len >= 16
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Geometric augmentation (rotate 90° cw, then mirror) — the deterministic
    // augmentation-pipeline stage, validated by the POSITION-SENSITIVE
    // weighted checksum: the composed transform is exactly the transpose
    // (rot90cw ∘ flipH : out(x,y) = in(y,x)), so the oracle's closed form is
    // the original formula with the coordinate roles swapped — any off-by-one
    // in either coordinate remap breaks wsum_r even though plain channel sums
    // are rotation-invariant. Codec-stage, partition-wise, no shuffle.
    Q("multimodal_image_augment",
      (s, dir) => {
        import s.implicits._
        Multimodal.extractFeatures(s,
            Multimodal.rotateFlip(s,
              Multimodal.syntheticImages(s,
                t(s, dir, "documents").filter($"doc_id" < 60))))
          .toDF()
          .select($"doc_id", $"width".cast("long").as("width"),
            $"height".cast("long").as("height"), $"n_px",
            $"sum_r", $"sum_g", $"sum_b", $"wsum_r")
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
             |  FROM documents WHERE doc_id < 60),
             |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
             |xy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |v AS (SELECT doc_id, w, h, x, y,
             |        doc_id * 31 + x * 7 + y * 13 AS base
             |      FROM xy)
             |SELECT doc_id, ANY_VALUE(h) AS width, ANY_VALUE(w) AS height,
             |  COUNT(*) AS n_px,
             |  CAST(SUM(base % 256) AS BIGINT) AS sum_r,
             |  CAST(SUM((base + 101) % 256) AS BIGINT) AS sum_g,
             |  CAST(SUM((base + 202) % 256) AS BIGINT) AS sum_b,
             |  CAST(SUM((y + 2 * x + 1) * (base % 256)) AS BIGINT) AS wsum_r
             |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Multimodal dataset card — the per-modality summary a dataset release
    // ships (HuggingFace-card-style): one row per media type with record
    // count, total payload bytes, and modality-appropriate size stats, over
    // the union of the synthetic image/mixed/video/audio corpora. Each
    // corpus reduces partition-wise in its codec stage to one bounded row —
    // the whole card is four bounded aggs and a union.
    Q("multimodal_dataset_card",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter($"doc_id" < 100)
        def card(media: org.apache.spark.sql.Dataset[graft.llm.MediaRecord]) =
          media.toDF()
            .select($"media_type", length($"payload").cast("long").as("bytes"))
            .groupBy($"media_type")
            .agg(count(lit(1)).as("n_records"), sum($"bytes").as("total_bytes"),
              min($"bytes").as("min_bytes"), max($"bytes").as("max_bytes"))
        card(Multimodal.syntheticMixedImages(s, ids))
          .unionByName(card(Multimodal.syntheticVideos(s, ids)))
          .unionByName(card(Multimodal.syntheticAudio(s, ids)))
          .orderBy($"media_type")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 16 + doc_id % 8 AS iw, 12 + doc_id % 5 AS ih,
             |    12 + doc_id % 6 AS vw, 10 + doc_id % 5 AS vh,
             |    3 + doc_id % 4 AS nf,
             |    800 + (doc_id % 7) * 100 AS an
             |  FROM documents WHERE doc_id < 100),
             |rec AS (
             |  SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
             |    ELSE 'image/x-portable-pixmap' END AS media_type,
             |    CASE WHEN doc_id % 2 = 0
             |      THEN 54 + ih * ((3 * iw + 3) // 4 * 4)
             |      -- P6 header: "P6\\n{w} {h}\\n255\\n" = 3+len(w)+1+len(h)+1+4
             |      ELSE 3 + length(CAST(iw AS VARCHAR)) + 1
             |        + length(CAST(ih AS VARCHAR)) + 1 + 4 + 3 * iw * ih
             |    END AS bytes
             |  FROM dims
             |  UNION ALL
             |  SELECT 'video/x-bmp-seq',
             |    nf * (54 + vh * ((3 * vw + 3) // 4 * 4))
             |  FROM dims
             |  UNION ALL
             |  SELECT 'audio/wav', 44 + 2 * an FROM dims)
             |SELECT media_type, COUNT(*) AS n_records,
             |  CAST(SUM(bytes) AS BIGINT) AS total_bytes,
             |  CAST(MIN(bytes) AS BIGINT) AS min_bytes,
             |  CAST(MAX(bytes) AS BIGINT) AS max_bytes
             |FROM rec GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ratio-metric variance via the delta method — the experimentation-
    // platform statistic for per-user ratio metrics (value per event):
    // var(X̄/Ȳ) ≈ (1/n)·(μx/μy)²·(σx²/μx² − 2σxy/(μxμy) + σy²/μy²), with all
    // moments decimal-exact per group and the delta formula one pinned IEEE
    // expression. Complements the Welch/CUPED tests with the ratio-metric
    // case they do not cover. One shuffle per group; bounded output.
    Q("events_ratio_metric_delta",
      (s, dir) => {
        import s.implicits._
        val per = graft.Tables.events(s, dir)
          .groupBy(($"user_id" % 2 === 0).as("treated"), $"user_id")
          .agg(dsum($"value").as("x"), count(lit(1)).cast("double").as("y"))
        val m = per.groupBy($"treated")
          .agg(count(lit(1)).as("n"),
            davg($"x", 8).as("mx"), davg($"y", 8).as("my"),
            davg($"x" * $"x", 8).as("mxx"),
            davg($"y" * $"y", 8).as("myy"),
            davg($"x" * $"y", 8).as("mxy"))
        m.select($"treated", $"n", ($"mx" / $"my").as("ratio"),
            ((lit(1.0d) / $"n".cast("double")) *
              (($"mx" / $"my") * ($"mx" / $"my")) *
              ((($"mxx" - $"mx" * $"mx") / ($"mx" * $"mx")) -
                (lit(2.0d) * ($"mxy" - $"mx" * $"my") / ($"mx" * $"my")) +
                (($"myy" - $"my" * $"my") / ($"my" * $"my"))))
              .as("var_ratio"))
          .orderBy($"treated")
      },
      Some(s"""WITH per AS (
              |  SELECT user_id % 2 = 0 AS treated, user_id,
              |    ${sqlDsum("value")} AS x,
              |    CAST(COUNT(*) AS DOUBLE) AS y
              |  FROM events GROUP BY 1, 2),
              |m AS (
              |  SELECT treated, COUNT(*) AS n,
              |    ${sqlDavg("x", 8)} AS mx, ${sqlDavg("y", 8)} AS my,
              |    ${sqlDavg("x * x", 8)} AS mxx,
              |    ${sqlDavg("y * y", 8)} AS myy,
              |    ${sqlDavg("x * y", 8)} AS mxy
              |  FROM per GROUP BY 1)
              |SELECT treated, n, mx / my AS ratio,
              |  (1.0::DOUBLE / CAST(n AS DOUBLE)) *
              |    ((mx / my) * (mx / my)) *
              |    (((mxx - mx * mx) / (mx * mx)) -
              |     (2.0::DOUBLE * (mxy - mx * my) / (mx * my)) +
              |     ((myy - my * my) / (my * my))) AS var_ratio
              |FROM m ORDER BY treated""".stripMargin)),

    // Grouped OLS regression (price on quantity per return flag) — the
    // simplest trend estimator every metrics stack ships: slope from CENTERED
    // decimal-exact moments (slope = (E[xy]−E[x]E[y])/(E[x²]−E[x]²) — the
    // centered form keeps every decimal-to-double cast in the safe-grid
    // magnitude range, where the raw n·Σxy form would cross the 2⁵³ exactness
    // line at scale), intercept and R² from the same moments, one pinned IEEE
    // expression each. One shuffle; map-side partials.
    Q("agg_ols_regression",
      (s, dir) => {
        import s.implicits._
        val m = t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            davg($"l_quantity").as("mx"),
            davg($"l_extendedprice").as("my"),
            davg($"l_quantity" * $"l_extendedprice").as("mxy"),
            davg($"l_quantity" * $"l_quantity").as("mxx"),
            // scale 4, not 8: price^2 is ~3e9, where a 1e-8 grid is finer
            // than the double ulp (the QueryDSL cast-divergence hazard);
            // 1e-4 stays coarser and the inputs carry <= 4 decimal digits
            davg($"l_extendedprice" * $"l_extendedprice").as("myy"))
        m.select($"l_returnflag", $"n",
            (($"mxy" - $"mx" * $"my") / ($"mxx" - $"mx" * $"mx"))
              .as("slope"),
            ($"my" - (($"mxy" - $"mx" * $"my") /
              ($"mxx" - $"mx" * $"mx")) * $"mx").as("intercept"),
            ((($"mxy" - $"mx" * $"my") * ($"mxy" - $"mx" * $"my")) /
              (($"mxx" - $"mx" * $"mx") * ($"myy" - $"my" * $"my")))
              .as("r2"))
          .orderBy($"l_returnflag")
      },
      Some(s"""WITH m AS (
              |  SELECT l_returnflag, COUNT(*) AS n,
              |    ${sqlDavg("l_quantity")} AS mx,
              |    ${sqlDavg("l_extendedprice")} AS my,
              |    ${sqlDavg("l_quantity * l_extendedprice")} AS mxy,
              |    ${sqlDavg("l_quantity * l_quantity")} AS mxx,
              |    ${sqlDavg("l_extendedprice * l_extendedprice")} AS myy
              |  FROM lineitem GROUP BY 1)
              |SELECT l_returnflag, n,
              |  (mxy - mx * my) / (mxx - mx * mx) AS slope,
              |  my - ((mxy - mx * my) / (mxx - mx * mx)) * mx AS intercept,
              |  ((mxy - mx * my) * (mxy - mx * my)) /
              |    ((mxx - mx * mx) * (myy - my * my)) AS r2
              |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Deterministic UUIDv3-style ID minting — stable document identifiers
    // from a namespace + content key (the no-RNG rule applied to ID
    // generation: re-running the pipeline mints the SAME ids, which is what
    // makes downstream joins and incremental loads reproducible). md5 of
    // 'graft:' || doc_id, formatted 8-4-4-4-12 with the version nibble forced
    // to 3 (RFC 4122 reserves version 3 for MD5 name-based UUIDs — version 5
    // would falsely advertise SHA-1) and the variant nibble to RFC-4122's
    // 10xx — pure string/bit ops, identical on both engines. Map-only.
    Q("fn_uuid3_mint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            md5(concat(lit("graft:"), $"doc_id".cast("string"))).as("h"))
          .select($"doc_id", concat_ws("-",
            substring($"h", 1, 8), substring($"h", 9, 4),
            concat(lit("3"), substring($"h", 14, 3)),
            concat(
              element_at(array(lit("8"), lit("9"), lit("a"), lit("b")),
                (conv(substring($"h", 17, 1), 16, 10).cast("int") % 4) + 1),
              substring($"h", 18, 3)),
            substring($"h", 21, 12)).as("uuid3"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH h AS (
              |  SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS h
              |  FROM documents)
              |SELECT doc_id,
              |  substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-' ||
              |  '3' || substring(h, 14, 3) || '-' ||
              |  substring('89ab',
              |    CAST((${QueryDSL.sqlHexInt("h", 17, 1)}) % 4 AS INT) + 1, 1)
              |    || substring(h, 18, 3) || '-' ||
              |  substring(h, 21, 12) AS uuid3
              |FROM h ORDER BY doc_id""".stripMargin)),

    // CUSUM change detection (Page 1954) over each user's daily series — the
    // drift detector that catches slow level shifts the rolling z-score
    // (spike detector) misses: Sₜ = max(0, Sₜ₋₁ + (vₜ − μ)), alarm when Sₜ
    // exceeds a SELF-CALIBRATING threshold (2× the user's mean absolute
    // deviation — computed decimal-exact, so the gate is reproducible, not a
    // magic constant). The recursion runs as a typed fold per bounded user
    // series (the Holt pattern); the oracle's recursive CTE steps identical
    // IEEE arithmetic including the max(0, ·) clamp.
    Q("events_cusum_drift",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy($"user_id", date_format(date_trunc("day", $"ts"),
            "yyyy-MM-dd").as("day"))
          .agg(dsum($"value").as("v"))
        val mu = daily.groupBy($"user_id").agg(davg($"v").as("mu"))
        val madev = daily.join(mu, "user_id")
          .groupBy($"user_id")
          .agg(davg(abs($"v" - $"mu"), 6).as("madev"))
        val full = daily.join(mu, "user_id").join(madev, "user_id")
          .select($"user_id".as[Long], $"day".as[String], $"v".as[Double],
            $"mu".as[Double], $"madev".as[Double])
        full.groupByKey(_._1)
          .mapGroups { (uid, it) =>
            val rows = it.toArray.sortBy(_._2)
            val mu = rows.head._4
            val thr = 2.0d * rows.head._5
            var s = 0.0d; var sMax = 0.0d; var nAlarm = 0L
            rows.foreach { case (_, _, v, _, _) =>
              s = math.max(0.0d, s + (v - mu))
              if (s > sMax) sMax = s
              if (s > thr) nAlarm += 1
            }
            (uid, rows.length.toLong, s, sMax, nAlarm)
          }
          .toDF("user_id", "n_days", "s_final", "s_max", "n_alarms")
          .orderBy($"user_id")
      },
      Some(s"""WITH RECURSIVE daily AS (
              |  SELECT user_id, date_trunc('day', ts) AS day,
              |    ${sqlDsum("value")} AS v
              |  FROM events GROUP BY 1, 2),
              |mu AS (SELECT user_id, ${sqlDavg("v")} AS mu
              |       FROM daily GROUP BY 1),
              |madev AS (
              |  SELECT d.user_id, ${sqlDavg("abs(d.v - mu.mu)", 6)} AS madev
              |  FROM daily d JOIN mu USING (user_id) GROUP BY 1),
              |idx AS (
              |  SELECT d.user_id, d.v, mu.mu, 2.0::DOUBLE * madev.madev AS thr,
              |    row_number() OVER (PARTITION BY d.user_id ORDER BY d.day)
              |      AS rn
              |  FROM daily d JOIN mu USING (user_id)
              |  JOIN madev USING (user_id)),
              |nn AS (SELECT user_id, MAX(rn) AS n FROM idx GROUP BY 1),
              |c AS (
              |  SELECT user_id, rn, thr,
              |    GREATEST(0.0::DOUBLE, 0.0::DOUBLE + (v - mu)) AS s,
              |    GREATEST(0.0::DOUBLE, 0.0::DOUBLE + (v - mu)) AS smax,
              |    CASE WHEN GREATEST(0.0::DOUBLE, 0.0::DOUBLE + (v - mu))
              |      > thr THEN 1 ELSE 0 END AS nal
              |  FROM idx WHERE rn = 1
              |  UNION ALL
              |  SELECT c.user_id, c.rn + 1, c.thr,
              |    GREATEST(0.0::DOUBLE, c.s + (i.v - i.mu)),
              |    GREATEST(c.smax, GREATEST(0.0::DOUBLE, c.s + (i.v - i.mu))),
              |    c.nal + CASE WHEN GREATEST(0.0::DOUBLE, c.s + (i.v - i.mu))
              |      > c.thr THEN 1 ELSE 0 END
              |  FROM c JOIN idx i
              |    ON i.user_id = c.user_id AND i.rn = c.rn + 1)
              |SELECT c.user_id, CAST(nn.n AS BIGINT) AS n_days, c.s AS s_final,
              |  c.smax AS s_max, CAST(c.nal AS BIGINT) AS n_alarms
              |FROM c JOIN nn ON nn.user_id = c.user_id AND c.rn = nn.n
              |ORDER BY c.user_id""".stripMargin)),

    // Vocabulary-pruning coverage curve — what fraction of token OCCURRENCES
    // the top-K vocabulary still covers, for a ladder of K (the tokenizer-
    // sizing trade-off chart). Frequency ranks break ties lexically; coverage
    // is an integer ratio divided once. The rank frame is the vocabulary
    // (bounded), so the K-ladder cross is bounded too.
    Q("text_vocab_prune_coverage",
      (s, dir) => {
        import s.implicits._
        import graft.llm.{TextFunctions => TF}
        // banded global rank (never a single-partition window, even though
        // this particular vocabulary is small — the shape must scale)
        val freq = bandedRowNumber(
          t(s, dir, "documents")
            .select(explode(TF.tokens($"text")).as("tok"))
            .groupBy($"tok").agg(count(lit(1)).as("f")),
          (-$"f").cast("long"), Seq($"f".desc, $"tok"), "rk", "nv")
        val tot = freq.agg(sum($"f").as("total"))
        val ks = Seq(8, 16, 24)
        freq.crossJoin(broadcast(tot))
          .select(explode(array(ks.map(lit): _*)).as("k"), $"rk", $"f",
            $"total")
          .filter($"rk" <= $"k")
          .groupBy($"k".cast("long").as("k"))
          .agg(max($"total").as("total_occurrences"),
            sum($"f").as("covered"))
          .select($"k", $"total_occurrences", $"covered",
            ($"covered".cast("double") / $"total_occurrences".cast("double"))
              .as("coverage"))
          .orderBy($"k")
      },
      Some("""WITH freq AS (
             |  SELECT tok, COUNT(*) AS f FROM (
             |    SELECT unnest(list_filter(
             |      regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |      x -> x <> '')) AS tok
             |    FROM documents)
             |  GROUP BY 1),
             |rk AS (
             |  SELECT tok, f, row_number() OVER (ORDER BY f DESC, tok) AS rk
             |  FROM freq),
             |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS total FROM freq)
             |SELECT CAST(k AS BIGINT) AS k,
             |  (SELECT total FROM tot) AS total_occurrences,
             |  CAST(SUM(f) AS BIGINT) AS covered,
             |  CAST(SUM(f) AS DOUBLE) /
             |    CAST((SELECT total FROM tot) AS DOUBLE) AS coverage
             |FROM rk, unnest([8, 16, 24]) t(k)
             |WHERE rk <= k GROUP BY k ORDER BY k""".stripMargin)),

    // Entity-resolution pipeline — the composed record-linkage flow (block →
    // fuzzy-score → transitively merge → canonicalize) that the individual
    // pieces (banded Jaro-Winkler, connected components) exist to serve:
    // part names blocked by first word, matched at rounded JW ≥ 0.88, merged
    // by 3 synchronous min-label propagation rounds (the bounded-round
    // contract every iterative graph query here uses), and reported as
    // canonical clusters. Match edges are per-band quadratic in DISTINCT
    // names — vocabulary-bounded, never corpus-sized.
    Q("pipeline_entity_resolution",
      (s, dir) => {
        import s.implicits._
        import graft.functions.StringSimFunctions.jaro_winkler_similarity
        val names = t(s, dir, "part").select($"p_name").distinct()
          .select($"p_name", substring_index($"p_name", " ", 1).as("band"))
        val a = names.select($"band", $"p_name".as("n1"))
        val b = names.select($"band", $"p_name".as("n2"))
        val matched = a.join(b, Seq("band"))
          .filter($"n1" =!= $"n2")
          .filter(round(jaro_winkler_similarity($"n1", $"n2"), 9) >= 0.88)
          .select($"n1", $"n2")
        val und = matched
          .unionByName(names.select($"p_name".as("n1"), $"p_name".as("n2")))
          .distinct().localCheckpoint()
        var labels = names.select($"p_name".as("node"),
          $"p_name".as("lbl"))
        (1 to 3).foreach { _ =>
          labels = und.join(labels, $"n2" === $"node")
            .groupBy($"n1").agg(min($"lbl").as("lbl"))
            .select($"n1".as("node"), $"lbl")
        }
        labels.groupBy($"lbl".as("cluster_rep"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy($"cluster_rep")
      },
      Some {
        val round_ = (k: Int) =>
          s"""l$k AS (
             |  SELECT e.n1 AS node, MIN(l.lbl) AS lbl
             |  FROM und e JOIN l${k - 1} l ON l.node = e.n2
             |  GROUP BY 1)""".stripMargin
        s"""WITH names AS (
           |  SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS band
           |  FROM part),
           |matched AS (
           |  SELECT a.p_name AS n1, b.p_name AS n2
           |  FROM names a JOIN names b ON b.band = a.band
           |    AND a.p_name <> b.p_name
           |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 9)
           |    >= 0.88),
           |und AS (
           |  SELECT DISTINCT n1, n2 FROM (
           |    SELECT n1, n2 FROM matched
           |    UNION ALL SELECT p_name, p_name FROM names)),
           |l0 AS (SELECT p_name AS node, p_name AS lbl FROM names),
           |${(1 to 3).map(round_).mkString(",\n")}
           |SELECT lbl AS cluster_rep, COUNT(*) AS n_members
           |FROM l3 GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Holt forecast BACKTEST — the validation loop that makes a forecaster
    // trustworthy: train the level/trend recursion on each user's first
    // n−1 days, forecast the held-out last day, report the absolute error.
    // Same typed-fold + recursive-CTE machinery as events_holt_linear, with
    // the holdout boundary the only change; |error| is one IEEE subtraction.
    Q("events_holt_backtest",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy($"user_id", date_format(date_trunc("day", $"ts"),
            "yyyy-MM-dd").as("day"))
          .agg(dsum($"value").as("v"))
          .select($"user_id".as[Long], $"day".as[String], $"v".as[Double])
        daily.groupByKey(_._1)
          .flatMapGroups { (uid, it) =>
            val vs = it.toArray.sortBy(_._2).map(_._3)
            if (vs.length < 3) Iterator.empty
            else {
              val train = vs.dropRight(1)
              var l = train(0)
              var b = train(1) - train(0)
              var i = 1
              while (i < train.length) {
                val lNew = 0.5 * train(i) + 0.5 * (l + b)
                b = 0.3 * (lNew - l) + 0.7 * b
                l = lNew
                i += 1
              }
              val fc = l + b
              val actual = vs.last
              Iterator.single(
                (uid, vs.length.toLong, fc, actual, math.abs(fc - actual)))
            }
          }
          .toDF("user_id", "n_days", "forecast", "actual", "abs_err")
          .orderBy($"user_id")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT user_id, date_trunc('day', ts) AS day,
             |    CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS v
             |  FROM events GROUP BY 1, 2),
             |idx AS (
             |  SELECT user_id, v,
             |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
             |  FROM daily),
             |nn AS (SELECT user_id, MAX(rn) AS n FROM idx GROUP BY 1
             |       HAVING MAX(rn) >= 3),
             |h AS (
             |  SELECT i1.user_id, 1 AS rn, i1.v AS l, i2.v - i1.v AS b
             |  FROM idx i1 JOIN idx i2
             |    ON i2.user_id = i1.user_id AND i2.rn = 2
             |  JOIN nn ON nn.user_id = i1.user_id
             |  WHERE i1.rn = 1
             |  UNION ALL
             |  SELECT h.user_id, h.rn + 1,
             |    0.5 * i.v + 0.5 * (h.l + h.b),
             |    0.3 * ((0.5 * i.v + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
             |  FROM h JOIN nn ON nn.user_id = h.user_id
             |  JOIN idx i ON i.user_id = h.user_id AND i.rn = h.rn + 1
             |  WHERE h.rn + 1 <= nn.n - 1)
             |SELECT h.user_id, CAST(nn.n AS BIGINT) AS n_days,
             |  h.l + h.b AS forecast, a.v AS actual,
             |  abs((h.l + h.b) - a.v) AS abs_err
             |FROM h
             |JOIN nn ON nn.user_id = h.user_id AND h.rn = nn.n - 1
             |JOIN idx a ON a.user_id = h.user_id AND a.rn = nn.n
             |ORDER BY h.user_id""".stripMargin)),

    // Wilson score interval for per-event-type reach (users touching the
    // type / all users) — the binomial CI that stays sane at extreme
    // proportions, unlike the normal approximation. Counts are exact; the
    // interval is one pinned IEEE expression per side (sqrt is correctly
    // rounded per IEEE-754, so the whole formula is engine-stable; z = 1.96
    // fixed). Bounded output: one row per event type.
    Q("events_reach_wilson_ci",
      (s, dir) => {
        import s.implicits._
        // Reach measured over the first 3 days (the full month saturates:
        // k = n = 150 for every type, so p, both CI bounds — the operator
        // under test — were identical constants on every row).
        val ev = graft.Tables.events(s, dir)
        val nUsers = ev.agg(countDistinct($"user_id").as("n"))
        val reach = ev.filter($"ts" < "2024-01-04")
          .select($"event_type", $"user_id").distinct()
          .groupBy($"event_type").agg(count(lit(1)).as("k"))
        val z = 1.96d
        val z2 = z * z
        reach.crossJoin(broadcast(nUsers))
          .select($"event_type", $"k", $"n",
            ($"k".cast("double") / $"n".cast("double")).as("p"))
          .select($"event_type", $"k", $"n", $"p",
            ((($"p" + lit(z2) / (lit(2.0d) * $"n".cast("double"))) -
              (lit(z) * sqrt(($"p" * (lit(1.0d) - $"p")) /
                $"n".cast("double") +
                lit(z2) / (lit(4.0d) * $"n".cast("double") *
                  $"n".cast("double"))))) /
              (lit(1.0d) + lit(z2) / $"n".cast("double"))).as("ci_low"),
            ((($"p" + lit(z2) / (lit(2.0d) * $"n".cast("double"))) +
              (lit(z) * sqrt(($"p" * (lit(1.0d) - $"p")) /
                $"n".cast("double") +
                lit(z2) / (lit(4.0d) * $"n".cast("double") *
                  $"n".cast("double"))))) /
              (lit(1.0d) + lit(z2) / $"n".cast("double"))).as("ci_high"))
          .orderBy($"event_type")
      },
      Some(s"""WITH nu AS (
              |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
              |  FROM events),
              |reach AS (
              |  SELECT event_type, COUNT(*) AS k FROM (
              |    SELECT DISTINCT event_type, user_id FROM events
              |    WHERE ts < TIMESTAMP '2024-01-04')
              |  GROUP BY 1),
              |pr AS (
              |  SELECT event_type, k, nu.n,
              |    CAST(k AS DOUBLE) / CAST(nu.n AS DOUBLE) AS p
              |  FROM reach CROSS JOIN nu)
              |SELECT event_type, k, n, p,
              |  ((p + ${1.96 * 1.96} / (2.0::DOUBLE * CAST(n AS DOUBLE))) -
              |   (1.96::DOUBLE * sqrt((p * (1.0::DOUBLE - p)) /
              |     CAST(n AS DOUBLE) +
              |     ${1.96 * 1.96} / (4.0::DOUBLE * CAST(n AS DOUBLE) *
              |       CAST(n AS DOUBLE))))) /
              |  (1.0::DOUBLE + ${1.96 * 1.96} / CAST(n AS DOUBLE)) AS ci_low,
              |  ((p + ${1.96 * 1.96} / (2.0::DOUBLE * CAST(n AS DOUBLE))) +
              |   (1.96::DOUBLE * sqrt((p * (1.0::DOUBLE - p)) /
              |     CAST(n AS DOUBLE) +
              |     ${1.96 * 1.96} / (4.0::DOUBLE * CAST(n AS DOUBLE) *
              |       CAST(n AS DOUBLE))))) /
              |  (1.0::DOUBLE + ${1.96 * 1.96} / CAST(n AS DOUBLE)) AS ci_high
              |FROM pr ORDER BY event_type""".stripMargin)),

    // Deterministic Poisson bootstrap (the one-pass resampling used for
    // standard errors at web scale — no resample shuffles, no RNG state):
    // each (row, replicate) draws a pseudo-Poisson(1) weight by mapping an
    // md5 integer through the FIXED integer CDF thresholds
    // [3679, 7358, 9197, 9810] (the Poisson(1) pmf at 4-digit precision), so
    // every engine draws identical weights. B=16 replicate means come from
    // decimal-exact weighted sums; the bootstrap SE is the replicate-mean
    // stddev (exact moments + one IEEE sqrt). One pass over the data,
    // B-bounded state per group.
    Q("agg_poisson_bootstrap_se",
      (s, dir) => {
        import s.implicits._
        val b = 16
        // TWO md5s per row supply all 16 replicate draws (4-nibble windows,
        // 8 per digest) — hashing once per (row, replicate) was the 4 s
        // hotspot; windowing the digest is 8x less hashing for identical
        // determinism (the 16-bit-window % 10000 modulo bias is irrelevant
        // to a bootstrap and identical on both engines).
        val rows = t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice",
            md5($"o_orderkey".cast("string")).as("h1"),
            md5(concat($"o_orderkey".cast("string"), lit("x"))).as("h2"))
          .select($"o_orderkey", $"o_totalprice",
            explode(array((0 until b).map(lit): _*)).as("rep"),
            $"h1", $"h2")
          .withColumn("u",
            conv(expr("substring(if(rep < 8, h1, h2), " +
              "cast((rep % 8) * 4 + 1 as int), 4)"), 16, 10)
              .cast("long") % 10000L)
          .withColumn("w",
            when($"u" < 3679L, 0L).when($"u" < 7358L, 1L)
              .when($"u" < 9197L, 2L).when($"u" < 9810L, 3L).otherwise(4L))
        val reps = rows.groupBy($"rep")
          .agg((sum(($"o_totalprice" * $"w".cast("double"))
            .cast("decimal(30,4)")).cast("double") /
            sum($"w").cast("double")).as("rep_mean"))
        reps.agg(count(lit(1)).as("n_reps"),
            davg($"rep_mean").as("boot_mean"),
            davg($"rep_mean" * $"rep_mean", 2).as("boot_m2"))
          .select($"n_reps", $"boot_mean",
            sqrt(($"boot_m2" - $"boot_mean" * $"boot_mean") *
              ($"n_reps".cast("double") / ($"n_reps" - 1).cast("double")))
              .as("boot_se"))
      },
      Some(s"""WITH hh AS (
              |  SELECT o_orderkey, o_totalprice,
              |    md5(CAST(o_orderkey AS VARCHAR)) AS h1,
              |    md5(CAST(o_orderkey AS VARCHAR) || 'x') AS h2
              |  FROM orders),
              |win AS (
              |  SELECT o_orderkey, o_totalprice, t.rep,
              |    CASE WHEN t.rep < 8 THEN h1 ELSE h2 END AS h,
              |    CAST((t.rep % 8) * 4 + 1 AS INT) AS p
              |  FROM hh, unnest(range(0, 16)) t(rep)),
              |rows_ AS (
              |  SELECT o_orderkey, o_totalprice, rep,
              |    ((instr('0123456789abcdef', substring(h, p, 1)) - 1) * 4096
              |     + (instr('0123456789abcdef', substring(h, p + 1, 1)) - 1)
              |       * 256
              |     + (instr('0123456789abcdef', substring(h, p + 2, 1)) - 1)
              |       * 16
              |     + (instr('0123456789abcdef', substring(h, p + 3, 1)) - 1))
              |      % 10000 AS u
              |  FROM win),
              |w AS (
              |  SELECT rep, o_totalprice,
              |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
              |      WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3 ELSE 4 END AS w
              |  FROM rows_),
              |reps AS (
              |  SELECT rep,
              |    CAST(SUM(CAST(o_totalprice * CAST(w AS DOUBLE)
              |      AS DECIMAL(30,4))) AS DOUBLE) /
              |      CAST(SUM(w) AS DOUBLE) AS rep_mean
              |  FROM w GROUP BY 1)
              |SELECT COUNT(*) AS n_reps,
              |  ${sqlDavg("rep_mean")} AS boot_mean,
              |  sqrt((${sqlDavg("rep_mean * rep_mean", 2)} -
              |    ${sqlDavg("rep_mean")} * ${sqlDavg("rep_mean")}) *
              |    (CAST(COUNT(*) AS DOUBLE) /
              |      CAST(COUNT(*) - 1 AS DOUBLE))) AS boot_se
              |FROM reps""".stripMargin)),

    // Total-variation categorical drift — the log-free companion to the
    // numeric KS test: TV(P,Q) = ½ Σ|pᵢ−qᵢ| between the source distributions
    // of two corpus halves, computed as the INTEGER Σ|cₐ·n_b − c_b·nₐ| and
    // divided once by 2·nₐ·n_b (same no-float-thresholds discipline as the
    // KS numerator — no PSI-style logs anywhere). Category space is the
    // source vocabulary — bounded; full-outer join covers one-sided
    // categories.
    Q("dq_tv_drift",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val ca = docs.filter($"doc_id" % 2 === 0)
          .groupBy($"source").agg(count(lit(1)).as("c_a"))
        val cb = docs.filter($"doc_id" % 2 === 1)
          .groupBy($"source").agg(count(lit(1)).as("c_b"))
        val tot = docs.agg(
          sum(when($"doc_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"doc_id" % 2 === 1, 1L).otherwise(0L)).as("n_b"))
        ca.join(cb, Seq("source"), "full")
          .select(coalesce($"c_a", lit(0L)).as("c_a"),
            coalesce($"c_b", lit(0L)).as("c_b"))
          .crossJoin(broadcast(tot))
          .select(abs($"c_a" * $"n_b" - $"c_b" * $"n_a").as("num"),
            $"n_a", $"n_b")
          .groupBy($"n_a", $"n_b").agg(sum($"num").as("tv_num"))
          .select($"n_a", $"n_b", $"tv_num",
            ($"tv_num".cast("double") /
              (lit(2.0d) * $"n_a".cast("double") * $"n_b".cast("double")))
              .as("tv"))
      },
      Some("""WITH ca AS (
             |  SELECT source, COUNT(*) AS c_a FROM documents
             |  WHERE doc_id % 2 = 0 GROUP BY 1),
             |cb AS (
             |  SELECT source, COUNT(*) AS c_b FROM documents
             |  WHERE doc_id % 2 = 1 GROUP BY 1),
             |tot AS (
             |  SELECT CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_b
             |  FROM documents),
             |j AS (
             |  SELECT COALESCE(ca.c_a, 0) AS c_a, COALESCE(cb.c_b, 0) AS c_b
             |  FROM ca FULL OUTER JOIN cb USING (source))
             |SELECT tot.n_a, tot.n_b,
             |  CAST(SUM(abs(j.c_a * tot.n_b - j.c_b * tot.n_a)) AS BIGINT)
             |    AS tv_num,
             |  CAST(SUM(abs(j.c_a * tot.n_b - j.c_b * tot.n_a)) AS DOUBLE) /
             |    (2.0::DOUBLE * CAST(tot.n_a AS DOUBLE) *
             |      CAST(tot.n_b AS DOUBLE)) AS tv
             |FROM j CROSS JOIN tot
             |GROUP BY tot.n_a, tot.n_b""".stripMargin)),

    // Mipmap / feature-pyramid generation: three successive nearest-neighbor
    // halvings per image (the level chain detection and multi-scale models
    // consume), each level re-encoded and re-decoded through the real codec.
    // The oracle recomputes every level's pixels by COMPOSING the trunc-
    // division source mapping (x_{L-1} = x_L·w_{L-1}//w_L) down to level 0 —
    // so the whole resize chain, not just one hop, is hash-pinned, with the
    // position-sensitive wsum catching any mapping drift. Codec-stage,
    // partition-wise.
    Q("multimodal_image_mipmap",
      (s, dir) => {
        import s.implicits._
        val base = Multimodal.syntheticImages(s,
          t(s, dir, "documents").filter($"doc_id" < 40))
        val levels = (1 to 3).map { lvl =>
          var m = base
          (1 to lvl).foreach { _ =>
            m = m.mapPartitions(_.map { rec =>
              val img = graft.llm.Bmp.decode(rec.payload)
              rec.copy(payload = graft.llm.Bmp.encode(
                graft.llm.Bmp.resizeNearest(img,
                  math.max(1, img.width / 2), math.max(1, img.height / 2))))
            })(org.apache.spark.sql.Encoders.product[graft.llm.MediaRecord])
          }
          Multimodal.extractFeatures(s, m).toDF()
            .select($"doc_id", lit(lvl.toLong).as("level"),
              $"width".cast("long").as("width"),
              $"height".cast("long").as("height"), $"sum_r", $"wsum_r")
        }
        levels.reduce(_ unionByName _).orderBy($"doc_id", $"level")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 16 + doc_id % 8 AS w0, 12 + doc_id % 5 AS h0
             |  FROM documents WHERE doc_id < 40),
             |d AS (
             |  SELECT doc_id, w0, h0, w0 // 2 AS w1, h0 // 2 AS h1,
             |    w0 // 2 // 2 AS w2, h0 // 2 // 2 AS h2,
             |    w0 // 2 // 2 // 2 AS w3, h0 // 2 // 2 // 2 AS h3
             |  FROM dims),
             |l1 AS (
             |  SELECT doc_id, 1 AS level, w1 AS w, h1 AS h,
             |    x * w0 // w1 AS sx, y * h0 // h1 AS sy, x, y, w0
             |  FROM d, unnest(range(0, w1)) t(x), unnest(range(0, h1)) u(y)),
             |l2 AS (
             |  SELECT doc_id, 2 AS level, w2 AS w, h2 AS h,
             |    (x * w1 // w2) * w0 // w1 AS sx,
             |    (y * h1 // h2) * h0 // h1 AS sy, x, y, w0
             |  FROM d, unnest(range(0, w2)) t(x), unnest(range(0, h2)) u(y)),
             |l3 AS (
             |  SELECT doc_id, 3 AS level, w3 AS w, h3 AS h,
             |    ((x * w2 // w3) * w1 // w2) * w0 // w1 AS sx,
             |    ((y * h2 // h3) * h1 // h2) * h0 // h1 AS sy, x, y, w0
             |  FROM d, unnest(range(0, w3)) t(x), unnest(range(0, h3)) u(y)),
             |px AS (
             |  SELECT * FROM l1 UNION ALL SELECT * FROM l2
             |  UNION ALL SELECT * FROM l3)
             |SELECT doc_id, CAST(level AS BIGINT) AS level,
             |  CAST(ANY_VALUE(w) AS BIGINT) AS width,
             |  CAST(ANY_VALUE(h) AS BIGINT) AS height,
             |  CAST(SUM((doc_id * 31 + sx * 7 + sy * 13) % 256) AS BIGINT)
             |    AS sum_r,
             |  CAST(SUM((x + 2 * y + 1) *
             |    ((doc_id * 31 + sx * 7 + sy * 13) % 256)) AS BIGINT)
             |    AS wsum_r
             |FROM px GROUP BY 1, 2 ORDER BY doc_id, level""".stripMargin)),

    // Bot-detection heuristics — the abuse-filtering pass every event
    // pipeline needs: flag users whose inter-event gaps are suspiciously
    // REGULAR (automation emits metronome traffic; humans don't). The
    // regularity test is variance < (mean/10)², evaluated ENTIRELY in exact
    // integer arithmetic on microsecond gaps — 100·(n·Σg² − (Σg)²) < (Σg)²
    // via decimal/hugeint cross-multiplication, so the flag boundary is
    // bit-exact on both engines (gap² exceeds int64, hence the wide-integer
    // sums). Plus a heavy-volume flag. Five metronome bots (120 events at an
    // exact 1 s cadence) are injected as fixtures — the organic corpus has
    // no automation, so without them both flags would be vacuously false.
    // One shuffle; per-user state bounded.
    Q("events_bot_heuristics",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val bots = s.range(5)
          .select(($"id" + 9000L).as("user_id"),
            explode(sequence(lit(0L), lit(119L))).as("i"))
          .select($"user_id",
            timestamp_micros(lit(1704067200000000L) + $"i" * 1000000L)
              .as("ts"),
            ($"user_id" * 1000L + $"i").as("event_id"))
        val gaps = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id")
          .unionByName(bots)
          .withColumn("gap",
            unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
          .filter($"gap".isNotNull)
        val st = gaps.groupBy($"user_id")
          .agg(count(lit(1)).as("n_gaps"),
            sum($"gap").as("sg"),
            sum($"gap".cast("decimal(19,0)") * $"gap".cast("decimal(19,0)"))
              .as("sgg"))
        st.select($"user_id", $"n_gaps", $"sg",
            ($"sg".cast("double") / $"n_gaps".cast("double")).as("mean_gap_us"),
            ((lit(100L) * ($"n_gaps" * $"sgg" -
              $"sg".cast("decimal(38,0)") * $"sg".cast("decimal(38,0)"))) <
              ($"sg".cast("decimal(38,0)") * $"sg".cast("decimal(38,0)")))
              .as("flag_regular"),
            ($"n_gaps" >= 100L).as("flag_heavy"))
          .orderBy($"user_id")
      },
      Some("""WITH bots AS (
             |  SELECT 9000 + b AS user_id,
             |    make_timestamp(1704067200000000 + i * 1000000) AS ts,
             |    (9000 + b) * 1000 + i AS event_id
             |  FROM unnest(range(0, 5)) t(b), unnest(range(0, 120)) u(i)),
             |ev AS (
             |  SELECT user_id, ts, event_id FROM events
             |  UNION ALL SELECT user_id, ts, event_id FROM bots),
             |g AS (
             |  SELECT user_id,
             |    epoch_us(ts) - lag(epoch_us(ts))
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
             |  FROM ev),
             |st AS (
             |  SELECT user_id, COUNT(*) AS n_gaps,
             |    CAST(SUM(gap) AS BIGINT) AS sg,
             |    SUM(CAST(gap AS HUGEINT) * gap) AS sgg
             |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT user_id, n_gaps, sg,
             |  CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
             |  100 * (n_gaps * sgg - CAST(sg AS HUGEINT) * sg)
             |    < CAST(sg AS HUGEINT) * sg AS flag_regular,
             |  n_gaps >= 100 AS flag_heavy
             |FROM st ORDER BY user_id""".stripMargin)),

    // Beta posterior summaries for per-type reach — the Bayesian companion
    // to the Wilson interval: with a uniform Beta(1,1) prior, the posterior
    // is Beta(k+1, n−k+1); its mean, mode, and variance are pure integer
    // ratios evaluated as pinned IEEE expressions (no special functions).
    // The shrinkage toward ½ vs the raw k/n is visible in the output.
    Q("events_reach_beta_posterior",
      (s, dir) => {
        import s.implicits._
        // Same early-window reach as the Wilson query: month-long reach is
        // saturated (k = n), collapsing every posterior to one constant.
        val ev = graft.Tables.events(s, dir)
        val nUsers = ev.agg(countDistinct($"user_id").as("n"))
        ev.filter($"ts" < "2024-01-04")
          .select($"event_type", $"user_id").distinct()
          .groupBy($"event_type").agg(count(lit(1)).as("k"))
          .crossJoin(broadcast(nUsers))
          .select($"event_type", $"k", $"n",
            (($"k" + 1L).cast("double") / ($"n" + 2L).cast("double"))
              .as("post_mean"),
            ($"k".cast("double") / $"n".cast("double")).as("mle"),
            ((($"k" + 1L) * ($"n" - $"k" + 1L)).cast("double") /
              ((($"n" + 2L) * ($"n" + 2L) * ($"n" + 3L)).cast("double")))
              .as("post_var"))
          .orderBy($"event_type")
      },
      Some("""WITH nu AS (
             |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
             |  FROM events),
             |reach AS (
             |  SELECT event_type, COUNT(*) AS k FROM (
             |    SELECT DISTINCT event_type, user_id FROM events
             |    WHERE ts < TIMESTAMP '2024-01-04')
             |  GROUP BY 1)
             |SELECT event_type, k, nu.n,
             |  CAST(k + 1 AS DOUBLE) / CAST(nu.n + 2 AS DOUBLE) AS post_mean,
             |  CAST(k AS DOUBLE) / CAST(nu.n AS DOUBLE) AS mle,
             |  CAST((k + 1) * (nu.n - k + 1) AS DOUBLE) /
             |    CAST((nu.n + 2) * (nu.n + 2) * (nu.n + 3) AS DOUBLE)
             |    AS post_var
             |FROM reach CROSS JOIN nu ORDER BY event_type""".stripMargin)),

    // Exact Shapley-value attribution (the modern multi-touch attribution,
    // vs the positional rules in the existing attribution query): each of
    // the 4 pre-purchase channels gets its average marginal contribution to
    // conversions over all 2⁴ coalitions. EVERYTHING is integers: users
    // collapse to a 16-value touch-mask histogram in ONE shuffle (bounded
    // state — this is why exact Shapley is tractable at 100 TB for small
    // channel sets), v(S) = converted users whose mask ⊆ S, and the n!-scaled
    // Shapley weights [|S|!·(3−|S|)!] make every credit an exact integer
    // divided once by 4! = 24. Credits sum to v(full)−v(∅) by construction —
    // emitted for audit. Every ORGANIC user touches all four channels (a
    // symmetric game — equal credits, which proves nothing), so partial-
    // coalition fixtures are injected: 20 converters who only saw
    // signup+view, 20 signup-only non-converters, 10 click-only converters —
    // making the credits actually discriminate.
    Q("events_shapley_attribution",
      (s, dir) => {
        import s.implicits._
        val bit = when($"event_type" === "signup", 1L)
          .when($"event_type" === "view", 2L)
          .when($"event_type" === "click", 4L)
          .when($"event_type" === "error", 8L).otherwise(0L)
        def fix(idStart: Long, n: Int, types: Seq[String]) =
          s.range(n).select(($"id" + idStart).as("user_id"),
            explode(array(types.map(lit): _*)).as("event_type"))
        val touches = graft.Tables.events(s, dir)
          .select($"user_id", $"event_type")
          .unionByName(fix(9100L, 20, Seq("signup", "view", "purchase")))
          .unionByName(fix(9200L, 20, Seq("signup")))
          .unionByName(fix(9300L, 10, Seq("click", "purchase")))
        val cm = touches
          .select($"user_id", bit.as("b"),
            ($"event_type" === "purchase").cast("long").as("p"))
          .groupBy($"user_id")
          .agg(expr("bit_or(b)").as("mask"), max($"p").as("conv"))
          .groupBy($"mask").agg(sum($"conv").as("n_conv"))
        val ss = s.range(16).select($"id".as("coal"))
        val v = cm.crossJoin(broadcast(ss))
          .filter($"mask".bitwiseOR($"coal") === $"coal")
          .groupBy($"coal").agg(sum($"n_conv").as("v"))
        val chans = Seq(("signup", 1L), ("view", 2L), ("click", 4L),
          ("error", 8L))
        val chanDf = chans.map { case (nm, b) =>
          s.range(16).select(lit(nm).as("channel"), lit(b).as("cbit"),
            $"id".as("s0"))
        }.reduce(_ unionByName _)
          .filter($"s0".bitwiseAND($"cbit") === 0)
          .withColumn("s1", $"s0".bitwiseOR($"cbit"))
          .withColumn("w", element_at(
            array(lit(6L), lit(2L), lit(2L), lit(6L)),
            expr("cast(bit_count(s0) as int)") + 1))
        chanDf
          .join(broadcast(v.select($"coal".as("s1"), $"v".as("v1"))),
            Seq("s1"), "left")
          .join(broadcast(v.select($"coal".as("s0"), $"v".as("v0"))),
            Seq("s0"), "left")
          .groupBy($"channel")
          .agg(sum($"w" * (coalesce($"v1", lit(0L)) -
            coalesce($"v0", lit(0L)))).as("shapley_x24"))
          .select($"channel", $"shapley_x24",
            ($"shapley_x24".cast("double") / 24.0d).as("shapley"))
          .orderBy($"channel")
      },
      Some("""WITH touches AS (
             |  SELECT user_id, event_type FROM events
             |  UNION ALL
             |  SELECT 9100 + i, t FROM unnest(range(0, 20)) a(i),
             |    unnest(['signup', 'view', 'purchase']) b(t)
             |  UNION ALL
             |  SELECT 9200 + i, 'signup' FROM unnest(range(0, 20)) a(i)
             |  UNION ALL
             |  SELECT 9300 + i, t FROM unnest(range(0, 10)) a(i),
             |    unnest(['click', 'purchase']) b(t)),
             |um AS (
             |  SELECT user_id,
             |    bit_or(CASE event_type WHEN 'signup' THEN 1
             |      WHEN 'view' THEN 2 WHEN 'click' THEN 4
             |      WHEN 'error' THEN 8 ELSE 0 END) AS mask,
             |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS conv
             |  FROM touches GROUP BY 1),
             |cm AS (SELECT mask, CAST(SUM(conv) AS BIGINT) AS n_conv
             |       FROM um GROUP BY 1),
             |v AS (
             |  SELECT s.coal, CAST(SUM(cm.n_conv) AS BIGINT) AS v
             |  FROM unnest(range(0, 16)) s(coal)
             |  JOIN cm ON (cm.mask | s.coal) = s.coal
             |  GROUP BY 1),
             |chans AS (
             |  SELECT * FROM (VALUES ('signup', 1), ('view', 2),
             |    ('click', 4), ('error', 8)) c(channel, cbit)),
             |pairs AS (
             |  SELECT ch.channel, ch.cbit, s.s0, s.s0 | ch.cbit AS s1,
             |    list_value(6, 2, 2, 6)[CAST(bit_count(s.s0) AS INT) + 1]
             |      AS w
             |  FROM chans ch, unnest(range(0, 16)) s(s0)
             |  WHERE (s.s0 & ch.cbit) = 0)
             |SELECT p.channel,
             |  CAST(SUM(p.w * (COALESCE(v1.v, 0) - COALESCE(v0.v, 0)))
             |    AS BIGINT) AS shapley_x24,
             |  CAST(SUM(p.w * (COALESCE(v1.v, 0) - COALESCE(v0.v, 0)))
             |    AS DOUBLE) / 24.0 AS shapley
             |FROM pairs p
             |LEFT JOIN v v1 ON v1.coal = p.s1
             |LEFT JOIN v v0 ON v0.coal = p.s0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hodges-Lehmann estimator — the robust location estimate (median of all
    // pairwise means, ~95% efficient under normality yet outlier-immune)
    // over a deterministic 200-order evaluation slice (TakeOrdered — the
    // pairwise lattice is quadratic by definition, so production bounds the
    // sample, not the corpus). Pairwise sums stay in exact integer cents;
    // the median uses the same interpolated-percentile semantics as
    // agg_percentile_cont.
    Q("agg_hodges_lehmann",
      (s, dir) => {
        import s.implicits._
        val sample = t(s, dir, "orders")
          .select($"o_orderkey",
            ($"o_totalprice".cast("decimal(18,2)") * 100)
              .cast("bigint").as("cents"))
          .orderBy($"o_orderkey").limit(200)
          .localCheckpoint()
        val pairs = sample.as("a").join(sample.as("b"),
            $"a.o_orderkey" <= $"b.o_orderkey")
          .select((($"a.cents" + $"b.cents").cast("double") / 200.0d)
            .as("pair_mean"))
        pairs.agg(count(lit(1)).as("n_pairs"),
            expr("percentile(pair_mean, 0.5D)").as("hodges_lehmann"))
      },
      Some("""WITH sample_ AS (
             |  SELECT o_orderkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS cents
             |  FROM orders ORDER BY o_orderkey LIMIT 200),
             |pairs AS (
             |  SELECT CAST(a.cents + b.cents AS DOUBLE) / 200.0 AS pair_mean
             |  FROM sample_ a JOIN sample_ b
             |    ON a.o_orderkey <= b.o_orderkey)
             |SELECT COUNT(*) AS n_pairs,
             |  quantile_cont(pair_mean, 0.5) AS hodges_lehmann
             |FROM pairs""".stripMargin)),

    // Neyman optimal allocation — survey-sampling's answer to "how should a
    // fixed labeling/eval budget be split across strata": n_h ∝ N_h·σ_h
    // (bigger and more variable strata get more samples). Stratum variances
    // are decimal-exact moments; σ is IEEE sqrt; shares divide once by the
    // Σ N_h·σ_h scalar (decimal-summed over the bounded stratum frame so the
    // total is order-free); allocations floor a 1000-sample budget.
    Q("sample_neyman_allocation",
      (s, dir) => {
        import s.implicits._
        val strata = t(s, dir, "customer")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_h"),
            davg($"c_acctbal").as("m1"),
            davg($"c_acctbal" * $"c_acctbal", 2).as("m2"))
          .select($"c_mktsegment", $"n_h",
            ($"n_h".cast("double") * sqrt($"m2" - $"m1" * $"m1"))
              .as("nh_sigma"))
        val tot = strata.agg(
          sum($"nh_sigma".cast("decimal(30,6)")).cast("double").as("tot"))
        strata.crossJoin(broadcast(tot))
          .select($"c_mktsegment", $"n_h",
            ($"nh_sigma" / $"tot").as("share"),
            floor(lit(1000.0d) * ($"nh_sigma" / $"tot")).cast("long")
              .as("alloc_of_1000"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""WITH strata AS (
              |  SELECT c_mktsegment, COUNT(*) AS n_h,
              |    ${sqlDavg("c_acctbal")} AS m1,
              |    ${sqlDavg("c_acctbal * c_acctbal", 2)} AS m2
              |  FROM customer GROUP BY 1),
              |ns AS (
              |  SELECT c_mktsegment, n_h,
              |    CAST(n_h AS DOUBLE) * sqrt(m2 - m1 * m1) AS nh_sigma
              |  FROM strata),
              |tot AS (
              |  SELECT CAST(SUM(CAST(nh_sigma AS DECIMAL(30,6))) AS DOUBLE)
              |    AS tot
              |  FROM ns)
              |SELECT ns.c_mktsegment, ns.n_h,
              |  ns.nh_sigma / tot.tot AS share,
              |  CAST(floor(1000.0::DOUBLE * (ns.nh_sigma / tot.tot))
              |    AS BIGINT) AS alloc_of_1000
              |FROM ns CROSS JOIN tot ORDER BY ns.c_mktsegment""".stripMargin)),

    // Power analysis / minimum detectable effect — the question every A/B
    // test starts with ("can this experiment even see the effect we care
    // about?"): MDE = (z_{α/2}+z_β)·σ_pooled·√(2/n) at α=0.05, power 0.8
    // (z constants fixed — no inverse-normal evaluation). Per-user outcome
    // variance comes from decimal-exact moments per arm, pooled, and the MDE
    // is one pinned IEEE expression with sqrt. Also reported relative to the
    // control mean. Bounded output.
    Q("events_power_mde",
      (s, dir) => {
        import s.implicits._
        val per = graft.Tables.events(s, dir)
          .groupBy(($"user_id" % 2 === 0).as("treated"), $"user_id")
          .agg(dsum($"value").as("x"))
        val arms = per.groupBy($"treated")
          .agg(count(lit(1)).as("n"), davg($"x", 2).as("m1"),
            davg($"x" * $"x", 2).as("m2"))
          .select($"treated", $"n", $"m1", ($"m2" - $"m1" * $"m1").as("v"))
        val wide = arms.agg(
          max(when($"treated", $"n")).as("n_t"),
          max(when(!$"treated", $"n")).as("n_c"),
          max(when($"treated", $"v")).as("v_t"),
          max(when(!$"treated", $"v")).as("v_c"),
          max(when(!$"treated", $"m1")).as("mean_c"))
        wide.select($"n_t", $"n_c", $"mean_c",
            sqrt(($"v_t" + $"v_c") / lit(2.0d)).as("sigma_pooled"),
            (lit(1.96d + 0.84d) * sqrt(($"v_t" + $"v_c") / lit(2.0d)) *
              sqrt(lit(2.0d) / $"n_c".cast("double"))).as("mde_abs"),
            ((lit(1.96d + 0.84d) * sqrt(($"v_t" + $"v_c") / lit(2.0d)) *
              sqrt(lit(2.0d) / $"n_c".cast("double"))) / $"mean_c")
              .as("mde_rel"))
      },
      Some(s"""WITH per AS (
              |  SELECT user_id % 2 = 0 AS treated, user_id,
              |    ${sqlDsum("value")} AS x
              |  FROM events GROUP BY 1, 2),
              |arms AS (
              |  SELECT treated, COUNT(*) AS n, ${sqlDavg("x", 2)} AS m1,
              |    ${sqlDavg("x * x", 2)} AS m2
              |  FROM per GROUP BY 1),
              |v AS (SELECT treated, n, m1, m2 - m1 * m1 AS v FROM arms),
              |wide AS (
              |  SELECT
              |    MAX(CASE WHEN treated THEN n END) AS n_t,
              |    MAX(CASE WHEN NOT treated THEN n END) AS n_c,
              |    MAX(CASE WHEN treated THEN v END) AS v_t,
              |    MAX(CASE WHEN NOT treated THEN v END) AS v_c,
              |    MAX(CASE WHEN NOT treated THEN m1 END) AS mean_c
              |  FROM v)
              |SELECT n_t, n_c, mean_c,
              |  sqrt((v_t + v_c) / 2.0::DOUBLE) AS sigma_pooled,
              |  ${1.96 + 0.84} * sqrt((v_t + v_c) / 2.0::DOUBLE) *
              |    sqrt(2.0::DOUBLE / CAST(n_c AS DOUBLE)) AS mde_abs,
              |  (${1.96 + 0.84} * sqrt((v_t + v_c) / 2.0::DOUBLE) *
              |    sqrt(2.0::DOUBLE / CAST(n_c AS DOUBLE))) / mean_c
              |    AS mde_rel
              |FROM wide""".stripMargin)),

    // Luhn checksum minting (ISO/IEC 7812 mod-10) — the validation digit on
    // every payment card and many national IDs; pipelines generating or
    // validating account-shaped identifiers need it exactly. Digits come
    // from pure integer arithmetic (key/10^i % 10), the double-every-second
    // rule folds 2d>9 to 2d−9, and the check digit closes the sum to ≡0
    // (mod 10) — all identical integer ops on both engines, map-only.
    Q("fn_luhn_checksum",
      (s, dir) => {
        import s.implicits._
        val digitSum = (0 until 12).map { i =>
          val p = math.pow(10, i).toLong
          val d = expr(s"(o_orderkey div $p) % 10")
          if (i % 2 == 0) when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
          else d
        }.reduceLeft(_ + _)
        t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey", digitSum.as("ds"))
          .select($"o_orderkey", $"ds",
            ((lit(10L) - ($"ds" % 10L)) % 10L).as("luhn_check_digit"))
          .orderBy($"o_orderkey")
      },
      Some {
        val terms = (0 until 12).map { i =>
          val p = math.pow(10, i).toLong
          val d = s"((o_orderkey // $p) % 10)"
          if (i % 2 == 0)
            s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
          else d
        }.mkString(" + ")
        s"""SELECT o_orderkey, CAST(($terms) AS BIGINT) AS ds,
           |  CAST((10 - (($terms) % 10)) % 10 AS BIGINT)
           |    AS luhn_check_digit
           |FROM orders WHERE o_orderkey < 1000
           |ORDER BY o_orderkey""".stripMargin
      }),

    // Letterbox/border detection — the crop-preprocessing pass for
    // screenshots and video frames: widths of the uniform-black margins per
    // side, from pure pixel scans in the codec stage. Even ids carry an
    // injected 2-pixel border, odd ids none; the synthetic interior can
    // never form an all-black row or column, so the oracle's fixture-side
    // expected values (2 vs 0) are exact — a detector off-by-one on any side
    // hash-mismatches.
    Q("multimodal_border_detect",
      (s, dir) => {
        import s.implicits._
        Multimodal.borderWidths(s,
            Multimodal.syntheticBorderedImages(s,
              t(s, dir, "documents").filter($"doc_id" < 100)))
          .toDF("doc_id", "top", "bottom", "left_", "right_")
          .select($"doc_id", $"top".cast("long").as("top"),
            $"bottom".cast("long").as("bottom"),
            $"left_".cast("long").as("left_px"),
            $"right_".cast("long").as("right_px"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS top,
             |  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS bottom,
             |  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS left_px,
             |  CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS right_px
             |FROM documents WHERE doc_id < 100
             |ORDER BY doc_id""".stripMargin)),

    // Stereo channel statistics — the interleaved-layout fixture (channel
    // deinterleave bugs are the classic multi-channel codec error): left
    // channel runs the standard mod-ramp, right a shifted one, so swapped or
    // mis-strided channels produce different sums than the oracle's
    // per-channel formulas. One codec-stage pass, striding the real decoded
    // interleaved samples.
    Q("multimodal_audio_stereo",
      (s, dir) => {
        import s.implicits._
        Multimodal.stereoChannelStats(s,
            Multimodal.syntheticStereoAudio(s,
              t(s, dir, "documents").filter($"doc_id" < 100)))
          .toDF("doc_id", "channel", "n_frames", "sum_s", "energy")
          .select($"doc_id", $"channel".cast("long").as("channel"),
            $"n_frames", $"sum_s", $"energy")
          .orderBy($"doc_id", $"channel")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 400 + (doc_id % 5) * 100 AS n
             |  FROM documents WHERE doc_id < 100),
             |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
             |v AS (
             |  SELECT doc_id, 0 AS channel,
             |    (doc_id*37 + i*13) % 2048 - 1024 AS s
             |  FROM sm
             |  UNION ALL
             |  SELECT doc_id, 1,
             |    ((doc_id + 7)*37 + i*13) % 2048 - 1024
             |  FROM sm)
             |SELECT doc_id, CAST(channel AS BIGINT) AS channel,
             |  COUNT(*) AS n_frames,
             |  CAST(SUM(s) AS BIGINT) AS sum_s,
             |  CAST(SUM(s * s) AS BIGINT) AS energy
             |FROM v GROUP BY 1, 2 ORDER BY doc_id, channel""".stripMargin)),

    // Cohort LTV projection — growth analytics' composition of retention and
    // monetization: for day-offsets 0..13, retention rate r_k (distinct
    // users active at first_day+k over cohort size) times the cohort's mean
    // daily revenue-per-active-user v̄_k, cumulated into the projected
    // 14-day LTV. All rates are exact integer ratios; the cumulative sum
    // runs over the BOUNDED offset frame. One shuffle for activity, one for
    // the cohort size scalar.
    Q("events_ltv_projection",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
        val firsts = ev.groupBy($"user_id")
          .agg(to_date(min($"ts")).as("d0"))
        val act = ev.join(firsts, "user_id")
          .select($"user_id", datediff(to_date($"ts"), $"d0").as("k"),
            $"value")
          .filter($"k" < 14)
        val perK = act.groupBy($"k")
          .agg(countDistinct($"user_id").as("active"),
            dsum($"value").as("rev"))
        val cohort = firsts.agg(count(lit(1)).as("n_cohort"))
        val base = perK.crossJoin(broadcast(cohort))
          .select($"k".cast("long").as("k"), $"active", $"n_cohort",
            ($"active".cast("double") / $"n_cohort".cast("double"))
              .as("retention"),
            ($"rev" / $"n_cohort".cast("double")).as("rev_per_cohort_user"))
        // cumulative over the BOUNDED 14-offset frame via a triangular join
        // (a global running-sum window would collapse to one partition)
        val cums = base.select($"k".as("k2"),
          $"rev_per_cohort_user".as("rp2"))
        base.join(broadcast(cums), $"k2" <= $"k")
          .groupBy($"k", $"active", $"n_cohort", $"retention",
            $"rev_per_cohort_user")
          .agg(sum($"rp2".cast("decimal(30,8)")).cast("double")
            .as("ltv_cum"))
          .orderBy($"k")
      },
      Some(s"""WITH firsts AS (
              |  SELECT user_id, CAST(min(ts) AS DATE) AS d0
              |  FROM events GROUP BY 1),
              |act AS (
              |  SELECT e.user_id,
              |    date_diff('day', f.d0, CAST(e.ts AS DATE)) AS k, e.value
              |  FROM events e JOIN firsts f USING (user_id)),
              |perk AS (
              |  SELECT k, COUNT(DISTINCT user_id) AS active,
              |    ${sqlDsum("value")} AS rev
              |  FROM act WHERE k < 14 GROUP BY 1),
              |cohort AS (SELECT COUNT(*) AS n_cohort FROM firsts),
              |base AS (
              |  SELECT CAST(k AS BIGINT) AS k, active,
              |    CAST(cohort.n_cohort AS BIGINT) AS n_cohort,
              |    CAST(active AS DOUBLE) / CAST(cohort.n_cohort AS DOUBLE)
              |      AS retention,
              |    rev / CAST(cohort.n_cohort AS DOUBLE)
              |      AS rev_per_cohort_user
              |  FROM perk CROSS JOIN cohort)
              |SELECT a.k, a.active, a.n_cohort, a.retention,
              |  a.rev_per_cohort_user,
              |  CAST(SUM(CAST(b.rev_per_cohort_user AS DECIMAL(30,8)))
              |    AS DOUBLE) AS ltv_cum
              |FROM base a JOIN base b ON b.k <= a.k
              |GROUP BY 1, 2, 3, 4, 5 ORDER BY a.k""".stripMargin)),

    // ORDER BY ALL (Spark 4 / DuckDB shared surface sugar): every projected
    // column, left to right, as the sort key — the interactive-analytics
    // convenience now in both engines' parsers. The oracle spells it the
    // same way, so the row is literally testing the shared syntax.
    Q("sql_order_by_all",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("nation_oba")
        s.sql("""SELECT n_regionkey, n_name FROM nation_oba ORDER BY ALL""")
      },
      Some("SELECT n_regionkey, n_name FROM nation ORDER BY ALL")),

    // SELECT * EXCEPT (Spark 4's star-modifier; DuckDB spells it EXCLUDE) —
    // the wide-table projection convenience that avoids enumerating dozens
    // of kept columns to drop one.
    Q("sql_star_except",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("nation_sx")
        s.sql(
          "SELECT * EXCEPT (n_regionkey) FROM nation_sx ORDER BY n_nationkey")
      },
      Some("SELECT * EXCLUDE (n_regionkey) FROM nation ORDER BY n_nationkey"))
,
    // X-bar/R control chart limits (Shewhart SPC — the factory-floor
    // monitoring discipline applied to metric pipelines): daily subgroup
    // means and ranges over event values, control limits at grand-mean
    // ± A₂·R̄ with the standard A₂ tabulated constant for the subgroup-size
    // bucket (constants fixed — no distribution evaluation). Exact decimal
    // subgroup moments; out-of-control days counted against the limits the
    // data itself sets. Bounded output: one row per day + limit columns.
    Q("agg_control_chart",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd")
            .as("day"))
          .agg(count(lit(1)).as("n"), davg($"value").as("xbar"),
            (max($"value") - min($"value")).as("rng"))
        // individuals-chart limits at ±2σ of the PLOTTED statistic (the
        // daily means) — 2σ, not the textbook 3σ, because 30 points at 3σ
        // would flag nothing and leave the gate untested; σ from exact
        // decimal moments of the bounded daily frame, one IEEE sqrt
        val lims = daily.agg(
          davg($"xbar", 8).as("grand_mean"),
          davg($"xbar" * $"xbar", 6).as("m2"))
        daily.crossJoin(broadcast(lims))
          .withColumn("sd", sqrt($"m2" - $"grand_mean" * $"grand_mean"))
          .select($"day", $"n", $"xbar", $"rng", $"grand_mean",
            ($"grand_mean" + lit(2.0d) * $"sd").as("ucl"),
            ($"grand_mean" - lit(2.0d) * $"sd").as("lcl"),
            ($"xbar" > $"grand_mean" + lit(2.0d) * $"sd" ||
              $"xbar" < $"grand_mean" - lit(2.0d) * $"sd")
              .as("out_of_control"))
          .orderBy($"day")
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
              |    COUNT(*) AS n, ${sqlDavg("value")} AS xbar,
              |    MAX(value) - MIN(value) AS rng
              |  FROM events GROUP BY 1),
              |lims AS (
              |  SELECT ${sqlDavg("xbar", 8)} AS grand_mean,
              |    ${sqlDavg("xbar * xbar", 6)} AS m2
              |  FROM daily),
              |ld AS (
              |  SELECT d.*, l.grand_mean,
              |    sqrt(l.m2 - l.grand_mean * l.grand_mean) AS sd
              |  FROM daily d CROSS JOIN lims l)
              |SELECT strftime(day, '%Y-%m-%d') AS day, n, xbar, rng,
              |  grand_mean,
              |  grand_mean + 2.0::DOUBLE * sd AS ucl,
              |  grand_mean - 2.0::DOUBLE * sd AS lcl,
              |  (xbar > grand_mean + 2.0::DOUBLE * sd OR
              |   xbar < grand_mean - 2.0::DOUBLE * sd) AS out_of_control
              |FROM ld ORDER BY day""".stripMargin)),

    // IPv4 derivation + CIDR membership — network-log enrichment (the
    // firewall/geo join every access-log pipeline starts with), on synthetic
    // addresses minted from order keys: octets by pure integer div/mod,
    // dotted-quad formatting, and prefix membership via the same integer
    // arithmetic a longest-prefix-match table uses (ip div 2^(32−len) =
    // prefix div 2^(32−len)). Map-only, no floats anywhere.
    Q("fn_ipv4_cidr",
      (s, dir) => {
        import s.implicits._
        val ip = ($"o_orderkey" * 2654435761L) % 4294967296L
        t(s, dir, "orders").filter($"o_orderkey" < 500)
          .select($"o_orderkey", ip.as("ip"))
          .select($"o_orderkey", $"ip",
            concat_ws(".",
              expr("cast(ip div 16777216 as string)"),
              expr("cast((ip div 65536) % 256 as string)"),
              expr("cast((ip div 256) % 256 as string)"),
              expr("cast(ip % 256 as string)")).as("dotted"),
            expr("ip div 16777216 = 10").as("in_10_slash8"),
            expr("ip div 16777216 = 10 OR " +
              "ip div 1048576 between 2752 and 2767 OR " +
              "ip div 65536 = 49320").as("is_private"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH ips AS (
             |  SELECT o_orderkey,
             |    (o_orderkey * 2654435761) % 4294967296 AS ip
             |  FROM orders WHERE o_orderkey < 500)
             |SELECT o_orderkey, ip,
             |  CAST(ip // 16777216 AS VARCHAR) || '.' ||
             |  CAST((ip // 65536) % 256 AS VARCHAR) || '.' ||
             |  CAST((ip // 256) % 256 AS VARCHAR) || '.' ||
             |  CAST(ip % 256 AS VARCHAR) AS dotted,
             |  ip // 16777216 = 10 AS in_10_slash8,
             |  (ip // 16777216 = 10 OR ip // 1048576 BETWEEN 2752 AND 2767
             |    OR ip // 65536 = 49320) AS is_private
             |FROM ips ORDER BY o_orderkey""".stripMargin)),

    // XYZ variability classification — supply-chain's companion to the ABC
    // revenue ranking already in the corpus: parts classed by demand
    // coefficient of variation (X steady, Y variable, Z erratic). The CV
    // thresholds (0.5 and 1.0) compare CROSS-MULTIPLIED — σ² < 0.25·μ² and
    // σ² < μ² in exact decimal moments — so the class boundary never touches
    // a float division or sqrt. One shuffle, bounded class output.
    Q("agg_xyz_classification",
      (s, dir) => {
        import s.implicits._
        val m = t(s, dir, "lineitem")
          .groupBy($"l_partkey")
          .agg(count(lit(1)).as("n_obs"),
            davg($"l_quantity").as("mu"),
            davg($"l_quantity" * $"l_quantity").as("m2"))
          .select($"l_partkey", $"n_obs", $"mu",
            ($"m2" - $"mu" * $"mu").as("sigma2"))
        val classed = m.select($"l_partkey", $"n_obs",
          when($"sigma2" * 4.0d < $"mu" * $"mu", "X")
            .when($"sigma2" < $"mu" * $"mu", "Y")
            .otherwise("Z").as("xyz_class"))
        classed.groupBy($"xyz_class")
          .agg(count(lit(1)).as("n_parts"),
            min($"l_partkey").as("min_part"),
            max($"l_partkey").as("max_part"))
          .orderBy($"xyz_class")
      },
      Some(s"""WITH m AS (
              |  SELECT l_partkey, COUNT(*) AS n_obs,
              |    ${sqlDavg("l_quantity")} AS mu,
              |    ${sqlDavg("l_quantity * l_quantity")} AS m2
              |  FROM lineitem GROUP BY 1),
              |cl AS (
              |  SELECT l_partkey, n_obs,
              |    CASE WHEN (m2 - mu * mu) * 4.0 < mu * mu THEN 'X'
              |      WHEN (m2 - mu * mu) < mu * mu THEN 'Y'
              |      ELSE 'Z' END AS xyz_class
              |  FROM m)
              |SELECT xyz_class, COUNT(*) AS n_parts,
              |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part
              |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Geohash encoding (Niemeyer's interleaved-bit base32 grid key — the
    // spatial bucketing join key): synthetic lat/lon minted from customer
    // keys as 20-bit quantized integers, bit-interleaved (even positions
    // longitude, per the spec) into a 40-bit code and emitted as an 8-char
    // base32 geohash. All shifts/masks generated identically for both
    // engines; map-only. The geohash PREFIX property (shared prefix ⇔
    // nearby cell) is what makes it a spatial join key at scale.
    Q("fn_geohash_encode",
      (s, dir) => {
        import s.implicits._
        val latq = expr("(c_custkey * 2654435761) % 1048576")
        val lonq = expr("(c_custkey * 40503) % 1048576")
        val code = (0 until 20).map { k =>
          expr(s"(((c_custkey * 40503) % 1048576) div ${1L << k} % 2) * " +
            s"${1L << (2 * k + 1)} + " +
            s"(((c_custkey * 2654435761) % 1048576) div ${1L << k} % 2) * " +
            s"${1L << (2 * k)}")
        }.reduceLeft(_ + _)
        val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        t(s, dir, "customer").filter($"c_custkey" <= 200)
          .select($"c_custkey", latq.as("latq"), lonq.as("lonq"),
            code.as("code"))
          .select($"c_custkey", $"latq", $"lonq", $"code",
            concat((7 to 0 by -1).map { j =>
              element_at(array(alpha.map(c => lit(c.toString)): _*),
                expr(s"cast(code div ${1L << (5 * j)} % 32 as int)") + 1)
            }: _*).as("geohash"))
          .orderBy($"c_custkey")
      },
      Some {
        val codeTerms = (0 until 20).map { k =>
          s"(((c_custkey * 40503) % 1048576) // ${1L << k} % 2) * " +
            s"${1L << (2 * k + 1)} + " +
            s"(((c_custkey * 2654435761) % 1048576) // ${1L << k} % 2) * " +
            s"${1L << (2 * k)}"
        }.mkString(" + ")
        val ghChars = (7 to 0 by -1).map { j =>
          s"substring('0123456789bcdefghjkmnpqrstuvwxyz', " +
            s"CAST(code // ${1L << (5 * j)} % 32 AS INT) + 1, 1)"
        }.mkString(" || ")
        s"""WITH c AS (
           |  SELECT c_custkey,
           |    (c_custkey * 2654435761) % 1048576 AS latq,
           |    (c_custkey * 40503) % 1048576 AS lonq,
           |    ($codeTerms) AS code
           |  FROM customer WHERE c_custkey <= 200)
           |SELECT c_custkey, latq, lonq, code,
           |  $ghChars AS geohash
           |FROM c ORDER BY c_custkey""".stripMargin
      }),

    // Geohash-bucketed neighbor join — the join the grid key exists FOR:
    // candidate pairs come from an EQUI-join on the 4-char geohash prefix
    // (each prefix is a ~20-bit cell, so the pair space is per-cell
    // quadratic, never corpus-quadratic), then exact integer L1 distance on
    // the quantized coordinates confirms. The scale contract of every
    // banded similarity join in this corpus, applied to space.
    Q("join_geohash_neighbors",
      (s, dir) => {
        import s.implicits._
        val code = (0 until 20).map { k =>
          expr(s"(((c_custkey * 40503) % 1048576) div ${1L << k} % 2) * " +
            s"${1L << (2 * k + 1)} + " +
            s"(((c_custkey * 2654435761) % 1048576) div ${1L << k} % 2) * " +
            s"${1L << (2 * k)}")
        }.reduceLeft(_ + _)
        val pts = t(s, dir, "customer")
          .select($"c_custkey",
            expr("(c_custkey * 2654435761) % 1048576").as("latq"),
            expr("(c_custkey * 40503) % 1048576").as("lonq"),
            code.as("code"))
          // 2-char prefix = top 10 bits of the 40-bit code (the top 5 bits
          // of each axis) — coarse enough that cells are populated at this
          // point density; a denser corpus would keep more prefix chars
          .withColumn("cell", expr("code div 1073741824"))
        val a = pts.select($"cell", $"c_custkey".as("ka"),
          $"latq".as("lata"), $"lonq".as("lona"))
        val b = pts.select($"cell", $"c_custkey".as("kb"),
          $"latq".as("latb"), $"lonq".as("lonb"))
        a.join(b, Seq("cell"))
          .filter($"ka" < $"kb")
          .select($"cell", $"ka", $"kb",
            (abs($"lata" - $"latb") + abs($"lona" - $"lonb")).as("l1"))
          .filter($"l1" < 40000L)
          .orderBy($"ka", $"kb")
      },
      Some {
        val codeTerms = (0 until 20).map { k =>
          s"(((c_custkey * 40503) % 1048576) // ${1L << k} % 2) * " +
            s"${1L << (2 * k + 1)} + " +
            s"(((c_custkey * 2654435761) % 1048576) // ${1L << k} % 2) * " +
            s"${1L << (2 * k)}"
        }.mkString(" + ")
        s"""WITH pts AS (
           |  SELECT c_custkey,
           |    (c_custkey * 2654435761) % 1048576 AS latq,
           |    (c_custkey * 40503) % 1048576 AS lonq,
           |    ($codeTerms) // 1073741824 AS cell
           |  FROM customer)
           |SELECT a.cell, a.c_custkey AS ka, b.c_custkey AS kb,
           |  abs(a.latq - b.latq) + abs(a.lonq - b.lonq) AS l1
           |FROM pts a JOIN pts b
           |  ON b.cell = a.cell AND a.c_custkey < b.c_custkey
           |WHERE abs(a.latq - b.latq) + abs(a.lonq - b.lonq) < 40000
           |ORDER BY ka, kb""".stripMargin
      }),

    // Dynamic-range compression (the broadcast-audio soft-knee limiter,
    // integer-exact): samples below the 512 threshold pass through, louder
    // ones are compressed 4:1 above the knee with TRUNC division (matching
    // DuckDB's `//` on negatives), preserving sign. Decode → compress →
    // re-encode → re-decode through the real codec; the oracle applies the
    // same piecewise map to the sample formula.
    Q("multimodal_audio_drc",
      (s, dir) => {
        import s.implicits._
        val compressed = Multimodal.syntheticAudio(s,
            t(s, dir, "documents").filter($"doc_id" < 100))
          .mapPartitions(_.map { rec =>
            val pcm = graft.llm.Wav.decode(rec.payload)
            val out = pcm.samples.map { sm =>
              val v = sm.toLong
              val a = math.abs(v)
              val c = if (a <= 512L) a else 512L + (a - 512L) / 4L
              (if (v < 0) -c else c).toShort
            }
            rec.copy(payload = graft.llm.Wav.encode(
              graft.llm.Wav.Pcm(pcm.sampleRate, pcm.channels, out)))
          })(org.apache.spark.sql.Encoders.product[graft.llm.MediaRecord])
        Multimodal.extractAudioFeatures(s, compressed).toDF()
          .select($"doc_id", $"n_samples", $"sum_s",
            $"min_s".cast("long").as("min_s"),
            $"max_s".cast("long").as("max_s"), $"energy")
          .orderBy($"doc_id")
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, 800 + (doc_id % 7) * 100 AS n
             |  FROM documents WHERE doc_id < 100),
             |sm AS (SELECT doc_id, unnest(range(0, n)) AS i FROM dims),
             |v AS (SELECT doc_id,
             |        (doc_id*37 + i*13) % 2048 - 1024 AS s
             |      FROM sm),
             |c AS (SELECT doc_id,
             |        CASE WHEN abs(s) <= 512 THEN s
             |          WHEN s > 0 THEN 512 + (s - 512) // 4
             |          ELSE -(512 + (-s - 512) // 4) END AS s
             |      FROM v)
             |SELECT doc_id, COUNT(*) AS n_samples,
             |  CAST(SUM(s) AS BIGINT) AS sum_s,
             |  CAST(MIN(s) AS BIGINT) AS min_s,
             |  CAST(MAX(s) AS BIGINT) AS max_s,
             |  CAST(SUM(s * s) AS BIGINT) AS energy
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // UTF-8 byte-density audit — bytes-per-character is the encoding cost a
    // byte-level tokenizer pays per script (Latin 1.0, accented ~1.1+, CJK
    // 3.0): octet_length vs char length per doc. The corpus is pure ASCII
    // (ratio exactly 1 everywhere — vacuous), so accented and CJK suffixes
    // are injected into two deterministic doc slices; both counts are exact
    // integers and the ratio one IEEE division.
    Q("text_utf8_density",
      (s, dir) => {
        import s.implicits._
        // explicit \u escapes so a source-file transcoding can never silently
        // de-accent the fixture (the mojibake-fixture convention)
        val accent = " caf\u00e9 na\u00efve r\u00e9sum\u00e9"
        val cjk = " \u6570\u636e\u7ba1\u9053"
        val docs = t(s, dir, "documents")
          .select($"doc_id",
            when($"doc_id" % 10 === 0, concat($"text", lit(accent)))
              .when($"doc_id" % 10 === 1, concat($"text", lit(cjk)))
              .otherwise($"text").as("text"))
        docs.select($"doc_id",
            length($"text").cast("long").as("n_chars"),
            octet_length($"text").cast("long").as("n_bytes"))
          .select($"doc_id", $"n_chars", $"n_bytes",
            ($"n_bytes".cast("double") / $"n_chars".cast("double"))
              .as("bytes_per_char"))
          .orderBy($"doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 THEN text || ' caf' || chr(233)
             |        || ' na' || chr(239) || 've r' || chr(233) || 'sum'
             |        || chr(233)
             |      WHEN doc_id % 10 = 1 THEN text || ' ' || chr(25968)
             |        || chr(25454) || chr(31649) || chr(36947)
             |      ELSE text END AS text
             |  FROM documents)
             |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             |  CAST(strlen(text) AS BIGINT) AS n_bytes,
             |  CAST(strlen(text) AS DOUBLE) / CAST(length(text) AS DOUBLE)
             |    AS bytes_per_char
             |FROM docs ORDER BY doc_id""".stripMargin)),

    // Wald-Wolfowitz runs test — is each user's daily value series random
    // noise or does it trend/cluster? Observed runs of above/below-mean
    // signs (per-user partitioned windows — parallel) against the expected
    // 2n₁n₂/n + 1 under randomness; the expectation is one pinned IEEE
    // expression of exact counts. Users whose observed runs sit far from
    // expected have serially-dependent behavior. Bounded per-user state.
    Q("events_runs_test",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
          .agg(dsum($"value").as("v"))
        val mu = daily.groupBy($"user_id").agg(davg($"v").as("mu"))
        val signed = daily.join(mu, "user_id")
          .select($"user_id", $"day", ($"v" > $"mu").as("hi"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        signed
          .withColumn("prev", lag($"hi", 1).over(w))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_days"),
            sum(when($"hi", 1L).otherwise(0L)).as("n1"),
            sum(when(!$"hi", 1L).otherwise(0L)).as("n2"),
            (sum(when($"prev".isNotNull && $"prev" =!= $"hi", 1L)
              .otherwise(0L)) + 1L).as("runs"))
          .select($"user_id", $"n_days", $"n1", $"n2", $"runs",
            ((lit(2.0d) * $"n1".cast("double") * $"n2".cast("double")) /
              $"n_days".cast("double") + lit(1.0d)).as("expected_runs"))
          .orderBy($"user_id")
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, date_trunc('day', ts) AS day,
              |    ${sqlDsum("value")} AS v
              |  FROM events GROUP BY 1, 2),
              |mu AS (SELECT user_id, ${sqlDavg("v")} AS mu
              |       FROM daily GROUP BY 1),
              |signed AS (
              |  SELECT d.user_id, d.day, d.v > mu.mu AS hi
              |  FROM daily d JOIN mu USING (user_id)),
              |lagged AS (
              |  SELECT user_id, hi,
              |    lag(hi) OVER (PARTITION BY user_id ORDER BY day) AS prev
              |  FROM signed)
              |SELECT user_id, COUNT(*) AS n_days,
              |  CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              |  CAST(SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n2,
              |  CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> hi
              |    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs,
              |  (2.0::DOUBLE * CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END)
              |      AS DOUBLE) *
              |    CAST(SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS DOUBLE)) /
              |    CAST(COUNT(*) AS DOUBLE) + 1.0::DOUBLE AS expected_runs
              |FROM lagged GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Maximum drawdown of the DEMEANED cumulative series — the raw daily
    // values are non-negative (a plain cumulative never dips, drawdown
    // trivially 0), so the statistic runs on each user's cumulative
    // DEVIATION from their own mean daily value: cum_k − k·μ, a random walk
    // whose peak-to-trough drop measures the longest under-performance
    // stretch. Decimal-exact cumulative sums cast once (safe grid), k·μ one
    // IEEE product per row, running peak a plain windowed max — every window
    // partitions by user.
    Q("events_max_drawdown",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
          .agg(sum($"value".cast("decimal(30,4)")).as("v"))
        val mu = daily.groupBy($"user_id").agg(davg($"v").as("mu"))
        val wOrd = Window.partitionBy($"user_id").orderBy($"day")
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
        daily.join(mu, "user_id")
          .withColumn("k", row_number().over(wOrd))
          .withColumn("dev",
            sum($"v").over(wCum).cast("double") -
              $"k".cast("double") * $"mu")
          .withColumn("peak", max($"dev").over(wCum))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_days"),
            max($"peak" - $"dev").as("max_drawdown"))
          .orderBy($"user_id")
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, date_trunc('day', ts) AS day,
              |    SUM(CAST(value AS DECIMAL(30,4))) AS v
              |  FROM events GROUP BY 1, 2),
              |mu AS (SELECT user_id, ${sqlDavg("v")} AS mu
              |       FROM daily GROUP BY 1),
              |c1 AS (
              |  SELECT d.user_id, d.day,
              |    CAST(SUM(d.v) OVER w AS DOUBLE) -
              |      CAST(row_number() OVER w2 AS DOUBLE) * mu.mu AS dev
              |  FROM daily d JOIN mu USING (user_id)
              |  WINDOW w AS (PARTITION BY d.user_id ORDER BY d.day
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |  w2 AS (PARTITION BY d.user_id ORDER BY d.day)),
              |c AS (
              |  SELECT user_id, dev, MAX(dev) OVER w3 AS peak
              |  FROM c1
              |  WINDOW w3 AS (PARTITION BY user_id ORDER BY day
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT user_id, COUNT(*) AS n_days,
              |  MAX(peak - dev) AS max_drawdown
              |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Theil-Sen estimator — the robust regression slope (median of all
    // pairwise slopes; one wild point moves OLS, not this), completing the
    // robust trio next to Hodges-Lehmann and MAD: price-on-quantity slopes
    // over the same TakeOrdered 200-order slice (pairwise by definition —
    // the sample is what production bounds). Slopes are IEEE divisions of
    // exact integer cents/quantities; the median uses the shared
    // interpolated-percentile semantics.
    Q("agg_theil_sen_slope",
      (s, dir) => {
        import s.implicits._
        val sample = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            $"l_quantity".cast("decimal(18,2)").cast("bigint").as("x"),
            ($"l_extendedprice".cast("decimal(18,2)") * 100)
              .cast("bigint").as("y"))
          .orderBy($"l_orderkey", $"l_linenumber").limit(200)
          .localCheckpoint()
        val a = sample.select($"l_orderkey".as("ka"),
          $"l_linenumber".as("la"), $"x".as("xa"), $"y".as("ya"))
        val b = sample.select($"l_orderkey".as("kb"),
          $"l_linenumber".as("lb"), $"x".as("xb"), $"y".as("yb"))
        val slopes = a.join(b,
            struct($"ka", $"la") < struct($"kb", $"lb") && $"xa" =!= $"xb")
          .select((($"yb" - $"ya").cast("double") /
            ($"xb" - $"xa").cast("double")).as("slope"))
        slopes.agg(count(lit(1)).as("n_pairs"),
          expr("percentile(slope, 0.5D)").as("theil_sen_cents_per_unit"))
      },
      Some("""WITH sample_ AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT) AS y
             |  FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200),
             |slopes AS (
             |  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
             |    AS slope
             |  FROM sample_ a JOIN sample_ b
             |    ON (a.l_orderkey, a.l_linenumber) <
             |       (b.l_orderkey, b.l_linenumber)
             |    AND a.x <> b.x)
             |SELECT COUNT(*) AS n_pairs,
             |  quantile_cont(slope, 0.5) AS theil_sen_cents_per_unit
             |FROM slopes""".stripMargin))
  )
}
