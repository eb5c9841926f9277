package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Round-10 wave five: integral-image audit, MMR diversified rerank, blocked
  * rank test, storage-encoding audit — same contract as every family
  * (scale-shaped plans, decimal-exact cross-partition reductions, total
  * ORDER BY, DuckDB oracle per query). */
object Analytics6 {

  val queries: Seq[Q] = Seq(

    // Integral image (summed-area table) through the real BMP decode: the
    // O(1)-region-sum structure behind box filters / Haar features. The
    // kernel builds the SAT with the standard recurrence and the output
    // hashes three integer witnesses — total-mass corner, center probe, and
    // an interior rectangle evaluated VIA the four-corner identity
    // A−B−C+D — so a prefix-sum or identity bug flips the hash even when
    // raw totals are right. The oracle recomputes each witness as a direct
    // range sum over the closed-form pixel formula (it never builds a SAT —
    // the identity is what's under test).
    Q("multimodal_image_integral",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.integralStats(s,
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
           |px AS (SELECT doc_id, w, h, x, y, ($gray) AS g FROM xy)
           |SELECT doc_id, ANY_VALUE(w * h) AS n_pix,
           |  CAST(SUM(g) AS BIGINT) AS total,
           |  CAST(SUM(CASE WHEN x <= w // 2 AND y <= h // 2
           |    THEN g ELSE 0 END) AS BIGINT) AS center,
           |  CAST(SUM(CASE WHEN x BETWEEN 2 AND w - 3
           |    AND y BETWEEN 2 AND h - 3 THEN g ELSE 0 END) AS BIGINT)
           |    AS interior
           |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Maximal-marginal-relevance rerank: for each probe, take the top-10
    // exact-cosine candidates, then select 5 iteratively maximizing
    // λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s) with λ=0.7 — the classic
    // diversity/relevance tradeoff every retrieval pipeline bolts onto its
    // ANN top-k. rel and the candidate-candidate sims are decimal-exact
    // cosines rounded at 9 BEFORE scoring, so the selection argmax compares
    // identical doubles on both engines (ties break by vid). All pair
    // frames are probe-bounded (3×corpus rel pass, 10×10 sims per probe
    // via qid equi-join); the 5 selection rounds run over the checkpointed
    // ≤30-row candidate frame.
    Q("sim_mmr_rerank",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        import graft.llm.Similarity
        val e = t(s, dir, "embeddings")
        val probes = e.filter($"vec_id" < 3)
          .select($"vec_id".as("qid"), $"embedding".as("qvec"),
            Similarity.normExact($"embedding").as("qn"))
        val corpus = e.select($"vec_id".as("vid"), $"embedding".as("cvec"),
          Similarity.normExact($"embedding").as("cn"))
        val rel = corpus.join(broadcast(probes), $"vid" =!= $"qid")
          .select($"qid", $"vid", $"cvec", $"cn",
            round(Similarity.dotExact($"qvec", $"cvec") / ($"qn" * $"cn"), 9)
              .as("rel"))
        val cands = rel
          .withColumn("rr", row_number().over(
            Window.partitionBy($"qid").orderBy($"rel".desc, $"vid")))
          .filter($"rr" <= 10)
          .select($"qid", $"vid", $"cvec", $"cn", $"rel")
          .localCheckpoint()
        val sims = cands.select($"qid", $"vid".as("v1"),
            $"cvec".as("e1"), $"cn".as("n1"))
          .join(cands.select($"qid", $"vid".as("v2"),
            $"cvec".as("e2"), $"cn".as("n2")), Seq("qid"))
          .filter($"v1" =!= $"v2")
          .select($"qid", $"v1", $"v2",
            round(Similarity.dotExact($"e1", $"e2") / ($"n1" * $"n2"), 9)
              .as("sim"))
          .localCheckpoint()
        val base = cands.select($"qid", $"vid", $"rel")
        var sel = base
          .withColumn("rn", row_number().over(
            Window.partitionBy($"qid").orderBy($"rel".desc, $"vid")))
          .filter($"rn" === 1)
          .select($"qid", $"vid", lit(1).as("rank"),
            (lit(0.7d) * $"rel").as("score"))
          .localCheckpoint()
        for (r <- 2 to 5) {
          val remaining = base.join(sel.select($"qid", $"vid"),
            Seq("qid", "vid"), "left_anti")
          val ms = sims.join(sel.select($"qid", $"vid".as("v2")),
              Seq("qid", "v2"))
            .groupBy($"qid", $"v1").agg(max($"sim").as("maxsim"))
            .withColumnRenamed("qid", "q2")
          val scored = remaining
            .join(ms, remaining("qid") === ms("q2") &&
              remaining("vid") === ms("v1"))
            .select(remaining("qid"), remaining("vid"), $"rel",
              (lit(0.7d) * $"rel" - lit(0.3d) * $"maxsim").as("score"))
          val pick = scored
            .withColumn("rn", row_number().over(
              Window.partitionBy($"qid").orderBy($"score".desc, $"vid")))
            .filter($"rn" === 1)
            .select($"qid", $"vid", lit(r).as("rank"), $"score")
          sel = sel.union(pick).localCheckpoint()
        }
        sel.select($"qid", $"rank", $"vid", round($"score", 9).as("score"))
          .orderBy($"qid", $"rank")
      },
      Some {
        val rounds = (2 to 5).map { r =>
          s"""sc$r AS (
             |  SELECT c.qid, c.vid, c.rel,
             |    0.7 * c.rel - 0.3 * (
             |      SELECT MAX(s.sim) FROM sims s
             |      JOIN s${r - 1} ON s${r - 1}.qid = s.qid
             |                    AND s${r - 1}.vid = s.v2
             |      WHERE s.qid = c.qid AND s.v1 = c.vid) AS score
             |  FROM cands c
             |  WHERE NOT EXISTS (SELECT 1 FROM s${r - 1}
             |    WHERE s${r - 1}.qid = c.qid AND s${r - 1}.vid = c.vid)),
             |p$r AS (
             |  SELECT qid, vid, $r AS rank, score FROM (
             |    SELECT qid, vid, score, ROW_NUMBER() OVER (PARTITION BY qid
             |      ORDER BY score DESC, vid) AS rn
             |    FROM sc$r) WHERE rn = 1),
             |s$r AS (SELECT qid, vid, rank, score FROM s${r - 1}
             |        UNION ALL SELECT qid, vid, rank, score FROM p$r)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH flat AS (
           |  SELECT vec_id, unnest(embedding) AS v,
           |         generate_subscripts(embedding, 1) AS pos
           |  FROM embeddings),
           |norms AS (
           |  SELECT vec_id,
           |    sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
           |      AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
           |  FROM flat GROUP BY vec_id),
           |rel0 AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS vid,
           |    round(CAST(SUM(CAST(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)
           |      AS DECIMAL(30,12))) AS DOUBLE) /
           |      (nq.nrm * nc.nrm), 9) AS rel
           |  FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id <> c.vec_id
           |  JOIN norms nq ON nq.vec_id = q.vec_id
           |  JOIN norms nc ON nc.vec_id = c.vec_id
           |  WHERE q.vec_id < 3
           |  GROUP BY q.vec_id, c.vec_id, nq.nrm, nc.nrm),
           |cands AS (
           |  SELECT qid, vid, rel FROM (
           |    SELECT qid, vid, rel, ROW_NUMBER() OVER (PARTITION BY qid
           |      ORDER BY rel DESC, vid) AS rr
           |    FROM rel0) WHERE rr <= 10),
           |sims AS (
           |  SELECT c1.qid, c1.vid AS v1, c2.vid AS v2,
           |    round(CAST(SUM(CAST(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)
           |      AS DECIMAL(30,12))) AS DOUBLE) /
           |      (n1.nrm * n2.nrm), 9) AS sim
           |  FROM cands c1 JOIN cands c2
           |    ON c1.qid = c2.qid AND c1.vid <> c2.vid
           |  JOIN flat a ON a.vec_id = c1.vid
           |  JOIN flat b ON b.vec_id = c2.vid AND b.pos = a.pos
           |  JOIN norms n1 ON n1.vec_id = c1.vid
           |  JOIN norms n2 ON n2.vec_id = c2.vid
           |  GROUP BY c1.qid, c1.vid, c2.vid, n1.nrm, n2.nrm),
           |s1 AS (
           |  SELECT qid, vid, 1 AS rank, 0.7 * rel AS score FROM (
           |    SELECT qid, vid, rel, ROW_NUMBER() OVER (PARTITION BY qid
           |      ORDER BY rel DESC, vid) AS rn
           |    FROM cands) WHERE rn = 1),
           |$rounds
           |SELECT qid, rank, vid, round(score, 9) AS score
           |FROM s5 ORDER BY qid, rank""".stripMargin
      }),

    // Friedman blocked rank test: does any event type consistently rank
    // higher by mean value across the 30 daily blocks? Ranks within each
    // day over the decimal-exact per-cell means (deterministic total order:
    // mean then type — a documented no-average-ties variant), then
    // Q = 12n/(k(k+1))·Σ(R̄ⱼ−(k+1)/2)². Integer rank sums until the one
    // final formula; all frames after the cell agg are k×n bounded.
    Q("stats_friedman_test",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val cells = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"), $"event_type")
          .agg(davg($"value", 6).as("m"))
        val ranked = cells.withColumn("r", row_number().over(
          Window.partitionBy($"day").orderBy($"m", $"event_type")))
        val byType = ranked.groupBy($"event_type")
          .agg(sum($"r").cast("long").as("rank_sum"),
            count(lit(1)).as("n_blocks"))
        byType.agg(count(lit(1)).as("k"),
            max($"n_blocks").as("n"),
            sum(($"rank_sum" * $"rank_sum").cast("decimal(30,6)"))
              .cast("double").as("ss"))
          .select($"k", $"n",
            round(lit(12.0d) * $"ss" /
              ($"n" * $"k" * ($"k" + 1)).cast("double") -
              lit(3.0d) * $"n" * ($"k" + 1), 6).as("q_stat"))
      },
      Some(s"""WITH cells AS (
              |  SELECT CAST(ts AS DATE) AS day, event_type,
              |    ${sqlDavg("value", 6)} AS m
              |  FROM events GROUP BY 1, 2),
              |ranked AS (
              |  SELECT day, event_type,
              |    ROW_NUMBER() OVER (PARTITION BY day
              |      ORDER BY m, event_type) AS r
              |  FROM cells),
              |bt AS (
              |  SELECT event_type, CAST(SUM(r) AS BIGINT) AS rank_sum,
              |    COUNT(*) AS n_blocks
              |  FROM ranked GROUP BY event_type),
              |a AS (
              |  SELECT COUNT(*) AS k, MAX(n_blocks) AS n,
              |    CAST(SUM(CAST(rank_sum * rank_sum AS DECIMAL(30,6)))
              |      AS DOUBLE) AS ss
              |  FROM bt)
              |SELECT k, n,
              |  round(12.0 * ss / CAST(n * k * (k + 1) AS DOUBLE)
              |    - 3.0 * n * (k + 1), 6) AS q_stat
              |FROM a""".stripMargin)),

    // Delta + varint storage-encoding audit over the sorted event-timestamp
    // stream, bucketed the way a time-series columnar writer would (one row
    // group per day, millisecond deltas within it, bucket base stored raw):
    // per delta bit-width, how many values / total delta mass / varint
    // bytes — the layout diagnostic behind "will this timestamp column
    // compress" (the answer here: a 3..22-bit spectrum, ~2.5 varint bytes
    // vs 8 raw). Width via the length of the binary string
    // (engine-identical for non-negative ints; tie-broken by event_id so
    // equal-ms rows order identically); varint bytes = ceil(width/7). The
    // window partitions by day — independent bounded partitions at any
    // scale, never a global sort.
    Q("scale_delta_varint_audit",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"day").orderBy($"ms", $"event_id")
        graft.Tables.events(s, dir)
          .select(to_date($"ts").as("day"), unix_millis($"ts").as("ms"),
            $"event_id")
          .withColumn("delta", $"ms" - lag($"ms", 1).over(w))
          .filter($"delta".isNotNull)
          .withColumn("width", length(bin($"delta")))
          .groupBy($"width")
          .agg(count(lit(1)).as("n_keys"),
            sum($"delta").cast("long").as("delta_sum"))
          .select($"width", $"n_keys", $"delta_sum",
            ($"n_keys" * ceil($"width".cast("double") / 7).cast("long"))
              .as("varint_bytes"))
          .orderBy($"width")
      },
      Some("""WITH t AS (
             |  SELECT CAST(ts AS DATE) AS day, epoch_ms(ts) AS ms, event_id
             |  FROM events),
             |d AS (
             |  SELECT ms - lag(ms) OVER (
             |      PARTITION BY day ORDER BY ms, event_id) AS delta
             |  FROM t),
             |f AS (SELECT delta, length(bin(delta)) AS width FROM d
             |      WHERE delta IS NOT NULL)
             |SELECT width, COUNT(*) AS n_keys,
             |  CAST(SUM(delta) AS BIGINT) AS delta_sum,
             |  COUNT(*) * CAST(ceil(CAST(width AS DOUBLE) / 7) AS BIGINT)
             |    AS varint_bytes
             |FROM f GROUP BY width ORDER BY width""".stripMargin)),

    // Block-matching motion estimation between the first two frames of the
    // multi-frame payloads — the video-compression primitive (4×4 blocks,
    // ±2 full-search, integer SAD over the grayscale field, ties
    // lexicographic on (dy,dx)). Per-video aggregates carry the
    // (bx+7·by)·(dx+5·dy) checksum, so one block matched to the wrong
    // offset flips the hash; the oracle replays the whole search from the
    // closed-form pixel formula (frame term 17·f) and the same tie order.
    Q("multimodal_video_motion_vectors",
      (s, dir) => {
        import s.implicits._
        import graft.llm.Multimodal
        Multimodal.motionStats(s,
            Multimodal.syntheticVideos(s,
              t(s, dir, "documents").filter($"doc_id" < 100)))
          .toDF()
          .orderBy($"doc_id")
      },
      Some {
        def gg(f: String, xe: String, ye: String) =
          s"""((doc_id*31 + ($f)*17 + ($xe)*7 + ($ye)*13) % 256
             | + (doc_id*31 + ($f)*17 + ($xe)*7 + ($ye)*13 + 101) % 256
             | + (doc_id*31 + ($f)*17 + ($xe)*7 + ($ye)*13 + 202) % 256)"""
            .stripMargin.replaceAll("\\s+", " ")
        s"""WITH dims AS (
           |  SELECT doc_id, 12 + doc_id % 6 AS w, 10 + doc_id % 5 AS h
           |  FROM documents WHERE doc_id < 100),
           |bxs AS (SELECT doc_id, w, h, unnest(range(0, w // 4)) AS bx
           |        FROM dims),
           |blocks AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 4)) AS by
           |           FROM bxs),
           |offs AS (SELECT doc_id, w, h, bx, by, unnest(range(-2, 3)) AS dy
           |         FROM blocks),
           |offs2 AS (SELECT doc_id, w, h, bx, by, dy,
           |            unnest(range(-2, 3)) AS dx
           |          FROM offs
           |          WHERE by * 4 + dy >= 0 AND by * 4 + 3 + dy < h),
           |valid AS (SELECT * FROM offs2
           |          WHERE bx * 4 + dx >= 0 AND bx * 4 + 3 + dx < w),
           |pxs AS (SELECT doc_id, bx, by, dx, dy,
           |          unnest(range(0, 4)) AS px
           |        FROM valid),
           |pxy AS (SELECT doc_id, bx, by, dx, dy, px,
           |          unnest(range(0, 4)) AS py
           |        FROM pxs),
           |sad AS (
           |  SELECT doc_id, bx, by, dx, dy,
           |    SUM(abs(
           |      ${gg("1", "bx*4 + px", "by*4 + py")} -
           |      ${gg("0", "bx*4 + px + dx", "by*4 + py + dy")})) AS sad
           |  FROM pxy GROUP BY doc_id, bx, by, dx, dy),
           |best AS (
           |  SELECT doc_id, bx, by, dx, dy, sad FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, bx, by
           |      ORDER BY sad, dy, dx) AS rn
           |    FROM sad) WHERE rn = 1)
           |SELECT doc_id, COUNT(*) AS n_blocks,
           |  CAST(SUM(sad) AS BIGINT) AS sum_sad,
           |  CAST(SUM(dx) AS BIGINT) AS sum_dx,
           |  CAST(SUM(dy) AS BIGINT) AS sum_dy,
           |  CAST(SUM((bx + 7*by) * (dx + 5*dy)) AS BIGINT) AS wsum_mv
           |FROM best GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Iterative proportional fitting (survey raking): adjust the
    // event_type × ISO-dow contingency weights to match uniform target
    // margins (total/5 per type, total/7 per dow) with 5 row/column scaling
    // rounds. The per-round margin sums go through decimal recasts so every
    // reduction is partitioning-independent; the cell grid stays
    // |types|×|dows| rows after the one fact-sized pass; scalars attach via
    // the sanctioned single-row cross. The oracle unrolls the same 10
    // scaling steps. Converged weights hash at round-6.
    Q("stats_ipf_raking",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables.events(s, dir)
          .select($"event_type",
            (((dayofweek(to_date($"ts")) + lit(5)) % 7) + 1).as("dow"))
        val tot = ev.agg(count(lit(1)).as("n_tot"))
        var cells = ev.groupBy($"event_type", $"dow")
          .agg(count(lit(1)).as("n_obs"))
          .crossJoin(broadcast(tot))
          .select($"event_type", $"dow", $"n_obs",
            $"n_obs".cast("double").as("wgt"),
            ($"n_tot".cast("double") / 5).as("rt"),
            ($"n_tot".cast("double") / 7).as("ct"))
          .localCheckpoint()
        for (_ <- 1 to 5) {
          val rs = cells.groupBy($"event_type".as("et2"))
            .agg(sum($"wgt".cast("decimal(30,12)")).cast("double").as("rsum"))
          cells = cells.join(broadcast(rs), $"event_type" === $"et2")
            .select($"event_type", $"dow", $"n_obs",
              ($"wgt" * ($"rt" / $"rsum")).as("wgt"), $"rt", $"ct")
          val cs = cells.groupBy($"dow".as("dw2"))
            .agg(sum($"wgt".cast("decimal(30,12)")).cast("double").as("csum"))
          cells = cells.join(broadcast(cs), $"dow" === $"dw2")
            .select($"event_type", $"dow", $"n_obs",
              ($"wgt" * ($"ct" / $"csum")).as("wgt"), $"rt", $"ct")
            .localCheckpoint()
        }
        cells.select($"event_type", $"dow", $"n_obs",
            round($"wgt", 6).as("w_raked"),
            round($"wgt" / $"n_obs", 6).as("rake_factor"))
          .orderBy($"event_type", $"dow")
      },
      Some {
        val rounds = (1 to 5).map { r =>
          s"""r$r AS (
             |  SELECT c.event_type, c.dow, c.n_obs,
             |    c.wgt * (c.rt / m.rsum) AS wgt, c.rt, c.ct
             |  FROM c${r - 1} c JOIN (
             |    SELECT event_type,
             |      CAST(SUM(CAST(wgt AS DECIMAL(30,12))) AS DOUBLE) AS rsum
             |    FROM c${r - 1} GROUP BY event_type) m
             |    ON c.event_type = m.event_type),
             |c$r AS (
             |  SELECT c.event_type, c.dow, c.n_obs,
             |    c.wgt * (c.ct / m.csum) AS wgt, c.rt, c.ct
             |  FROM r$r c JOIN (
             |    SELECT dow,
             |      CAST(SUM(CAST(wgt AS DECIMAL(30,12))) AS DOUBLE) AS csum
             |    FROM r$r GROUP BY dow) m
             |    ON c.dow = m.dow)""".stripMargin
        }.mkString(",\n")
        s"""WITH ev AS (
           |  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow
           |  FROM events),
           |tot AS (SELECT COUNT(*) AS n_tot FROM ev),
           |c0 AS (
           |  SELECT event_type, dow, COUNT(*) AS n_obs,
           |    CAST(COUNT(*) AS DOUBLE) AS wgt,
           |    CAST(n_tot AS DOUBLE) / 5 AS rt,
           |    CAST(n_tot AS DOUBLE) / 7 AS ct
           |  FROM ev CROSS JOIN tot
           |  GROUP BY event_type, dow, n_tot),
           |$rounds
           |SELECT event_type, dow, n_obs,
           |  round(wgt, 6) AS w_raked,
           |  round(wgt / n_obs, 6) AS rake_factor
           |FROM c5 ORDER BY event_type, dow""".stripMargin
      }),

    // Isotonic (monotone-increasing) regression of the daily mean value via
    // the minimax formula iso(i) = max_{j≤i} min_{k≥j} avg(y[j..k]) — the
    // closed form of pool-adjacent-violators, expressed entirely as bounded
    // join algebra (no sequential pooling): decimal-exact prefix sums, the
    // 30×30 segment lattice, one min per start, one max per position. Every
    // frame after the daily agg is ≤n_days² rows (sanctioned bounded
    // crosses); segment averages are single IEEE divisions of exact sums.
    Q("stats_isotonic_minimax",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).as("cnt"),
            sum($"value".cast("decimal(20,6)")).as("sv"))
          .select($"day", $"cnt", $"sv",
            datediff($"day", lit("2024-01-01").cast("date")).as("t"))
          .localCheckpoint()
        val segs = daily.select($"t".as("j"), $"sv".as("svj"), $"cnt".as("cj"))
          .join(daily.select($"t".as("k"), $"sv".as("svk"),
            $"cnt".as("ck")), $"j" <= $"k")
        // avg over [j..k] from prefix-free pairwise sums: recompute the
        // segment sum as Σ over rows in [j,k] via a second bounded join
        val members = daily.select($"t".as("m"), $"sv".as("svm"),
          $"cnt".as("cm"))
        val segAvg = segs.select($"j", $"k")
          .join(members, $"m" >= $"j" && $"m" <= $"k")
          .groupBy($"j", $"k")
          .agg((sum($"svm").cast("double") /
            sum($"cm").cast("double")).as("avg"))
        val minPerStart = segAvg.groupBy($"j").agg(min($"avg").as("mj"))
        val iso = daily.select($"t".as("i"), $"day", $"sv", $"cnt")
          .join(minPerStart, $"j" <= $"i")
          .groupBy($"i", $"day", $"sv", $"cnt")
          .agg(max($"mj").as("iso"))
        iso.select($"day",
            round($"sv".cast("double") / $"cnt", 6).as("y_mean"),
            round($"iso", 6).as("y_iso"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
             |    SUM(CAST(value AS DECIMAL(20,6))) AS sv,
             |    CAST(ts AS DATE) - DATE '2024-01-01' AS t
             |  FROM events GROUP BY 1, 4),
             |segavg AS (
             |  SELECT j.t AS j, k.t AS k,
             |    CAST(SUM(m.sv) AS DOUBLE) / CAST(SUM(m.cnt) AS DOUBLE)
             |      AS avg
             |  FROM daily j JOIN daily k ON j.t <= k.t
             |  JOIN daily m ON m.t >= j.t AND m.t <= k.t
             |  GROUP BY j.t, k.t),
             |mins AS (SELECT j, MIN(avg) AS mj FROM segavg GROUP BY j),
             |iso AS (
             |  SELECT d.t, d.day, d.sv, d.cnt, MAX(m.mj) AS iso
             |  FROM daily d JOIN mins m ON m.j <= d.t
             |  GROUP BY d.t, d.day, d.sv, d.cnt)
             |SELECT day,
             |  round(CAST(sv AS DOUBLE) / cnt, 6) AS y_mean,
             |  round(iso, 6) AS y_iso
             |FROM iso ORDER BY day""".stripMargin)),

    // Gap-filling by linear interpolation: synthetically blind every fifth
    // day of the daily revenue series, then reconstruct each missing day
    // from its nearest present neighbors — value = prev + (next−prev)·
    // (d−dp)/(dn−dp), exact date arithmetic, single IEEE interpolation of
    // decimal-exact day totals. The neighbor lookups are bounded non-equi
    // joins over the ≤|days| daily frame (the LOCF query's forward-fill
    // generalized to two-sided). Output marks real vs interpolated rows.
    Q("events_gapfill_interpolate",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables.events(s, dir)
          .groupBy(to_date($"ts").as("day"))
          .agg(sum($"value".cast("decimal(20,6)")).as("sv"))
          .select($"day", $"sv",
            datediff($"day", lit("2024-01-01").cast("date")).as("d"))
          .localCheckpoint()
        val present = daily.filter($"d" % 5 =!= 2)
          .select($"day", $"d", $"sv".cast("double").as("v"))
        val missing = daily.filter($"d" % 5 === 2)
          .select($"day".as("mday"), $"d".as("md"))
        val prev = missing.join(present.select($"d".as("pd"),
            $"v".as("pv")), $"pd" < $"md")
          .groupBy($"mday", $"md")
          .agg(max(struct($"pd", $"pv")).as("p"))
          .select($"mday", $"md", $"p.pd".as("pd"), $"p.pv".as("pv"))
        val nxt = missing.join(present.select($"d".as("nd"),
            $"v".as("nv")), $"nd" > $"md")
          .groupBy($"mday", $"md")
          .agg(min(struct($"nd", $"nv")).as("q"))
          .select($"mday", $"md", $"q.nd".as("nd"), $"q.nv".as("nv"))
        val interp = prev.join(nxt, Seq("mday", "md"))
          .select($"mday".as("day"),
            ($"pv" + ($"nv" - $"pv") *
              (($"md" - $"pd").cast("double") /
               ($"nd" - $"pd").cast("double"))).as("v"),
            lit(1).as("interpolated"))
        present.select($"day", $"v", lit(0).as("interpolated"))
          .union(interp)
          .select($"day", round($"v", 6).as("value"), $"interpolated")
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    SUM(CAST(value AS DECIMAL(20,6))) AS sv,
             |    CAST(ts AS DATE) - DATE '2024-01-01' AS d
             |  FROM events GROUP BY 1, 3),
             |present AS (SELECT day, d, CAST(sv AS DOUBLE) AS v
             |            FROM daily WHERE d % 5 <> 2),
             |missing AS (SELECT day AS mday, d AS md
             |            FROM daily WHERE d % 5 = 2),
             |prev AS (
             |  SELECT mday, md, MAX(d) AS pd,
             |    MAX_BY(v, d) AS pv
             |  FROM missing JOIN present ON d < md GROUP BY mday, md),
             |nxt AS (
             |  SELECT mday, md, MIN(d) AS nd,
             |    MIN_BY(v, d) AS nv
             |  FROM missing JOIN present ON d > md GROUP BY mday, md),
             |interp AS (
             |  SELECT p.mday AS day,
             |    pv + (nv - pv) * (CAST(md - pd AS DOUBLE) /
             |      CAST(nd - pd AS DOUBLE)) AS v,
             |    1 AS interpolated
             |  FROM prev p JOIN nxt n USING (mday, md))
             |SELECT day, round(v, 6) AS value, interpolated FROM (
             |  SELECT day, v, 0 AS interpolated FROM present
             |  UNION ALL SELECT day, v, interpolated FROM interp)
             |ORDER BY day""".stripMargin))
  )
}
