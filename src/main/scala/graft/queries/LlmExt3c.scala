package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DataTypes
import graft.llm.{Multimodal, TextFunctions => TF}
import QueryDSL._

/** Fourth-wave operators, part 3 of the [[LlmExt3]] family (split for file
  * size only — same scope, same determinism rules; the family scaladoc lives
  * on [[LlmExt3]]): total-variation drift, mipmap pyramids, bot heuristics,
  * Beta-posterior reach, exact Shapley attribution, Hodges-Lehmann, Neyman
  * allocation, power/MDE, Luhn minting, letterbox/border detection, stereo
  * deinterleave, cohort LTV, ORDER BY ALL and star-EXCEPT sugar, Shewhart
  * control charts, IPv4/CIDR, XYZ classification, geohash encode + neighbor
  * join, audio DRC, UTF-8 density, runs test, max drawdown, Theil-Sen. */
object LlmExt3c {

  val queries: Seq[Q] = Seq(
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
