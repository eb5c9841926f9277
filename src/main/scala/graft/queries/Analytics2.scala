package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.Multimodal
import QueryDSL._

/** Fifth-wave analytics/ML-feature operators:
  *
  *  - Markov removal-effect attribution (Anderl et al. 2016 shape — the
  *    data-driven multi-touch model marketing stacks run next to Shapley):
  *    absorption probabilities by fixed-iteration value recursion, one
  *    scenario per removed channel;
  *  - HITS hubs & authorities (Kleinberg 1999) over the customer-nation →
  *    supplier-nation trade graph — the asymmetric companion to PageRank
  *    (who aggregates demand vs who concentrates supply);
  *  - leave-one-out target encoding with additive smoothing — the
  *    high-cardinality categorical featurizer whose LOO form prevents
  *    target leakage (each row's own label is subtracted from its group
  *    statistic);
  *  - parquet schema-drift report between two table snapshots (added /
  *    removed / type-changed / unchanged per column, physical types
  *    normalized to pandas-kind classes) — the contract check a pipeline
  *    runs before pointing jobs at a refreshed snapshot.
  *
  * Same determinism rules as every family: exact integer counts, decimal
  * sums for any order-sensitive reduction, single IEEE divisions on exact
  * inputs, fixed iteration counts mirrored by unrolled oracle CTEs. */
object Analytics2 {

  private val channels = Seq("signup", "view", "click", "error")

  val queries: Seq[Q] = Seq(

    // Markov removal-effect attribution: journeys = each user's first-3-days
    // event sequence (start → channels → conv on first purchase, else null),
    // first-order transition probabilities, and P(conv | start) by 12
    // synchronous value-iteration rounds v(i) = Σⱼ p(i,j)·v(j) with
    // v(conv)=1, v(null)=0. A channel's removal effect re-scores the chain
    // with every edge INTO that channel redirected to null (the standard
    // removal semantics; its own out-edges become unreachable). The
    // transition counting is the only corpus-touching stage; the ≤|states|²
    // probability frame (state domain is fixed, NOT data-sized) is collected
    // and the 5-scenario × 12-round iteration runs on the driver with the
    // decimal arithmetic mirrored term-for-term — see the inline note.
    Q("events_markov_attribution",
      (s, dir) => {
        import s.implicits._
        val cutoff = "2024-01-04"
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val rn = graft.Tables.events(s, dir)
          .filter($"ts" < cutoff)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("rn", row_number().over(w))
        val firstP = rn.filter($"event_type" === "purchase")
          .groupBy($"user_id").agg(min($"rn").as("prn"))
        val journey = rn.join(firstP, Seq("user_id"), "left")
          .filter($"prn".isNull || $"rn" <= $"prn")
          .select($"user_id", $"rn",
            when($"event_type" === "purchase", "conv")
              .otherwise($"event_type").as("state"))
        val start = journey.select($"user_id").distinct()
          .select($"user_id", lit(0).as("rn"), lit("start").as("state"))
        val nullEnd = journey.groupBy($"user_id")
          .agg(max($"rn").as("mrn"),
            max(when($"state" === "conv", 1).otherwise(0)).as("has_conv"))
          .filter($"has_conv" === 0)
          .select($"user_id", ($"mrn" + 1).as("rn"), lit("null").as("state"))
        val seq0 = journey.unionByName(start).unionByName(nullEnd)
        val trans = seq0
          .withColumn("nxt",
            lead($"state", 1).over(
              Window.partitionBy($"user_id").orderBy($"rn")))
          .filter($"nxt".isNotNull)
          .groupBy($"state".as("i"), $"nxt".as("j"))
          .agg(count(lit(1)).as("n_ij"))
        val rowTot = trans.groupBy($"i".as("ri")).agg(sum($"n_ij").as("n_i"))
        val p = trans.join(rowTot, $"i" === $"ri")
          .select($"i", $"j",
            ($"n_ij".cast("double") / $"n_i".cast("double")).as("frac"))
        // Value iteration on the DRIVER (r13 rework): the transition frame is
        // bounded by the STATE DOMAIN (|event types| + start/conv/null)² —
        // data-INDEPENDENT, the sanctioned bounded-model-artifact collect —
        // so 12 synchronous rounds × 5 scenarios are microseconds of Scala
        // instead of ~50 tiny Spark jobs of pure scheduler constant (the
        // previous shape cost ~4 s wall at ANY sf). Only the one
        // transition-counting shuffle above touches the corpus at any scale.
        // Decimal arithmetic mirrors the engine/oracle term-for-term:
        // valueOf(double) → setScale(12, HALF_UP) → exact sum → doubleValue
        // is exactly Spark's cast(decimal(30,12)) → sum → cast(double), so
        // the hash is unchanged (verified at sf0.001/0.01/0.1).
        val edges = p.collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        import java.math.{BigDecimal => JBD, RoundingMode}
        def dec12(d: Double) = JBD.valueOf(d).setScale(12, RoundingMode.HALF_UP)
        def rnd9(d: Double) =
          JBD.valueOf(d).setScale(9, RoundingMode.HALF_UP).doubleValue
        val vstart: Map[String, Double] = ("base" +: channels).flatMap { sc =>
          val ps = edges.iterator
            .filter { case (i, _, _) => i != sc }
            .map { case (i, j, f) => (i, if (j == sc) "null" else j, f) }
            .toVector
          var v: Map[String, Double] = Map("conv" -> 1.0d, "null" -> 0.0d)
          (1 to 12).foreach { _ =>
            // inner-join semantics: only edges whose target has a value
            // contribute; a state with no contributing edge drops out (= 0)
            val next = ps.filter { case (_, j2, _) => v.contains(j2) }
              .groupBy(_._1)
              .map { case (i, es) =>
                i -> es.map { case (_, j2, f) => dec12(f * v(j2)) }
                  .reduce(_.add(_)).doubleValue
              }
            v = next ++ Map("conv" -> 1.0d, "null" -> 0.0d)
          }
          v.get("start").map(sc -> _)
        }.toMap
        val basP = vstart("base")
        val eff = channels.flatMap { ch =>
          vstart.get(ch).map { rp =>
            (ch, rp, math.max(0.0d, (basP - rp) / basP))
          }
        }
        val effTot = eff.map(t => dec12(t._3)).reduce(_.add(_)).doubleValue
        eff.map { case (ch, rp, ef) =>
            (ch, rnd9(basP), rnd9(rp), rnd9(ef), rnd9(ef / effTot))
          }
          .sortBy(_._1)
          .toDF("channel", "base_p", "removed_p", "removal_effect",
            "attribution")
      },
      Some {
        val round = (k: Int) =>
          s"""v$k AS (
             |  SELECT ps.scenario, ps.i AS state,
             |    CAST(SUM(CAST(ps.frac * q.v AS DECIMAL(30,12))) AS DOUBLE)
             |      AS v
             |  FROM ps JOIN v${k - 1} q
             |    ON q.scenario = ps.scenario AND q.state = ps.j2
             |  GROUP BY 1, 2
             |  UNION ALL SELECT scenario, state, v FROM absorbing)""".stripMargin
        s"""WITH ev AS (
           |  SELECT user_id, event_type,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS rn
           |  FROM events WHERE ts < TIMESTAMP '2024-01-04'),
           |fp AS (SELECT user_id, MIN(rn) AS prn FROM ev
           |       WHERE event_type = 'purchase' GROUP BY 1),
           |journey AS (
           |  SELECT e.user_id, e.rn,
           |    CASE WHEN e.event_type = 'purchase' THEN 'conv'
           |         ELSE e.event_type END AS state
           |  FROM ev e LEFT JOIN fp USING (user_id)
           |  WHERE fp.prn IS NULL OR e.rn <= fp.prn),
           |seq0 AS (
           |  SELECT user_id, rn, state FROM journey
           |  UNION ALL
           |  SELECT DISTINCT user_id, 0, 'start' FROM journey
           |  UNION ALL
           |  SELECT user_id, MAX(rn) + 1, 'null' FROM journey
           |  GROUP BY user_id
           |  HAVING MAX(CASE WHEN state = 'conv' THEN 1 ELSE 0 END) = 0),
           |pairs AS (
           |  SELECT state AS i,
           |    lead(state) OVER (PARTITION BY user_id ORDER BY rn) AS j
           |  FROM seq0),
           |trans AS (SELECT i, j, COUNT(*) AS n_ij FROM pairs
           |          WHERE j IS NOT NULL GROUP BY 1, 2),
           |p AS (
           |  SELECT t.i, t.j,
           |    CAST(t.n_ij AS DOUBLE) / CAST(rt.n_i AS DOUBLE) AS frac
           |  FROM trans t JOIN (SELECT i, SUM(n_ij) AS n_i FROM trans
           |                     GROUP BY 1) rt ON rt.i = t.i),
           |scen AS (SELECT unnest(['base', ${channels.map(c => s"'$c'")
                .mkString(", ")}]) AS scenario),
           |ps AS (
           |  SELECT scen.scenario, p.i,
           |    CASE WHEN p.j = scen.scenario THEN 'null' ELSE p.j END AS j2,
           |    p.frac
           |  FROM p, scen WHERE p.i <> scen.scenario),
           |absorbing AS (
           |  SELECT scenario, s.state,
           |    CASE WHEN s.state = 'conv' THEN 1.0 ELSE 0.0 END AS v
           |  FROM scen, (SELECT unnest(['conv', 'null']) AS state) s),
           |v0 AS (SELECT scenario, state, v FROM absorbing),
           |${(1 to 12).map(round).mkString(",\n")},
           |vstart AS (SELECT scenario, v FROM v12 WHERE state = 'start'),
           |base AS (SELECT v AS base_p FROM vstart WHERE scenario = 'base'),
           |eff AS (
           |  SELECT vs.scenario AS channel, b.base_p, vs.v AS removed_p,
           |    greatest(0.0, (b.base_p - vs.v) / b.base_p) AS effect
           |  FROM vstart vs, base b WHERE vs.scenario <> 'base'),
           |tot AS (SELECT CAST(SUM(CAST(effect AS DECIMAL(30,12))) AS DOUBLE)
           |          AS eff_tot FROM eff)
           |SELECT channel, round(base_p, 9) AS base_p,
           |  round(removed_p, 9) AS removed_p,
           |  round(effect, 9) AS removal_effect,
           |  round(effect / tot.eff_tot, 9) AS attribution
           |FROM eff, tot ORDER BY channel""".stripMargin
      }),

    // HITS hubs & authorities over the customer-nation → supplier-nation
    // trade graph (same edge rollup as graph_pagerank): 4 synchronous
    // rounds of a ← Wᵀh, h ← W·a on globally pre-scaled weights (one
    // division by the total edge weight — values stay bounded without
    // per-round renormalization, which would cost a scalar cross per
    // round), then one final L1 normalization per side. Each round is one
    // key-partitioned join + decimal-summed agg over the 25-node edge
    // frame; the three single-row crosses (global weight, two final
    // normalizers) are sanctioned scalar fan-ins.
    Q("graph_hits",
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
        val wtot = e.agg(sum($"w").as("wt"))
        val ew = e.crossJoin(broadcast(wtot))
          .select($"src", $"dst",
            ($"w".cast("double") / $"wt".cast("double")).as("frac"))
        // Round 15 (the PowerFold idiom, see graph_pagerank): the 4 rounds of
        // a ← Wᵀh, h ← W·a over the ≤625-row edge frame fold into ONE
        // single-row aggregate over an 8-step parity sequence (odd step
        // updates a from h, even step updates h from a) — the accumulator is
        // the concrete (h, a) array pair, so each half-round evaluates once.
        // Replaces 8 loop checkpoints + per-round join/groupBy exchanges.
        // Decimal gathers are the grouped sums bit-for-bit (order-free);
        // IEEE multiply is commutative so frac·h = h·frac exactly.
        val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
        // (37,12) accumulator: +(30,12) promotes to exactly (38,12) — scale
        // preserved (a (38,12) acc would promote to precision 39 and Spark
        // would cut the scale to 11, a rounding sum() never does)
        val DEC38 = org.apache.spark.sql.types.DataTypes.createDecimalType(37, 12)
        val row = ew.agg(collect_list(struct($"src", $"dst", $"frac")).as("es"))
          .withColumn("srcs",
            array_sort(array_distinct(transform($"es", e => e("src")))))
          .withColumn("dsts",
            array_sort(array_distinct(transform($"es", e => e("dst")))))
        def gA(h: Column) = transform($"dsts", d =>
          aggregate(filter($"es", e => e("dst") === d), lit(0).cast(DEC38),
            (acc, e) => (acc + (e("frac") * element_at(h,
              array_position($"srcs", e("src")).cast("int")))
              .cast(DEC)).cast(DEC38)).cast("double"))
        def gH(a: Column) = transform($"srcs", sn =>
          aggregate(filter($"es", e => e("src") === sn), lit(0).cast(DEC38),
            (acc, e) => (acc + (e("frac") * element_at(a,
              array_position($"dsts", e("dst")).cast("int")))
              .cast(DEC)).cast(DEC38)).cast("double"))
        val fin = aggregate(sequence(lit(1), lit(8)),
          struct(transform($"srcs", _ => lit(1.0d)).as("h"),
            transform($"dsts", _ => lit(0.0d)).as("a")),
          (acc, k) => when(pmod(k, lit(2)) === 1,
              struct(acc("h").as("h"), gA(acc("h")).as("a")))
            .otherwise(struct(gH(acc("a")).as("h"), acc("a").as("a"))))
        def dsumArr(xs: Column) = aggregate(xs, lit(0).cast(DEC38),
          (acc, x) => (acc + x.cast(DEC)).cast(DEC38)).cast("double")
        row.select($"srcs", $"dsts", fin("h").as("hh"), fin("a").as("aa"),
            array_sort(array_distinct(concat($"srcs", $"dsts"))).as("nodes"))
          .select(explode(transform($"nodes", n => {
            val hpos = array_position($"srcs", n).cast("int")
            val apos = array_position($"dsts", n).cast("int")
            struct(n.as("node"),
              when(hpos > 0,
                round(element_at($"hh", hpos) / dsumArr($"hh"), 9))
                .otherwise(lit(0.0d)).as("hub_share"),
              when(apos > 0,
                round(element_at($"aa", apos) / dsumArr($"aa"), 9))
                .otherwise(lit(0.0d)).as("auth_share"))
          })).as("z"))
          .select($"z.node".as("node"), $"z.hub_share".as("hub_share"),
            $"z.auth_share".as("auth_share"))
          .orderBy($"node")
      },
      Some {
        val round = (k: Int) =>
          s"""a$k AS (
             |  SELECT ew.dst,
             |    CAST(SUM(CAST(ew.frac * h.h AS DECIMAL(30,12))) AS DOUBLE)
             |      AS a
             |  FROM ew JOIN h${k - 1} h ON h.src = ew.src GROUP BY 1),
             |h$k AS (
             |  SELECT ew.src,
             |    CAST(SUM(CAST(ew.frac * a.a AS DECIMAL(30,12))) AS DOUBLE)
             |      AS h
             |  FROM ew JOIN a$k a ON a.dst = ew.dst GROUP BY 1)""".stripMargin
        s"""WITH e AS (
           |  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |wt AS (SELECT SUM(w) AS wt FROM e),
           |ew AS (SELECT src, dst,
           |         CAST(w AS DOUBLE) / CAST(wt.wt AS DOUBLE) AS frac
           |       FROM e, wt),
           |h0 AS (SELECT DISTINCT src, CAST(1.0 AS DOUBLE) AS h FROM ew),
           |${(1 to 4).map(round).mkString(",\n")},
           |ht AS (SELECT CAST(SUM(CAST(h AS DECIMAL(30,12))) AS DOUBLE)
           |         AS ht FROM h4),
           |att AS (SELECT CAST(SUM(CAST(a AS DECIMAL(30,12))) AS DOUBLE)
           |         AS at FROM a4),
           |hs AS (SELECT src AS node, h / ht.ht AS hub_share FROM h4, ht),
           |asx AS (SELECT dst AS node, a / att.at AS auth_share
           |        FROM a4, att)
           |SELECT COALESCE(hs.node, asx.node) AS node,
           |  round(COALESCE(hub_share, 0.0), 9) AS hub_share,
           |  round(COALESCE(auth_share, 0.0), 9) AS auth_share
           |FROM hs FULL JOIN asx ON hs.node = asx.node
           |ORDER BY node""".stripMargin
      }),

    // Leave-one-out target encoding with additive smoothing (m = 20 toward
    // the global prior): enc_i = (Σ_cat y − y_i + m·prior)/(n_cat − 1 + m).
    // The LOO subtraction is what prevents target leakage when the encoding
    // feeds a model trained on the same rows. Group sums are exact integers
    // (binary target), the prior is one integer division, each row's
    // encoding is a pinned IEEE expression — map-only after one bounded
    // rollup joined back by category. The single-row prior cross is a
    // sanctioned scalar fan-in.
    Q("feat_target_encoding",
      (s, dir) => {
        import s.implicits._
        val m = 20.0d
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_mktsegment"),
            $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"c_mktsegment".as("cat"),
            when($"o_totalprice" > 150000.0, 1L).otherwise(0L).as("y"))
        val grp = o.groupBy($"cat")
          .agg(count(lit(1)).as("n_c"), sum($"y").as("sum_y"))
        val prior = o.agg(
          (sum($"y").cast("double") / count(lit(1)).cast("double"))
            .as("prior"))
        o.join(broadcast(grp), "cat")
          .crossJoin(broadcast(prior))
          .filter($"o_orderkey" < 2000)
          .select($"o_orderkey", $"cat", $"y",
            round((($"sum_y" - $"y").cast("double") + lit(m) * $"prior") /
              (($"n_c" - 1L).cast("double") + lit(m)), 9).as("enc_loo"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, c_mktsegment AS cat,
             |    CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |grp AS (SELECT cat, COUNT(*) AS n_c,
             |          CAST(SUM(y) AS BIGINT) AS sum_y
             |        FROM o GROUP BY 1),
             |prior AS (SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |            AS prior FROM o)
             |SELECT o.o_orderkey, o.cat, CAST(o.y AS BIGINT) AS y,
             |  round((CAST(grp.sum_y - o.y AS DOUBLE) + 20.0 * prior.prior) /
             |    (CAST(grp.n_c - 1 AS DOUBLE) + 20.0), 9) AS enc_loo
             |FROM o JOIN grp USING (cat) CROSS JOIN prior
             |WHERE o.o_orderkey < 2000
             |ORDER BY o.o_orderkey""".stripMargin)),

    // Parquet schema-drift report between two snapshots of the same table
    // (v2 drops a column, adds one, and retypes another; an int-width
    // change normalizes away, mirroring the driver's pandas-kind hashing):
    // schemas come from the parquet FOOTERS of two really-written snapshot
    // dirs — metadata-only, no data scan — and diff as a full outer join.
    // The oracle pins the expected report as literals: the contract is the
    // drift table itself. At 100 TB this is the pre-flight gate before
    // pointing jobs at a refreshed snapshot (footer reads cost O(files),
    // not O(bytes)).
    Q("dq_schema_drift",
      (s, dir) => {
        import s.implicits._
        val v1Path = Sinks.scoped(dir, "schema_v1")
        val v2Path = Sinks.scoped(dir, "schema_v2")
        if (!new java.io.File(s"$v1Path/_SUCCESS").exists()) {
          t(s, dir, "orders")
            .select($"o_orderkey", $"o_custkey", $"o_totalprice",
              $"o_orderstatus", $"o_orderdate")
            .limit(100).coalesce(1)
            .write.mode("overwrite").parquet(v1Path)
        }
        if (!new java.io.File(s"$v2Path/_SUCCESS").exists()) {
          t(s, dir, "orders")
            .select($"o_orderkey", $"o_custkey".cast("int").as("o_custkey"),
              $"o_totalprice".cast("string").as("o_totalprice"),
              $"o_orderdate", lit("web").as("o_channel"))
            .limit(100).coalesce(1)
            .write.mode("overwrite").parquet(v2Path)
        }
        def kind(dt: org.apache.spark.sql.types.DataType): String =
          dt.typeName match {
            case "long" | "integer" | "short" | "byte" => "int"
            case "double" | "float" | "decimal" => "float"
            case "timestamp" | "timestamp_ntz" | "date" => "datetime"
            case other => other
          }
        def schemaDf(path: String, col: String) = {
          val fields = s.read.parquet(path).schema.fields.toSeq
            .map(f => (f.name, kind(f.dataType)))
          fields.toDF("column_name", col)
        }
        val v1 = schemaDf(v1Path, "v1_type")
        val v2 = schemaDf(v2Path, "v2_type")
        v1.join(v2, Seq("column_name"), "full")
          .select($"column_name", $"v1_type", $"v2_type",
            when($"v1_type".isNull, "added")
              .when($"v2_type".isNull, "removed")
              .when($"v1_type" =!= $"v2_type", "type_changed")
              .otherwise("unchanged").as("status"))
          .orderBy($"column_name")
      },
      Some("""SELECT * FROM (VALUES
             |  ('o_channel',     CAST(NULL AS VARCHAR), 'string', 'added'),
             |  ('o_custkey',     'int',     'int',      'unchanged'),
             |  ('o_orderdate',   'datetime','datetime', 'unchanged'),
             |  ('o_orderkey',    'int',     'int',      'unchanged'),
             |  ('o_orderstatus', 'string',  CAST(NULL AS VARCHAR), 'removed'),
             |  ('o_totalprice',  'float',   'string',   'type_changed'))
             |  t(column_name, v1_type, v2_type, status)
             |ORDER BY column_name""".stripMargin)),

    // windowFunnel (the ClickHouse-style time-constrained ordered funnel,
    // distinct from both existing funnels: the ordered one has no time
    // window, the bitmask one no order): per signup start, greedily chain
    // the earliest later view → click → purchase; the reached level counts
    // only steps inside the 6-hour window from the start. Greedy-earliest
    // is optimal per start, and the per-user level maximizes over starts.
    // Every stage is a user-keyed equi-join + min-agg — at 100 TB this is
    // |steps| shuffles on the join key, never a per-user collect. Window
    // arithmetic in integer microseconds.
    Q("events_window_funnel",
      (s, dir) => {
        import s.implicits._
        val winUs = 21600L * 1000000L
        val ev = graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_type")
        def step(of: String) = ev.filter($"event_type" === of)
        val s1 = step("signup").select($"user_id", $"ts".as("t1"))
        val t2 = s1.join(step("view").select($"user_id", $"ts".as("vt")),
            Seq("user_id")).filter($"vt" > $"t1")
          .groupBy($"user_id", $"t1").agg(min($"vt").as("t2"))
        val t3 = t2.join(step("click").select($"user_id", $"ts".as("ct")),
            Seq("user_id")).filter($"ct" > $"t2")
          .groupBy($"user_id", $"t1").agg(min($"ct").as("t3"))
        val t4 = t3.join(step("purchase").select($"user_id", $"ts".as("pt")),
            Seq("user_id")).filter($"pt" > $"t3")
          .groupBy($"user_id", $"t1").agg(min($"pt").as("t4"))
        val lv = s1
          .join(t2, Seq("user_id", "t1"), "left")
          .join(t3.select($"user_id", $"t1", $"t3"), Seq("user_id", "t1"), "left")
          .join(t4.select($"user_id", $"t1", $"t4"), Seq("user_id", "t1"), "left")
          .select($"user_id",
            when($"t2".isNull ||
                unix_micros($"t2") - unix_micros($"t1") > winUs, 1)
              .when($"t3".isNull ||
                unix_micros($"t3") - unix_micros($"t1") > winUs, 2)
              .when($"t4".isNull ||
                unix_micros($"t4") - unix_micros($"t1") > winUs, 3)
              .otherwise(4).as("lvl"))
        lv.groupBy($"user_id").agg(max($"lvl").as("lvl"))
          .groupBy($"lvl").agg(count(lit(1)).as("n_users"))
          .orderBy($"lvl")
      },
      Some("""WITH s1 AS (SELECT user_id, ts AS t1 FROM events
             |            WHERE event_type = 'signup'),
             |t2 AS (SELECT s1.user_id, s1.t1, MIN(v.ts) AS t2
             |       FROM s1 JOIN events v ON v.user_id = s1.user_id
             |        AND v.event_type = 'view' AND v.ts > s1.t1 GROUP BY 1, 2),
             |t3 AS (SELECT t2.user_id, t2.t1, MIN(c.ts) AS t3
             |       FROM t2 JOIN events c ON c.user_id = t2.user_id
             |        AND c.event_type = 'click' AND c.ts > t2.t2 GROUP BY 1, 2),
             |t4 AS (SELECT t3.user_id, t3.t1, MIN(p.ts) AS t4
             |       FROM t3 JOIN events p ON p.user_id = t3.user_id
             |        AND p.event_type = 'purchase' AND p.ts > t3.t3
             |       GROUP BY 1, 2),
             |lv AS (
             |  SELECT s1.user_id,
             |    CASE WHEN t2.t2 IS NULL
             |           OR epoch_us(t2.t2) - epoch_us(s1.t1) > 21600000000
             |           THEN 1
             |         WHEN t3.t3 IS NULL
             |           OR epoch_us(t3.t3) - epoch_us(s1.t1) > 21600000000
             |           THEN 2
             |         WHEN t4.t4 IS NULL
             |           OR epoch_us(t4.t4) - epoch_us(s1.t1) > 21600000000
             |           THEN 3
             |         ELSE 4 END AS lvl
             |  FROM s1 LEFT JOIN t2 USING (user_id, t1)
             |  LEFT JOIN t3 USING (user_id, t1)
             |  LEFT JOIN t4 USING (user_id, t1)),
             |ul AS (SELECT user_id, MAX(lvl) AS lvl FROM lv GROUP BY 1)
             |SELECT lvl, COUNT(*) AS n_users FROM ul
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 3×3 Sobel edge statistics over the decoded BMP corpus — the
    // convolution-stage archetype (blur/sharpen/edge kernels) on top of the
    // real codec: grayscale = r+g+b (integer, no luma weights), L1 gradient
    // magnitude |gx|+|gy| (integer-exact, no sqrt), per-image sum / max /
    // edge-count at a fixed threshold. The kernel runs inside the decode
    // pass with direct neighbor indexing; the oracle recomputes every
    // neighbor from the closed-form pixel formula, so kernel addressing
    // (offsets, border exclusion, channel collapse) is hash-pinned.
    Q("multimodal_image_sobel",
      (s, dir) => {
        import s.implicits._
        Multimodal.sobelStats(s,
            Multimodal.syntheticImages(s,
              t(s, dir, "documents").filter($"doc_id" < 60)), 600)
          .toDF()
          .orderBy($"doc_id")
      },
      Some {
        def g(xe: String, ye: String) =
          s"""((doc_id*31 + ($xe)*7 + ($ye)*13) % 256
             | + (doc_id*31 + ($xe)*7 + ($ye)*13 + 101) % 256
             | + (doc_id*31 + ($xe)*7 + ($ye)*13 + 202) % 256)""".stripMargin
             .replaceAll("\\s+", " ")
        s"""WITH dims AS (
           |  SELECT doc_id, 16 + doc_id % 8 AS w, 12 + doc_id % 5 AS h
           |  FROM documents WHERE doc_id < 60),
           |xs AS (SELECT doc_id, h, unnest(range(1, w - 1)) AS x FROM dims),
           |xy AS (SELECT doc_id, x, unnest(range(1, h - 1)) AS y FROM xs),
           |m AS (
           |  SELECT doc_id, x, y,
           |    abs((${g("x+1", "y-1")} + 2*${g("x+1", "y")} + ${g("x+1", "y+1")})
           |      - (${g("x-1", "y-1")} + 2*${g("x-1", "y")} + ${g("x-1", "y+1")}))
           |    + abs((${g("x-1", "y+1")} + 2*${g("x", "y+1")} + ${g("x+1", "y+1")})
           |      - (${g("x-1", "y-1")} + 2*${g("x", "y-1")} + ${g("x+1", "y-1")}))
           |      AS mag
           |  FROM xy)
           |SELECT doc_id, COUNT(*) AS n_interior,
           |  CAST(SUM(mag) AS BIGINT) AS sum_mag,
           |  CAST(MAX(mag) AS BIGINT) AS max_mag,
           |  CAST(SUM(CASE WHEN mag > 600 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_edges
           |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Goertzel single-bin tone detection over the decoded WAV corpus — the
    // FFT-free spectral probe (DTMF / beep / hum gates): the 2nd-order
    // recursion s₀ = x + coeff·s₁ − s₂ over the first 200 samples at bin 5
    // (coeff = 2·cos(2π·5/200), pinned as a literal — no runtime libm) and
    // at DC (coeff = 2) for contrast; power = s₁² + s₂² − coeff·s₁·s₂. One
    // codec-stage pass per record; the oracle's recursive CTE steps the
    // identical IEEE recursion from the synthetic sample formula, so the
    // decode AND the 200-step arithmetic are hash-pinned end to end.
    Q("multimodal_audio_goertzel",
      (s, dir) => {
        import s.implicits._
        val coeff = 1.9753766811902755d
        Multimodal.goertzelPower(s,
            Multimodal.syntheticAudio(s,
              t(s, dir, "documents").filter($"doc_id" < 100)), 200, coeff)
          .toDF()
          .select($"doc_id", $"n",
            round($"p_target", 2).as("p_target"),
            round($"p_dc", 2).as("p_dc"),
            ($"p_target" > $"p_dc").as("tone_dominant"))
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE docs AS (
             |  SELECT doc_id FROM documents WHERE doc_id < 100),
             |g AS (
             |  SELECT doc_id, 0 AS i, CAST(0 AS DOUBLE) AS s1,
             |    CAST(0 AS DOUBLE) AS s2, CAST(0 AS DOUBLE) AS d1,
             |    CAST(0 AS DOUBLE) AS d2
             |  FROM docs
             |  UNION ALL
             |  SELECT doc_id, i + 1,
             |    CAST((doc_id*37 + i*13) % 2048 - 1024 AS DOUBLE)
             |      + CAST(1.9753766811902755 AS DOUBLE) * s1 - s2,
             |    s1,
             |    CAST((doc_id*37 + i*13) % 2048 - 1024 AS DOUBLE)
             |      + 2.0 * d1 - d2,
             |    d1
             |  FROM g WHERE i < 200)
             |SELECT doc_id, 200 AS n,
             |  round(s1 * s1 + s2 * s2 - CAST(1.9753766811902755 AS DOUBLE) * s1 * s2, 2)
             |    AS p_target,
             |  round(d1 * d1 + d2 * d2 - 2.0 * d1 * d2, 2) AS p_dc,
             |  (s1 * s1 + s2 * s2 - CAST(1.9753766811902755 AS DOUBLE) * s1 * s2)
             |    > (d1 * d1 + d2 * d2 - 2.0 * d1 * d2) AS tone_dominant
             |FROM g WHERE i = 200 ORDER BY doc_id""".stripMargin)),

    // Group-sequential monitoring with an O'Brien-Fleming-shaped boundary —
    // the peek-every-day A/B discipline that controls type-I error without
    // waiting for the fixed horizon: daily cumulative two-proportion z
    // against b_t = z_crit·√(N_T/N_t) (wide early, z_crit at full
    // information). Arms split by user hash; the B arm carries an injected
    // deterministic lift (every 8th signup counts as a conversion) so the
    // crossing actually happens mid-experiment instead of never. Counts are
    // exact integers; z and the boundary are single pinned IEEE
    // expressions per day (sqrt only — no libm); the 30-row day frame is
    // the only window input. The single-row total-information cross is a
    // sanctioned scalar fan-in.
    Q("events_sequential_obf",
      (s, dir) => {
        import s.implicits._
        val e = graft.Tables.events(s, dir)
          .select(($"user_id" % 2).as("arm"),
            to_date($"ts").as("day"),
            when($"user_id" % 2 === 0,
              ($"event_type" === "purchase").cast("int"))
              .otherwise(($"event_type" === "purchase" ||
                ($"event_type" === "signup" && $"event_id" % 8 === 0))
                .cast("int")).as("conv"))
        val daily = e.groupBy($"arm", $"day")
          .agg(count(lit(1)).as("n"), sum($"conv").as("k"))
        val cum = daily.select($"arm", $"day",
          sum($"n").over(Window.partitionBy($"arm").orderBy($"day"))
            .as("cn"),
          sum($"k").over(Window.partitionBy($"arm").orderBy($"day"))
            .as("ck"))
        val wide = cum.filter($"arm" === 0)
          .select($"day", $"cn".as("na"), $"ck".as("ka"))
          .join(cum.filter($"arm" === 1)
            .select($"day".as("d2"), $"cn".as("nb"), $"ck".as("kb")),
            $"day" === $"d2")
        val nTot = e.agg(count(lit(1)).cast("double").as("n_total"))
        wide.crossJoin(broadcast(nTot))
          .select($"day", $"na", $"ka", $"nb", $"kb", $"n_total")
          .withColumn("pp",
            ($"ka" + $"kb").cast("double") / ($"na" + $"nb").cast("double"))
          .withColumn("z",
            ($"kb".cast("double") / $"nb".cast("double") -
              $"ka".cast("double") / $"na".cast("double")) /
              sqrt($"pp" * (lit(1.0d) - $"pp") *
                (lit(1.0d) / $"na".cast("double") +
                  lit(1.0d) / $"nb".cast("double"))))
          .withColumn("boundary",
            lit(2.0d) * sqrt($"n_total" / ($"na" + $"nb").cast("double")))
          .select($"day", $"na", $"kb",
            round($"z", 9).as("z"),
            round($"boundary", 9).as("boundary"),
            (abs($"z") > $"boundary").as("crossed"))
          .orderBy($"day")
      },
      Some("""WITH e AS (
             |  SELECT user_id % 2 AS arm, CAST(ts AS DATE) AS day,
             |    CASE WHEN user_id % 2 = 0 THEN
             |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             |    ELSE CASE WHEN event_type = 'purchase'
             |      OR (event_type = 'signup' AND event_id % 8 = 0)
             |      THEN 1 ELSE 0 END END AS conv
             |  FROM events),
             |d AS (SELECT arm, day, COUNT(*) AS n,
             |        CAST(SUM(conv) AS BIGINT) AS k
             |      FROM e GROUP BY 1, 2),
             |c AS (SELECT arm, day,
             |        CAST(SUM(n) OVER (PARTITION BY arm ORDER BY day)
             |          AS BIGINT) AS cn,
             |        CAST(SUM(k) OVER (PARTITION BY arm ORDER BY day)
             |          AS BIGINT) AS ck
             |      FROM d),
             |nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM e),
             |w AS (SELECT a.day, a.cn AS na, a.ck AS ka,
             |        b.cn AS nb, b.ck AS kb
             |      FROM c a JOIN c b ON a.day = b.day
             |        AND a.arm = 0 AND b.arm = 1),
             |s AS (
             |  SELECT w.day, w.na, w.kb, nt.n_total,
             |    CAST(w.ka + w.kb AS DOUBLE) / CAST(w.na + w.nb AS DOUBLE)
             |      AS pp,
             |    CAST(w.kb AS DOUBLE) / CAST(w.nb AS DOUBLE) -
             |      CAST(w.ka AS DOUBLE) / CAST(w.na AS DOUBLE) AS diff,
             |    1.0 / CAST(w.na AS DOUBLE) + 1.0 / CAST(w.nb AS DOUBLE)
             |      AS invn,
             |    CAST(w.na + w.nb AS DOUBLE) AS nt_t
             |  FROM w, nt)
             |SELECT day, na, kb,
             |  round(diff / sqrt(pp * (1.0 - pp) * invn), 9) AS z,
             |  round(2.0 * sqrt(n_total / nt_t), 9) AS boundary,
             |  abs(diff / sqrt(pp * (1.0 - pp) * invn))
             |    > 2.0 * sqrt(n_total / nt_t) AS crossed
             |FROM s ORDER BY day""".stripMargin)),

    // DoReMi-style domain reweighting by multiplicative weights (the
    // linearized no-regret update — exp-free, so fully engine-pinned):
    // domains = languages, per-domain excess signal = mean chars/1000, and
    // 6 rounds of w ← normalize(w·(1 + η·loss)) where loss_d =
    // base_d/(1+w_d) — the diminishing-returns feedback (upweighted
    // domains report less excess) that makes the fixed point non-trivial.
    // Everything runs on the 5-row domain frame: products are pinned IEEE,
    // normalizers are decimal sums, and each round's single-row
    // normalizer cross is a sanctioned scalar fan-in. The oracle unrolls
    // the identical 6 rounds.
    Q("sample_domain_mw_weights",
      (s, dir) => {
        import s.implicits._
        val eta = 0.3d
        val base = t(s, dir, "documents")
          .groupBy($"lang")
          .agg((davg($"n_chars") / 1000.0d).cast("double").as("base_d"))
          .localCheckpoint()
        val k = base.count().toDouble
        var w = base.select($"lang", $"base_d",
          (lit(1.0d) / lit(k)).as("w"))
        (1 to 6).foreach { _ =>
          val up = w.select($"lang", $"base_d",
            ($"w" * (lit(1.0d) + lit(eta) *
              ($"base_d" / (lit(1.0d) + $"w")))).as("uw"))
          val tot = up.agg(
            sum($"uw".cast("decimal(30,12)")).cast("double").as("tot"))
          // checkpoint the 5-row frame per round: the normalizer cross reads
          // `up` twice (sum + division), so an unbroken lineage doubles the
          // plan every round (63 BNLJ instances in the lint vs 1)
          w = up.crossJoin(broadcast(tot))
            .select($"lang", $"base_d", ($"uw" / $"tot").as("w"))
            .localCheckpoint()
        }
        w.select($"lang", round($"base_d", 9).as("base_d"),
            round($"w", 9).as("mix_weight"))
          .orderBy($"lang")
      },
      Some {
        val round = (r: Int) =>
          s"""u$r AS (
             |  SELECT lang, base_d,
             |    w * (1.0 + 0.3 * (base_d / (1.0 + w))) AS uw
             |  FROM w${r - 1}),
             |w$r AS (
             |  SELECT lang, base_d, uw / t.tot AS w
             |  FROM u$r, (SELECT CAST(SUM(CAST(uw AS DECIMAL(30,12)))
             |               AS DOUBLE) AS tot FROM u$r) t)""".stripMargin
        s"""WITH base AS (
           |  SELECT lang,
           |    CAST(${QueryDSL.sqlDavg("n_chars")} / 1000.0 AS DOUBLE)
           |      AS base_d
           |  FROM documents GROUP BY 1),
           |kk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM base),
           |w0 AS (SELECT lang, base_d, 1.0 / kk.k AS w FROM base, kk),
           |${(1 to 6).map(round).mkString(",\n")}
           |SELECT lang, round(base_d, 9) AS base_d,
           |  round(w, 9) AS mix_weight
           |FROM w6 ORDER BY lang""".stripMargin
      }),

    // WordPiece tokenization (the BERT tokenizer): vocab = every single
    // character plus the top-40 multi-character 1-4-grams per class
    // (word-initial vs ## continuation, counted corpus-frequency-weighted,
    // ties broken lexicographically), then greedy longest-match-first
    // segmentation of every corpus word. Scale shape: vocab building is
    // two distributed aggs over the distinct-word frame; the selected
    // vocab is a BOUNDED model artifact (≤~100 entries) broadcast into a
    // map-side segmenter — the corpus itself is never collected, and at
    // 100 TB the apply step is embarrassingly parallel. The oracle builds
    // the identical vocab in SQL, precomputes a greedy jump table
    // (longest vocab match per word/position), and walks it with a
    // recursive pointer chase — so vocab selection, class routing, and
    // greedy semantics are all hash-pinned.
    Q("text_wordpiece_apply",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select(explode(graft.llm.TextFunctions.tokens($"text")).as("w"))
        val wf = toks.groupBy($"w").agg(count(lit(1)).as("nw"))
          .localCheckpoint()
        val sub = wf
          .select($"w", $"nw",
            explode(sequence(lit(0), length($"w") - 1)).as("pos"))
          .select($"w", $"nw", $"pos",
            explode(sequence(lit(1),
              least(lit(4), length($"w") - $"pos"))).as("len"))
          .select($"w", $"nw", ($"pos" === 0).as("is_init"),
            expr("substring(w, pos + 1, len)").as("gram"))
        val grams = sub.groupBy($"gram", $"is_init")
          .agg(sum($"nw").as("cnt"))
        val ranked = grams.filter(length($"gram") > 1)
          .withColumn("rk", row_number().over(
            Window.partitionBy($"is_init").orderBy($"cnt".desc, $"gram")))
          .filter($"rk" <= 40).select($"gram", $"is_init")
        val vocabDf = ranked.unionByName(
          grams.filter(length($"gram") === 1).select($"gram", $"is_init"))
        // bounded model artifact (≤ 40·2 + charset·2 entries) → broadcast
        val vocabSet: Set[(String, Boolean)] = vocabDf.collect()
          .map(r => (r.getString(0), r.getBoolean(1))).toSet
        val pieces = wf.select($"w".as[String], $"nw".as[Long])
          .flatMap { case (word, nw) =>
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(String, Long, String)]
            var pos = 0
            while (pos < word.length) {
              var len = math.min(4, word.length - pos)
              while (len > 1 &&
                  !vocabSet((word.substring(pos, pos + len), pos == 0)))
                len -= 1
              val gram = word.substring(pos, pos + len)
              out += (((if (pos == 0) gram else "##" + gram), nw, word))
              pos += len
            }
            out
          }.toDF("piece", "nw", "w")
        pieces.groupBy($"piece")
          .agg(sum($"nw").as("n_uses"), countDistinct($"w").as("n_words"))
          .orderBy($"piece")
      },
      Some {
        val toksSql =
          "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), x -> x <> '')"
        s"""WITH RECURSIVE toks AS (
           |  SELECT unnest($toksSql) AS w FROM documents),
           |wf AS (SELECT w, COUNT(*) AS nw FROM toks GROUP BY 1),
           |sub AS (
           |  SELECT w, nw, pos, len, substring(w, pos + 1, len) AS gram,
           |    pos = 0 AS is_init
           |  FROM wf, unnest(range(0, length(w))) p(pos),
           |       unnest(range(1, 5)) l(len)
           |  WHERE pos + len <= length(w)),
           |grams AS (SELECT gram, is_init, CAST(SUM(nw) AS BIGINT) AS cnt
           |          FROM sub GROUP BY 1, 2),
           |ranked AS (
           |  SELECT gram, is_init FROM grams WHERE length(gram) > 1
           |  QUALIFY row_number() OVER (PARTITION BY is_init
           |    ORDER BY cnt DESC, gram) <= 40),
           |vocab AS (
           |  SELECT gram, is_init FROM ranked
           |  UNION ALL
           |  SELECT gram, is_init FROM grams WHERE length(gram) = 1),
           |jump AS (
           |  SELECT s.w, s.pos, s.gram, s.len
           |  FROM sub s JOIN vocab v
           |    ON v.gram = s.gram AND v.is_init = (s.pos = 0)
           |  QUALIFY row_number() OVER (PARTITION BY s.w, s.pos
           |    ORDER BY s.len DESC) = 1),
           |seg AS (
           |  SELECT w, nw, 0 AS pos FROM wf
           |  UNION ALL
           |  SELECT seg.w, seg.nw, seg.pos + j.len
           |  FROM seg JOIN jump j ON j.w = seg.w AND j.pos = seg.pos
           |  WHERE seg.pos < length(seg.w)),
           |pieces AS (
           |  SELECT seg.w, seg.nw,
           |    CASE WHEN seg.pos = 0 THEN j.gram
           |         ELSE '##' || j.gram END AS piece
           |  FROM seg JOIN jump j ON j.w = seg.w AND j.pos = seg.pos
           |  WHERE seg.pos < length(seg.w))
           |SELECT piece, CAST(SUM(nw) AS BIGINT) AS n_uses,
           |  COUNT(DISTINCT w) AS n_words
           |FROM pieces GROUP BY 1 ORDER BY 1""".stripMargin
      })
  )
}
