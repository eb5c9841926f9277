package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    // removal semantics; its own out-edges become unreachable). All five
    // scenarios (base + 4 removals) ride ONE edge frame via a map-side
    // explode — the iteration is 12 key-partitioned join+agg rounds over a
    // bounded (≤5·|states|²-row) aggregate frame, never the event table; at
    // 100 TB only the one transition-counting shuffle touches the corpus.
    // Per-round dot products sum in decimal; the two single-row global
    // crosses (base probability, effect normalizer) are sanctioned
    // scalar fan-ins.
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
          .localCheckpoint()
        // one edge frame, five scenarios, map-side fan-out
        val ps = p
          .withColumn("scenario", explode(array(
            (lit("base") +: channels.map(lit)): _*)))
          .filter($"i" =!= $"scenario")
          .withColumn("j2",
            when($"j" === $"scenario", lit("null")).otherwise($"j"))
          .select($"scenario", $"i", $"j2", $"frac")
          .localCheckpoint()
        val absorbing = ("base" +: channels)
          .flatMap(sc => Seq((sc, "conv", 1.0d), (sc, "null", 0.0d)))
          .toDF("scenario", "state", "v")
        var v = absorbing
        (1 to 12).foreach { it =>
          val nv = ps.join(v.withColumnRenamed("scenario", "vs"),
              $"vs" === ps("scenario") && $"state" === $"j2")
            .select(ps("scenario"), $"i",
              ($"frac" * $"v").cast("decimal(30,12)").as("c"))
            .groupBy($"scenario", $"i")
            .agg(sum($"c").cast("double").as("v"))
            .select($"scenario", $"i".as("state"), $"v")
          v = nv.unionByName(absorbing)
          if (it % 4 == 0) v = v.localCheckpoint()
        }
        val vstart = v.filter($"state" === "start")
          .select($"scenario", $"v").localCheckpoint()
        val base = vstart.filter($"scenario" === "base")
          .select($"v".as("base_p"))
        val eff = vstart.filter($"scenario" =!= "base")
          .crossJoin(broadcast(base))
          .select($"scenario".as("channel"), $"base_p",
            $"v".as("removed_p"),
            greatest(lit(0.0d), ($"base_p" - $"v") / $"base_p").as("effect"))
        val tot = eff.agg(
          sum($"effect".cast("decimal(30,12)")).cast("double").as("eff_tot"))
        eff.crossJoin(broadcast(tot))
          .select($"channel", round($"base_p", 9).as("base_p"),
            round($"removed_p", 9).as("removed_p"),
            round($"effect", 9).as("removal_effect"),
            round($"effect" / $"eff_tot", 9).as("attribution"))
          .orderBy($"channel")
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
          .localCheckpoint()
        val srcs = ew.select($"src").distinct().localCheckpoint()
        var h = srcs.withColumn("h", lit(1.0d))
        var a = ew.select($"dst").distinct().withColumn("a", lit(0.0d))
        (1 to 4).foreach { _ =>
          // checkpoint both 25-row frames per round: a feeds h in-round AND
          // the final normalization, so an unbroken lineage re-expands every
          // prior round in both consumers (65-shuffle plan vs 10)
          a = ew.join(h, "src")
            .select($"dst", ($"frac" * $"h").cast("decimal(30,12)").as("c"))
            .groupBy($"dst").agg(sum($"c").cast("double").as("a"))
            .localCheckpoint()
          h = ew.join(a, "dst")
            .select($"src", ($"frac" * $"a").cast("decimal(30,12)").as("c"))
            .groupBy($"src").agg(sum($"c").cast("double").as("h"))
            .localCheckpoint()
        }
        val hTot = h.agg(
          sum($"h".cast("decimal(30,12)")).cast("double").as("ht"))
        val aTot = a.agg(
          sum($"a".cast("decimal(30,12)")).cast("double").as("at"))
        val hs = h.crossJoin(broadcast(hTot))
          .select($"src".as("node"), ($"h" / $"ht").as("hub_share"))
        val as0 = a.crossJoin(broadcast(aTot))
          .select($"dst".as("node"), ($"a" / $"at").as("auth_share"))
        hs.join(as0, Seq("node"), "full")
          .select($"node",
            round(coalesce($"hub_share", lit(0.0d)), 9).as("hub_share"),
            round(coalesce($"auth_share", lit(0.0d)), 9).as("auth_share"))
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
             |ORDER BY column_name""".stripMargin))
  )
}
