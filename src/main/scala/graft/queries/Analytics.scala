package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDSL._
import graft.llm.{TextFunctions => TF}

/** Statistical / graph / experimentation analytics — the operator families an
  * analytics engine needs beyond the relational core: closed-form regression,
  * distribution diagnostics, graph motifs, marketing attribution, and A/B
  * evaluation. Every query follows the determinism rules in [[QueryDSL]]
  * (decimal-exact moments, identical double expression trees on both engines,
  * total ORDER BY).
  *
  * Reference anchor: the reference's task archetypes end at opaque subprocess
  * transforms (`/root/reference/xetl/models/task.py:319-328`); these are the
  * engine-native analyses users would otherwise shell out for.
  */
object Analytics {

  // lazy: forces AFTER object init so the later-defined moreQueries val is set
  lazy val queries: Seq[Q] = baseQueries ++ moreQueries

  private val baseQueries: Seq[Q] = Seq(

    // Group-wise OLS regression (closed-form): slope/intercept/r² of price on
    // quantity per return flag, from ONE grouped pass of decimal-exact moments —
    // the agg_corr_exact machinery extended to the full regression readout. At
    // 100 TB this is a single map-side-combined shuffle on the group key; no
    // second pass, no driver math. Moments are centered decimals (exact,
    // associative, partitioning-independent); slope/intercept/r² are identical
    // IEEE double expression trees on both engines.
    Q("agg_regression_ols",
      (s, dir) => {
        import s.implicits._
        val xd = ($"l_quantity" - 25.0d).cast("decimal(18,2)")
        val yd = ($"l_extendedprice" - 40000.0d).cast("decimal(18,2)")
        val slope = ($"sxy" - $"sx" * $"sy" / $"n") /
          ($"sxx" - $"sx" * $"sx" / $"n")
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(xd).cast("double").as("sx"),
            sum(xd * xd).cast("double").as("sxx"),
            sum(yd).cast("double").as("sy"),
            sum(yd * yd).cast("double").as("syy"),
            sum(xd * yd).cast("double").as("sxy"))
          .select($"l_returnflag", $"n",
            slope.as("slope"),
            ((lit(40000.0d) + $"sy" / $"n") -
              slope * (lit(25.0d) + $"sx" / $"n")).as("intercept"),
            ((($"sxy" - $"sx" * $"sy" / $"n") * ($"sxy" - $"sx" * $"sy" / $"n")) /
              (($"sxx" - $"sx" * $"sx" / $"n") *
               ($"syy" - $"sy" * $"sy" / $"n"))).as("r2"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH v AS (
             |  SELECT l_returnflag,
             |    CAST(l_quantity - 25.0 AS DECIMAL(18,2)) AS xd,
             |    CAST(l_extendedprice - 40000.0 AS DECIMAL(18,2)) AS yd
             |  FROM lineitem),
             |c AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    CAST(SUM(xd) AS DOUBLE) AS sx,
             |    CAST(SUM(xd * xd) AS DOUBLE) AS sxx,
             |    CAST(SUM(yd) AS DOUBLE) AS sy,
             |    CAST(SUM(yd * yd) AS DOUBLE) AS syy,
             |    CAST(SUM(xd * yd) AS DOUBLE) AS sxy
             |  FROM v GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
             |  (40000.0 + sy / n) -
             |    ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (25.0 + sx / n)
             |    AS intercept,
             |  ((sxy - sx * sy / n) * (sxy - sx * sy / n)) /
             |    ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
             |FROM c ORDER BY l_returnflag""".stripMargin)),

    // Equi-depth histogram WITHOUT a global row-number over the raw table: the
    // scalable formulation first collapses to the value histogram (one grouped
    // count — at 100 TB the only full-data pass), then computes the cumulative
    // distribution with a TWO-LEVEL prefix sum — range-bucket the values, window
    // only within each range bucket, and carry cross-bucket offsets on the tiny
    // per-bucket frame (the text_token_budget_pack pattern). No stage ever sorts
    // more than one range-bucket's distinct values on one reducer. Each value's
    // equi-depth bucket then derives from its cumulative start position with
    // pure integer arithmetic (`div` — no doubles, no engine-specific rounding);
    // duplicates of a value share a start position, so values never split across
    // buckets — partitioning- and engine-independent.
    Q("agg_histogram_equidepth",
      (s, dir) => {
        import s.implicits._
        // range bucket: any deterministic ORDER-PRESERVING coarsening works
        // (Spark-side only — the oracle computes the same cum another way)
        val h = t(s, dir, "lineitem")
          .groupBy($"l_extendedprice".as("v")).agg(count(lit(1)).as("c"))
          .withColumn("rb", floor($"v" / 1000.0d))
        val offsets = h.groupBy($"rb").agg(sum($"c").as("rb_c"))
          .withColumn("offset", coalesce(
            sum($"rb_c").over(Window.orderBy($"rb")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("n", sum($"rb_c").over(Window.partitionBy()))
          .select($"rb", $"offset", $"n")
        h.join(broadcast(offsets), Seq("rb"))
          .withColumn("cum", $"offset" + sum($"c").over(
            Window.partitionBy($"rb").orderBy($"v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("bucket", expr("(((cum - c) * 8) div n) + 1"))
          .groupBy($"bucket")
          .agg(sum($"c").cast("bigint").as("cnt"),
            min($"v").as("lo"), max($"v").as("hi"))
          .orderBy($"bucket")
      },
      Some("""WITH h AS (
             |  SELECT l_extendedprice AS v, COUNT(*) AS c
             |  FROM lineitem GROUP BY 1),
             |cd AS (
             |  SELECT v, c,
             |    CAST(SUM(c) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS cum,
             |    CAST(SUM(c) OVER () AS BIGINT) AS n
             |  FROM h)
             |SELECT (((cum - c) * 8) // n) + 1 AS bucket,
             |  CAST(SUM(c) AS BIGINT) AS cnt, MIN(v) AS lo, MAX(v) AS hi
             |FROM cd GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Median absolute deviation per group (robust spread): positional low-median
    // of |x − median|, computed from the VALUE HISTOGRAM rather than row-level
    // windows — quantity has ~50 distinct values, so after one grouped count the
    // median and MAD both come from cumulative sums over tiny per-group frames
    // (the positional median at floor((n+1)/2) is the smallest value whose
    // cumulative count reaches that position — identical to the oracle's
    // row_number formulation, at a fraction of the sort). The full-table work is
    // ONE map-side-combined count; everything after runs on |groups|·|values|
    // rows.
    Q("agg_mad",
      (s, dir) => {
        import s.implicits._
        def posMedian(h: org.apache.spark.sql.DataFrame, valueCol: String) = {
          // h: (l_returnflag, <valueCol>, c) → (l_returnflag, median of value)
          val cw = Window.partitionBy($"l_returnflag").orderBy(col(valueCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          h.withColumn("cum", sum($"c").over(cw))
            .withColumn("tot", sum($"c").over(Window.partitionBy($"l_returnflag")))
            .filter($"cum" >= floor(($"tot" + 1) / 2).cast("long"))
            .groupBy($"l_returnflag")
            .agg(min(col(valueCol)).as("m"))
        }
        val h = t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("c"))
        val med = posMedian(h, "l_quantity")
          .select($"l_returnflag".as("mf"), $"m".as("med"))
        val devH = h.join(broadcast(med), $"l_returnflag" === $"mf")
          .withColumn("dev", abs($"l_quantity" - $"med"))
          .groupBy($"l_returnflag", $"med", $"dev").agg(sum($"c").as("c"))
        val mad = posMedian(devH.drop("med"), "dev")
        med.join(mad, $"mf" === $"l_returnflag")
          .select($"l_returnflag", $"med".as("median_low"), $"m".as("mad_low"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH med AS (
             |  SELECT l_returnflag AS mf, l_quantity AS med FROM (
             |    SELECT l_returnflag, l_quantity,
             |      ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |        ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             |      COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
             |    FROM lineitem)
             |  WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)),
             |dev AS (
             |  SELECT l_returnflag, med, abs(l_quantity - med) AS dev,
             |    l_orderkey, l_linenumber
             |  FROM lineitem JOIN med ON l_returnflag = mf)
             |SELECT l_returnflag, med AS median_low, dev AS mad_low FROM (
             |  SELECT l_returnflag, med, dev,
             |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |      ORDER BY dev, l_orderkey, l_linenumber) AS rn,
             |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
             |  FROM dev)
             |WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
             |ORDER BY l_returnflag""".stripMargin)),

    // Triangle counting on the nation-level trade graph. The undirected edge set
    // is stored ORIENTED (src < dst), so each triangle is counted exactly once by
    // the canonical a<b<c wedge-close join — the standard trick that bounds the
    // join fan-out by the smaller-degree endpoint instead of counting every
    // triangle 6×. All three legs are equi-joins (hash-partitionable at any
    // scale); the graph itself is the output of one grouped fact pass.
    Q("graph_triangle_count",
      (s, dir) => {
        import s.implicits._
        val raw = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y"))
          .filter($"x" =!= $"y")
        val ue = raw.select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
          .distinct()
        val e1 = ue.select($"a".as("a1"), $"b".as("b1"))
        val e2 = ue.select($"a".as("a2"), $"b".as("b2"))
        val e3 = ue.select($"a".as("a3"), $"b".as("b3"))
        e1.join(e2, $"b1" === $"a2")
          .join(e3, $"a1" === $"a3" && $"b2" === $"b3")
          .agg(count(lit(1)).as("n_triangles"))
      },
      Some("""WITH raw AS (
             |  SELECT c_nationkey AS x, s_nationkey AS y
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey),
             |ue AS (
             |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw)
             |SELECT COUNT(*) AS n_triangles
             |FROM ue e1 JOIN ue e2 ON e1.b = e2.a
             |  JOIN ue e3 ON e1.a = e3.a AND e2.b = e3.b""".stripMargin)),

    // BFS hop counts from nation 0 over the DIRECTED trade graph: four rounds of
    // frontier-expand (equi-join) + min-hop collapse — Pregel-by-joins, like
    // graph_pagerank but for reachability. Each round shuffles only the frontier
    // (≤ |V| rows after the distinct), never the fact table. The oracle is the
    // textbook bounded recursive CTE.
    Q("graph_bfs_hops",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .filter($"src" =!= $"dst")
          .distinct()
          .localCheckpoint() // small edge list; cut the 4-join lineage once
        var frontier = e.filter($"src" === 0)
          .select($"src".as("node")).distinct()
          .withColumn("hops", lit(0))
        var reached = frontier
        for (h <- 1 to 4) {
          frontier = frontier.join(e, $"node" === $"src")
            .select($"dst".as("node")).distinct()
            .withColumn("hops", lit(h))
          reached = reached.union(frontier)
        }
        reached.groupBy($"node").agg(min($"hops").as("hops")).orderBy($"node")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey),
             |r AS (
             |  SELECT DISTINCT src AS node, 0 AS hops FROM e WHERE src = 0
             |  UNION ALL
             |  SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node
             |  WHERE r.hops < 4)
             |SELECT node, MIN(hops) AS hops FROM r GROUP BY node
             |ORDER BY node""".stripMargin)),

    // Last-touch marketing attribution: each purchase is credited to the user's
    // most recent preceding click/view ('direct' when none). One key-partitioned
    // window (last over a 1-preceding frame, ignoreNulls) carries the touch
    // forward — the classic "attach latest qualifying prior event" shape, done
    // with zero self-joins; then one grouped rollup of count + exact revenue.
    Q("events_attribution_last_touch",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "events")
          .withColumn("last_touch",
            last(when($"event_type".isin("click", "view"), $"event_type"),
              ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .groupBy(coalesce($"last_touch", lit("direct")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("revenue"))
          .orderBy($"channel")
      },
      Some(s"""WITH t AS (
              |  SELECT event_type, value,
              |    last_value(CASE WHEN event_type IN ('click','view')
              |                    THEN event_type END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY ts, event_id
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              |      AS last_touch
              |  FROM events)
              |SELECT COALESCE(last_touch, 'direct') AS channel,
              |  COUNT(*) AS n_purchases, ${sqlDsum("value")} AS revenue
              |FROM t WHERE event_type = 'purchase'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Join-key skew diagnostic: the distribution of per-key group sizes
    // (max / positional p50 / positional p99 / mean / skew ratio) in one pass
    // over the COMPRESSED key histogram — the report that decides between a
    // plain shuffle join and the salted variant (join_skew_salted /
    // agg_skew_twolevel) before burning a 100 TB shuffle. The global window runs
    // over |distinct keys| rows, not the fact table; positional percentiles use
    // pure integer positions (no interpolation, engine-independent).
    Q("dq_skew_report",
      (s, dir) => {
        import s.implicits._
        val sizes = t(s, dir, "lineitem")
          .groupBy($"l_suppkey").agg(count(lit(1)).as("sz"))
        sizes
          .withColumn("rn", row_number().over(Window.orderBy($"sz", $"l_suppkey")))
          .withColumn("k", count(lit(1)).over(Window.partitionBy()))
          .agg(
            count(lit(1)).as("n_keys"),
            sum($"sz").cast("bigint").as("n_rows"),
            max($"sz").as("max_sz"),
            min(when($"rn" === floor(($"k" + 1) / 2).cast("long"), $"sz"))
              .as("p50_sz"),
            min(when($"rn" === expr("(99 * k + 99) div 100"), $"sz"))
              .as("p99_sz"))
          .select($"n_keys", $"n_rows", $"max_sz", $"p50_sz", $"p99_sz",
            ($"n_rows".cast("double") / $"n_keys").as("avg_sz"),
            ($"max_sz" / ($"n_rows".cast("double") / $"n_keys")).as("skew_ratio"))
      },
      Some("""WITH sizes AS (
             |  SELECT l_suppkey, COUNT(*) AS sz FROM lineitem GROUP BY 1),
             |r AS (
             |  SELECT sz,
             |    ROW_NUMBER() OVER (ORDER BY sz, l_suppkey) AS rn,
             |    COUNT(*) OVER () AS k
             |  FROM sizes),
             |a AS (
             |  SELECT COUNT(*) AS n_keys,
             |    CAST(SUM(sz) AS BIGINT) AS n_rows,
             |    MAX(sz) AS max_sz,
             |    MIN(CASE WHEN rn = CAST(floor((k + 1) / 2) AS BIGINT)
             |             THEN sz END) AS p50_sz,
             |    MIN(CASE WHEN rn = (99 * k + 99) // 100 THEN sz END) AS p99_sz
             |  FROM r)
             |SELECT n_keys, n_rows, max_sz, p50_sz, p99_sz,
             |  CAST(n_rows AS DOUBLE) / n_keys AS avg_sz,
             |  max_sz / (CAST(n_rows AS DOUBLE) / n_keys) AS skew_ratio
             |FROM a""".stripMargin)),

    // Quantile-rank feature normalization: percent_rank of account balance
    // WITHIN nation plus an integer decile — the rank-based transform that makes
    // heavy-tailed features comparable across segments. percent_rank is
    // (rank−1)/(n−1) in both engines (ties share a rank, so the value is
    // determined by the data alone); the decile derives from the same two
    // integers, floored after exact small-integer double division.
    Q("feat_quantile_rank",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal")
        t(s, dir, "customer")
          .select($"c_custkey", $"c_nationkey", $"c_acctbal",
            percent_rank().over(w).as("pr"),
            (least(lit(9L),
              floor((rank().over(w) - 1) * 10 /
                greatest(count(lit(1)).over(Window.partitionBy($"c_nationkey")) - 1,
                  lit(1L)))
                .cast("long")) + 1).as("decile"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
             |  percent_rank() OVER w AS pr,
             |  least(9, CAST(floor(
             |    (rank() OVER w - 1) * 10 /
             |    greatest(COUNT(*) OVER (PARTITION BY c_nationkey) - 1, 1))
             |    AS BIGINT)) + 1 AS decile
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
             |ORDER BY c_custkey""".stripMargin)),

    // Calendar date-dimension generation: a sequence generator (not a driver
    // loop) spans the fact table's own [min, max] date range; every attribute is
    // a pure column function. The ISO weekday is spelled out arithmetically on
    // the Spark side ((dayofweek+5) % 7 + 1) to pin the Monday=1 convention the
    // oracle's isodow uses — cross-engine weekday numbering is convention, not
    // math, so the query declares it.
    Q("gen_date_dim",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .agg(min(to_date($"o_orderdate")).as("d0"),
            max(to_date($"o_orderdate")).as("d1"))
          .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
          .select($"d",
            year($"d").as("y"), quarter($"d").as("q"),
            month($"d").as("m"), dayofmonth($"d").as("dom"),
            (((dayofweek($"d") + 5) % 7) + 1).as("isodow"),
            ($"d" === last_day($"d")).as("is_month_end"),
            (((dayofweek($"d") + 5) % 7) + 1 >= 6).as("is_weekend"))
          .orderBy($"d")
      },
      Some("""WITH span AS (
             |  SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
             |    CAST(MAX(o_orderdate) AS DATE) AS d1
             |  FROM orders),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
             |    AS d
             |  FROM span)
             |SELECT d, year(d) AS y, quarter(d) AS q, month(d) AS m,
             |  dayofmonth(d) AS dom, isodow(d) AS isodow,
             |  d = last_day(d) AS is_month_end,
             |  isodow(d) >= 6 AS is_weekend
             |FROM spine ORDER BY d""".stripMargin)),

    // A/B experiment readout with Welch's t statistic: deterministic arm
    // assignment from an md5 nibble of the user id (the sample_stratified_hash
    // bucketing — portable across engines, stable across reruns), then ONE
    // global aggregate of conditional decimal-exact moments for both arms, and
    // the t statistic as an identical double expression tree. No per-arm
    // subqueries, no second pass — the 100 TB shape is a single map-side-combined
    // reduction to one row.
    Q("events_ab_welch",
      (s, dir) => {
        import s.implicits._
        val nibble =
          conv(substring(md5($"user_id".cast("string")), 1, 1), 16, 10).cast("int")
        val vd = ($"value" - 100.0d).cast("decimal(18,4)")
        t(s, dir, "events")
          .withColumn("in_a", nibble < 8)
          .agg(
            sum(when($"in_a", 1L).otherwise(0L)).as("n_a"),
            sum(when(!$"in_a", 1L).otherwise(0L)).as("n_b"),
            sum(when($"in_a", vd)).cast("double").as("sa"),
            sum(when($"in_a", vd * vd)).cast("double").as("saa"),
            sum(when(!$"in_a", vd)).cast("double").as("sb"),
            sum(when(!$"in_a", vd * vd)).cast("double").as("sbb"))
          .select($"n_a", $"n_b",
            (lit(100.0d) + $"sa" / $"n_a").as("mean_a"),
            (lit(100.0d) + $"sb" / $"n_b").as("mean_b"),
            ($"sa" / $"n_a" - $"sb" / $"n_b").as("lift"),
            (($"sa" / $"n_a" - $"sb" / $"n_b") /
              sqrt((($"saa" - $"sa" * $"sa" / $"n_a") / ($"n_a" - 1)) / $"n_a" +
                   (($"sbb" - $"sb" * $"sb" / $"n_b") / ($"n_b" - 1)) / $"n_b"))
              .as("t_welch"))
      },
      Some("""WITH v AS (
             |  SELECT
             |    instr('0123456789abcdef',
             |          substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 8
             |      AS in_a,
             |    CAST(value - 100.0 AS DECIMAL(18,4)) AS vd
             |  FROM events),
             |c AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(SUM(CASE WHEN in_a THEN vd END) AS DOUBLE) AS sa,
             |    CAST(SUM(CASE WHEN in_a THEN vd * vd END) AS DOUBLE) AS saa,
             |    CAST(SUM(CASE WHEN NOT in_a THEN vd END) AS DOUBLE) AS sb,
             |    CAST(SUM(CASE WHEN NOT in_a THEN vd * vd END) AS DOUBLE) AS sbb
             |  FROM v)
             |SELECT n_a, n_b,
             |  100.0 + sa / n_a AS mean_a,
             |  100.0 + sb / n_b AS mean_b,
             |  sa / n_a - sb / n_b AS lift,
             |  (sa / n_a - sb / n_b) /
             |    sqrt(((saa - sa * sa / n_a) / (n_a - 1)) / n_a +
             |         ((sbb - sb * sb / n_b) / (n_b - 1)) / n_b) AS t_welch
             |FROM c""".stripMargin)),

    // Lexical rarity scoring: each document's mean corpus-frequency rank of its
    // tokens — the rank-based cousin of perplexity filtering that needs NO
    // transcendental math (log-probabilities don't hash across engines; integer
    // ranks do). Vocab ranks come from the banded two-level rank over the
    // compressed token histogram; the per-doc score is one equi-join + one
    // grouped exact sum.
    Q("text_rarity_score",
      (s, dir) => {
        import s.implicits._
        // banded global rank over the token histogram: no |vocab|-row
        // single-reducer sort (bucket = −n, ties broken by token)
        val vocab = bandedRowNumber(
          t(s, dir, "documents")
            .select(explode(TF.tokens($"text")).as("token"))
            .groupBy($"token").agg(count(lit(1)).as("n")),
          -$"n", Seq($"n".desc, $"token"), "r", "r_n")
          .select($"token".as("vt"), $"r")
        t(s, dir, "documents").filter($"doc_id" < 300)
          .select($"doc_id", explode(TF.tokens($"text")).as("token"))
          .join(vocab, $"token" === $"vt")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum($"r").cast("bigint").as("rank_sum"))
          .select($"doc_id", $"n_tok", $"rank_sum",
            ($"rank_sum".cast("double") / $"n_tok").as("avg_rank"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH tok AS (
              |  SELECT unnest(${duckToks("text")}) AS token FROM documents),
              |vocab AS (
              |  SELECT token AS vt,
              |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS BIGINT)
              |      AS r
              |  FROM tok GROUP BY token),
              |d AS (
              |  SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents WHERE doc_id < 300)
              |SELECT doc_id, COUNT(*) AS n_tok,
              |  CAST(SUM(r) AS BIGINT) AS rank_sum,
              |  CAST(SUM(r) AS DOUBLE) / COUNT(*) AS avg_rank
              |FROM d JOIN vocab ON token = vt
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Incremental SCD2 maintenance: yesterday's history (built from the old
    // partition) + today's changeset, WITHOUT rebuilding — close each key's open
    // version at the key's first new change date, append the changeset's own
    // intervals. The oracle is the FULL-table rebuild: the query asserts the
    // warehouse invariant incremental-apply ≡ rebuild, which is what makes the
    // daily O(Δ) merge trustworthy at a 100 TB history the full rebuild couldn't
    // touch. Shapes: two partitioned window passes + one broadcast-size join of
    // per-key first-new dates.
    Q("scd2_incremental_apply",
      (s, dir) => {
        import s.implicits._
        val split = lit("1998-01-01 00:00:00").cast("timestamp")
        val o = t(s, dir, "orders")
        val old = o.filter($"o_orderdate" < split)
        val nw = o.filter($"o_orderdate" >= split)
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        val oldh = old
          .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
            $"o_orderdate".as("valid_from"),
            lead($"o_orderdate", 1).over(w).as("vt_old"))
        val firstNew = nw.groupBy($"o_custkey".as("fk"))
          .agg(min($"o_orderdate").as("first_new"))
        val closed = oldh.join(firstNew, $"o_custkey" === $"fk", "left")
          .select($"o_custkey", $"o_orderkey", $"o_orderstatus", $"valid_from",
            coalesce($"vt_old", $"first_new").as("valid_to"),
            ($"vt_old".isNull && $"first_new".isNull).as("is_current"))
        val newh = nw
          .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
            $"o_orderdate".as("valid_from"),
            lead($"o_orderdate", 1).over(w).as("valid_to"))
          .withColumn("is_current", $"valid_to".isNull)
        closed.unionByName(newh).orderBy($"o_custkey", $"o_orderkey")
      },
      // oracle = the full-history rebuild; equality IS the invariant under test
      Some("""WITH h AS (
             |  SELECT o_custkey, o_orderkey, o_orderstatus,
             |    o_orderdate AS valid_from,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS next_from
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, o_orderstatus, valid_from,
             |  next_from AS valid_to,
             |  next_from IS NULL AS is_current
             |FROM h ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Snapshot reconciliation audit: classify every key across two table versions
    // as added / removed / changed / unchanged in ONE full-outer equi-join — the
    // nightly "what moved" report that replaces per-row lookups with a single
    // key-partitioned pass. The two versions are derived deterministically from
    // the same table (drop-mod-97 simulates late rows, drop-mod-89 simulates
    // deletions, the mod-100 price bump simulates updates).
    Q("dq_table_diff",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val prev = o.filter($"o_orderkey" % 89 =!= 7)
          .select($"o_orderkey".as("pk"),
            when($"o_orderkey" % 100 === 0, $"o_totalprice" - 1.0d)
              .otherwise($"o_totalprice").as("pprice"))
        val cur = o.filter($"o_orderkey" % 97 =!= 3)
          .select($"o_orderkey".as("ck"), $"o_totalprice".as("cprice"))
        prev.join(cur, $"pk" === $"ck", "full_outer")
          .agg(
            sum(when($"pk".isNull, 1L).otherwise(0L)).as("n_added"),
            sum(when($"ck".isNull, 1L).otherwise(0L)).as("n_removed"),
            sum(when($"pk".isNotNull && $"ck".isNotNull &&
              !($"pprice" === $"cprice"), 1L).otherwise(0L)).as("n_changed"),
            sum(when($"pk".isNotNull && $"ck".isNotNull &&
              ($"pprice" === $"cprice"), 1L).otherwise(0L)).as("n_unchanged"))
      },
      Some("""WITH prev AS (
             |  SELECT o_orderkey AS pk,
             |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice - 1.0
             |         ELSE o_totalprice END AS pprice
             |  FROM orders WHERE o_orderkey % 89 <> 7),
             |cur AS (
             |  SELECT o_orderkey AS ck, o_totalprice AS cprice
             |  FROM orders WHERE o_orderkey % 97 <> 3)
             |SELECT
             |  CAST(SUM(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_added,
             |  CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_removed,
             |  CAST(SUM(CASE WHEN pk IS NOT NULL AND ck IS NOT NULL
             |    AND pprice <> cprice THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
             |  CAST(SUM(CASE WHEN pk IS NOT NULL AND ck IS NOT NULL
             |    AND pprice = cprice THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
             |FROM prev FULL OUTER JOIN cur ON pk = ck""".stripMargin)),

    // Gini concentration of order value per priority class: the inequality
    // readout (revenue concentration, usage skew) via the rank formulation
    // G = (2·Σ rᵢxᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ). Σ rᵢxᵢ is invariant under
    // permuting equal values, so the unique (value, orderkey) tie order makes it
    // engine-independent; sums stay decimal-exact and both operands are rounded
    // to integer decimals BEFORE the one double division (large-decimal → double
    // casts are the known cross-engine rounding hazard).
    Q("agg_gini_concentration",
      (s, dir) => {
        import s.implicits._
        val xd = $"o_totalprice".cast("decimal(18,2)")
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice", $"o_orderkey")
        t(s, dir, "orders")
          .select($"o_orderpriority", xd.as("xd"),
            row_number().over(w).cast("long").as("rn"))
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum($"xd").as("sd"),
            sum($"rn" * $"xd").as("wd"))
          .select($"o_orderpriority", $"n",
            (round(lit(2) * $"wd" - ($"n" + 1) * $"sd", 0).cast("double") /
              round($"n" * $"sd", 0).cast("double")).as("gini"))
          .orderBy($"o_orderpriority")
      },
      Some("""WITH r AS (
             |  SELECT o_orderpriority,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS xd,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn
             |  FROM orders),
             |c AS (
             |  SELECT o_orderpriority, COUNT(*) AS n,
             |    SUM(xd) AS sd, SUM(rn * xd) AS wd
             |  FROM r GROUP BY o_orderpriority)
             |SELECT o_orderpriority, n,
             |  CAST(ROUND(2 * wd - (n + 1) * sd, 0) AS DOUBLE) /
             |    CAST(ROUND(n * sd, 0) AS DOUBLE) AS gini
             |FROM c ORDER BY o_orderpriority""".stripMargin)),

    // 7-day rolling distinct users — EXACT, via fixed-width bitmaps as WINDOW
    // aggregates: per (day, bucket) bitmaps from one grouped pass (the only
    // full-data shuffle), then bitmap_or_agg over a 6-preceding RANGE frame per
    // bucket and a per-day sum of bucket counts. The window state is 7 bitmaps
    // of 4 KB per bucket — constant memory regardless of user count — where the
    // naive rolling COUNT(DISTINCT) re-expands every event 7×. The oracle IS
    // that naive 7× range join, which is exactly the plan this operator replaces
    // at scale. Ids are shifted +1: bitmap_bit_position is 1-based, so id 0 would
    // collide with id 1 (found as an off-by-one undercount against the oracle).
    Q("events_rolling_distinct_users",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("ev_rolling")
        s.sql(rollingDistinctSql("ev_rolling"))
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
             |SELECT d.day, COUNT(DISTINCT e.user_id) AS users_7d
             |FROM days d JOIN events e
             |  ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
             |GROUP BY d.day ORDER BY d.day""".stripMargin)),

    // Hashing-trick featurization: tokens hashed into 64 buckets via two md5
    // nibbles (portable across engines — never xxhash/murmur, whose seeds are
    // Spark-internal), per-doc sparse counts rendered as a sorted "bucket:count"
    // string. Map-side explode + one (doc, bucket) count shuffle; the vocabulary
    // never materializes anywhere — the point of the hashing trick at corpus
    // scale.
    Q("feat_hashing_trick",
      (s, dir) => {
        import s.implicits._
        val bucket = (
          (conv(substring(md5($"token"), 1, 1), 16, 10).cast("int") * 16) +
            conv(substring(md5($"token"), 2, 1), 16, 10).cast("int")) % 64
        t(s, dir, "documents").filter($"doc_id" < 300)
          .select($"doc_id", explode(TF.tokens($"text")).as("token"))
          .select($"doc_id", bucket.as("bucket"))
          .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").cast("bigint").as("n_tok"),
            concat_ws(" ",
              transform(sort_array(collect_list(struct($"bucket", $"c"))),
                s0 => concat(s0("bucket").cast("string"), lit(":"),
                  s0("c").cast("string")))).as("features"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents WHERE doc_id < 300),
              |b AS (
              |  SELECT doc_id,
              |    ((instr('0123456789abcdef', substring(md5(token), 1, 1)) - 1)
              |      * 16
              |     + instr('0123456789abcdef', substring(md5(token), 2, 1)) - 1)
              |      % 64 AS bucket
              |  FROM tok),
              |c AS (
              |  SELECT doc_id, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2)
              |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
              |  string_agg(bucket || ':' || c, ' ' ORDER BY bucket) AS features
              |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )

  private val moreQueries: Seq[Q] = Seq(

    // Benford first-digit audit (fraud / synthetic-data detection): the digit
    // comes from the DECIMAL STRING rendering (decimal→string is identical
    // across engines; a log10-based extraction would hash-diverge on
    // transcendental rounding). Map-only digit extraction + one 9-row rollup;
    // the share is a single double division per output row.
    Q("dq_benford_first_digit",
      (s, dir) => {
        import s.implicits._
        val d = substring($"o_totalprice".cast("decimal(18,2)").cast("string"), 1, 1)
        t(s, dir, "orders")
          .filter($"o_totalprice" > 0)
          .groupBy(d.cast("int").as("digit"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share",
            $"n".cast("double") / sum($"n").over(Window.partitionBy()))
          .orderBy($"digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
             |    AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM orders WHERE o_totalprice > 0)
             |SELECT digit, COUNT(*) AS n,
             |  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
             |FROM d GROUP BY digit ORDER BY digit""".stripMargin)),

    // Islands-and-gaps over an id sequence (completeness audit: "which ranges
    // of orderkeys are missing?"): the classic lead-minus-current formulation on
    // the DISTINCT key frame — one shuffle for distinct, one ordered window over
    // keys only. Emits each gap's [from, to] and width; total ORDER BY start.
    Q("dq_sequence_gaps",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"k")
        t(s, dir, "orders")
          // a sparse slice so real gaps exist at every scale factor
          .filter($"o_orderpriority" === "1-URGENT" && $"o_orderstatus" === "F")
          .select(($"o_orderkey" % 1000).as("k")).distinct()
          .withColumn("nxt", lead($"k", 1).over(w))
          .filter($"nxt" - $"k" > 1)
          .select(($"k" + 1).as("gap_from"), ($"nxt" - 1).as("gap_to"),
            ($"nxt" - $"k" - 1).as("gap_width"))
          .orderBy($"gap_from")
      },
      Some("""WITH ks AS (
             |  SELECT DISTINCT o_orderkey % 1000 AS k FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'),
             |g AS (
             |  SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM ks)
             |SELECT k + 1 AS gap_from, nxt - 1 AS gap_to,
             |  nxt - k - 1 AS gap_width
             |FROM g WHERE nxt - k > 1 ORDER BY gap_from""".stripMargin)),

    // Burst detection: each day's event count against its own trailing-7-day
    // mean (exact integer counts; the ratio is ONE double division). The window
    // runs over the tiny per-day aggregate — the fact table is touched once.
    // Flag = integer cross-multiplication (n * 2 > trailing_sum), so the boolean
    // is never at the mercy of double rounding.
    Q("events_burst_days",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"day").rowsBetween(-7, -1)
        t(s, dir, "events")
          .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n"))
          .withColumn("trail_n", sum($"n").over(w))
          .withColumn("trail_days", count($"n").over(w))
          .filter($"trail_days" >= 3)
          .select($"day", $"n",
            ($"n".cast("double") * $"trail_days" / $"trail_n").as("burst_ratio"),
            ($"n" * $"trail_days" > $"trail_n" * 2).as("is_burst"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
             |  FROM events GROUP BY 1),
             |tr AS (
             |  SELECT day, n,
             |    SUM(n) OVER (ORDER BY day
             |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_n,
             |    COUNT(n) OVER (ORDER BY day
             |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_days
             |  FROM daily)
             |SELECT day, n,
             |  CAST(n AS DOUBLE) * trail_days / trail_n AS burst_ratio,
             |  n * trail_days > trail_n * 2 AS is_burst
             |FROM tr WHERE trail_days >= 3 ORDER BY day""".stripMargin)),

    // EWMA smoothing over the per-user daily series: a FIXED 8-tap exponential
    // kernel (α = 0.5) written as explicit lag() taps with a left-associated
    // weighted sum, normalized by the weight mass of the taps actually present.
    // The recursive EWMA definition cannot run distributed (each row depends on
    // the previous result); the windowed-kernel form is the standard scale-out
    // approximation — per-key parallel, one shuffle on user_id, identical IEEE
    // expression trees on both engines. Daily sums go through decimal first.
    Q("events_ewma_smooth",
      (s, dir) => {
        import s.implicits._
        val daily = graft.Tables(s, dir, "events")
          .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
          .agg(dsum($"value").as("v"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val weights = (0 to 7).map(j => math.pow(0.5, j))
        val taps = (0 to 7).map(j => lag($"v", j).over(w))
        val num = taps.zip(weights).map { case (x, wt) =>
          coalesce(x, lit(0.0d)) * lit(wt) }.reduceLeft(_ + _)
        val den = taps.zip(weights).map { case (x, wt) =>
          when(x.isNotNull, lit(wt)).otherwise(lit(0.0d)) }.reduceLeft(_ + _)
        daily.select($"user_id", $"day", $"v",
            round((num / den), 6).as("ewma"))
          .orderBy($"user_id", $"day")
      },
      Some {
        val weights = (0 to 7).map(j => math.pow(0.5, j))
        val num = weights.zipWithIndex.map { case (wt, j) =>
          s"COALESCE(lag(v, $j) OVER w, 0.0) * $wt" }
          .reduceLeft((a, b) => s"($a + $b)")
        val den = weights.zipWithIndex.map { case (wt, j) =>
          s"CASE WHEN lag(v, $j) OVER w IS NOT NULL THEN $wt ELSE 0.0 END" }
          .reduceLeft((a, b) => s"($a + $b)")
        s"""WITH daily AS (
           |  SELECT user_id, date_trunc('day', ts) AS day,
           |    ${sqlDsum("value")} AS v
           |  FROM events GROUP BY 1, 2)
           |SELECT user_id, day, v, round(($num) / ($den), 6) AS ewma
           |FROM daily
           |WINDOW w AS (PARTITION BY user_id ORDER BY day)
           |ORDER BY user_id, day""".stripMargin
      }),

    // Winsorization (outlier clamping at exact p05/p95): thresholds come from the
    // exact interpolated percentile (quantile_cont semantics, as in
    // agg_percentile_cont), broadcast back onto the rows, and the clamped mean is
    // decimal-exact. Two passes over the grouped column — the unavoidable shape
    // for EXACT thresholds; the 100 TB variant swaps in the mergeable KLL sketch
    // thresholds (approx_kll_quantiles) with the same join structure.
    Q("feat_winsorize",
      (s, dir) => {
        import s.implicits._
        val th = t(s, dir, "orders")
          .groupBy($"o_orderstatus".as("st"))
          .agg(expr("percentile(o_totalprice, array(0.05D, 0.95D))").as("qs"))
          .select($"st", element_at($"qs", 1).as("p05"),
            element_at($"qs", 2).as("p95"))
        t(s, dir, "orders")
          .join(broadcast(th), $"o_orderstatus" === $"st")
          .select($"o_orderstatus",
            $"o_totalprice",
            least(greatest($"o_totalprice", $"p05"), $"p95").as("wv"),
            ($"o_totalprice" < $"p05").as("lo"),
            ($"o_totalprice" > $"p95").as("hi"),
            $"p05", $"p95")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum($"lo".cast("long")).as("n_clamped_low"),
            sum($"hi".cast("long")).as("n_clamped_high"),
            min($"p05").as("p05"), max($"p95").as("p95"),
            davg($"o_totalprice").as("mean_raw"),
            davg($"wv").as("mean_winsorized"))
          .orderBy($"o_orderstatus")
      },
      Some(s"""WITH th AS (
              |  SELECT o_orderstatus AS st,
              |    quantile_cont(o_totalprice, 0.05) AS p05,
              |    quantile_cont(o_totalprice, 0.95) AS p95
              |  FROM orders GROUP BY 1),
              |j AS (
              |  SELECT o_orderstatus, o_totalprice,
              |    least(greatest(o_totalprice, p05), p95) AS wv,
              |    o_totalprice < p05 AS lo, o_totalprice > p95 AS hi, p05, p95
              |  FROM orders JOIN th ON o_orderstatus = st)
              |SELECT o_orderstatus, COUNT(*) AS n,
              |  CAST(SUM(CAST(lo AS BIGINT)) AS BIGINT) AS n_clamped_low,
              |  CAST(SUM(CAST(hi AS BIGINT)) AS BIGINT) AS n_clamped_high,
              |  MIN(p05) AS p05, MAX(p95) AS p95,
              |  ${sqlDavg("o_totalprice")} AS mean_raw,
              |  ${sqlDavg("wv")} AS mean_winsorized
              |FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Chi-square independence test (event_type × user cohort): the contingency
    // table INCLUDING empty cells (full cross of the two tiny margins — a
    // PLANS.md-style bounded densification), expected counts from exact integer
    // margin products, per-cell contributions summed through DECIMAL so the
    // statistic is partitioning-independent. The margins/cells are aggregates;
    // nothing driver-side.
    Q("events_chi_square",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables(s, dir, "events")
          .select($"event_type", ($"user_id" % 3).as("cohort"))
        val cells = ev.groupBy($"event_type", $"cohort").agg(count(lit(1)).as("o"))
        val rowM = ev.groupBy($"event_type").agg(count(lit(1)).as("rt"))
        val colM = ev.groupBy($"cohort").agg(count(lit(1)).as("ct"))
        val tot = ev.agg(count(lit(1)).as("n"))
        val grid = rowM.crossJoin(colM).crossJoin(tot)
          .join(cells, Seq("event_type", "cohort"), "left")
          .select($"event_type", $"cohort", $"rt", $"ct", $"n",
            coalesce($"o", lit(0L)).as("o"))
        val e = ($"rt" * $"ct").cast("double") / $"n"
        val contrib = (($"o" - e) * ($"o" - e)) / e
        grid.agg(
            sum(contrib.cast("decimal(30,12)")).cast("double").as("chi2"),
            countDistinct($"event_type").as("nr"),
            countDistinct($"cohort").as("nc"),
            count(lit(1)).as("n_cells"))
          .select(round($"chi2", 6).as("chi2"),
            (($"nr" - 1) * ($"nc" - 1)).as("dof"),
            $"n_cells")
      },
      Some("""WITH ev AS (SELECT event_type, user_id % 3 AS cohort FROM events),
             |cells AS (SELECT event_type, cohort, count(*) AS o
             |          FROM ev GROUP BY 1, 2),
             |rm AS (SELECT event_type, count(*) AS rt FROM ev GROUP BY 1),
             |cm AS (SELECT cohort, count(*) AS ct FROM ev GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM ev),
             |grid AS (
             |  SELECT rm.event_type, cm.cohort, rt, ct, n,
             |    COALESCE(cells.o, 0) AS o
             |  FROM rm CROSS JOIN cm CROSS JOIN tot
             |  LEFT JOIN cells ON cells.event_type = rm.event_type
             |                 AND cells.cohort = cm.cohort)
             |SELECT
             |  round(CAST(SUM(CAST(
             |    ((o - CAST(rt * ct AS DOUBLE) / n) *
             |     (o - CAST(rt * ct AS DOUBLE) / n)) /
             |      (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(30,12))) AS DOUBLE), 6)
             |    AS chi2,
             |  (count(DISTINCT event_type) - 1) * (count(DISTINCT cohort) - 1) AS dof,
             |  count(*) AS n_cells
             |FROM grid""".stripMargin)),

    // CUPED variance reduction (controlled-experiment metric adjustment): the
    // pre-period covariate x (first half of the month) adjusts the post-period
    // metric y via θ = cov(x,y)/var(x), computed from decimal-exact global
    // moments (the agg_regression_ols machinery); the per-arm CUPED mean is then
    // mean(y) − θ·(mean(x) − x̄). Two aggregations (per-user, then per-arm) plus
    // one broadcast of the 1-row moment frame — nothing driver-side, nothing
    // quadratic; identical IEEE finish trees on both engines.
    Q("events_ab_cuped",
      (s, dir) => {
        import s.implicits._
        val users = graft.Tables(s, dir, "events")
          .groupBy($"user_id")
          .agg(
            dsum(when(dayofmonth($"ts") <= 15, $"value").otherwise(lit(0.0d))).as("x"),
            dsum(when(dayofmonth($"ts") > 15, $"value").otherwise(lit(0.0d))).as("y"))
          .select($"user_id", ($"user_id" % 2).as("arm"),
            $"x".cast("decimal(18,4)").as("xd"), $"y".cast("decimal(18,4)").as("yd"))
        val mom = users.agg(count(lit(1)).as("n"),
          sum($"xd").cast("double").as("sx"),
          sum($"xd" * $"xd").cast("double").as("sxx"),
          sum($"yd").cast("double").as("sy"),
          sum($"xd" * $"yd").cast("double").as("sxy"))
        val theta = ($"sxy" - $"sx" * $"sy" / $"n") /
          ($"sxx" - $"sx" * $"sx" / $"n")
        users.groupBy($"arm")
          .agg(count(lit(1)).as("n_users"),
            sum($"xd").cast("double").as("ax"),
            sum($"yd").cast("double").as("ay"))
          .crossJoin(broadcast(mom))
          .select($"arm", $"n_users",
            round($"ay" / $"n_users", 6).as("mean_raw"),
            round($"ay" / $"n_users" -
              theta * ($"ax" / $"n_users" - $"sx" / $"n"), 6).as("mean_cuped"),
            round(theta, 6).as("theta"))
          .orderBy($"arm")
      },
      Some("""WITH u AS (
             |  SELECT user_id, user_id % 2 AS arm,
             |    CAST(CAST(SUM(CAST(CASE WHEN dayofmonth(ts) <= 15 THEN value
             |      ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS DECIMAL(18,4)) AS xd,
             |    CAST(CAST(SUM(CAST(CASE WHEN dayofmonth(ts) > 15 THEN value
             |      ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS DECIMAL(18,4)) AS yd
             |  FROM events GROUP BY user_id),
             |m AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(xd) AS DOUBLE) AS sx, CAST(SUM(xd * xd) AS DOUBLE) AS sxx,
             |    CAST(SUM(yd) AS DOUBLE) AS sy, CAST(SUM(xd * yd) AS DOUBLE) AS sxy
             |  FROM u),
             |a AS (
             |  SELECT arm, COUNT(*) AS n_users,
             |    CAST(SUM(xd) AS DOUBLE) AS ax, CAST(SUM(yd) AS DOUBLE) AS ay
             |  FROM u GROUP BY arm)
             |SELECT arm, n_users,
             |  round(ay / n_users, 6) AS mean_raw,
             |  round(ay / n_users -
             |    ((sxy - sx * sy / n) / (sxx - sx * sx / n)) *
             |      (ax / n_users - sx / n), 6) AS mean_cuped,
             |  round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS theta
             |FROM a CROSS JOIN m ORDER BY arm""".stripMargin)),

    // Quantile normalization across sources (batch-effect removal): each value is
    // replaced by the POOLED distribution's value at its within-source percentile.
    // The pooled quantile grid is 101 exact interpolated quantiles (one bounded
    // aggregate, broadcast back), the within-source rank is a per-source window —
    // so the whole transform is one window + one broadcast join; no global sort
    // of the corpus.
    Q("feat_quantile_normalize",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"source", $"n_chars")
        val pr = percent_rank().over(
          Window.partitionBy($"source").orderBy($"n_chars", $"doc_id"))
        val ranked = docs.select($"doc_id", $"source", $"n_chars",
          round(pr * 100, 0).cast("int").as("centile"))
        val gridArr = (0 to 100).map(i => s"${i / 100.0}D").mkString(", ")
        val grid = docs
          .agg(expr(s"percentile(n_chars, array($gridArr))").as("qs"))
          .select(posexplode($"qs").as(Seq("centile", "qval")))
        ranked.join(broadcast(grid), Seq("centile"))
          .select($"doc_id", $"source", $"n_chars", round($"qval", 6).as("normalized"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
             |r AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(round(percent_rank() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) * 100, 0) AS INTEGER) AS centile
             |  FROM d),
             |qs AS (
             |  SELECT quantile_cont(n_chars,
             |    list_transform(generate_series(0, 100), i -> i / 100.0)) AS q
             |  FROM d),
             |g AS (
             |  SELECT i - 1 AS centile, q[i] AS qval
             |  FROM qs, generate_series(1, 101) t(i))
             |SELECT doc_id, source, n_chars, round(qval, 6) AS normalized
             |FROM r JOIN g USING (centile)
             |ORDER BY doc_id""".stripMargin)),

    // ISO-week calendar rollup: ISO week number plus the ISO WEEK-YEAR (the year
    // of that week's Thursday — weeks 52/53/1 straddle January 1, so the plain
    // calendar year mislabels boundary weeks). Spark has no isoyear(); the
    // Thursday trick derives it from arithmetic only, so both engines agree
    // exactly. One map-side-combined rollup on (iso_year, iso_week).
    Q("events_iso_week_rollup",
      (s, dir) => {
        import s.implicits._
        val d = $"o_orderdate".cast("date")
        val isoDow = ((dayofweek(d) + lit(5)) % 7) + 1
        val thursday = date_add(d, lit(4) - isoDow)
        t(s, dir, "orders")
          .groupBy(year(thursday).as("iso_year"), weekofyear(d).as("iso_week"))
          .agg(count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("sum_price"),
            min(d).as("first_day"))
          .orderBy($"iso_year", $"iso_week")
      },
      Some(s"""SELECT
              |  CAST(isoyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_year,
              |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
              |  COUNT(*) AS n_orders,
              |  ${sqlDsum("o_totalprice")} AS sum_price,
              |  MIN(CAST(o_orderdate AS DATE)) AS first_day
              |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Weighted single-source shortest path (Bellman-Ford relaxations as joins):
    // the Pregel-style companion of graph_bfs_hops for WEIGHTED edges — each
    // round joins the current distance frame to the edge list, takes the per-node
    // MIN candidate, and folds it in; localCheckpoint cuts the growing lineage
    // exactly like graph_pagerank. Distances stay DECIMAL throughout, so min()
    // comparisons and the final values are engine-exact (no float-accumulation
    // order sensitivity). 4 rounds bound the plan; the oracle unrolls the same
    // 4 relaxations as chained CTEs.
    Q("graph_shortest_path_weighted",
      (s, dir) => {
        import s.implicits._
        val edges = t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey", $"l_quantity")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .filter($"c_nationkey" =!= $"s_nationkey")
          .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .agg(min($"l_quantity".cast("decimal(18,2)")).as("w"))
          .localCheckpoint()
        val nodes = edges.select($"src".as("node"))
          .union(edges.select($"dst".as("node"))).distinct()
        var dist = nodes.withColumn("d",
          when($"node" === 0, lit(BigDecimal(0)).cast("decimal(18,2)")))
        for (_ <- 1 to 4) {
          val best = dist.filter($"d".isNotNull)
            .join(edges, $"node" === $"src")
            .groupBy($"dst".as("bnode")).agg(min($"d" + $"w").as("best"))
          dist = dist.join(best, $"node" === $"bnode", "left")
            .select($"node",
              when($"d".isNull, $"best")
                .when($"best".isNull, $"d")
                .when($"best" < $"d", $"best")
                .otherwise($"d").as("d"))
            .localCheckpoint()
        }
        dist.select($"node", $"d".cast("double").as("dist")).orderBy($"node")
      },
      Some {
        def relax(prev: String, i: Int): String =
          s"""r$i AS (
             |  SELECT e.dst AS bnode, MIN($prev.d + e.w) AS best
             |  FROM $prev JOIN e ON e.src = $prev.node
             |  WHERE $prev.d IS NOT NULL GROUP BY 1),
             |d$i AS (
             |  SELECT p.node,
             |    CASE WHEN p.d IS NULL THEN r.best
             |         WHEN r.best IS NULL THEN p.d
             |         WHEN r.best < p.d THEN r.best ELSE p.d END AS d
             |  FROM $prev p LEFT JOIN r$i r ON p.node = r.bnode)""".stripMargin
        s"""WITH e AS (
           |  SELECT c_nationkey AS src, s_nationkey AS dst,
           |    MIN(CAST(l_quantity AS DECIMAL(18,2))) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey GROUP BY 1, 2),
           |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |d0 AS (SELECT node,
           |  CASE WHEN node = 0 THEN CAST(0 AS DECIMAL(18,2)) END AS d FROM n),
           |${relax("d0", 1)},
           |${relax("d1", 2)},
           |${relax("d2", 3)},
           |${relax("d3", 4)}
           |SELECT node, CAST(d AS DOUBLE) AS dist FROM d4 ORDER BY node""".stripMargin
      }),

    // Event-type co-occurrence / association mining (support + lift): the "market
    // basket" is a (user, hour) cell; pair candidates come from a SELF-JOIN on
    // the basket key (equi — per-basket fanout is bounded by the type vocabulary,
    // never corpus-quadratic), margins and the basket total from two cheap
    // rollups. Lift's integer cross-products stay exact; the final ratio is one
    // double division, rounded.
    Q("events_type_cooccurrence",
      (s, dir) => {
        import s.implicits._
        val baskets = graft.Tables(s, dir, "events")
          .select($"user_id", date_trunc("hour", $"ts").as("minute"), $"event_type")
          .distinct()
        val pairs = baskets.as("a")
          .join(baskets.as("b"),
            $"a.user_id" === $"b.user_id" && $"a.minute" === $"b.minute" &&
              $"a.event_type" < $"b.event_type")
          .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
          .agg(count(lit(1)).as("n_pair"))
        val margins = baskets.groupBy($"event_type").agg(count(lit(1)).as("n_type"))
        val total = baskets.select($"user_id", $"minute").distinct()
          .agg(count(lit(1)).as("n_baskets"))
        pairs
          .join(broadcast(margins.select($"event_type".as("type_a"), $"n_type".as("na"))),
            Seq("type_a"))
          .join(broadcast(margins.select($"event_type".as("type_b"), $"n_type".as("nb"))),
            Seq("type_b"))
          .crossJoin(broadcast(total))
          .select($"type_a", $"type_b", $"n_pair",
            round(($"n_pair" * $"n_baskets").cast("double") / ($"na" * $"nb"), 6)
              .as("lift"))
          .orderBy($"type_a", $"type_b")
      },
      Some("""WITH baskets AS (
             |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS minute, event_type
             |  FROM events),
             |pairs AS (
             |  SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    count(*) AS n_pair
             |  FROM baskets a JOIN baskets b
             |    ON a.user_id = b.user_id AND a.minute = b.minute
             |   AND a.event_type < b.event_type
             |  GROUP BY 1, 2),
             |m AS (SELECT event_type, count(*) AS n_type FROM baskets GROUP BY 1),
             |tot AS (SELECT count(*) AS n_baskets FROM
             |        (SELECT DISTINCT user_id, minute FROM baskets))
             |SELECT type_a, type_b, n_pair,
             |  round(CAST(n_pair * n_baskets AS DOUBLE) / (ma.n_type * mb.n_type), 6)
             |    AS lift
             |FROM pairs
             |JOIN m ma ON ma.event_type = type_a
             |JOIN m mb ON mb.event_type = type_b
             |CROSS JOIN tot
             |ORDER BY type_a, type_b""".stripMargin)),

    // Longest consecutive-day streak per user — the gaps-and-islands MAX-run
    // readout (sessionize finds the islands; this ranks them). The island id is
    // the classic day_number − row_number difference: constant within a
    // consecutive run, strictly increasing across gaps. Two key-partitioned
    // aggregations; no self-joins.
    Q("events_streak_longest",
      (s, dir) => {
        import s.implicits._
        val days = graft.Tables(s, dir, "events")
          .select($"user_id", $"ts".cast("date").as("day")).distinct()
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val runs = days
          .withColumn("grp",
            datediff($"day", lit("2024-01-01").cast("date")) -
              row_number().over(w))
          .groupBy($"user_id", $"grp")
          .agg(count(lit(1)).as("run_len"), min($"day").as("run_start"))
        runs.groupBy($"user_id")
          .agg(max($"run_len").as("longest_streak"),
            sum($"run_len").as("active_days"),
            count(lit(1)).as("n_runs"))
          .orderBy($"user_id")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |runs AS (
             |  SELECT user_id,
             |    datediff('day', DATE '2024-01-01', day) -
             |      row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp,
             |    day
             |  FROM days),
             |r2 AS (
             |  SELECT user_id, grp, count(*) AS run_len FROM runs
             |  GROUP BY user_id, grp)
             |SELECT user_id, MAX(run_len) AS longest_streak,
             |  CAST(SUM(run_len) AS BIGINT) AS active_days,
             |  count(*) AS n_runs
             |FROM r2 GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Shannon-entropy behavioral diversity per user: −Σ p·ln p over the user's
    // event-type distribution. Each type's contribution goes through DECIMAL
    // before the per-user sum (an unordered double sum would be partitioning-
    // dependent); p is an exact integer ratio. High entropy = diversified usage;
    // 0 = single-type users.
    Q("events_entropy_diversity",
      (s, dir) => {
        import s.implicits._
        val cnt = graft.Tables(s, dir, "events")
          .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy($"user_id").agg(sum($"c").as("n"))
        val p = $"c".cast("double") / $"n"
        cnt.join(tot, Seq("user_id"))
          .select($"user_id", $"n",
            (-(p * log(p))).cast("decimal(30,12)").as("e"))
          .groupBy($"user_id")
          .agg(max($"n").as("n_events"),
            round(sum($"e").cast("double"), 9).as("entropy"))
          .orderBy($"user_id")
      },
      Some("""WITH cnt AS (
             |  SELECT user_id, event_type, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n
             |        FROM cnt GROUP BY 1),
             |e AS (
             |  SELECT cnt.user_id, n,
             |    CAST(-((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))
             |      AS DECIMAL(30,12)) AS e
             |  FROM cnt JOIN tot ON cnt.user_id = tot.user_id)
             |SELECT user_id, MAX(n) AS n_events,
             |  round(CAST(SUM(e) AS DOUBLE), 9) AS entropy
             |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Growth accounting (daily user lifecycle states): each active user-day is
    // NEW (first ever), RETAINED (active the day before) or RESURRECTED (gap
    // > 1 day); a user CHURNS on the day after an activity run ends (bounded to
    // the observed horizon). Two per-user windows (lag + lead over distinct
    // active days), one day-level rollup — the standard DAU decomposition, no
    // self-joins, no calendar cross.
    Q("events_lifecycle_states",
      (s, dir) => {
        import s.implicits._
        val days = graft.Tables(s, dir, "events")
          .select($"user_id", $"ts".cast("date").as("day")).distinct()
        val horizon = days.agg(max($"day").as("max_day"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val marked = days
          .withColumn("prev", lag($"day", 1).over(w))
          .withColumn("next", lead($"day", 1).over(w))
        val active = marked.select($"day",
          when($"prev".isNull, "new")
            .when(datediff($"day", $"prev") === 1, "retained")
            .otherwise("resurrected").as("state"))
        val churn = marked
          .filter($"next".isNull || datediff($"next", $"day") > 1)
          .select(date_add($"day", 1).as("day"), lit("churned").as("state"))
          .crossJoin(broadcast(horizon))
          .filter($"day" <= $"max_day")
          .select($"day", $"state")
        active.unionByName(churn)
          .groupBy($"day")
          .agg(
            sum(when($"state" === "new", 1L).otherwise(0L)).as("n_new"),
            sum(when($"state" === "retained", 1L).otherwise(0L)).as("n_retained"),
            sum(when($"state" === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
            sum(when($"state" === "churned", 1L).otherwise(0L)).as("n_churned"))
          .orderBy($"day")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |h AS (SELECT MAX(day) AS max_day FROM days),
             |m AS (
             |  SELECT user_id, day,
             |    lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev,
             |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
             |  FROM days),
             |active AS (
             |  SELECT day,
             |    CASE WHEN prev IS NULL THEN 'new'
             |         WHEN datediff('day', prev, day) = 1 THEN 'retained'
             |         ELSE 'resurrected' END AS state
             |  FROM m),
             |churn AS (
             |  SELECT day + 1 AS day, 'churned' AS state
             |  FROM m CROSS JOIN h
             |  WHERE (next IS NULL OR datediff('day', day, next) > 1)
             |    AND day + 1 <= max_day),
             |u AS (SELECT * FROM active UNION ALL SELECT * FROM churn)
             |SELECT day,
             |  CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_new,
             |  CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_retained,
             |  CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_resurrected,
             |  CAST(SUM(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_churned
             |FROM u GROUP BY day ORDER BY day""".stripMargin)),

    // Day-of-week seasonality index: each weekday's event rate relative to the
    // overall daily mean (index 1.0 = flat). Counts stay integers until a single
    // cross-multiplied double ratio — daily means never materialize separately,
    // so the index is engine-exact before rounding. ISO weekday via arithmetic
    // (Spark has no isodow; same trick as the ISO-week rollup).
    Q("events_seasonality_dow",
      (s, dir) => {
        import s.implicits._
        val d = $"ts".cast("date")
        val daily = graft.Tables(s, dir, "events")
          .groupBy(d.as("day")).agg(count(lit(1)).as("n"))
          .select($"day", $"n", (((dayofweek($"day") + lit(5)) % 7) + 1).as("dow"))
        val byDow = daily.groupBy($"dow")
          .agg(sum($"n").as("events"), count(lit(1)).as("days"))
        val tot = daily.agg(sum($"n").as("tot_events"), count(lit(1)).as("tot_days"))
        byDow.crossJoin(broadcast(tot))
          .select($"dow", $"events", $"days",
            round(($"events" * $"tot_days").cast("double") /
              ($"days" * $"tot_events"), 9).as("seasonality_index"))
          .orderBy($"dow")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |  FROM events GROUP BY 1),
             |byDow AS (
             |  SELECT isodow(day) AS dow, CAST(SUM(n) AS BIGINT) AS events,
             |    count(*) AS days
             |  FROM daily GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_events,
             |               count(*) AS tot_days FROM daily)
             |SELECT CAST(dow AS INTEGER) AS dow, events, days,
             |  round(CAST(events * tot_days AS DOUBLE) / (days * tot_events), 9)
             |    AS seasonality_index
             |FROM byDow CROSS JOIN tot ORDER BY dow""".stripMargin)),

    // Degree distribution of the nation trade graph: out/in degrees per node
    // from one aggregation each, then the degree histogram (how many nodes have
    // degree k) — the first diagnostic of any graph workload's skew before
    // running pagerank/BFS on it.
    Q("graph_degree_distribution",
      (s, dir) => {
        import s.implicits._
        // one shipping week only — the full-period graph is complete (every
        // nation trades with every nation) and its histogram is a single row
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
          .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
          .filter($"src" =!= $"dst")
          .distinct()
        val outDeg = e.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
        outDeg.groupBy($"deg")
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy($"deg")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |    AND l_shipdate >= TIMESTAMP '1997-03-01'
             |    AND l_shipdate <  TIMESTAMP '1997-03-08'),
             |d AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src)
             |SELECT deg, count(*) AS n_nodes
             |FROM d GROUP BY deg ORDER BY deg""".stripMargin)),

    // 30-day ROLLING Pearson correlation between two daily series (count vs
    // quantity): the windowed form of agg_corr_exact. The raw table collapses to
    // the daily grain first (the only full-data pass — map-side combinable), so
    // the unpartitioned ordered window only ever sees |days| rows regardless of
    // corpus size; moments are decimal window sums (exact, associative) and the
    // correlation readout is the identical IEEE double tree on both engines.
    // Partial leading windows are skipped (n = 30) so every emitted row has a
    // full frame — no 0/0 NaN boundary to diverge on.
    Q("win_rolling_corr",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "lineitem")
          .groupBy(to_date($"l_shipdate").as("day"))
          .agg(count(lit(1)).cast("decimal(18,2)").as("x"),
            sum($"l_quantity".cast("decimal(18,2)")).as("y"))
        val w = Window.orderBy($"day").rowsBetween(-29, 0)
        val n = count(lit(1)).over(w).cast("double")
        daily.select($"day", n.as("n"),
            sum($"x").over(w).cast("double").as("sx"),
            sum($"x" * $"x").over(w).cast("double").as("sxx"),
            sum($"y").over(w).cast("double").as("sy"),
            sum($"y" * $"y").over(w).cast("double").as("syy"),
            sum($"x" * $"y").over(w).cast("double").as("sxy"))
          .filter($"n" === 30.0d)
          .select($"day",
            (($"n" * $"sxy" - $"sx" * $"sy") /
              sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
                   ($"n" * $"syy" - $"sy" * $"sy"))).as("corr30"))
          .orderBy($"day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(l_shipdate AS DATE) AS day,
             |    CAST(COUNT(*) AS DECIMAL(18,2)) AS x,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS y
             |  FROM lineitem GROUP BY 1),
             |w AS (
             |  SELECT day,
             |    CAST(COUNT(*) OVER win AS DOUBLE) AS n,
             |    CAST(SUM(x) OVER win AS DOUBLE) AS sx,
             |    CAST(SUM(x*x) OVER win AS DOUBLE) AS sxx,
             |    CAST(SUM(y) OVER win AS DOUBLE) AS sy,
             |    CAST(SUM(y*y) OVER win AS DOUBLE) AS syy,
             |    CAST(SUM(x*y) OVER win AS DOUBLE) AS sxy
             |  FROM daily
             |  WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING
             |                 AND CURRENT ROW))
             |SELECT day,
             |  (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy)) AS corr30
             |FROM w WHERE n = 30.0 ORDER BY day""".stripMargin)),

    // Autocorrelation function of the daily event-count series at lags 1..7 —
    // the time-series diagnostic behind seasonality detection. The series is the
    // aggregated daily frame (|days| rows); the 7 lags come from a map-side
    // generator (explode of a literal array — no join, no BNLJ), then each lag
    // pairs via ONE equi-join on the shifted date. Decimal-exact sums,
    // identical double readout (the agg_corr_exact discipline).
    Q("events_autocorr_lag",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .groupBy(to_date($"ts").as("day"))
          .agg(count(lit(1)).cast("decimal(18,2)").as("c"))
        val nD = $"n_pairs".cast("double")
        daily.select($"day", $"c",
            explode(array((1 to 7).map(lit): _*)).as("k"))
          .join(daily.select($"day".as("pday"), $"c".as("pc")),
            date_sub($"day", $"k") === $"pday")
          .select($"k", $"c".as("x"), $"pc".as("y"))
          .groupBy($"k")
          .agg(count(lit(1)).as("n_pairs"),
            sum($"x").cast("double").as("sx"),
            sum($"x" * $"x").cast("double").as("sxx"),
            sum($"y").cast("double").as("sy"),
            sum($"y" * $"y").cast("double").as("syy"),
            sum($"x" * $"y").cast("double").as("sxy"))
          .select($"k", $"n_pairs",
            ((nD * $"sxy" - $"sx" * $"sy") /
              sqrt((nD * $"sxx" - $"sx" * $"sx") *
                   (nD * $"syy" - $"sy" * $"sy"))).as("autocorr"))
          .orderBy($"k")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    CAST(COUNT(*) AS DECIMAL(18,2)) AS c
             |  FROM events GROUP BY 1),
             |lagged AS (
             |  SELECT day, c, unnest([1, 2, 3, 4, 5, 6, 7]) AS k FROM daily),
             |pairs AS (
             |  SELECT l.k, l.c AS x, p.c AS y
             |  FROM lagged l JOIN daily p ON p.day = l.day - l.k),
             |g AS (
             |  SELECT k, COUNT(*) AS n_pairs,
             |    CAST(SUM(x) AS DOUBLE) AS sx,
             |    CAST(SUM(x*x) AS DOUBLE) AS sxx,
             |    CAST(SUM(y) AS DOUBLE) AS sy,
             |    CAST(SUM(y*y) AS DOUBLE) AS syy,
             |    CAST(SUM(x*y) AS DOUBLE) AS sxy
             |  FROM pairs GROUP BY k)
             |SELECT k, n_pairs,
             |  (CAST(n_pairs AS DOUBLE)*sxy - sx*sy) /
             |    sqrt((CAST(n_pairs AS DOUBLE)*sxx - sx*sx) *
             |         (CAST(n_pairs AS DOUBLE)*syy - sy*sy)) AS autocorr
             |FROM g ORDER BY k""".stripMargin)),

    // Zipf-law fit over the corpus vocabulary: OLS of ln(frequency) on ln(rank)
    // for the top-200 tokens — the standard corpus-health diagnostic (natural
    // text slopes ≈ −1; generated/templated text diverges). Reuses the
    // text_vocab_build rank pipeline (one token-count shuffle; the top-200 frame
    // is tiny), then one closed-form regression readout — ln() and the double
    // combination are identical expression trees on both engines, sums go
    // through decimal at scale 9 (|ln| ≤ 12, far under the rounding-divergence
    // threshold).
    Q("text_zipf_fit",
      (s, dir) => {
        import s.implicits._
        val nD = $"n_ranks".cast("double")
        val slope = (nD * $"sxy" - $"sx" * $"sy") /
          (nD * $"sxx" - $"sx" * $"sx")
        t(s, dir, "documents")
          .select(explode(TF.tokens($"text")).as("token"))
          .groupBy($"token").agg(count(lit(1)).as("n"))
          // top-200 via distributed TakeOrdered FIRST (per-partition top-k +
          // merge); the single-partition rank window then runs over 200 rows,
          // never the full vocabulary rollup
          .orderBy($"n".desc, $"token").limit(200)
          .withColumn("r", row_number().over(Window.orderBy($"n".desc, $"token")))
          .select(log($"r".cast("double")).as("x"),
            log($"n".cast("double")).as("y"))
          .agg(count(lit(1)).as("n_ranks"),
            dsum($"x", 9).as("sx"), dsum($"x" * $"x", 9).as("sxx"),
            dsum($"y", 9).as("sy"), dsum($"y" * $"y", 9).as("syy"),
            dsum($"x" * $"y", 9).as("sxy"))
          .select($"n_ranks", slope.as("slope"),
            (($"sy" - slope * $"sx") / nD).as("intercept"),
            (((nD * $"sxy" - $"sx" * $"sy") * (nD * $"sxy" - $"sx" * $"sy")) /
              ((nD * $"sxx" - $"sx" * $"sx") *
               (nD * $"syy" - $"sy" * $"sy"))).as("r2"))
      },
      Some(s"""WITH t AS (
              |  SELECT unnest(${duckToks("text")}) AS token FROM documents),
              |c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token),
              |rk AS (
              |  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token)
              |              AS DOUBLE)) AS x,
              |    ln(CAST(n AS DOUBLE)) AS y
              |  FROM c
              |  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, token) <= 200),
              |g AS (
              |  SELECT COUNT(*) AS n_ranks,
              |    ${sqlDsum("x", 9)} AS sx, ${sqlDsum("x*x", 9)} AS sxx,
              |    ${sqlDsum("y", 9)} AS sy, ${sqlDsum("y*y", 9)} AS syy,
              |    ${sqlDsum("x*y", 9)} AS sxy
              |  FROM rk)
              |SELECT n_ranks,
              |  (CAST(n_ranks AS DOUBLE)*sxy - sx*sy) /
              |    (CAST(n_ranks AS DOUBLE)*sxx - sx*sx) AS slope,
              |  (sy - ((CAST(n_ranks AS DOUBLE)*sxy - sx*sy) /
              |         (CAST(n_ranks AS DOUBLE)*sxx - sx*sx)) * sx) /
              |    CAST(n_ranks AS DOUBLE) AS intercept,
              |  ((CAST(n_ranks AS DOUBLE)*sxy - sx*sy) *
              |   (CAST(n_ranks AS DOUBLE)*sxy - sx*sy)) /
              |    ((CAST(n_ranks AS DOUBLE)*sxx - sx*sx) *
              |     (CAST(n_ranks AS DOUBLE)*syy - sy*sy)) AS r2
              |FROM g""".stripMargin)),

    // Geospatial nearest-center assignment (haversine): every point joins its
    // closest of k facility centers — the geodesic twin of the k-means assign
    // step. The 25 centers collapse to ONE sorted array row (a sanctioned
    // single-row scalar cross; at 100 TB this is a broadcast variable, never a
    // pair explosion) and the per-point argmin is a map-side HOF over that
    // array — no point ever shuffles. Coordinates are derived deterministically
    // from keys (the synthetic schema carries no geo columns); the great-circle
    // formula is the identical libm double tree on both engines (fn_trig
    // precedent), and ties break on center key via the struct sort.
    Q("geo_nearest_center",
      (s, dir) => {
        import s.implicits._
        val centers = t(s, dir, "nation")
          .select($"n_nationkey".cast("double").as("ck"),
            (lit(-60.0d) + lit(5.5d) * $"n_nationkey").as("clat"),
            (lit(-170.0d) + lit(13.7d) * $"n_nationkey").as("clon"))
          .agg(sort_array(collect_list(struct($"ck", $"clat", $"clon")))
            .as("cs"))
        t(s, dir, "supplier")
          .select($"s_suppkey",
            (lit(-85.0d) + ($"s_suppkey" * 7919L % 1700L) / 10.0d).as("plat"),
            (lit(-180.0d) + ($"s_suppkey" * 104729L % 3599L) / 10.0d).as("plon"))
          .crossJoin(centers)
          .withColumn("best", expr(
            // degree→radian via one explicit multiply by the π/180 double
            // literal: radians() associates differently across engines
            // (Java's toRadians is x/180*π) and would drift a ULP
            """array_sort(transform(cs, c -> struct(
              |  2.0D * 6371.0D * asin(sqrt(
              |    sin((c.clat - plat) * 0.017453292519943295D / 2.0D) *
              |    sin((c.clat - plat) * 0.017453292519943295D / 2.0D) +
              |    cos(plat * 0.017453292519943295D) *
              |    cos(c.clat * 0.017453292519943295D) *
              |    sin((c.clon - plon) * 0.017453292519943295D / 2.0D) *
              |    sin((c.clon - plon) * 0.017453292519943295D / 2.0D)))
              |    AS dist_km,
              |  c.ck AS ck)))[0]""".stripMargin))
          .groupBy($"best.ck".as("center_key"))
          .agg(count(lit(1)).as("n_points"),
            min($"best.dist_km").as("min_km"),
            max($"best.dist_km").as("max_km"))
          .orderBy($"center_key")
      },
      Some("""WITH centers AS (
             |  SELECT CAST(n_nationkey AS DOUBLE) AS ck,
             |    -60.0 + 5.5 * n_nationkey AS clat,
             |    -170.0 + 13.7 * n_nationkey AS clon
             |  FROM nation),
             |pts AS (
             |  SELECT s_suppkey,
             |    -85.0 + (s_suppkey * 7919 % 1700) / 10.0 AS plat,
             |    -180.0 + (s_suppkey * 104729 % 3599) / 10.0 AS plon
             |  FROM supplier),
             |d AS (
             |  SELECT s_suppkey, ck,
             |    2.0 * 6371.0 * asin(sqrt(
             |      sin((clat - plat) * 0.017453292519943295 / 2.0) *
             |      sin((clat - plat) * 0.017453292519943295 / 2.0) +
             |      cos(plat * 0.017453292519943295) *
             |      cos(clat * 0.017453292519943295) *
             |      sin((clon - plon) * 0.017453292519943295 / 2.0) *
             |      sin((clon - plon) * 0.017453292519943295 / 2.0))) AS dist_km
             |  FROM pts CROSS JOIN centers),
             |r AS (
             |  SELECT *, row_number() OVER (PARTITION BY s_suppkey
             |    ORDER BY dist_km, ck) AS rn FROM d)
             |SELECT ck AS center_key, COUNT(*) AS n_points,
             |  MIN(dist_km) AS min_km, MAX(dist_km) AS max_km
             |FROM r WHERE rn = 1 GROUP BY ck ORDER BY center_key""".stripMargin)),

    // Common-neighbor link prediction over the undirected trade graph: for every
    // NON-adjacent node pair, count shared neighbors and score Jaccard overlap
    // of the neighborhoods — the classic "who should be connected" graph query.
    // Candidate pairs come from an equi-join of the adjacency list with itself
    // ON THE SHARED NEIGHBOR (never an all-pairs cross); existing edges drop via
    // an anti-join; degrees broadcast back. At 100 TB the shared-neighbor join
    // is the standard scalable shape, with hub skew bounded by degree-capping
    // the adjacency list first (not needed at this graph's size).
    Q("graph_link_prediction",
      (s, dir) => {
        import s.implicits._
        val raw = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-06-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-06-08").cast("timestamp"))
          .select($"l_orderkey", $"l_suppkey")
          .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
            $"l_suppkey" === $"s_suppkey")
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y"))
          .filter($"x" =!= $"y")
        val ue = raw.select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
          .distinct().localCheckpoint()
        val nbrs = ue.select($"a".as("u"), $"b".as("v"))
          .unionByName(ue.select($"b".as("u"), $"a".as("v")))
        val deg = nbrs.groupBy($"u").agg(count(lit(1)).as("d"))
        val cand = nbrs.select($"u".as("u1"), $"v".as("w"))
          .join(nbrs.select($"u".as("u2"), $"v".as("w2")),
            $"w" === $"w2" && $"u1" < $"u2")
          .groupBy($"u1", $"u2").agg(count(lit(1)).as("common_cnt"))
          .join(ue, $"u1" === $"a" && $"u2" === $"b", "left_anti")
        cand
          .join(broadcast(deg.select($"u".as("u1"), $"d".as("d1"))), Seq("u1"))
          .join(broadcast(deg.select($"u".as("u2"), $"d".as("d2"))), Seq("u2"))
          .select($"u1", $"u2", $"common_cnt",
            ($"common_cnt".cast("double") /
              ($"d1" + $"d2" - $"common_cnt")).as("jaccard"))
          .orderBy($"common_cnt".desc, $"u1", $"u2").limit(20)
      },
      Some("""WITH raw AS (
             |  SELECT c_nationkey AS x, s_nationkey AS y
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE c_nationkey <> s_nationkey
             |    AND l_shipdate >= TIMESTAMP '1997-06-01'
             |    AND l_shipdate <  TIMESTAMP '1997-06-08'),
             |ue AS (
             |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM raw),
             |nbrs AS (
             |  SELECT a AS u, b AS v FROM ue
             |  UNION ALL SELECT b AS u, a AS v FROM ue),
             |deg AS (SELECT u, count(*) AS d FROM nbrs GROUP BY u),
             |cand AS (
             |  SELECT n1.u AS u1, n2.u AS u2, count(*) AS common_cnt
             |  FROM nbrs n1 JOIN nbrs n2 ON n1.v = n2.v AND n1.u < n2.u
             |  GROUP BY n1.u, n2.u),
             |nonadj AS (
             |  SELECT c.* FROM cand c
             |  WHERE NOT EXISTS (SELECT 1 FROM ue
             |                    WHERE ue.a = c.u1 AND ue.b = c.u2))
             |SELECT u1, u2, common_cnt,
             |  CAST(common_cnt AS DOUBLE) / (d1.d + d2.d - common_cnt) AS jaccard
             |FROM nonadj
             |JOIN deg d1 ON d1.u = u1
             |JOIN deg d2 ON d2.u = u2
             |ORDER BY common_cnt DESC, u1, u2 LIMIT 20""".stripMargin)),

    // Community detection via synchronous weighted label propagation (LPA), 3
    // unrolled rounds over the undirected trade graph of a 3-day shipping
    // window (the full-year graph is near-complete and LPA correctly collapses
    // it to one community — the sparse slice is what has structure: 5
    // communities over 25 nations at sf0.01): each node adopts the
    // label with the largest incident edge-weight sum among its neighbors
    // (ties to the smallest label — the determinism rule that makes sync LPA
    // hashable; async LPA is order-dependent by construction). Each round is
    // ONE key-partitioned join + two grouped aggregations — the Pregel shape in
    // plain DataFrames, like graph_pagerank; no driver-side state. At 100 TB
    // the per-round shuffle carries |E| (neighbor,label) pairs keyed by node —
    // hub skew is bounded by the same degree-capping as graph_link_prediction.
    Q("graph_label_propagation",
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
          .localCheckpoint() // 25-node edge list: cut the 4-join lineage once
        var labels = und.select($"u".as("node")).distinct()
          .withColumn("lbl", $"node")
        for (_ <- 1 to 3) {
          labels = und.join(labels, $"v" === $"node")
            .groupBy($"u", $"lbl").agg(sum($"w").as("wsum"))
            .groupBy($"u")
            .agg(min(struct((-$"wsum").as("nw"), $"lbl".as("l"))).as("m"))
            .select($"u".as("node"), $"m.l".as("lbl"))
        }
        labels.orderBy($"node")
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
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT node, lbl FROM l3 ORDER BY node""".stripMargin
      }),

    // k-core peeling (k = 3), 3 synchronous rounds over the same 3-day trade
    // slice: each round drops nodes of degree < k and the edges touching them;
    // what survives 3 rounds approximates the 3-core (the full core is the
    // fixpoint — bounded rounds keep the oracle an unrolled CTE chain, the
    // same contract as BFS/pagerank/LPA). Each round is one degree count +
    // one semi-join — Pregel-by-joins; at 100 TB both legs are key-partitioned
    // equi-joins over the shrinking edge set.
    Q("graph_kcore",
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
          .select($"c_nationkey".as("x"), $"s_nationkey".as("y"))
        var edges = raw
          .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
          .distinct()
          .select($"a".as("u"), $"b".as("v"))
          .unionByName(raw.select(least($"x", $"y").as("a"),
            greatest($"x", $"y").as("b")).distinct()
            .select($"b".as("u"), $"a".as("v")))
          .localCheckpoint()
        for (_ <- 1 to 3) {
          val keep = edges.groupBy($"u").agg(count(lit(1)).as("d"))
            .filter($"d" >= 3).select($"u".as("kn"))
          edges = edges
            .join(keep, $"u" === $"kn", "left_semi")
            .join(keep.select($"kn".as("kn2")), $"v" === $"kn2", "left_semi")
            .localCheckpoint()
        }
        edges.groupBy($"u".as("node")).agg(count(lit(1)).as("core_degree"))
          .orderBy($"node")
      },
      Some {
        val round = (k: Int) =>
          s"""keep$k AS (
             |  SELECT u FROM e${k - 1} GROUP BY u HAVING COUNT(*) >= 3),
             |e$k AS (
             |  SELECT e.u, e.v FROM e${k - 1} e
             |  JOIN keep$k ku ON ku.u = e.u
             |  JOIN keep$k kv ON kv.u = e.v)""".stripMargin
        s"""WITH raw AS (
           |  SELECT DISTINCT least(c_nationkey, s_nationkey) AS a,
           |    greatest(c_nationkey, s_nationkey) AS b
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  WHERE c_nationkey <> s_nationkey
           |    AND l_shipdate >= TIMESTAMP '1997-06-01'
           |    AND l_shipdate <  TIMESTAMP '1997-06-04'),
           |e0 AS (
           |  SELECT a AS u, b AS v FROM raw
           |  UNION ALL SELECT b, a FROM raw),
           |${(1 to 3).map(round).mkString(",\n")}
           |SELECT u AS node, COUNT(*) AS core_degree
           |FROM e3 GROUP BY u ORDER BY node""".stripMargin
      })
  )

  /** The rolling-distinct SQL over any view with (ts TIMESTAMP, user_id BIGINT).
    *
    * The window frame only evaluates at EXISTING (bkt, day) rows, so a bucket
    * with no events on day d would silently drop its earlier-in-window users
    * from d's total (latent locally where all ids share one 32768-wide bucket;
    * guaranteed wrong at scale). Densify to the full (bucket × active-day) grid
    * first: an explicit CROSS JOIN of the two tiny AGGREGATED frames —
    * |days| × |user-space/32768| rows, exactly the frame the window evaluates
    * anyway (PLANS.md sanctions this bounded densification cross). bitmap_or_agg
    * skips the grid's null bitmaps. Spec-covered with multi-bucket ids in
    * RollingDistinctSpec. */
  def rollingDistinctSql(view: String): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    datediff(CAST(ts AS DATE), DATE '1995-01-01') AS dnum,
       |    bitmap_bucket_number(user_id + 1) AS bkt,
       |    bitmap_construct_agg(bitmap_bit_position(user_id + 1)) AS b
       |  FROM $view GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT d.day, d.dnum, k.bkt FROM
       |    (SELECT DISTINCT day, dnum FROM daily) d
       |    CROSS JOIN (SELECT DISTINCT bkt FROM daily) k),
       |dense AS (
       |  SELECT g.day, g.dnum, g.bkt, daily.b
       |  FROM grid g LEFT JOIN daily
       |    ON g.day = daily.day AND g.bkt = daily.bkt),
       |rolled AS (
       |  SELECT day, bitmap_count(
       |    bitmap_or_agg(b) OVER (PARTITION BY bkt ORDER BY dnum
       |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS c
       |  FROM dense)
       |SELECT day, CAST(SUM(c) AS BIGINT) AS users_7d
       |FROM rolled GROUP BY day ORDER BY day""".stripMargin

  /** DuckDB tokenizer mirror of [[TF.tokens]] (same regex class, same filter). */
  private def duckToks(textExpr: String) =
    s"list_filter(regexp_split_to_array(lower($textExpr), '[^\\p{L}\\p{N}]+'), x -> x <> '')"
}
