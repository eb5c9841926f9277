package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes
import QueryDSL._

/** Window functions — SURVEY.md §2b "Window functions". Determinism: every window's
  * ORDER BY is total within its partition (ties broken to a unique key), so
  * row_number/ntile/lag/lead are reproducible across engines and partitionings.
  * Running sums go through exact decimals (frame accumulation of doubles would be
  * order-stable here, but decimal keeps the rule uniform). At scale each window is one
  * shuffle on its partition key; pre-partitioned data would avoid even that. */
object Windows {

  private val dec = DataTypes.createDecimalType(30, 4)

  val queries: Seq[Q] = Seq(
    Q("win_rank_rownum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber", $"l_partkey")
        t(s, dir, "lineitem")
          .filter($"l_suppkey" <= 20)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey",
            $"l_extendedprice",
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"))
          .filter($"rn" <= 5)
          .orderBy($"l_suppkey", $"rn")
      },
      Some("""SELECT * FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice,
             |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
             |  FROM lineitem WHERE l_suppkey <= 20
             |  WINDOW w AS (PARTITION BY l_suppkey
             |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey)
             |) WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin)),

    Q("win_lag_lead",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .filter($"user_id" <= 30)
          .select($"user_id", $"event_id", $"value",
            lag($"value", 1).over(w).as("prev_value"),
            lead($"value", 1).over(w).as("next_value"),
            lag($"event_type", 2, "none").over(w).as("prev2_type"))
          .orderBy($"user_id", $"event_id", $"value")
      },
      Some("""SELECT user_id, event_id, value,
             |  LAG(value, 1) OVER w AS prev_value,
             |  LEAD(value, 1) OVER w AS next_value,
             |  LAG(event_type, 2, 'none') OVER w AS prev2_type
             |FROM events WHERE user_id <= 30
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id, value""".stripMargin)),

    Q("win_running_sum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter($"o_custkey" <= 100)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice",
            sum($"o_totalprice".cast(dec)).over(w).cast("double").as("running_total"),
            count(lit(1)).over(w).as("running_n"),
            max($"o_totalprice").over(w).as("running_max"))
          .orderBy($"o_custkey", $"o_orderkey", $"o_totalprice")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER w AS DOUBLE) AS running_total,
             |  COUNT(*) OVER w AS running_n,
             |  MAX(o_totalprice) OVER w AS running_max
             |FROM orders WHERE o_custkey <= 100
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey, o_totalprice""".stripMargin)),

    // RANGE frame keyed on the order value itself — frame membership depends only on
    // values, so ties are harmless by construction.
    Q("win_range_frame",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice")
          .rangeBetween(-100, 0)
        t(s, dir, "orders")
          .filter($"o_custkey" <= 50)
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
            count(lit(1)).over(w).as("n_within_100"),
            sum($"o_totalprice".cast(dec)).over(w).cast("double").as("sum_within_100"))
          .orderBy($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  COUNT(*) OVER w AS n_within_100,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER w AS DOUBLE) AS sum_within_100
             |FROM orders WHERE o_custkey <= 50
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             |             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Q("win_ntile_pct",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
        t(s, dir, "customer")
          .filter($"c_custkey" <= 300)
          .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 9).as("pct_rank"),
            round(cume_dist().over(w), 9).as("cdist"))
          .orderBy($"c_mktsegment", $"c_custkey", $"c_acctbal")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
             |  NTILE(4) OVER w AS quartile,
             |  ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
             |  ROUND(CUME_DIST() OVER w, 9) AS cdist
             |FROM customer WHERE c_custkey <= 300
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Q("win_first_last_nth",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus").orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .filter($"o_custkey" <= 30)
          .select($"o_orderstatus", $"o_orderkey",
            first($"o_orderkey").over(w).as("first_key"),
            last($"o_orderkey").over(w).as("last_key"),
            nth_value($"o_orderkey", 3).over(w).as("third_key"))
          .orderBy($"o_orderstatus", $"o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
             |  LAST_VALUE(o_orderkey) OVER w AS last_key,
             |  NTH_VALUE(o_orderkey, 3) OVER w AS third_key
             |FROM orders WHERE o_custkey <= 30
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY 1, 2""".stripMargin)),

    // Top-k per group — the scalable idiom (no global sort, one shuffle on the group key).
    Q("topk_per_group",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // The OPTIMIZER-REWRITE path to the same native operator: the query is the
    // vanilla row_number()-filter-drop idiom, and the opt-in TopKRewrite rule
    // (graft.plans.TopKRewrite) swaps in TopKPerGroup automatically — the user
    // writes declarative intent, the engine picks the bounded-buffer physical
    // operator. Hash-checked, so the rewrite's CORRECTNESS rides the oracle
    // gate, not just the plan-shape spec.
    Q("topk_per_group_rewrite",
      (s, dir) => {
        import s.implicits._
        graft.plans.TopKRewriteSupport.enableRewrite(s)
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".desc_nulls_last)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey".desc)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_custkey, o_totalprice DESC, o_orderkey DESC""".stripMargin)),

    // Same top-3-per-customer as `topk_per_group`, via the NATIVE whole-operator
    // path (graft.plans.TopKPerGroup: custom LogicalPlan → SparkStrategy →
    // SparkPlan): a map-side partial keeps ≤ k rows per key per partition, so the
    // shuffle carries k·|keys| rows, not the table — the window formulation above
    // must fully sort every partition first. Mixed sort directions encode as
    // struct(price, -orderkey) descending (price DESC, orderkey ASC); the struct
    // makes the per-group order TOTAL, so the kept set is partition-independent.
    Q("topk_per_group_native",
      (s, dir) => {
        import s.implicits._
        graft.plans.TopK.perGroup(
            t(s, dir, "orders")
              .select($"o_custkey", $"o_orderkey", $"o_totalprice"),
            groupCols = Seq("o_custkey"),
            sortKey = struct($"o_totalprice", -$"o_orderkey"),
            k = 3)
          .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),

    // Time-interval RANGE frame: 7-day trailing spend per customer. Spark expresses
    // interval frames as epoch-second arithmetic (rangeBetween over cast-to-long);
    // the oracle uses the native RANGE BETWEEN INTERVAL bound — identical inclusive
    // window on second-aligned timestamps. One shuffle on the partition key.
    Q("win_time_range_frame",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          // NTZ→TZ cast is the identity under the pinned UTC session; ANSI forbids
          // a direct TIMESTAMP_NTZ→BIGINT cast
          .orderBy($"o_orderdate".cast("timestamp").cast("long"))
          .rangeBetween(-7L * 86400, 0)
        t(s, dir, "orders")
          .filter($"o_custkey" < 200)
          .select($"o_orderkey", $"o_custkey", $"o_orderdate",
            count(lit(1)).over(w).as("n_7d"),
            sum($"o_totalprice".cast(dec)).over(w).cast("double").as("spend_7d"))
          .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate,
             |  COUNT(*) OVER w AS n_7d,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER w AS DOUBLE)
             |    AS spend_7d
             |FROM orders WHERE o_custkey < 200
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             |             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // lag ... IGNORE NULLS — last non-null preceding value (gap-aware carry-forward,
    // the LOCF primitive inside a window). Nulls are injected deterministically so
    // both the skip path and the plain path are exercised on every partition.
    Q("win_lag_ignore_nulls",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .filter($"o_custkey" < 200)
          .withColumn("v",
            when($"o_orderstatus" === "O", lit(null)).otherwise($"o_totalprice"))
          .select($"o_orderkey", $"o_custkey", $"v",
            lag($"v", 1).over(w).as("prev_any"),
            lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_nonnull"))
          .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
      },
      Some("""WITH v AS (
             |  SELECT o_orderkey, o_custkey, o_orderdate,
             |    CASE WHEN o_orderstatus = 'O' THEN NULL
             |         ELSE o_totalprice END AS v
             |  FROM orders WHERE o_custkey < 200)
             |SELECT o_orderkey, o_custkey, v,
             |  lag(v, 1) OVER w AS prev_any,
             |  lag(v, 1 IGNORE NULLS) OVER w AS prev_nonnull
             |FROM v
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // ratio_to_report: each row's share of its partition total — the unordered
    // window aggregate (no frame, whole-partition sum broadcast to every row).
    // The denominator is a DECIMAL sum so it is partitioning-independent; one
    // double division per row, key-partitioned and parallel.
    Q("win_ratio_to_report",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus")
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
            round($"o_totalprice" /
              sum($"o_totalprice".cast("decimal(30,4)")).over(w).cast("double"),
              9).as("share"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  round(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
             |    OVER (PARTITION BY o_orderstatus) AS DOUBLE), 9) AS share
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // EXACT rolling median over a bounded 7-row frame: the frame's values are
    // collected per row (bounded — 7 elements max, safe in any engine) and the
    // median read positionally with even/odd interpolation. The positional pick
    // is over an array_sort'd copy, so the result is frame-content-deterministic
    // regardless of input partitioning; a percentile sketch replaces this shape
    // when the frame is unbounded.
    Q("win_rolling_median",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(-6, Window.currentRow)
        // floor() the positional indexes explicitly: a bare int/2 division is
        // double in Spark (cast truncates) but CAST in DuckDB ROUNDS
        val lo = element_at($"win_vals", floor(($"n" + 1) / 2).cast("int"))
        val hi = element_at($"win_vals", (floor($"n" / 2) + 1).cast("int"))
        t(s, dir, "orders").filter($"o_custkey" < 300)
          .withColumn("win_vals", array_sort(collect_list($"o_totalprice").over(w)))
          .withColumn("n", size($"win_vals"))
          .select($"o_custkey", $"o_orderkey", $"o_totalprice",
            round((lo + hi) / 2.0, 6).as("rolling_median7"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""WITH w AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    list_sort(list(o_totalprice) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey
             |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win_vals
             |  FROM orders WHERE o_custkey < 300),
             |p AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice, win_vals,
             |    len(win_vals) AS n
             |  FROM w)
             |SELECT o_custkey, o_orderkey, o_totalprice,
             |  round((win_vals[CAST(floor((n + 1) / 2) AS INTEGER)] +
             |         win_vals[CAST(floor(n / 2) AS INTEGER) + 1]) / 2.0, 6)
             |    AS rolling_median7
             |FROM p ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
