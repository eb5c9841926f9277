package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Headline multi-operator pipelines: TPC-H-shaped star joins (the canonical 100 TB
  * plan test — selective dim filters must prune the fact scan, dims must broadcast)
  * and a MERGE/upsert changeset application (the batch form of a mutable-table sink).
  * These exercise join ORDER and join STRATEGY selection, not just join correctness:
  * at scale the only acceptable plan filters customer/orders before the lineitem join
  * and never shuffles a dim. */
object Headline {

  val queries: Seq[Q] = Seq(

    // TPC-H Q3 shape (shipping priority): 3-way fact⋈fact⋈dim with selective filters
    // on both fact sides. Catalyst pushes both date predicates into the parquet scans
    // and AQE picks the join order; revenue is decimal-exact per QueryDSL.
    Q("tpch_q3_shape",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 8).as("revenue"))
          .select($"l_orderkey", $"revenue", $"o_orderdate")
          .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
          .limit(20)
      },
      Some(s"""SELECT l_orderkey,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 8)} AS revenue,
              |  o_orderdate
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1997-01-01'
              |  AND l_shipdate > TIMESTAMP '1997-01-01'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 20""".stripMargin)),

    // TPC-H Q5 shape (local supplier volume): 6-table star — two fact tables plus four
    // dims, with the "local" c_nationkey = s_nationkey residual. nation/region are
    // explicitly broadcast; supplier/customer join on their keys. Per-nation revenue.
    Q("tpch_q5_shape",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region").filter($"r_name" === "ASIA")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey") &&
                    c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 8).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(s"""SELECT n_name,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 8)} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate <  TIMESTAMP '1998-01-01'
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q18 shape (large-volume customers): a HAVING-filtered aggregate drives a
    // semi-filter back onto the fact — the aggregate over lineitem (one hash shuffle
    // on l_orderkey) keeps only heavy orders, and that tiny survivor set then joins
    // customer/orders. At 100 TB the qualifying set is ~1e-4 of orders, so the
    // re-join is broadcast-sized even though the source is the full fact. Quantity
    // sums go through decimal so the HAVING boundary (> 180) is engine-exact.
    Q("tpch_q18_shape",
      (s, dir) => {
        import s.implicits._
        val heavy = t(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(dsum($"l_quantity").as("sum_qty"))
          .filter($"sum_qty" > 180.0)
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        heavy.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey",
            $"o_orderdate", $"o_totalprice", $"sum_qty")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      Some(s"""WITH heavy AS (
              |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
              |  FROM lineitem GROUP BY l_orderkey
              |  HAVING ${sqlDsum("l_quantity")} > 180.0)
              |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
              |FROM heavy
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // MERGE/upsert: apply a changeset (updates for o_orderkey % 100 < 10, inserts
    // with shifted keys) onto the orders snapshot via ONE full-outer join on the key
    // — the scalable batch formulation of MERGE INTO (no per-row lookups; both sides
    // hash-partition on o_orderkey). Output: per-op row counts and value totals.
    Q("upsert_merge_changeset",
      (s, dir) => {
        import s.implicits._
        val snap = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
        val base = t(s, dir, "orders")
        val updates = base.filter($"o_orderkey" % 100 < 10)
          .select($"o_orderkey".as("u_orderkey"),
            ($"o_totalprice" * 1.1).as("u_totalprice"))
        val inserts = base.filter($"o_orderkey" % 100 >= 95)
          .select(($"o_orderkey" + 10000000L).as("u_orderkey"),
            $"o_totalprice".as("u_totalprice"))
        val changes = updates.union(inserts)
        snap.join(changes, $"o_orderkey" === $"u_orderkey", "full_outer")
          .select(
            when($"o_orderkey".isNull, "insert")
              .when($"u_orderkey".isNull, "keep")
              .otherwise("update").as("op"),
            coalesce($"u_totalprice", $"o_totalprice").as("price"))
          .groupBy($"op")
          .agg(count(lit(1)).as("n"), dsum($"price").as("total"))
          .orderBy($"op")
      },
      Some(s"""WITH changes AS (
              |  SELECT o_orderkey AS u_orderkey, o_totalprice * 1.1 AS u_totalprice
              |  FROM orders WHERE o_orderkey % 100 < 10
              |  UNION ALL
              |  SELECT o_orderkey + 10000000 AS u_orderkey, o_totalprice AS u_totalprice
              |  FROM orders WHERE o_orderkey % 100 >= 95)
              |SELECT
              |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              |       WHEN c.u_orderkey IS NULL THEN 'keep'
              |       ELSE 'update' END AS op,
              |  COUNT(*) AS n,
              |  ${sqlDsum("COALESCE(c.u_totalprice, o.o_totalprice)")} AS total
              |FROM (SELECT o_orderkey, o_totalprice FROM orders) o
              |FULL OUTER JOIN changes c ON o.o_orderkey = c.u_orderkey
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CDC changelog apply — upsert_merge_changeset plus the DELETE leg: one
    // full-outer join on the key applies I/U/D ops in a single shuffle (deletes
    // drop the matched row, updates override, inserts survive the outer side).
    // The batch form of applying a Debezium-style changelog to a snapshot; no
    // per-row lookups at any scale.
    Q("cdc_apply_changelog",
      (s, dir) => {
        import s.implicits._
        val snap = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
        val base = t(s, dir, "orders")
        val mods = base.filter($"o_orderkey" % 100 < 15)
          .select($"o_orderkey".as("k"),
            when($"o_orderkey" % 100 < 5, "D").otherwise("U").as("op"),
            ($"o_totalprice" * 1.2).as("new_price"))
        val ins = base.filter($"o_orderkey" % 100 >= 95)
          .select(($"o_orderkey" + 20000000L).as("k"), lit("I").as("op"),
            $"o_totalprice".as("new_price"))
        snap.join(mods.union(ins), $"o_orderkey" === $"k", "full_outer")
          .filter(coalesce($"op", lit("")) =!= "D")
          .select(coalesce($"op", lit("keep")).as("op"),
            coalesce($"new_price", $"o_totalprice").as("price"))
          .groupBy($"op")
          .agg(count(lit(1)).as("n"), dsum($"price").as("total"))
          .orderBy($"op")
      },
      Some(s"""WITH ch AS (
              |  SELECT o_orderkey AS k,
              |    CASE WHEN o_orderkey % 100 < 5 THEN 'D' ELSE 'U' END AS op,
              |    o_totalprice * 1.2 AS new_price
              |  FROM orders WHERE o_orderkey % 100 < 15
              |  UNION ALL
              |  SELECT o_orderkey + 20000000, 'I', o_totalprice
              |  FROM orders WHERE o_orderkey % 100 >= 95),
              |j AS (
              |  SELECT o.o_orderkey, ch.k, ch.op, ch.new_price, o.o_totalprice
              |  FROM (SELECT o_orderkey, o_totalprice FROM orders) o
              |  FULL OUTER JOIN ch ON o.o_orderkey = ch.k)
              |SELECT COALESCE(op, 'keep') AS op, COUNT(*) AS n,
              |  ${sqlDsum("COALESCE(new_price, o_totalprice)")} AS total
              |FROM j WHERE COALESCE(op, '') <> 'D'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Stream-stream join, batch-equivalent: click → purchase conversion within
    // 10 minutes per user. The join is EQUI on user_id with a residual time band —
    // a hash-partitioned join whose per-key fanout is bounded by per-user activity,
    // exactly the shape Structured Streaming executes with watermarked state (the
    // streaming wiring for this query is exercised in StreamingSpec).
    Q("stream_stream_join_batch",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
        val buys = e.filter($"event_type" === "purchase")
          .select($"user_id".as("b_user"), $"event_id".as("buy_id"), $"ts".as("buy_ts"))
        clicks.join(buys,
            $"user_id" === $"b_user" &&
            $"buy_ts" >= $"click_ts" &&
            $"buy_ts" <= $"click_ts" + expr("interval 10 minutes"))
          .select($"user_id", $"click_id", $"buy_id")
          .orderBy($"user_id", $"click_id", $"buy_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id
             |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
             |JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') b
             |  ON c.user_id = b.user_id
             | AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
             |ORDER BY 1, 2, 3""".stripMargin)),

    // Batch equivalent of the LEFT-OUTER stream-stream join
    // (Streaming.streamStreamClickBuyOuter): clicks that never convert inside the
    // window surface with a NULL buy — in streaming those rows emit on watermark-
    // driven state eviction; in batch they are the ordinary outer-join remainder.
    // Same physical shape either way: a key-partitioned join, state/shuffle bounded
    // by the time band.
    Q("stream_stream_join_outer_batch",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
        val buys = e.filter($"event_type" === "purchase")
          .select($"user_id".as("b_user"), $"event_id".as("buy_id"), $"ts".as("buy_ts"))
        clicks.join(buys,
            $"user_id" === $"b_user" &&
            $"buy_ts" >= $"click_ts" &&
            $"buy_ts" <= $"click_ts" + expr("interval 10 minutes"),
            "leftOuter")
          .select($"user_id", $"click_id", $"buy_id")
          .orderBy($"user_id", $"click_id", $"buy_id".asc_nulls_first)
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id
             |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
             |LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') b
             |  ON c.user_id = b.user_id
             | AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
             |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin)),

    // Type-2 slowly-changing-dimension history build: each key's change events
    // become [valid_from, valid_to) intervals via lead() over (key, date, tiebreak).
    // The open version carries NULL valid_to (is_current already marks it); a
    // year-9999 sentinel would overflow datetime64[ns] consumers downstream. One
    // hash shuffle on the key, per-key sorted windows — the standard warehouse
    // snapshot-to-history operator, linear at any scale. Ties on the change date
    // produce zero-duration versions deterministically (orderkey tiebreak).
    Q("scd2_history_build",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
            $"o_orderdate".as("valid_from"),
            lead($"o_orderdate", 1).over(w).as("next_from"))
          .select($"o_custkey", $"o_orderkey", $"o_orderstatus", $"valid_from",
            $"next_from".as("valid_to"),
            $"next_from".isNull.as("is_current"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""WITH h AS (
             |  SELECT o_custkey, o_orderkey, o_orderstatus,
             |    o_orderdate AS valid_from,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS next_from
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, o_orderstatus, valid_from,
             |  next_from AS valid_to,
             |  next_from IS NULL AS is_current
             |FROM h ORDER BY o_custkey, o_orderkey""".stripMargin))
  )
}
