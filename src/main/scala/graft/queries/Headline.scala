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
             |FROM h ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Point-in-time (temporal) join: attach to each fact row the dimension VERSION
    // that was active at the fact's event time — the standard warehouse join against
    // an SCD2 dimension. The dim here is built from the facts themselves (per-user
    // daily status = first event_type of the day, versioned by lead(day)), then the
    // join is an EQUI join on the key with the interval predicate as a residual:
    // shuffle partitions by user_id only, and since versions-per-key is bounded
    // (dims are small relative to facts), the per-key version probe is O(versions)
    // — no range-join pair explosion, no broadcast of the fact. This is the plan
    // that survives 100 TB of facts against a million-row dimension history.
    Q("join_point_in_time",
      (s, dir) => {
        import s.implicits._
        val ev = graft.Tables(s, dir, "events")
        val firstW = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
        val verW = Window.partitionBy($"user_id").orderBy($"day")
        val dim = ev
          .select($"user_id", date_trunc("day", $"ts").as("day"),
            $"ts", $"event_id", $"event_type")
          .withColumn("rn", row_number().over(firstW))
          .filter($"rn" === 1)
          .select($"user_id", $"day".as("valid_from"),
            lead($"day", 1).over(verW).as("valid_to"),
            $"event_type".as("status"))
        ev.as("f")
          .join(dim.as("d"),
            $"f.user_id" === $"d.user_id" &&
              $"f.ts" >= $"valid_from" &&
              ($"valid_to".isNull || $"f.ts" < $"valid_to"))
          .select($"event_id", $"f.user_id".as("user_id"), $"status")
          .orderBy($"event_id")
      },
      Some("""WITH firsts AS (
             |  SELECT user_id, date_trunc('day', ts) AS day, ts, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
             |      ORDER BY ts, event_id) AS rn
             |  FROM events),
             |dim AS (
             |  SELECT user_id, day AS valid_from,
             |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS valid_to,
             |    event_type AS status
             |  FROM firsts WHERE rn = 1)
             |SELECT f.event_id, f.user_id, d.status
             |FROM events f
             |JOIN dim d ON f.user_id = d.user_id
             |  AND f.ts >= d.valid_from
             |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
             |ORDER BY f.event_id""".stripMargin)),

    // TPC-H Q10 shape (returned-item revenue): which customers returned goods in a
    // quarter, by lost revenue. Selective predicates (one quarter of orders, R-flag
    // lines) are pushed into both fact scans; nation broadcasts; the aggregate
    // carries customer attributes in the key so no second customer join is needed.
    Q("tpch_q10_shape",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1997-04-01").cast("timestamp"))
        val li = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name", $"c_mktsegment")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 8).as("revenue"))
          .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal",
            $"n_name", $"c_mktsegment")
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 8)} AS revenue,
              |  c_acctbal, n_name, c_mktsegment
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1997-01-01'
              |  AND o_orderdate <  TIMESTAMP '1997-04-01'
              |GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q16 shape (parts/supplier relationship): supplier variety per part
    // profile, EXCLUDING a blocklisted supplier set via NOT IN. The distinct
    // (partkey, suppkey) pairs come from the fact; the blocklist is a scalar-
    // subquery-sized set so Spark plans the NOT IN as a broadcast null-aware anti
    // join — the only NOT IN plan that is safe at scale. count(DISTINCT) runs as
    // two-phase partial aggregation on (brand, type, size).
    Q("tpch_q16_shape",
      (s, dir) => {
        import s.implicits._
        val p = t(s, dir, "part")
          .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" && $"p_size" <= 30)
        // broadcast semi BEFORE the pair-distinct: the selective part predicate
        // prunes the fact rows feeding the expensive distinct shuffle
        val pairs = t(s, dir, "lineitem")
          .join(broadcast(p.select($"p_partkey".as("pk"))),
            $"l_partkey" === $"pk", "left_semi")
          .select($"l_partkey", $"l_suppkey").distinct()
        val bad = t(s, dir, "supplier").filter($"s_acctbal" < 0).select($"s_suppkey")
        pairs.join(broadcast(p), $"l_partkey" === $"p_partkey")
          .join(bad, $"l_suppkey" === $"s_suppkey", "left_anti")
          .groupBy($"p_brand", $"p_type", $"p_size")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
          .limit(50)
      },
      Some("""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
             |SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM pairs
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 30
             |  AND l_suppkey NOT IN (
             |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50""".stripMargin)),

    // TPC-H Q20 shape (excess inventory): suppliers who shipped a LOT of a targeted
    // part family — a nested semi-join chain. The inner aggregate runs on the
    // (partkey, suppkey) grain AFTER a broadcast semi-filter on the part prefix
    // (the selective predicate prunes the fact aggregation's input, not its
    // output), and only the qualifying supplier-key set — tiny by construction —
    // joins back to supplier. Quantity sums are decimal so the > 90 boundary is
    // engine-exact.
    Q("tpch_q20_shape",
      (s, dir) => {
        import s.implicits._
        val redParts = t(s, dir, "part")
          .filter($"p_name".startsWith("red")).select($"p_partkey")
        val heavy = t(s, dir, "lineitem")
          .join(broadcast(redParts), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(dsum($"l_quantity").as("sum_qty"))
          .filter($"sum_qty" > 90.0)
          .select($"l_suppkey").distinct()
        t(s, dir, "supplier")
          .join(heavy, $"s_suppkey" === $"l_suppkey", "left_semi")
          .filter($"s_nationkey" < 13)
          .select($"s_suppkey", $"s_name", $"s_nationkey")
          .orderBy($"s_name")
      },
      Some(s"""SELECT s_suppkey, s_name, s_nationkey
              |FROM supplier
              |WHERE s_suppkey IN (
              |  SELECT l_suppkey FROM lineitem
              |  WHERE l_partkey IN (
              |    SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              |  GROUP BY l_partkey, l_suppkey
              |  HAVING ${sqlDsum("l_quantity")} > 90.0)
              |  AND s_nationkey < 13
              |ORDER BY s_name""".stripMargin)),

    // Changelog EMISSION (the inverse of cdc_apply_changelog): diff two table
    // snapshots into an I/U/D change feed with ONE full-outer join on the key —
    // the scalable snapshot-compare (both sides hash-partition on the key; no
    // per-row lookups, no driver diffing). Unchanged rows drop out before the
    // sink, so the emitted feed is proportional to the drift, not the table.
    Q("cdc_emit_changelog",
      (s, dir) => {
        import s.implicits._
        val cur = t(s, dir, "orders")
          .select($"o_orderkey".as("k"), $"o_totalprice".as("old_price"))
        val nxt = t(s, dir, "orders")
          .filter($"o_orderkey" % 97 =!= 0) // deletes
          .select($"o_orderkey".as("k"),
            when($"o_orderkey" % 10 === 3, $"o_totalprice" + 100.0)
              .otherwise($"o_totalprice").as("new_price"))
          .unionByName(
            t(s, dir, "orders").filter($"o_orderkey" % 500 === 0) // inserts
              .select(($"o_orderkey" + 10000000L).as("k"),
                $"o_totalprice".as("new_price")))
        cur.join(nxt, Seq("k"), "full_outer")
          .select($"k".as("o_orderkey"),
            when($"old_price".isNull, "I")
              .when($"new_price".isNull, "D")
              .when($"old_price" =!= $"new_price", "U").as("op"),
            $"old_price", $"new_price")
          .filter($"op".isNotNull)
          .orderBy($"o_orderkey")
      },
      Some("""WITH cur AS (
             |  SELECT o_orderkey AS k, o_totalprice AS old_price FROM orders),
             |nxt AS (
             |  SELECT o_orderkey AS k,
             |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 100.0
             |         ELSE o_totalprice END AS new_price
             |  FROM orders WHERE o_orderkey % 97 <> 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000 AS k, o_totalprice AS new_price
             |  FROM orders WHERE o_orderkey % 500 = 0),
             |d AS (
             |  SELECT COALESCE(cur.k, nxt.k) AS o_orderkey,
             |    CASE WHEN cur.old_price IS NULL THEN 'I'
             |         WHEN nxt.new_price IS NULL THEN 'D'
             |         WHEN cur.old_price <> nxt.new_price THEN 'U' END AS op,
             |    cur.old_price, nxt.new_price
             |  FROM cur FULL OUTER JOIN nxt ON cur.k = nxt.k)
             |SELECT * FROM d WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q17 shape (small-quantity-order revenue): a correlated scalar aggregate
    // — each line compares against 0.2 × avg quantity OF ITS OWN PART — decorrelated
    // into one grouped pass + a broadcast join back. The selective part-family
    // predicate is applied as a broadcast semi BEFORE the per-part aggregate, so at
    // 100 TB the fact is scanned once and only the targeted family's rows feed the
    // aggregation; the per-part threshold frame is |family| rows and broadcasts.
    // The threshold (exact decimal mean × 0.2) is the identical IEEE double tree on
    // both engines, so the < boundary cannot diverge.
    Q("tpch_q17_shape",
      (s, dir) => {
        import s.implicits._
        val p = t(s, dir, "part")
          .filter($"p_type" === "STANDARD" && $"p_size" <= 25)
          .select($"p_partkey")
        val li = t(s, dir, "lineitem")
          .join(broadcast(p), $"l_partkey" === $"p_partkey", "left_semi")
          .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        val thresh = li.groupBy($"l_partkey")
          .agg((davg($"l_quantity") * 0.2d).as("qty_cap"))
        li.join(broadcast(thresh), Seq("l_partkey"))
          .filter($"l_quantity" < $"qty_cap")
          .agg((dsum($"l_extendedprice") / 7.0d).as("avg_yearly"),
            count(lit(1)).as("n_small_lines"))
      },
      Some(s"""WITH li AS (
              |  SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
              |  WHERE l_partkey IN (SELECT p_partkey FROM part
              |    WHERE p_type = 'STANDARD' AND p_size <= 25)),
              |th AS (
              |  SELECT l_partkey, ${sqlDavg("l_quantity")} * 0.2 AS qty_cap
              |  FROM li GROUP BY l_partkey)
              |SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
              |  COUNT(*) AS n_small_lines
              |FROM li JOIN th USING (l_partkey)
              |WHERE l_quantity < qty_cap""".stripMargin)),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the hardest classic
    // decorrelation — EXISTS plus NOT EXISTS against the same fact, here spelled
    // as one semi-join (another supplier was on the order) and one anti-join
    // (…but no OTHER supplier was late) over a deduped (order, supplier) pair set.
    // The reference schema has no commit/receipt dates, so "late" is shipping
    // > 60 days after order placement on a finished order. Both probe sides are
    // pair-distinct BEFORE the self-joins — at 100 TB the semi/anti operate on the
    // collapsed pair grain, never on raw line rows.
    Q("tpch_q21_shape",
      (s, dir) => {
        import s.implicits._
        val ordF = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate")
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        // Round 15 (guide §2.4): the semi + anti SELF-joins collapse into
        // per-order distinct-supplier counts. late ⊆ pairs (same source rows,
        // extra filter), so for a late (ok, sk): "∃ pairs row with another
        // supplier" ⇔ the order has ≥ 2 distinct suppliers overall, and
        // "∄ OTHER late supplier" ⇔ the order has exactly 1 distinct late
        // supplier (whose sk is then max(sk)). The old plan duplicated the
        // whole late chain (lineitem+orders scanned twice more) and
        // re-shuffled both distinct frames from (ok, sk) to ok for the
        // semi/anti probes; this shape is one grouped pass per side joined
        // on ok. Same sole set, same numwait counts.
        val lateAgg = li.join(ordF, $"l_orderkey" === $"o_orderkey")
          .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL '60' DAY"))
          .groupBy($"l_orderkey")
          .agg(countDistinct($"l_suppkey").as("nl"), max($"l_suppkey").as("sk"))
          .filter($"nl" === 1)
        val pairsAgg = li.groupBy($"l_orderkey")
          .agg(countDistinct($"l_suppkey").as("np"))
          .filter($"np" >= 2).select($"l_orderkey")
        lateAgg.join(pairsAgg, "l_orderkey")
          .join(t(s, dir, "supplier"), $"sk" === $"s_suppkey")
          .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name").limit(25)
      },
      Some("""WITH late AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'
             |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
             |pairs AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
             |sole AS (
             |  SELECT late.ok, late.sk FROM late
             |  WHERE EXISTS (SELECT 1 FROM pairs p
             |                WHERE p.ok = late.ok AND p.sk <> late.sk)
             |    AND NOT EXISTS (SELECT 1 FROM late l2
             |                    WHERE l2.ok = late.ok AND l2.sk <> late.sk))
             |SELECT s_name, COUNT(*) AS numwait
             |FROM sole JOIN supplier ON sk = s_suppkey
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin))
  )
}
