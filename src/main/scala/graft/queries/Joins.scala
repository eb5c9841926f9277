package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Joins — SURVEY.md §2b "Joins". Scale notes per query:
  *  - fact⋈fact (lineitem⋈orders) shuffles on the join key; AQE handles skew.
  *  - dim joins (nation/region/supplier) are explicitly `broadcast()` — at 100 TB the
  *    dims stay KB-MB sized, so the join is map-side with zero shuffle of the fact.
  *  - non-equi joins are kept band-limited so the BNLJ work is bounded per row.
  *  - the as-of join is expressed as equi-join + per-key window (shuffle on the equi
  *    key, no cross product), the standard scalable formulation.
  */
object Joins {

  /** Bucketed copies of lineitem/orders for the co-located join and bucket-pruned
    * scan. The bucketed layout is a one-time investment (the 100 TB pattern: pay
    * the bucketed write once, join/prune shuffle-free forever after), so each
    * table is built only if this session doesn't already have it. Table names
    * carry a hash of the source dir, so sessions/tests reading different SF dirs
    * never share a table, and re-running a query times the read, not the writes.
    * NOTE: building the tables is a construction-time side effect on first use
    * (plan-only tools pay it once per session/dir). */
  private def ensureBucketedTables(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val suffix = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir) & 0x7fffffff)
    val liTbl = s"li_bucketed_$suffix"
    val oTbl = s"o_bucketed_$suffix"
    def ensure(tbl: String)(build: => Unit): Unit =
      if (!s.catalog.tableExists(tbl)) {
        // a fresh session's in-memory catalog doesn't know about managed-table
        // dirs left by previous JVMs — clear any stale dir before writing
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), tbl)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        build
      }
    ensure(liTbl) {
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(32, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(liTbl)
    }
    ensure(oTbl) {
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(oTbl)
    }
    (liTbl, oTbl)
  }

  val queries: Seq[Q] = Seq(
    Q("join_inner_agg",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 8).as("revenue"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 8)} AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("join_broadcast_dims",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("total_bal"))
          .orderBy($"r_name")
      },
      Some(s"""SELECT r_name, COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS total_bal
              |FROM customer
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    Q("join_left_agg",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            count($"l_orderkey").as("n_matched"),
            sum(when($"l_orderkey".isNull, 1).otherwise(0)).as("n_unmatched"),
            dsum(coalesce($"l_quantity", lit(0.0))).as("qty"))
          .orderBy($"o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_rows, COUNT(l_orderkey) AS n_matched,
              |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
              |  ${sqlDsum("COALESCE(l_quantity, 0.0)")} AS qty
              |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("join_right_agg",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"), "right")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_rows"), count($"l_orderkey").as("n_li"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_rows, COUNT(l_orderkey) AS n_li
             |FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    Q("join_full_outer",
      (s, dir) => {
        import s.implicits._
        // orders customers vs high-balance customers: both sides have exclusives.
        val o = t(s, dir, "orders").groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"))
        val c = t(s, dir, "customer").filter($"c_acctbal" > 5000)
          .select($"c_custkey", $"c_mktsegment")
        o.join(c, o("o_custkey") === c("c_custkey"), "full")
          .select(
            coalesce($"o_custkey", $"c_custkey").as("custkey"),
            coalesce($"n_orders", lit(0L)).as("n_orders"),
            coalesce($"c_mktsegment", lit("NONE")).as("segment"))
          .orderBy($"custkey", $"n_orders", $"segment")
      },
      Some("""SELECT COALESCE(o_custkey, c_custkey) AS custkey,
             |  COALESCE(n_orders, 0) AS n_orders,
             |  COALESCE(c_mktsegment, 'NONE') AS segment
             |FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
             |FULL JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000) c
             |  ON o_custkey = c_custkey
             |ORDER BY 1, 2, 3""".stripMargin)),

    Q("join_semi",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val big = t(s, dir, "orders").filter($"o_totalprice" > 4000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey", $"c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 4000)
             |ORDER BY 1, 2""".stripMargin)),

    Q("join_anti",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        // Anti-join against a FILTERED right side so the survivor set is
        // non-empty at every SF (every customer has *some* order, so an
        // unfiltered anti would be vacuously 0-row — a hash that stays green
        // even if the anti-join silently returned nothing).
        val o = t(s, dir, "orders").filter($"o_totalprice" > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey", $"c_name", $"c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_totalprice > 300000)
             |ORDER BY 1, 2, 3""".stripMargin)),

    Q("join_cross",
      (s, dir) => {
        import s.implicits._
        val r = t(s, dir, "region")
        val n = t(s, dir, "nation")
        r.crossJoin(n)
          .select($"r_regionkey", $"n_nationkey",
            ($"n_regionkey" === $"r_regionkey").as("same_region"))
          .orderBy($"r_regionkey", $"n_nationkey", $"same_region")
      },
      Some("""SELECT r_regionkey, n_nationkey, n_regionkey = r_regionkey AS same_region
             |FROM region CROSS JOIN nation
             |ORDER BY 1, 2, 3""".stripMargin)),

    // Banded non-equi (theta/range) join, expressed scalably: bucket both sides on
    // floor(acctbal/50). A [s-50, s+50] window (width 100) spans at most 3 width-50
    // buckets, so each supplier row probes buckets {b-1, b, b+1} via a plain
    // equi-join on the bucket key (shuffle-partitionable SortMergeJoin) with the
    // exact band predicate as a residual condition. No BroadcastNestedLoopJoin /
    // cartesian anywhere in the plan — the naive `ON c BETWEEN s-50 AND s+50`
    // compiles to BNLJ, which is supplier×customer work at 100×.
    Q("join_range_band",
      (s, dir) => {
        import s.implicits._
        val sup = t(s, dir, "supplier")
          .select($"s_suppkey", $"s_acctbal")
          .withColumn("bkt", explode(array(
            floor($"s_acctbal" / 50) - 1,
            floor($"s_acctbal" / 50),
            floor($"s_acctbal" / 50) + 1)))
        val c = t(s, dir, "customer")
          .select($"c_acctbal", floor($"c_acctbal" / 50).as("cbkt"))
        sup.join(c,
            col("bkt") === col("cbkt") &&
            c("c_acctbal") >= sup("s_acctbal") - 50 &&
            c("c_acctbal") <= sup("s_acctbal") + 50)
          .groupBy($"s_suppkey")
          .agg(count(lit(1)).as("n_close"), dsum($"c_acctbal").as("band_bal"))
          .orderBy($"s_suppkey")
      },
      Some(s"""SELECT s_suppkey, COUNT(*) AS n_close, ${sqlDsum("c_acctbal")} AS band_bal
              |FROM supplier JOIN customer
              |  ON c_acctbal >= s_acctbal - 50 AND c_acctbal <= s_acctbal + 50
              |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin)),

    // Interval/overlap join (SURVEY §2b "interval/overlap join"): order pairs of the
    // SAME customer whose 7-day activity windows [orderdate, orderdate+7d] overlap.
    // The equi key (custkey) partitions the work — the shuffle is a plain hash
    // exchange on custkey and the overlap predicate runs as a residual inside each
    // key group (orders-per-customer is bounded), so the plan is a SortMergeJoin,
    // never BNLJ/cartesian. This is the scalable overlap-join shape whenever a
    // partition key exists; when none does, bucket time like join_range_band.
    Q("join_interval_overlap",
      (s, dir) => {
        import s.implicits._
        def legs(k: String, ck: String, st: String, en: String) =
          t(s, dir, "orders").select(
            $"o_custkey".as(ck), $"o_orderkey".as(k),
            $"o_orderdate".as(st),
            ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as(en))
        val a = legs("k1", "ck", "s1", "e1")
        val b = legs("k2", "ck2", "s2", "e2")
        a.join(b,
            $"ck" === $"ck2" && $"k1" < $"k2" &&
            $"s1" <= $"e2" && $"s2" <= $"e1")
          .groupBy($"ck")
          .agg(count(lit(1)).as("n_overlap"),
            min($"k1").as("first_key"))
          .orderBy($"ck")
      },
      Some("""SELECT a.o_custkey AS ck, COUNT(*) AS n_overlap,
             |  min(a.o_orderkey) AS first_key
             |FROM orders a JOIN orders b
             |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
             | AND a.o_orderdate <= b.o_orderdate + INTERVAL 7 DAY
             | AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bucketed co-located join: both fact tables written bucketBy(orderkey) with the
    // same bucket count, so the join needs NO shuffle of either side (SortMergeJoin
    // reads matching buckets directly — verify via explain: no Exchange below the
    // join). At 100 TB this is the pattern for repeated fact-fact joins: pay the
    // bucketed write once, join shuffle-free forever after.
    Q("join_bucketed_colocated",
      (s, dir) => {
        import s.implicits._
        val (liTbl, oTbl) = ensureBucketedTables(s, dir)
        // MERGE hint: at small SF the dim side fits the broadcast threshold, which
        // would hide the point — force the sort-merge path to demonstrate that the
        // bucket layout joins with no Exchange under the join (the 100 TB fact-fact
        // case, where broadcasting is impossible anyway).
        s.table(liTbl).hint("merge")
          .join(s.table(oTbl), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Salted skew join: identical semantics to the plain equi-join (the oracle IS
    // the plain join); the salt spreads any hot l_suppkey over 8 reducers.
    Q("join_skew_salted",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").select($"l_suppkey", $"l_quantity")
        val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
          .withColumnRenamed("s_suppkey", "l_suppkey")
        graft.ops.SkewJoin.salted(li, sup, "l_suppkey", nSalts = 8)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .orderBy($"s_nationkey")
      },
      Some(s"""SELECT s_nationkey, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // As-of join via UNION-MERGE: for each event, the most recent order of that
    // customer at or before the event timestamp. The equi-join + per-event window
    // formulation materializes events × orders-per-user and shuffles that expansion
    // a second time for the window; here both inputs are unioned keyed by
    // (user, time) and ONE window per user carries the latest order forward —
    // a single shuffle of |events| + |orders| rows, no pair expansion. Within a
    // timestamp: order rows (tag 0) sort before event rows (tag 1), giving the
    // inclusive `o_orderdate <= ts` semantics, and o_orderkey ascending means
    // `last` carries the highest key among same-date orders — exactly the
    // ROW_NUMBER() ... ORDER BY o_orderdate DESC, o_orderkey DESC pick.
    Q("join_asof",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events").select($"event_id", $"ts", $"user_id")
        val o = t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        graft.ops.AsOfJoin.asof(e, o,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            rightTieBreak = "o_orderkey",
            payload = Seq("o_orderkey", "o_totalprice"))
          .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, o_orderkey, o_totalprice
             |FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
             |) WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // Nearest-value 1-D join WITHOUT pair materialization: in one dimension the
    // nearest neighbor is ADJACENT in sorted order, so the operator is lag/lead
    // over a price sort — O(n log n), no self-join (a band self-join goes
    // quadratic in dense bands: measured 339 s at sf0.1 before this rewrite).
    // The sort runs per price band in parallel; only each band's FIRST/LAST row
    // needs its neighbor from the adjacent band, supplied by a |bands|-row edge
    // frame (the scan_global_row_ids decomposition, applied to adjacency).
    // Prices are tie-broken into a total order by a key-derived decimal epsilon;
    // the nearest pick (closer of the two neighbors, ties to the smaller key)
    // is the same rule in the oracle's single global window.
    Q("join_nearest_value",
      (s, dir) => {
        import s.implicits._
        val parts = t(s, dir, "part")
          .select($"p_partkey",
            ($"p_retailprice" + $"p_partkey" * 0.0001)
              .cast("decimal(14,4)").as("p"))
          .withColumn("band", floor($"p" / 50).cast("long"))
        val w = Window.partitionBy($"band").orderBy($"p", $"p_partkey")
        val withNb = parts
          .withColumn("pv", lag(struct($"p", $"p_partkey"), 1).over(w))
          .withColumn("nx", lead(struct($"p", $"p_partkey"), 1).over(w))
        val bandW = Window.orderBy($"band")
        val edges = parts.groupBy($"band")
          .agg(min(struct($"p", $"p_partkey")).as("bfirst"),
            max(struct($"p", $"p_partkey")).as("blast"))
          .select($"band",
            lag($"blast", 1).over(bandW).as("prev_last"),
            lead($"bfirst", 1).over(bandW).as("next_first"))
        val full = withNb.join(broadcast(edges), Seq("band"))
          .withColumn("cp", coalesce($"pv", $"prev_last"))
          .withColumn("cn", coalesce($"nx", $"next_first"))
        val dPrev = abs($"p" - $"cp.p")
        val dNext = abs($"p" - $"cn.p")
        val pickPrev = $"cn".isNull ||
          ($"cp".isNotNull && (dPrev < dNext ||
            (dPrev === dNext && $"cp.p_partkey" < $"cn.p_partkey")))
        full.select($"p_partkey", $"p".cast("double").as("price"),
            when(pickPrev, $"cp.p_partkey").otherwise($"cn.p_partkey")
              .as("nearest_key"),
            when(pickPrev, dPrev).otherwise(dNext).cast("double").as("price_diff"))
          .orderBy($"p_partkey")
      },
      Some("""WITH parts AS (
             |  SELECT p_partkey,
             |    CAST(p_retailprice + p_partkey * 0.0001 AS DECIMAL(14,4)) AS p
             |  FROM part),
             |w AS (
             |  SELECT p_partkey, p,
             |    lag(p)          OVER o AS pv_p,
             |    lag(p_partkey)  OVER o AS pv_k,
             |    lead(p)         OVER o AS nx_p,
             |    lead(p_partkey) OVER o AS nx_k
             |  FROM parts
             |  WINDOW o AS (ORDER BY p, p_partkey)),
             |pick AS (
             |  SELECT p_partkey, p, pv_p, pv_k, nx_p, nx_k,
             |    (nx_p IS NULL OR (pv_p IS NOT NULL AND
             |      (abs(p - pv_p) < abs(p - nx_p) OR
             |       (abs(p - pv_p) = abs(p - nx_p) AND pv_k < nx_k))))
             |      AS pick_prev
             |  FROM w)
             |SELECT p_partkey, CAST(p AS DOUBLE) AS price,
             |  CASE WHEN pick_prev THEN pv_k ELSE nx_k END AS nearest_key,
             |  CAST(CASE WHEN pick_prev THEN abs(p - pv_p)
             |            ELSE abs(p - nx_p) END AS DOUBLE) AS price_diff
             |FROM pick ORDER BY p_partkey""".stripMargin)),

    // NATIVE as-of join (graft.plans.AsOfJoinExec): the same backward-inclusive
    // semantics as join_asof, executed by the custom whole-operator plan — co-
    // partition on the key, sort (key, time[, tie]), ONE streaming merge pass
    // with O(1) state per partition. No union-merge payload widening, no window
    // machinery, no pair expansion; hash-checked against the identical oracle.
    Q("join_asof_native",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events").select($"event_id", $"ts", $"user_id")
        val o = t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        graft.plans.AsOfNative.join(e, o,
            $"user_id", $"o_custkey", $"ts", $"o_orderdate", $"o_orderkey")
          .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, o_orderkey, o_totalprice
             |FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
             |) WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // Forward AS-OF join: each event attaches the NEXT order (earliest
    // o_orderdate >= ts) for the same user — "time to next purchase" semantics,
    // the mirror of join_asof. Same union-merge operator, one hash shuffle of
    // |events| + |orders|, no pair expansion (the oracle's LEFT JOIN + row_number
    // materializes the pairs; the engine never does).
    Q("join_asof_forward",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events").select($"event_id", $"ts", $"user_id")
        val o = t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        graft.ops.AsOfJoin.asofForward(e, o,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            rightTieBreak = "o_orderkey",
            payload = Seq("o_orderkey", "o_totalprice"))
          .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, o_orderkey, o_totalprice
             |FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |                       ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
             |) WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // AS-OF join with TOLERANCE (pandas merge_asof(tolerance=...) semantics):
    // the matched prior order only counts if it is within the tolerance,
    // otherwise the event keeps NULLs. Because every as-of candidate is <= ts,
    // the nearest candidate being stale implies ALL candidates are stale, so
    // tolerance is exactly a post-pass null-out of the matched row — the
    // union-merge operator runs unchanged (one shuffle, no pair expansion) and
    // the gap check is a map-only stage after it. Tolerance is 8400 days
    // because the synthetic tables put events ~22-23 years after the order
    // history (gaps 8190..9799 days at sf0.01) — 8400 splits the population,
    // so both the match-kept and match-expired paths are exercised.
    Q("join_asof_tolerance",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events").select($"event_id", $"ts", $"user_id")
        val o = t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        val ok = $"o_orderdate".isNotNull &&
          datediff(to_date($"ts"), to_date($"o_orderdate")) <= 8400
        graft.ops.AsOfJoin.asof(e, o,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            rightTieBreak = "o_orderkey",
            payload = Seq("o_orderkey", "o_totalprice", "o_orderdate"))
          .select($"event_id", $"user_id",
            when(ok, $"o_orderkey").as("o_orderkey"),
            when(ok, $"o_totalprice").as("o_totalprice"),
            when(ok, datediff(to_date($"ts"), to_date($"o_orderdate")))
              .as("gap_days"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CASE WHEN ok THEN o_orderkey END AS o_orderkey,
             |  CASE WHEN ok THEN o_totalprice END AS o_totalprice,
             |  CASE WHEN ok THEN gap END AS gap_days
             |FROM (
             |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             |    CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
             |              CAST(e.ts AS DATE)) AS INTEGER) AS gap,
             |    o.o_orderdate IS NOT NULL AND
             |      date_diff('day', CAST(o.o_orderdate AS DATE),
             |                CAST(e.ts AS DATE)) <= 8400 AS ok,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
             |) WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // Bucket-pruned point read: an equality/IN filter on the bucket column hashes
    // the literals to their buckets and reads ONLY those files
    // (SelectedBucketsCount in the scan — here 7 keys ⇒ ≤7 of 32 buckets). The
    // storage-layout sibling of partition pruning (scan_dpp_prune) and range/
    // Z-order stats pruning (sorted_layout_scan, zorder_layout_scan): at 100 TB a
    // keyed lookup touches 1/32nd of the fact table without any index structure.
    Q("scan_bucket_prune",
      (s, dir) => {
        import s.implicits._
        val (liTbl, _) = ensureBucketedTables(s, dir)
        s.table(liTbl)
          .filter($"l_orderkey".isin(1L, 2L, 3L, 4L, 5L, 6L, 7L))
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .orderBy($"l_orderkey")
      },
      Some(s"""SELECT l_orderkey, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
              |FROM lineitem WHERE l_orderkey IN (1, 2, 3, 4, 5, 6, 7)
              |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // Null-key skew split: in an outer join, NULL keys never match but still hash
    // to ONE reducer — at 100 TB a 30%-null foreign key serializes a third of the
    // table through a single task. The fix is structural: route null-key rows
    // AROUND the join (they keep a NULL payload by definition) and union them
    // back, so the shuffle only carries matchable keys. Here a derived key is
    // NULL for every third lineitem; the oracle is the plain LEFT JOIN — the
    // split is pure plan surgery, never a semantic change.
    Q("join_null_skew_split",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_quantity",
            when($"l_orderkey" % 3 === 0, lit(null)).otherwise($"l_orderkey").as("k"))
        val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority")
        val matched = li.filter($"k".isNotNull)
          .join(o, $"k" === $"o_orderkey", "left")
          .select($"l_quantity", $"o_orderpriority")
        val bypass = li.filter($"k".isNull)
          .select($"l_quantity", lit(null).cast("string").as("o_orderpriority"))
        matched.unionAll(bypass)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .orderBy($"o_orderpriority".asc_nulls_first)
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
              |FROM (SELECT l_quantity,
              |        CASE WHEN l_orderkey % 3 = 0 THEN NULL ELSE l_orderkey END AS k
              |      FROM lineitem) li
              |LEFT JOIN orders ON li.k = o_orderkey
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority NULLS FIRST""".stripMargin))
  )
}
