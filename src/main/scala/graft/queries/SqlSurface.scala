package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** ANSI-SQL surface operators beyond plain joins/aggs: correlated and uncorrelated
  * subqueries (EXISTS / NOT EXISTS / IN / correlated scalar), FILTER-clause
  * aggregates, and null-safe equality joins. The Spark surface here is deliberately
  * `spark.sql(...)` where the feature IS a SQL feature — Catalyst decorrelates every
  * subquery below into a semi/anti/left join (RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery), so the physical plans are ordinary hash-partitioned
  * joins that scale out; nothing executes per-row against the inner table. */
object SqlSurface {

  val queries: Seq[Q] = Seq(

    // EXISTS + NOT EXISTS in one predicate: customers with ≥1 urgent order and no
    // finished order. Catalyst plans LeftSemi ⨝ then LeftAnti ⨝ on o_custkey — two
    // shuffled equi-joins, no per-row subquery execution.
    Q("subq_exists",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_mktsegment FROM customer c
                |WHERE EXISTS (SELECT 1 FROM orders o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_orderpriority = '1-URGENT')
                |  AND NOT EXISTS (SELECT 1 FROM orders o2
                |                  WHERE o2.o_custkey = c.c_custkey
                |                    AND o2.o_orderstatus = 'F')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_orderpriority = '1-URGENT')
             |  AND NOT EXISTS (SELECT 1 FROM orders o2
             |                  WHERE o2.o_custkey = c.c_custkey
             |                    AND o2.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // Uncorrelated IN subquery → LeftSemi against a broadcast-sized inner (nation).
    Q("subq_in",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT s_suppkey, s_name FROM supplier
                |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                |                      WHERE n_regionkey IN (1, 2))
                |ORDER BY s_suppkey""".stripMargin)
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
             |                      WHERE n_regionkey IN (1, 2))
             |ORDER BY s_suppkey""".stripMargin)),

    // Null-aware anti join — the NOT IN trap: if the subquery produces even one
    // NULL, three-valued logic makes `x NOT IN (...)` never-true, so the branch
    // with an injected NULL contributes ZERO rows while the null-free branch
    // anti-joins normally. Spark plans this as a null-aware anti join (it cannot
    // use a plain hash anti join); both engines implement the same ANSI rule, which
    // is exactly what the gate pins down.
    Q("subq_not_in_null_aware",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT 'clean_subquery' AS leg, COUNT(*) AS n FROM supplier
                |WHERE s_nationkey NOT IN
                |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
                |UNION ALL
                |SELECT 'null_poisoned', COUNT(*) FROM supplier
                |WHERE s_nationkey NOT IN
                |  (SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_nationkey END
                |   FROM nation)
                |ORDER BY leg""".stripMargin)
      },
      Some("""SELECT 'clean_subquery' AS leg, COUNT(*) AS n FROM supplier
             |WHERE s_nationkey NOT IN
             |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
             |UNION ALL
             |SELECT 'null_poisoned', COUNT(*) FROM supplier
             |WHERE s_nationkey NOT IN
             |  (SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_nationkey END
             |   FROM nation)
             |ORDER BY leg""".stripMargin)),

    // Correlated scalar subquery (per-customer order count): decorrelated into a
    // left outer join against a pre-aggregated orders frame — one shuffle each side,
    // exact BIGINT output.
    Q("subq_scalar_correlated",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey,
                |  (SELECT COUNT(*) FROM orders o
                |   WHERE o.o_custkey = c.c_custkey) AS n_orders
                |FROM customer c
                |WHERE c_custkey <= 200
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  (SELECT COUNT(*) FROM orders o
             |   WHERE o.o_custkey = c.c_custkey) AS n_orders
             |FROM customer c
             |WHERE c_custkey <= 200
             |ORDER BY c_custkey""".stripMargin)),

    // FILTER-clause aggregates: conditional counts/sums inside ONE grouped pass
    // (no self-joins, no second scan); decimal-exact sum per QueryDSL rules.
    Q("agg_filtered", {
      val sql = s"""SELECT l_returnflag,
                   |  COUNT(*) AS n_all,
                   |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
                   |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)))
                   |       FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_disc
                   |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(sql)
      }
    },
      Some("""SELECT l_returnflag,
             |  COUNT(*) AS n_all,
             |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4)))
             |       FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_disc
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match each
    // other, unlike '=' which drops them. Both sides pre-aggregate to ≤5 rows before
    // the join, so the null-safe comparison is exercised without a wide shuffle; at
    // scale a null-safe key still hash-partitions (NULL is just one more key value).
    Q("join_null_safe",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val nullablePrio =
          when($"o_orderpriority" === "1-URGENT", lit(null)).otherwise($"o_orderpriority")
        val a = o.groupBy(nullablePrio.as("prio")).agg(count(lit(1)).as("n_all"))
        val b = o.filter($"o_orderstatus" === "F")
          .groupBy(nullablePrio.as("prio")).agg(count(lit(1)).as("n_finished"))
        a.join(b, a("prio") <=> b("prio"), "left")
          .select(a("prio"), $"n_all", coalesce($"n_finished", lit(0L)).as("n_finished"))
          .orderBy(a("prio").asc_nulls_first)
      },
      Some("""WITH a AS (
             |  SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio, COUNT(*) AS n_all
             |  FROM orders GROUP BY 1),
             |b AS (
             |  SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio, COUNT(*) AS n_finished
             |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
             |SELECT a.prio, a.n_all, COALESCE(b.n_finished, 0) AS n_finished
             |FROM a LEFT JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
             |ORDER BY a.prio ASC NULLS FIRST""".stripMargin)),

    // LATERAL correlated subquery with ORDER BY + LIMIT: per-customer top-2 orders.
    // Catalyst decorrelates the lateral limit into a partitioned window (rank ≤ 2)
    // over one shuffled join — no per-row subquery execution at any scale.
    Q("subq_lateral_topk",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, o_orderkey, o_totalprice
                |FROM customer c
                |JOIN LATERAL (
                |  SELECT o_orderkey, o_totalprice FROM orders o
                |  WHERE o.o_custkey = c.c_custkey
                |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
                |WHERE c_custkey < 100
                |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
      },
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
             |FROM customer c
             |JOIN LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON TRUE
             |WHERE c_custkey < 100
             |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)),

    // ANSI listagg (Spark 4) — ordered string aggregation WITHIN GROUP; the ORDER BY
    // inside the aggregate makes the concatenation deterministic under any
    // partitioning (collect_list alone is partition-order-sensitive). Groups here
    // are dimension-bounded; unbounded-group listagg is an anti-pattern at scale.
    Q("agg_listagg",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT n_name,
                |  listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS suppliers
                |FROM supplier JOIN nation ON s_nationkey = n_nationkey
                |GROUP BY n_name ORDER BY n_name""".stripMargin)
      },
      Some("""SELECT n_name,
             |  string_agg(s_name, ',' ORDER BY s_name) AS suppliers
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Recursive CTE (Spark 4 WITH RECURSIVE): generate a month spine by recursion,
    // left-join the fact aggregate onto it so empty months surface as zero — the
    // classic report-completeness shape. The recursion itself is driver-cheap
    // (12 rows); the data-touching part stays one key-partitioned aggregation.
    Q("sql_recursive_cte",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""WITH RECURSIVE m(mon) AS (
                |  SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12)
                |SELECT mon, COALESCE(n, 0) AS n_orders
                |FROM m LEFT JOIN (
                |  SELECT month(o_orderdate) AS mon2, COUNT(*) AS n
                |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) o
                |ON mon = mon2 ORDER BY mon""".stripMargin)
      },
      Some("""WITH RECURSIVE m(mon) AS (
             |  SELECT 1 UNION ALL SELECT mon + 1 FROM m WHERE mon < 12)
             |SELECT mon, COALESCE(n, 0) AS n_orders
             |FROM m LEFT JOIN (
             |  SELECT month(o_orderdate) AS mon2, COUNT(*) AS n
             |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) o
             |ON mon = mon2 ORDER BY mon""".stripMargin)),

    // VARIANT semi-structured type (Spark 4): parse the JSON props column once into
    // a binary VARIANT and extract typed fields with variant_get — the columnar
    // semi-structured path (shredded binary, no per-access JSON re-parse, unlike
    // get_json_object). try_variant_get returns NULL for missing paths.
    Q("fn_variant_semistructured",
      (s, dir) => {
        import s.implicits._
        graft.Tables.events(s, dir)
          .filter($"event_id" < 2000)
          .select($"event_id", parse_json($"props").as("v"))
          .select($"event_id",
            expr("variant_get(v, '$.k', 'int')").as("k_int"),
            expr("variant_get(v, '$.k', 'string')").as("k_str"),
            expr("try_variant_get(v, '$.missing', 'int')").as("k_missing"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
             |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
             |  json_extract_string(props, '$.k') AS k_str,
             |  CAST(NULL AS INTEGER) AS k_missing
             |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    // GROUP BY ALL / ORDER BY ALL (modern ANSI-adjacent sugar, Spark 4 + DuckDB):
    // group keys are inferred as every non-aggregate select item — the exploratory
    // query shape users reach for first. Plan is identical to the explicit GROUP BY.
    Q("sql_group_by_all",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(s"""SELECT o_orderstatus, o_orderpriority,
                 |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
                 |FROM orders
                 |GROUP BY ALL ORDER BY ALL""".stripMargin)
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority,
              |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders
              |GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // SQL PIVOT clause (the declarative spelling of the DataFrame pivot in
    // agg_pivot): explicit IN-list values, so the plan is a single grouped
    // aggregation — no distinct-values discovery pass. The oracle spells it as
    // conditional aggregation; same plan shape either way.
    Q("sql_pivot_clause",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT * FROM (
                |  SELECT o_orderstatus, o_orderpriority FROM orders)
                |PIVOT (COUNT(*) AS n
                |       FOR o_orderpriority IN ('1-URGENT' AS urgent,
                |                               '5-LOW' AS low))
                |ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS urgent,
             |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS low
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // EXISTS as a projected BOOLEAN (not a filter): Catalyst plans an
    // ExistenceJoin — a semi-join variant that keeps every probe row and adds the
    // match flag — the join type none of the filter-position subqueries exercise.
    // One hash-partitioned pass; no conditional re-scan per row.
    Q("subq_exists_flag",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_mktsegment,
                |  EXISTS (SELECT 1 FROM orders o
                |          WHERE o.o_custkey = c.c_custkey
                |            AND o.o_orderpriority = '1-URGENT') AS has_urgent
                |FROM customer c WHERE c_custkey <= 500
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  EXISTS (SELECT 1 FROM orders o
             |          WHERE o.o_custkey = c.c_custkey
             |            AND o.o_orderpriority = '1-URGENT') AS has_urgent
             |FROM customer c WHERE c_custkey <= 500
             |ORDER BY c_custkey""".stripMargin)),

    // Join-strategy HINTS from SQL: BROADCAST pins the dim build side (the 100 TB
    // must-have when statistics under-estimate a small side), MERGE forces
    // sort-merge where a hash build would not fit. Hints change the PLAN, never the
    // result — the oracle is hint-free.
    Q("sql_join_hints",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(s"""SELECT /*+ BROADCAST(nation), MERGE(orders) */
                 |  n_name, COUNT(*) AS n_orders,
                 |  ${sqlDsum("o_totalprice")} AS sum_price
                 |FROM orders
                 |JOIN customer ON o_custkey = c_custkey
                 |JOIN nation ON c_nationkey = n_nationkey
                 |GROUP BY n_name ORDER BY n_name""".stripMargin)
      },
      Some(s"""SELECT n_name, COUNT(*) AS n_orders,
              |  ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // String collations (Spark 4): grouping under UTF8_LCASE folds case variants
    // into one equivalence class at the COMPARISON level — no lower() projection,
    // the collation travels with the type through the shuffle. The representative
    // key is pinned with a binary-collation MIN so output is deterministic; the
    // oracle mirrors the classes with lower().
    Q("sql_collation_group",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""WITH v AS (
                |  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                |              ELSE lower(p_brand) END AS brand_cased
                |  FROM part)
                |SELECT min(brand_cased COLLATE UTF8_BINARY) AS brand_rep,
                |  COUNT(*) AS n
                |FROM v
                |GROUP BY brand_cased COLLATE UTF8_LCASE
                |ORDER BY brand_rep""".stripMargin)
      },
      Some("""WITH v AS (
             |  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
             |              ELSE lower(p_brand) END AS brand_cased
             |  FROM part)
             |SELECT min(brand_cased) AS brand_rep, COUNT(*) AS n
             |FROM v GROUP BY lower(brand_cased)
             |ORDER BY brand_rep""".stripMargin)),

    // SQL UNPIVOT clause (the standard spelling of wide→long; the API twin is
    // unpivot_melt, the generator twin fn_stack_wide_to_long). Values are
    // pre-cast to one type — UNPIVOT requires a common value column type, and
    // DOUBLE keeps both engines' output schemas identical.
    Q("sql_unpivot_clause",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, metric, val FROM (
                |  SELECT o_orderkey, o_totalprice AS price,
                |    CAST(o_custkey AS DOUBLE) AS cust
                |  FROM orders WHERE o_orderkey < 500)
                |UNPIVOT (val FOR metric IN (price, cust))
                |ORDER BY o_orderkey, metric""".stripMargin)
      },
      Some("""SELECT o_orderkey, metric, val FROM (
             |  SELECT o_orderkey, o_totalprice AS price,
             |    CAST(o_custkey AS DOUBLE) AS cust
             |  FROM orders WHERE o_orderkey < 500)
             |UNPIVOT (val FOR metric IN (price, cust))
             |ORDER BY o_orderkey, metric""".stripMargin)),

    // Hive-style script transform: SELECT TRANSFORM ... USING pipes each
    // partition's rows through an external process (tab-separated in/out, no
    // serde) — the SQL-surface spelling of the reference's subprocess task
    // archetype (task.py:321-328; the API twin is pipe_subprocess_filter).
    // The child runs per partition in parallel with streamed stdin/stdout, so
    // at 100 TB the subprocess cost scales out with the executors. Output
    // columns come back as strings; the query re-aggregates AFTER the pipe, so
    // the result is partitioning-independent. Quantities are floored to BIGINT
    // before crossing the boundary — the pipe compares integers, never
    // engine-rendered doubles.
    // Boundary contract, learned the hard way: (1) the no-serde default field
    // delimiter is Hive's '', which awk does not treat as whitespace —
    // declare ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t' on BOTH sides;
    // (2) feeding the pipe straight off the vectorized parquet scan NPEs the
    // feed thread (column batch freed under the writer thread), so the input
    // goes through one DISTRIBUTE BY first — row-materialized, and the natural
    // placement anyway when the pipe follows a shuffle at scale.
    Q("sql_script_transform",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""WITH src AS (
                |  SELECT l_returnflag AS f,
                |    CAST(floor(l_quantity) AS BIGINT) AS q
                |  FROM lineitem DISTRIBUTE BY f),
                |fed AS (
                |  SELECT TRANSFORM(f, q)
                |    ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
                |    USING 'awk \'$2 > 25\'' AS (flag STRING, fq STRING)
                |    ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
                |  FROM src)
                |SELECT flag, count(*) AS n,
                |  sum(CAST(fq AS BIGINT)) AS sum_fq
                |FROM fed GROUP BY flag ORDER BY flag""".stripMargin)
      },
      Some("""WITH f AS (
             |  SELECT l_returnflag AS flag,
             |    CAST(FLOOR(l_quantity) AS BIGINT) AS fq
             |  FROM lineitem)
             |SELECT flag, COUNT(*) AS n, CAST(SUM(fq) AS BIGINT) AS sum_fq
             |FROM f WHERE fq > 25 GROUP BY flag ORDER BY flag""".stripMargin)),

    // SQL pipe syntax (Spark 4): the linear |> spelling of scan → filter →
    // aggregate → project → sort. Same Catalyst plan as the nested form — the
    // pipes are pure parser surface, so pushdown/pruning/AQE all apply
    // unchanged; the oracle is the classic nested SQL for the same plan.
    Q("sql_pipe_syntax",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(s"""FROM lineitem
                 ||> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 ||> AGGREGATE count(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
                 |   GROUP BY l_returnflag, l_linestatus
                 ||> SELECT l_returnflag, l_linestatus, n, sum_qty
                 ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
              |  ${sqlDsum("l_quantity")} AS sum_qty
              |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN expr):
    // a catalog-registered expression macro, not a UDF — the body inlines into
    // the plan at resolution, so it stays inside whole-stage codegen with zero
    // serialization cost (verified: the plan is identical to writing the
    // expression by hand). OR REPLACE keeps re-registration idempotent within
    // a session. The oracle inlines the same body.
    Q("sql_create_function",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE,
                |  d DOUBLE) RETURNS DOUBLE RETURN p * (1.0 - d)""".stripMargin)
        s.sql(s"""SELECT l_returnflag,
                 |  CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                 |    AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
                 |  count(*) AS n
                 |FROM lineitem GROUP BY l_returnflag
                 |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount))
             |    AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // SQL session variables (Spark 4 DECLARE / SET VAR): computed state carried
    // between statements — here a corpus-derived threshold (exact decimal mean,
    // so the value is engine-identical) set once, then referenced by a second
    // query. The oracle spells the same threshold as a scalar subquery.
    Q("sql_session_variables",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("DECLARE OR REPLACE VARIABLE qty_floor DOUBLE DEFAULT 0.0")
        s.sql(s"""SET VAR qty_floor = (SELECT ${sqlDavg("l_quantity")}
                 |                     FROM lineitem)""".stripMargin)
        s.sql("""SELECT l_returnflag, count(*) AS n_above
                |FROM lineitem WHERE l_quantity > qty_floor
                |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some(s"""SELECT l_returnflag, count(*) AS n_above
              |FROM lineitem
              |WHERE l_quantity > (SELECT ${sqlDavg("l_quantity")}
              |                    FROM lineitem)
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // IDENTIFIER() clause (Spark 4): table and column names resolved from
    // constant-foldable string expressions — the injection-safe spelling of
    // dynamic SQL (templated jobs pick tables per run without string-splicing
    // the query). Resolution happens at analysis, so the executed plan is the
    // static one.
    Q("sql_identifier_clause",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT IDENTIFIER('l_' || 'returnflag') AS flag, count(*) AS n
                |FROM IDENTIFIER('line' || 'item')
                |GROUP BY IDENTIFIER('l_' || 'returnflag')
                |ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin)),

    // Named parameter markers (Spark 4 spark.sql(query, args)): typed
    // parameterized SQL — values bind as literals at parse time (visible to
    // constant folding and parquet pushdown), never string-spliced. The oracle
    // inlines the same constants.
    Q("sql_named_parameters",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        // The revenue sum goes through DECIMAL (order-free) and varies per
        // group; max_qty alone saturated at the parameter bound minus one on
        // every row, leaving nothing the hash could actually falsify.
        s.sql(
          """SELECT l_linestatus, count(*) AS n, max(l_quantity) AS max_qty,
            |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            |    AS revenue
            |FROM lineitem
            |WHERE l_quantity < :maxq AND l_returnflag = :flag
            |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
          Map("maxq" -> 10, "flag" -> "R"))
      },
      Some("""SELECT l_linestatus, count(*) AS n, max(l_quantity) AS max_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS revenue
             |FROM lineitem
             |WHERE l_quantity < 10 AND l_returnflag = 'R'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))
  )
}
