package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Scans, projection, filtering, predicates — SURVEY.md §2b "Sources / sinks" and
  * "Projection / filter / predicates". Filters and projections here are declarative so
  * Catalyst pushes them into the parquet scan (verified via explain: PushedFilters /
  * ReadSchema) — at 100 TB that is the difference between reading 2 columns of a
  * partition subset and reading everything. */
object Core {

  val queries: Seq[Q] = Seq(
    Q("scan_filter_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1995-04-01").cast("timestamp"))
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    Q("filter_predicates",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_returnflag".isin("A", "R") &&
                  $"l_quantity".between(10, 20) &&
                  ($"l_linestatus" === "F" || !($"l_discount" > 0.05)) &&
                  $"l_shipdate".isNotNull &&
                  $"l_returnflag" =!= "N")
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_quantity",
            when($"l_discount" <= 0.02, "low")
              .when($"l_discount" <= 0.06, "mid")
              .otherwise("high").as("disc_band"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_quantity",
            $"disc_band")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             |  CASE WHEN l_discount <= 0.02 THEN 'low'
             |       WHEN l_discount <= 0.06 THEN 'mid'
             |       ELSE 'high' END AS disc_band
             |FROM lineitem
             |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
             |  AND (l_linestatus = 'F' OR NOT (l_discount > 0.05))
             |  AND l_shipdate IS NOT NULL AND l_returnflag <> 'N'
             |ORDER BY 1, 2, 3, 4, 5""".stripMargin)),

    Q("filter_like_rlike",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter($"p_name".like("%a%") && $"p_type".rlike("^[A-Z]+") &&
                  $"p_brand".startsWith("Brand"))
          .select($"p_partkey", $"p_name", $"p_type")
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_name LIKE '%a%' AND regexp_matches(p_type, '^[A-Z]+')
             |  AND p_brand LIKE 'Brand%'
             |ORDER BY p_partkey""".stripMargin)),

    Q("distinct_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select($"l_returnflag", $"l_linestatus")
          .distinct()
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Round-trip through a CSV sink+scan: exercises the CSV source/sink family while
    // staying oracle-checkable against the parquet table (the round-trip must be
    // lossless for the projected columns).
    Q("csv_roundtrip_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/csv_roundtrip"
        t(s, dir, "nation").coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .csv(out)
          .orderBy($"n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    Q("json_roundtrip_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/json_roundtrip"
        t(s, dir, "customer").select($"c_custkey", $"c_name", $"c_mktsegment")
          .coalesce(1).write.mode("overwrite").json(out)
        s.read.schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING").json(out)
          .orderBy($"c_custkey")
      },
      Some("SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")),

    // Partitioned parquet sink + scan with partition pruning: the scan of the written
    // dataset prunes to one partition directory (at scale: reads 1/N of the data).
    Q("partitioned_write_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/part_by_flag"
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        s.read.parquet(out)
          .filter($"l_returnflag" === "A")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
          .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_returnflag = 'A' ORDER BY 1, 2, 3""".stripMargin)),

    // Malformed-record routing (PERMISSIVE CSV + corrupt-record column): real feeds
    // carry broken lines; the scalable pattern parses in PERMISSIVE mode, routes
    // rows with a populated corrupt column to quarantine, and the pipeline decides
    // on the counts — no abort, no row leaves the executors. Fixture: every 5th
    // nation row is emitted with a non-numeric key and a missing field. The gate
    // must REFERENCE every column it validates: the CSV reader prunes unprojected
    // columns before conversion (spark.sql.csv.parser.columnPruning.enabled), so a
    // malformed value in an unreferenced column never populates the corrupt record.
    Q("csv_malformed_routing",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "csv_malformed")
        if (!new java.io.File(s"$out/_SUCCESS").exists()) {
          t(s, dir, "nation")
            .select(when($"n_nationkey" % 5 === 0,
                concat(lit("BADKEY,"), $"n_name"))
              .otherwise(concat_ws(",",
                $"n_nationkey", $"n_name", $"n_regionkey")).as("line"))
            .coalesce(1).write.mode("overwrite").text(out)
        }
        s.read
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(out)
          .agg(
            count(when($"_corrupt".isNull, 1)).as("n_good"),
            count(when($"_corrupt".isNotNull, 1)).as("n_quarantined"),
            sum(when($"_corrupt".isNull, $"n_nationkey")).cast("long")
              .as("sum_key_good"),
            sum(when($"_corrupt".isNull, $"n_regionkey")).cast("long")
              .as("sum_region_good"))
      },
      Some("""SELECT
             |  CAST(SUM(CASE WHEN n_nationkey % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_good,
             |  CAST(SUM(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_quarantined,
             |  CAST(SUM(CASE WHEN n_nationkey % 5 <> 0 THEN n_nationkey END)
             |    AS BIGINT) AS sum_key_good,
             |  CAST(SUM(CASE WHEN n_nationkey % 5 <> 0 THEN n_regionkey END)
             |    AS BIGINT) AS sum_region_good
             |FROM nation""".stripMargin)),

    // Dynamic partition overwrite (INSERT OVERWRITE ... PARTITION semantics): the
    // delta write replaces ONLY the partitions it contains ('O'), leaving sibling
    // partitions' files untouched — the idempotent daily-reload primitive. In static
    // mode (the default) the same write would wipe the whole dataset; at 100 TB
    // dynamic mode is the difference between rewriting one day and rewriting the
    // table. The conf flip is scoped and restored.
    Q("partitioned_overwrite_dynamic",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/orders_dyn_overwrite"
        val o = t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        o.withColumn("src", lit("full"))
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "dynamic")
        try o.filter($"o_orderstatus" === "O")
          .withColumn("o_totalprice", $"o_totalprice" * 0.9)
          .withColumn("src", lit("delta"))
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
        s.read.parquet(out)
          .groupBy($"o_orderstatus", $"src")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus,
              |  CASE WHEN o_orderstatus = 'O' THEN 'delta' ELSE 'full' END AS src,
              |  COUNT(*) AS n,
              |  ${sqlDsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 0.9 ELSE o_totalprice END")} AS sum_price
              |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus""".stripMargin)),

    // Schema evolution on read (mergeSchema): two writer generations — the second
    // adds a column — land in one dataset; the merged scan unions the footers'
    // schemas and null-fills the column where an old file lacks it. This is how a
    // 100 TB corpus absorbs schema drift without rewriting history; the partition
    // column (batch=) prunes generation-scoped reads.
    Q("schema_merge_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/customer_schema_evolve"
        val c = t(s, dir, "customer")
        c.select($"c_custkey", $"c_acctbal")
          .write.mode("overwrite").parquet(s"$out/batch=1")
        c.select($"c_custkey", $"c_acctbal", $"c_mktsegment")
          .write.mode("overwrite").parquet(s"$out/batch=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy($"batch",
            coalesce($"c_mktsegment", lit("<absent>")).as("seg"))
          .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("sum_bal"))
          .orderBy($"batch", $"seg")
      },
      Some(s"""SELECT 1 AS batch, '<absent>' AS seg, COUNT(*) AS n,
              |  ${sqlDsum("c_acctbal")} AS sum_bal
              |FROM customer
              |UNION ALL
              |SELECT 2, c_mktsegment, COUNT(*), ${sqlDsum("c_acctbal")}
              |FROM customer GROUP BY 2
              |ORDER BY batch, seg""".stripMargin)),

    Q("temp_view_sql",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n
                |FROM orders WHERE o_totalprice > 1000.0
                |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n
             |FROM orders WHERE o_totalprice > 1000.0
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
