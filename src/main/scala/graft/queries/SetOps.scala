package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Set operations + sorts/limits — SURVEY.md §2b "Set ops" and "Sorts / limits".
  * intersect/except are Catalyst left-semi/left-anti under the hood (one shuffle on
  * the full row); union is shuffle-free. */
object SetOps {

  val queries: Seq[Q] = Seq(
    Q("setop_union_all",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").filter($"c_nationkey" <= 2)
          .select($"c_name".as("name"), $"c_nationkey".as("nationkey"),
            lit("customer").as("kind"))
        val sup = t(s, dir, "supplier").filter($"s_nationkey" <= 2)
          .select($"s_name".as("name"), $"s_nationkey".as("nationkey"),
            lit("supplier").as("kind"))
        c.unionByName(sup).orderBy($"name", $"nationkey", $"kind")
      },
      Some("""SELECT * FROM (
             |  SELECT c_name AS name, c_nationkey AS nationkey, 'customer' AS kind
             |  FROM customer WHERE c_nationkey <= 2
             |  UNION ALL
             |  SELECT s_name, s_nationkey, 'supplier' FROM supplier WHERE s_nationkey <= 2
             |) ORDER BY 1, 2, 3""".stripMargin)),

    Q("setop_union_distinct",
      (s, dir) => {
        import s.implicits._
        val cn = t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        val sn = t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
        cn.union(sn).distinct().orderBy($"nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY 1""".stripMargin)),

    Q("setop_intersect",
      (s, dir) => {
        import s.implicits._
        val a = t(s, dir, "customer").filter($"c_acctbal" > 7000)
          .select($"c_nationkey".as("nationkey"))
        val b = t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
        a.intersect(b).orderBy($"nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 7000
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY 1""".stripMargin)),

    Q("setop_except",
      (s, dir) => {
        import s.implicits._
        // EXCEPT against a FILTERED right side: suppliers cover all 25
        // nations, so an unfiltered difference is vacuously empty — the
        // acctbal gate leaves the nations with no high-balance supplier.
        val a = t(s, dir, "nation").select($"n_nationkey".as("nationkey"))
        val b = t(s, dir, "supplier").filter($"s_acctbal" > 8000)
          .select($"s_nationkey".as("nationkey"))
        a.except(b).orderBy($"nationkey")
      },
      Some("""SELECT n_nationkey AS nationkey FROM nation
             |EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
             |ORDER BY 1""".stripMargin)),

    Q("setop_intersect_all",
      (s, dir) => {
        import s.implicits._
        val a = t(s, dir, "lineitem").filter($"l_returnflag" === "A")
          .select($"l_suppkey".as("suppkey"))
        val b = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
          .select($"l_suppkey".as("suppkey"))
        a.intersectAll(b).groupBy($"suppkey").agg(count(lit(1)).as("multiplicity"))
          .orderBy($"suppkey")
      },
      Some("""SELECT suppkey, COUNT(*) AS multiplicity FROM (
             |  SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'A'
             |  INTERSECT ALL
             |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
             |) GROUP BY suppkey ORDER BY suppkey""".stripMargin)),

    Q("setop_except_all",
      (s, dir) => {
        import s.implicits._
        val a = t(s, dir, "lineitem").filter($"l_quantity" <= 25)
          .select($"l_suppkey".as("suppkey"))
        val b = t(s, dir, "lineitem").filter($"l_quantity" > 25)
          .select($"l_suppkey".as("suppkey"))
        a.exceptAll(b).groupBy($"suppkey").agg(count(lit(1)).as("multiplicity"))
          .orderBy($"suppkey")
      },
      Some("""SELECT suppkey, COUNT(*) AS multiplicity FROM (
             |  SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity <= 25
             |  EXCEPT ALL
             |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
             |) GROUP BY suppkey ORDER BY suppkey""".stripMargin)),

    Q("sort_multikey_nulls",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .select($"c_custkey", $"c_acctbal",
            nullif($"c_mktsegment", lit("BUILDING")).as("seg"))
          .orderBy($"seg".asc_nulls_first, $"c_acctbal".desc, $"c_custkey")
          .limit(100)
      },
      Some("""SELECT c_custkey, c_acctbal, NULLIF(c_mktsegment, 'BUILDING') AS seg
             |FROM customer
             |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey
             |LIMIT 100""".stripMargin)),

    Q("sort_limit_offset",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select($"p_partkey", $"p_name", $"p_retailprice")
          .orderBy($"p_retailprice".desc, $"p_partkey")
          .offset(10).limit(20)
      },
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             |ORDER BY p_retailprice DESC, p_partkey
             |LIMIT 20 OFFSET 10""".stripMargin)),

    // unionByName with allowMissingColumns: schema-drifted branches align by COLUMN
    // NAME (positional union would silently mis-bind) and the absent column
    // null-fills — the in-plan counterpart of schema_merge_scan's on-disk merge.
    Q("setop_union_byname_missing",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val a = c.filter($"c_custkey" <= 750)
          .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        val b = c.filter($"c_custkey" > 750)
          .select(($"c_acctbal" * 2.0).as("c_acctbal"), $"c_custkey")
        a.unionByName(b, allowMissingColumns = true)
          .select($"c_custkey", $"c_acctbal",
            coalesce($"c_mktsegment", lit("<none>")).as("seg"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, c_mktsegment AS seg FROM customer
             |WHERE c_custkey <= 750
             |UNION ALL
             |SELECT c_custkey, c_acctbal * 2.0, '<none>' FROM customer
             |WHERE c_custkey > 750
             |ORDER BY c_custkey""".stripMargin))
  )
}
