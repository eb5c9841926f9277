package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native top-k-per-group operator: correctness vs the window formulation, boundary
  * determinism via total sort keys, plan shape (partial below the exchange). */
class TopKPerGroupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("keeps the k highest per group, ties broken by the struct key") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 1.0),
      ("c", 6L, 5.0), ("c", 7L, 5.0), ("c", 8L, 5.0), ("c", 9L, 5.0))
      .toDF("g", "id", "v").repartition(4)
    val got = TopK.perGroup(df, Seq("g"), struct($"v", -$"id"), k = 2)
      .orderBy($"g", $"v".desc, $"id")
      .select($"g", $"id").as[(String, Long)].collect().toSeq
    // a: v=30 twice (ids 2,4; -id desc → id asc keeps both), b: only row,
    // c: all v equal → lowest two ids
    assert(got == Seq(("a", 2L), ("a", 4L), ("b", 5L), ("c", 6L), ("c", 7L)))
  }

  test("ascending keeps the k lowest") {
    import spark.implicits._
    val df = Seq(("x", 1L, 9.0), ("x", 2L, 3.0), ("x", 3L, 7.0))
      .toDF("g", "id", "v")
    val got = TopK.perGroup(df, Seq("g"), struct($"v", $"id"), k = 2,
        descending = false)
      .orderBy($"v").select($"id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L))
  }

  test("empty group cols = global top-k") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id").repartition(5)
    val got = TopK.perGroup(df, Seq.empty, struct($"id"), k = 3)
      .orderBy($"id".desc).as[Long].collect().toSeq
    assert(got == Seq(100L, 99L, 98L))
  }

  test("agrees with the window formulation on real tables, any partitioning") {
    import spark.implicits._
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .repartition(7) // deliberately unaligned with the group key
    val viaOp = TopK.perGroup(o, Seq("o_custkey"),
      struct($"o_totalprice", -$"o_orderkey"), k = 3)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWin = o.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
    assert(viaOp.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaOp).isEmpty)
  }

  test("null sort values order last, never displace ranked rows, no NPE") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(9.0)),
      ("b", 4L, None), ("b", 5L, None)) // all-null group still yields rows
      .toDF("g", "id", "v")
    val got = TopK.perGroup(df, Seq("g"), $"v", k = 2)
      .orderBy($"g", $"id").select($"g", $"id")
      .as[(String, Long)].collect().toSeq
    // a: 9.0 and 5.0 beat the null; b: only nulls, both kept
    assert(got == Seq(("a", 1L), ("a", 3L), ("b", 4L), ("b", 5L)))
  }

  test("array sort keys are copied correctly (no buffer-reuse corruption)") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("g", i.toLong, Seq(i % 7, i)))
      .toDF("g", "id", "arr").repartition(3)
    val got = TopK.perGroup(df, Seq("g"), $"arr", k = 3)
      .orderBy($"id").select($"id").as[Long].collect().toSeq
    // lexicographic max arrays: [6, x] with the largest x: ids 489, 496, and [5,495]?
    // compute expected on the driver with the same ordering
    val expected = (1 to 500).map(i => (Seq(i % 7, i), i.toLong))
      .sortBy(_._1.toList)(Ordering.Implicits.seqOrdering[List, Int])
      .takeRight(3).map(_._2).sorted
    assert(got == expected)
  }

  test("partial flush cap: exact results beyond MaxPartialKeys distinct keys") {
    import spark.implicits._
    val n = TopKPerGroupExec.MaxPartialKeys + 5000
    val df = spark.range(n.toLong).select($"id".as("g"),
        ($"id" % 3).as("r"), ($"id" * 2).as("v"))
      .coalesce(1) // single input partition → one partial sees > cap keys
    val got = TopK.perGroup(df, Seq("g"), struct($"v", $"r"), k = 1)
    assert(got.count() == n.toLong) // one row per key survives
    // spot-check: every kept row is its key's own single row (k=1, unique keys)
    assert(got.filter($"v" =!= $"g" * 2).count() == 0)
  }

  test("plan: partial below the exchange, final above; no sort of the input") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0)).toDF("g", "id", "v")
    val plan = TopK.perGroup(df, Seq("g"), struct($"v", $"id"), k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupExec(partial"), plan)
    assert(plan.contains("TopKPerGroupExec(final"), plan)
    assert(plan.indexOf("TopKPerGroupExec(final") <
      plan.indexOf("TopKPerGroupExec(partial"), "final must be above partial")
    assert(!plan.contains("Sort "), s"no sort expected:\n$plan")
  }
}
