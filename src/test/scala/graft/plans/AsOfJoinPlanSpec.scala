package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("native as-of join == window-pick reference on real tables") {
    import spark.implicits._
    val e = graft.Tables.events(spark, sf).select($"event_id", $"ts", $"user_id")
    val o = graft.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
    val got = AsOfNative.join(e, o,
        $"user_id", $"o_custkey", $"ts", $"o_orderdate", $"o_orderkey")
      .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
    // reference: equi-join + per-left-row window pick (the formulation the
    // operator exists to avoid — fine at spec scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_id")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val want = e.join(o, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
    assert(got.count() == e.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("physical plan is a single merge pass: no window, no pair join") {
    import spark.implicits._
    val e = graft.Tables.events(spark, sf).select($"event_id", $"ts", $"user_id")
    val o = graft.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")
    val planStr = AsOfNative.join(e, o,
      $"user_id", $"o_custkey", $"ts", $"o_orderdate", $"o_orderkey")
      .queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoinExec"), planStr)
    assert(!planStr.contains("SortMergeJoin") && !planStr.contains("Window"), planStr)
  }

  test("left rows with no prior right row keep nulls; null keys never match") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "t", "tag").repartition(3)
    val r = Seq((1L, 6L, 100.0), (1L, 9L, 200.0), (3L, 1L, 300.0))
      .toDF("rk", "rt", "v").repartition(2)
    val got = AsOfNative.join(l, r, $"k", $"rk", $"t", $"rt", $"rt")
      .select($"tag", $"v").collect().map(x => (x.getString(0),
        if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(got == Map("a" -> 200.0, "b" -> null, "c" -> null))
  }
}
