package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    TopKRewriteSupport.enableRewrite(s)
    s
  }

  private def vanillaTopK(k: Int) = {
    import spark.implicits._
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".desc_nulls_last)
    o.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice")
  }

  test("row_number <= k with dropped rn plans as TopKPerGroupExec") {
    val planStr = vanillaTopK(5).queryExecution.executedPlan.toString
    assert(planStr.contains("TopKPerGroupExec"), planStr)
    assert(!planStr.contains("Window"), planStr)
  }

  test("rewritten plan returns exactly the window formulation's rows") {
    import spark.implicits._
    val got = vanillaTopK(5).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // reference: same computation with the rn column RETAINED — the rule must
    // not fire (rn is in the output), so this runs through the vanilla window
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".desc_nulls_last)
    val ref = o.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice", $"rn")
    assert(ref.queryExecution.executedPlan.toString.contains("Window"))
    val want = ref.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.size == 15)
  }

  test("no rewrite when rn survives, directions mix, or sort keys are nullable") {
    import spark.implicits._
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    // mixed directions keep the window
    val wMixed = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".asc_nulls_first)
    val mixed = o.withColumn("rn", row_number().over(wMixed)).filter($"rn" <= 3)
      .select($"o_orderkey")
    assert(mixed.queryExecution.executedPlan.toString.contains("Window"))
    // nullable sort key keeps the window (null ordering differs)
    val wNullable = Window.partitionBy($"o_orderstatus")
      .orderBy(when($"o_totalprice" > 0, $"o_orderkey").asc)
    val nullable = o.withColumn("rn", row_number().over(wNullable)).filter($"rn" <= 3)
      .select($"o_orderkey")
    assert(nullable.queryExecution.executedPlan.toString.contains("Window"))
  }
}
