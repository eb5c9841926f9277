package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerPrefilterSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    StringSimFunctions.register(s)
    if (!s.experimental.extraOptimizations.contains(JaroWinklerPrefilter))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ JaroWinklerPrefilter
    s
  }

  private def parquetPairs = {
    import spark.implicits._
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(substring($"text", 1, 20).as("l"), substring($"text", 5, 20).as("r"))
  }

  test("rule injects the length-ratio guard above the 0.8 threshold") {
    import spark.implicits._
    val df = parquetPairs.filter(
      StringSimFunctions.jaro_winkler_similarity($"l", $"r") >= 0.9)
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("jaro_winkler_similarity"), optimized)
    assert(optimized.contains("least(length("), s"guard not injected:\n$optimized")
  }

  test("no guard at or below the vacuous 0.8 threshold") {
    import spark.implicits._
    val df = parquetPairs.filter(
      StringSimFunctions.jaro_winkler_similarity($"l", $"r") >= 0.8)
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!optimized.contains("least(length("), optimized)
  }

  test("guard is sound: filtered results identical with and without the rule") {
    import spark.implicits._
    val names = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .select($"p_name").distinct()
    val a = names.select($"p_name".as("n1"))
    val b = names.select($"p_name".as("n2"))
    val pairs = a.crossJoin(b).filter($"n1" < $"n2")
    val withRule = pairs
      .filter(StringSimFunctions.jaro_winkler_similarity($"n1", $"n2") >= 0.85)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // reference: evaluate the same predicate without the Filter node the rule
    // rewrites (project the score, filter on the projected column)
    val reference = pairs
      .select($"n1", $"n2",
        StringSimFunctions.jaro_winkler_similarity($"n1", $"n2").as("s"))
      .collect().filter(_.getDouble(2) >= 0.85)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(withRule == reference)
    assert(reference.nonEmpty)
  }
}
