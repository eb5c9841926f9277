package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LevenshteinPrefilterSpec extends AnyFunSuite {

  private lazy val spark = {
    // extraOptimizations works on an already-built session (withExtensions is
    // silently ignored when getOrCreate returns another suite's session)
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(LevenshteinPrefilter))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ LevenshteinPrefilter
    s
  }

  private def pairs = {
    import spark.implicits._
    Seq(("kitten", "sitting"), ("abcdef", "abcdefghijklmnop"),
      ("same", "same"), ("a", "aaaaaaaaaaaaaaaaaaaaa"))
      .toDF("l", "r")
  }

  test("rule injects the length-delta guard into levenshtein filters") {
    // parquet-backed, not a local Seq — ConvertToLocalRelation would otherwise
    // evaluate the deterministic filter away before the plan can be inspected
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(substring($"text", 1, 20).as("l"), substring($"text", 5, 20).as("r"))
    val df = docs.filter(expr("levenshtein(l, r) <= 3"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("levenshtein"), optimized)
    assert(optimized.contains("abs((length("),
      s"guard not injected:\n$optimized")
  }

  test("rewrite preserves results exactly") {
    import spark.implicits._
    val got = pairs.filter(expr("levenshtein(l, r) <= 3"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("kitten", "sitting"), ("same", "same")))
  }

  test("rule is idempotent (one guard, even after repeated optimization)") {
    val df = pairs.filter(expr("levenshtein(l, r) <= 3"))
    val once = LevenshteinPrefilter(df.queryExecution.optimizedPlan)
    val twice = LevenshteinPrefilter(once)
    assert(once == twice)
  }

  test("thresholded 3-arg levenshtein is NOT rewritten (returns -1 over threshold)") {
    import spark.implicits._
    // levenshtein(l, r, 3) = -1 for the wide pairs, and -1 <= 10 is TRUE: vanilla
    // Spark keeps all rows. A length-delta <= 10 guard would wrongly drop
    // ("a", 21×"a") — so the rule must not touch the thresholded form.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(substring($"text", 1, 4).as("l"),
        concat(substring($"text", 1, 1), lit("x" * 20)).as("r"))
    val df = docs.filter(expr("levenshtein(l, r, 3) <= 10"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!optimized.contains("abs((length("),
      s"unsound guard injected on thresholded form:\n$optimized")
    val got = pairs.filter(expr("levenshtein(l, r, 3) <= 10")).count()
    assert(got == pairs.count()) // every row: distance <= 3 or -1, both <= 10
  }
}
