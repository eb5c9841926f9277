package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SketchFunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SketchFunctions.register(s)
    s
  }

  test("bloom prefilter has no false negatives (every inserted key passes)") {
    spark.range(0, 1000).createOrReplaceTempView("keys")
    val misses = spark.sql(
      """SELECT COUNT(*) AS n FROM keys
        |WHERE NOT graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(id),
        |          CAST(1000 AS BIGINT), CAST(16384 AS BIGINT)) FROM keys),
        |  xxhash64(id))""".stripMargin).head().getLong(0)
    assert(misses == 0L, s"bloom dropped $misses inserted keys")
  }

  test("bloom prefilter + exact semi-join equals the plain semi-join") {
    spark.range(0, 2000).createOrReplaceTempView("fact")
    spark.range(0, 2000).filter("id % 37 = 0").createOrReplaceTempView("dim")
    val filtered = spark.sql(
      """SELECT COUNT(*) AS n FROM (
        |  SELECT id FROM fact
        |  WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(id),
        |            CAST(100 AS BIGINT), CAST(8192 AS BIGINT)) FROM dim),
        |    xxhash64(id))) f
        |LEFT SEMI JOIN dim d ON f.id = d.id""".stripMargin).head().getLong(0)
    val exact = spark.sql(
      "SELECT COUNT(*) FROM fact f LEFT SEMI JOIN dim d ON f.id = d.id")
      .head().getLong(0)
    assert(filtered == exact)
  }

  test("bloom prefilter actually prunes (selectivity below 1)") {
    spark.range(0, 10000).createOrReplaceTempView("fact2")
    spark.range(0, 10000).filter("id % 100 = 0").createOrReplaceTempView("dim2")
    val kept = spark.sql(
      """SELECT COUNT(*) FROM fact2
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(id),
        |          CAST(100 AS BIGINT), CAST(16384 AS BIGINT)) FROM dim2),
        |  xxhash64(id))""".stripMargin).head().getLong(0)
    // 100 true keys; a healthy bloom at these parameters keeps well under 5%.
    assert(kept >= 100 && kept < 500, s"bloom kept $kept of 10000")
  }

  test("KLL sketch quantiles land within the sketch's rank-error bound") {
    KllFunctions.register(spark)
    spark.range(0, 20000).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kll_vals")
    val r = spark.sql(
      """SELECT kll_quantile(kll_sketch_agg(v), 0.5D) AS p50,
        |       kll_quantile(kll_sketch_agg(v), 0.99D) AS p99
        |FROM kll_vals""".stripMargin).head()
    // k=200 → normalized rank error ~1.65%; allow 2.5% of the 20k range
    assert(math.abs(r.getDouble(0) - 10000.0) < 500, r.toString)
    assert(math.abs(r.getDouble(1) - 19800.0) < 500, r.toString)
  }

  test("KLL merge of per-part sketches agrees with the whole-data sketch") {
    KllFunctions.register(spark)
    spark.range(0, 20000).selectExpr("CAST(id AS DOUBLE) AS v", "id % 4 AS part")
      .createOrReplaceTempView("kll_parts")
    val merged = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5D) AS p50 FROM (
        |  SELECT kll_sketch_agg(v) AS sk FROM kll_parts GROUP BY part)""".stripMargin)
      .head().getDouble(0)
    // merged per-part sketches must estimate the same median as one global pass
    assert(math.abs(merged - 10000.0) < 600, s"merged p50=$merged")
  }

  test("KLL sketch is null-safe and empty-safe") {
    KllFunctions.register(spark)
    spark.sql("SELECT CAST(NULL AS DOUBLE) AS v WHERE 1=0")
      .createOrReplaceTempView("kll_empty")
    val r = spark.sql(
      "SELECT kll_sketch_agg(v) AS sk FROM kll_empty").head()
    assert(r.isNullAt(0)) // empty input → null sketch, not a crash
  }
}
