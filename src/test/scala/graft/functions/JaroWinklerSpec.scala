package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    StringSimFunctions.register(s)
    s
  }

  // Reference values probed from DuckDB jaro_similarity / jaro_winkler_similarity
  // (the oracle engine) — the implementation must agree to strictly tighter than
  // the query-level rounding (1e-9).
  private val cases = Seq(
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
    ("", "", 0.0, 0.0),
    ("a", "", 0.0, 0.0),
    ("abc", "abc", 1.0, 1.0),
    ("dwayne", "duane", 0.8222222222222223, 0.8400000000000001),
    ("ab", "ba", 0.0, 0.0),
    ("abcdef", "fedcba", 0.38888888888888884, 0.38888888888888884),
    ("supplier#000000001", "supplier#000000010", 0.9814814814814815, 0.9888888888888889),
    ("x", "y", 0.0, 0.0),
    ("ab", "abcdefghij", 0.7333333333333334, 0.7866666666666667))

  test("jaro / jaro-winkler match the DuckDB reference values") {
    for ((a, b, j, jw) <- cases) {
      assert(math.abs(JaroWinklerImpl.jaro(a, b) - j) < 1e-12,
        s"jaro($a, $b): got ${JaroWinklerImpl.jaro(a, b)}, want $j")
      assert(math.abs(JaroWinklerImpl.jaroWinkler(a, b) - jw) < 1e-12,
        s"jw($a, $b): got ${JaroWinklerImpl.jaroWinkler(a, b)}, want $jw")
    }
  }

  test("symmetry: jw(a,b) == jw(b,a) on the reference pairs") {
    for ((a, b, _, _) <- cases) {
      assert(JaroWinklerImpl.jaroWinkler(a, b) == JaroWinklerImpl.jaroWinkler(b, a))
      assert(JaroWinklerImpl.jaro(a, b) == JaroWinklerImpl.jaro(b, a))
    }
  }

  test("SQL-registered expressions evaluate inside codegen and handle nulls") {
    val df = spark.sql(
      """SELECT jaro_similarity('martha', 'marhta') AS j,
        |       jaro_winkler_similarity('dixon', 'dicksonx') AS jw,
        |       jaro_winkler_similarity(CAST(NULL AS STRING), 'x') AS jn""".stripMargin)
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 0.9444444444444445) < 1e-12)
    assert(math.abs(row.getDouble(1) - 0.8133333333333332) < 1e-12)
    assert(row.isNullAt(2))
  }
}
