package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("NFC composes decomposed sequences and is identity on ASCII") {
    import spark.implicits._
    val df = Seq(
      ("e\u0301le\u0300ve", "\u00e9l\u00e8ve"), // decomposed -> composed
      ("plain ascii", "plain ascii"),
      ("caf\u00e9", "caf\u00e9") // already NFC: untouched
    ).toDF("raw", "want")
      .withColumn("got", UnicodeNormalize.nfc_normalize($"raw"))
    assert(df.filter($"got" =!= $"want").count() === 0)
    // composition shrinks code-point length
    val lens = df.select(length($"raw").as("lr"), length($"got").as("lg"))
      .head()
    assert(lens.getInt(0) === 7 && lens.getInt(1) === 5)
  }

  test("NFKC folds compatibility forms (full-width, ligature, circled digit)") {
    import spark.implicits._
    val got = Seq("Ｈｅｌｌｏ ﬁne ①")
      .toDF("raw")
      .select(UnicodeNormalize.nfkc_normalize($"raw").as("g"))
      .head().getString(0)
    assert(got === "Hello fine 1")
  }

  test("SQL registry: nfc_normalize usable from spark.sql") {
    UnicodeNormalize.register(spark)
    val got = spark.sql("SELECT nfc_normalize('e\u0301') AS n")
      .head().getString(0)
    assert(got === "\u00e9")
  }

  test("null propagates; expression stays codegen-eligible") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "ok"))
      .toDF("id", "s")
      .select($"id", UnicodeNormalize.nfc_normalize($"s").as("n"))
    assert(df.filter($"n".isNull).count() === 1)
    // no CodegenFallback: the generated plan should not mention fallback mode
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Fallback"))
  }
}
