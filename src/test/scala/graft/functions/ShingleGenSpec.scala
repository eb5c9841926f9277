package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleGenSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    ShingleGen.register(s)
    s
  }

  test("shingle_gen matches the materializing posexplode(transform(...)) formulation") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 100)
      .select($"doc_id", graft.llm.TextFunctions.tokens($"text").as("tk"))
    docs.createOrReplaceTempView("sg_docs")

    val viaGen = spark.sql(
      """SELECT doc_id, pos, shingle
        |FROM sg_docs LATERAL VIEW shingle_gen(tk, 3) g AS pos, shingle""".stripMargin)

    val viaHof = docs
      .select($"doc_id", posexplode(expr(
        """CASE WHEN size(tk) >= 3
          |  THEN transform(sequence(0, size(tk) - 3),
          |         i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))
          |  ELSE array() END""".stripMargin)))
      .toDF("doc_id", "pos", "shingle")

    assert(viaGen.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaGen).isEmpty)
    assert(viaGen.count() > 0)
  }

  test("short and empty token arrays generate no rows; width > size is safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, Seq("x", "y", "z"))
    ).toDF("id", "tk")
    df.createOrReplaceTempView("sg_edge")
    val rows = spark.sql(
      "SELECT id, pos, shingle FROM sg_edge LATERAL VIEW shingle_gen(tk, 3) g AS pos, shingle")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((3L, 0, "x y z")))
  }

  test("null ELEMENTS are skipped, not NPE'd; positions keep original indexing") {
    import spark.implicits._
    val df = Seq((1L, Seq(Some("a"), None, Some("b"), Some("c"), Some("d"))))
      .toDF("id", "tk")
    df.createOrReplaceTempView("sg_nullelem")
    val rows = spark.sql(
      "SELECT pos, shingle FROM sg_nullelem LATERAL VIEW shingle_gen(tk, 3) g AS pos, shingle")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // windows at pos 0 and 1 contain the null token and are skipped
    assert(rows == Seq((2, "b c d")))
  }

  test("null token array generates no rows (outer view yields the null row)") {
    import spark.implicits._
    val df = Seq((1L, Option(Seq("a", "b", "c", "d"))), (2L, None))
      .toDF("id", "tk")
    df.createOrReplaceTempView("sg_null")
    val inner = spark.sql(
      "SELECT id FROM sg_null LATERAL VIEW shingle_gen(tk, 3) g AS pos, shingle")
    assert(inner.collect().map(_.getLong(0)).toSeq == Seq(1L, 1L))
    val outer = spark.sql(
      "SELECT id, pos FROM sg_null LATERAL VIEW OUTER shingle_gen(tk, 3) g AS pos, shingle")
    assert(outer.count() == 3) // 2 shingles for id=1 + the preserved null row for id=2
  }
}
