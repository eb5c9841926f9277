package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join must be row-for-row identical to the plain equi-join. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("salted inner join == plain inner join") {
    val li = graft.Tables.lineitem(spark, sf).select("l_suppkey", "l_quantity")
    val sup = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val salted = SkewJoin.salted(li, sup, "l_suppkey", nSalts = 8)
    val plain = li.join(sup, Seq("l_suppkey"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    import spark.implicits._
    val fact = Seq((1, "a"), (2, "b"), (99, "c")).toDF("k", "v")
    val dim = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val salted = SkewJoin.salted(fact, dim, "k", nSalts = 4, joinType = "left")
    val plain = fact.join(dim, Seq("k"), "left")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.filter($"k" === 99).count() == 1)
  }

  test("unsupported join types are rejected") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(df, df, "k", nSalts = 2, joinType = "full")
    }
  }
}
