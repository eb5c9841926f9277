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

  // VERDICT r12 ask #8 pins: the AQE adjudication made salting fallback-only.
  // (1) PlanLint's detector and SkewJoin's injected column stay in sync — if
  // either renames, the salted-join gate would silently stop seeing plans.
  test("PlanLint detects the salt column SkewJoin actually injects") {
    import spark.implicits._
    val fact = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val dim = Seq((1, "x")).toDF("k", "w")
    val plan = SkewJoin.salted(fact, dim, "k", nSalts = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains(graft.tools.PlanLint.SaltColName),
      "SkewJoin's salt column no longer matches PlanLint.SaltColName — " +
        "the salted-join gate is blind")
  }

  // (2) The batch allowlist is exactly the demo query: any other batch plan
  // routing through SkewJoin.salted must fail the gate (streaming joins are
  // the operator's only production context — AQE cannot re-plan micro-batches).
  test("salted-join allowlist is the single sanctioned demo query") {
    assert(graft.tools.PlanLint.sanctionedSalted == Set("join_skew_salted"))
    val v = graft.tools.PlanLint.saltViolations(
      Set("join_skew_salted", "some_other_query"), ran = Set.empty, fullRun = true)
    assert(v.exists(_.startsWith("UNSANCTIONED-SALTED-JOIN some_other_query")))
    assert(!v.exists(_.contains("join_skew_salted")))
    val stale = graft.tools.PlanLint.saltViolations(
      Set.empty, ran = Set.empty, fullRun = true)
    assert(stale.exists(_.startsWith("STALE-SALT-SANCTION join_skew_salted")))
  }
}
