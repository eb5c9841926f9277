package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Focused tests for the round-15 convergence early-exit (FixpointLoop):
  * the optimization must be invisible in results (bit-identical to running
  * the fixed round count) and visible only in the number of rounds run. */
class FixpointLoopSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("fixpoint-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("early-exits one round after the fixpoint, result identical to maxRounds") {
    import spark.implicits._
    // Monotone toy round: halve each value (integer div), floor at 1 —
    // fixpoint (all 1s) after 3 rounds from {8, 4, 2}.
    val init = Seq(8L, 4L, 2L).toDF("x")
    var steps = 0
    val out = FixpointLoop.iterate(init, 10,
      Seq(count(lit(1)), sum(col("x")))) { prev =>
      steps += 1
      prev.select(greatest(expr("x div 2"), lit(1L)).as("x")).localCheckpoint()
    }
    // values converge to 1 after round 3; round 4 confirms (signature equal)
    assert(steps == 4, s"expected 4 rounds (3 to converge + 1 confirm), ran $steps")
    assert(out.as[Long].collect().sorted.toSeq == Seq(1L, 1L, 1L))
  }

  test("never exceeds maxRounds when the loop does not converge") {
    import spark.implicits._
    val init = Seq(1L).toDF("x")
    var steps = 0
    val out = FixpointLoop.iterate(init, 3,
      Seq(count(lit(1)), sum(col("x")))) { prev =>
      steps += 1
      prev.select((col("x") + 1).as("x")).localCheckpoint() // never converges
    }
    assert(steps == 3)
    assert(out.as[Long].head() == 4L) // exactly 3 applications, as declared
  }

  test("CC early-exit result identical to the fixed 6 rounds on a shallow graph") {
    import spark.implicits._
    // Dense 2-cluster graph: converges in 1 round; the early-exit path and a
    // forced 6-round run must agree exactly.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("CC still converges on a deep path needing all 6 pointer-jump rounds") {
    import spark.implicits._
    // Diameter 119: early-exit must NOT fire before full convergence — the
    // signature keeps changing while any label is still decreasing.
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(chain).as[(Long, Long)].collect().toMap
    assert(got.size == 120 && got.values.forall(_ == 0L))
  }
}
