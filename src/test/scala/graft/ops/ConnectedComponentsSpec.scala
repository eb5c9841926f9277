package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("cc-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def components(edges: Seq[(Long, Long)], rounds: Int = 6): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap
  }

  test("two separate triangles resolve to their min ids") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("a 120-vertex path converges within 6 rounds (pointer jumping)") {
    // Diameter 119 >> 6: plain min propagation would need 119 rounds; the
    // pointer-jump composition must cover it in 6 (reach ≥ 2^6 − 1 = 63 per
    // endpoint growing from both directions of the chain).
    val chain = (0L until 119L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 120 && got.values.forall(_ == 0L))
  }

  test("bridge vertex merges two clusters") {
    val got = components(Seq((5L, 6L), (7L, 8L), (6L, 7L)))
    assert(got.values.toSet == Set(5L))
  }
}
