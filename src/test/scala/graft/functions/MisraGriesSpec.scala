package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("heavy items survive the sketch across partitioned partial aggregation") {
    import spark.implicits._
    // 'heavy' has share 1/3 > 1/(k+1) for k = 8 — guaranteed in the summary no
    // matter how Spark partitions and merges; fillers dilute the counters.
    val rows = (1 to 4000).map { i =>
      if (i % 3 == 0) "heavy" else s"filler${i % 997}"
    }
    val cands = rows.toDF("item")
      .repartition(7) // force multiple partial buffers + merges
      .agg(MisraGriesFunctions.mg_topk_candidates($"item", 8).as("c"))
      .head().getSeq[String](0)
    assert(cands.contains("heavy"), s"candidates: $cands")
    assert(cands.size <= 8)
  }

  test("candidate array is sorted and bounded by k") {
    import spark.implicits._
    val rows = (1 to 500).map(i => s"v${i % 40}")
    val cands = rows.toDF("item")
      .agg(MisraGriesFunctions.mg_topk_candidates($"item", 5).as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 5)
    assert(cands == cands.sorted)
  }
}
