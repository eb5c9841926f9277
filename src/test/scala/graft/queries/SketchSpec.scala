package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural guarantees of the deterministically-checkable sketches in
  * [[SketchQ]], asserted on the sf0.001 tables: the t2 oracle pins exact
  * values; these tests pin the PROPERTIES that make the structures sketches
  * at all, so a future hash-family or width change that silently breaks a
  * guarantee fails here even if it stays self-consistent with its oracle. */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("count-min: every point estimate dominates the exact count") {
    val rows = SparkEntry.queries("agg_countmin_estimate")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("count-min: sketch mass equals d x stream length") {
    val ev = graft.Tables(spark, sfDir, "events").count()
    val mass = SparkEntry.queries("agg_countmin_sketch")(spark, sfDir)
      .groupBy("d").sum("cnt").collect()
    assert(mass.length == 4)
    mass.foreach(r => assert(r.getLong(1) == ev,
      s"each hash row must see the whole stream: $r vs $ev"))
  }

  test("bloom gate: no false negatives; maybe-rate stays below 50%") {
    val rows = SparkEntry.queries("dedup_bloom_gate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val fn = rows.filter(r =>
      r.getAs[Boolean]("actual") && !r.getAs[Boolean]("bloom_maybe"))
    assert(fn.isEmpty, s"bloom may never miss a member: ${fn.toSeq}")
    assert(rows.exists(_.getAs[Boolean]("actual")),
      "fixture injection must produce true members")
    val maybes = rows.count(_.getAs[Boolean]("bloom_maybe"))
    assert(maybes * 2 < rows.length,
      s"gate must actually prune: $maybes maybe of ${rows.length}")
  }

  test("systematic resampling: picks are weight-monotone and cover the range") {
    val rows = SparkEntry.queries("sample_systematic_importance")(spark, sfDir)
      .collect()
    assert(rows.length == 50, "one pick per position")
    val ts = rows.map(_.getAs[Long]("t"))
    assert(ts.sameElements(ts.sorted), "positions ascend")
    val picks = rows.map(_.getAs[Long]("doc_id"))
    assert(picks.sameElements(picks.sorted),
      "doc picks are monotone in position for an id-ordered cumsum")
  }
}
