package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multi-bucket coverage for events_rolling_distinct_users: the sf test data's
  * user ids all land in ONE 32768-wide bitmap bucket, so the DuckDB oracle can
  * never catch the sparse-(bucket, day)-grid bug — a bucket with no events on a
  * day must still contribute its earlier-in-window users to that day's total. */
class RollingDistinctSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("buckets inactive on a day still count their in-window users") {
    import spark.implicits._
    // user 1 → bucket 1; user 40000 → bucket 2 (32768-wide buckets).
    // day 1: both active. days 2-3: only user 1 active.
    val rows = Seq(
      ("2020-01-01 10:00:00", 1L), ("2020-01-01 11:00:00", 40000L),
      ("2020-01-02 10:00:00", 1L),
      ("2020-01-03 10:00:00", 1L))
    rows.toDF("s", "user_id").selectExpr("CAST(s AS TIMESTAMP) AS ts", "user_id")
      .createOrReplaceTempView("rd_multi")
    val got = spark.sql(Analytics.rollingDistinctSql("rd_multi"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    // user 40000 stays inside the 7-day window on all three days even though
    // bucket 2 has no events after day 1
    assert(got == Seq(("2020-01-01", 2L), ("2020-01-02", 2L), ("2020-01-03", 2L)),
      got.toString)
  }

  test("window actually expires: activity 8 days earlier no longer counts") {
    import spark.implicits._
    val rows = Seq(
      ("2020-01-01 10:00:00", 40000L),
      ("2020-01-09 10:00:00", 1L))
    rows.toDF("s", "user_id").selectExpr("CAST(s AS TIMESTAMP) AS ts", "user_id")
      .createOrReplaceTempView("rd_expire")
    val got = spark.sql(Analytics.rollingDistinctSql("rd_expire"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(got == Seq(("2020-01-01", 1L), ("2020-01-09", 1L)), got.toString)
  }
}
