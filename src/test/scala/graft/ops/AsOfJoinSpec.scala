package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Union-merge as-of join semantics: inclusive boundary, same-time tie-break
  * (highest tie-break wins), left-outer nulls, key isolation. */
class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks most recent right row at-or-before each left time, per key") {
    import spark.implicits._
    val quotes = Seq( // key, time, qid, px
      (1L, ts("2024-01-01 10:00:00"), 100L, 5.0),
      (1L, ts("2024-01-01 10:05:00"), 101L, 6.0),
      (2L, ts("2024-01-01 10:01:00"), 200L, 9.0))
      .toDF("sym", "qt", "qid", "px")
    val trades = Seq( // key, time, trade id
      (1L, ts("2024-01-01 10:00:00"), 1L), // inclusive: matches the 10:00 quote
      (1L, ts("2024-01-01 10:04:59"), 2L), // before the 10:05 quote → still 100
      (1L, ts("2024-01-01 10:05:00"), 3L), // inclusive at 10:05 → 101
      (2L, ts("2024-01-01 10:00:00"), 4L), // no quote yet for key 2 → nulls
      (3L, ts("2024-01-01 12:00:00"), 5L)) // key never quoted → nulls
      .toDF("sym", "tt", "tid")
    val got = AsOfJoin.asof(trades, quotes,
        leftKey = "sym", rightKey = "sym", leftTime = "tt", rightTime = "qt",
        rightTieBreak = "qid", payload = Seq("qid", "px"))
      .orderBy("tid")
      .select("tid", "qid", "px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (1L, Some(100L), Some(5.0)),
      (2L, Some(100L), Some(5.0)),
      (3L, Some(101L), Some(6.0)),
      (4L, None, None),
      (5L, None, None)))
  }

  test("same-time right rows: highest tie-break wins (matches window DESC pick)") {
    import spark.implicits._
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 09:00:00"), 11L, 2.0)) // same time, higher id wins
      .toDF("k", "rt", "rid", "v")
    val left = Seq((1L, ts("2024-01-01 09:30:00"), 77L)).toDF("k", "lt", "lid")
    val got = AsOfJoin.asof(left, right, "k", "k", "lt", "rt", "rid", Seq("rid", "v"))
      .select("rid", "v").head()
    assert(got.getLong(0) == 11L && got.getDouble(1) == 2.0)
  }

  test("forward: picks earliest right row at-or-after each left time, per key") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 5.0),
      (1L, ts("2024-01-01 10:05:00"), 101L, 6.0),
      (2L, ts("2024-01-01 10:01:00"), 200L, 9.0))
      .toDF("sym", "qt", "qid", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L), // inclusive: matches the 10:00 quote
      (1L, ts("2024-01-01 10:00:01"), 2L), // next is the 10:05 quote
      (1L, ts("2024-01-01 10:05:00"), 3L), // inclusive at 10:05 → 101
      (1L, ts("2024-01-01 10:05:01"), 4L), // nothing after → nulls
      (2L, ts("2024-01-01 10:30:00"), 5L)) // key 2's only quote is earlier → nulls
      .toDF("sym", "tt", "tid")
    val got = AsOfJoin.asofForward(trades, quotes,
        leftKey = "sym", rightKey = "sym", leftTime = "tt", rightTime = "qt",
        rightTieBreak = "qid", payload = Seq("qid", "px"))
      .orderBy("tid")
      .select("tid", "qid", "px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (1L, Some(100L), Some(5.0)),
      (2L, Some(101L), Some(6.0)),
      (3L, Some(101L), Some(6.0)),
      (4L, None, None),
      (5L, None, None)))
  }

  test("forward: same-time right rows: lowest tie-break wins") {
    import spark.implicits._
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 09:00:00"), 11L, 2.0)) // same time, lower id wins
      .toDF("k", "rt", "rid", "v")
    val left = Seq((1L, ts("2024-01-01 08:00:00"), 77L)).toDF("k", "lt", "lid")
    val got = AsOfJoin.asofForward(left, right, "k", "k", "lt", "rt", "rid",
      Seq("rid", "v")).select("rid", "v").head()
    assert(got.getLong(0) == 10L && got.getDouble(1) == 1.0)
  }

  test("agrees with the equi-join + window formulation on real tables") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val e = graft.Tables(spark, sf, "events").select($"event_id", $"ts", $"user_id")
    val o = graft.Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
    val viaOp = AsOfJoin.asof(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        "o_orderkey", Seq("o_orderkey", "o_totalprice"))
      .select($"event_id", $"o_orderkey", $"o_totalprice")
    val joined = e.join(o,
      e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"), "left")
    val w = Window.partitionBy($"event_id")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val viaJoin = joined.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_id", $"o_orderkey", $"o_totalprice")
    assert(viaOp.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaOp).isEmpty)
  }
}
