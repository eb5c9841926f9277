package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming correctness = equivalence with the batch expressions on the same data:
  * a parquet-backed stream drained through a memory sink must agree with the batch
  * DataFrame result (the DuckDB oracle covers the batch side in t2). */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def batchEvents = graft.Tables.events(spark, sf)

  test("tumbling window counts: stream == batch") {
    val got = Streaming.runToMemory(spark,
      Streaming.tumblingCounts(Streaming.eventsStream(spark, sf), "10 minutes",
        "1 minute"),
      "t_tumbling", OutputMode.Complete())
    val want = batchEvents
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("session windows: stream == batch") {
    val got = Streaming.runToMemory(spark,
      Streaming.sessionAgg(Streaming.eventsStream(spark, sf), "30 minutes", "1 minute"),
      "t_session", OutputMode.Complete())
    val want = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("total"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("dropDuplicatesWithinWatermark keeps one row per key") {
    val got = Streaming.runToMemory(spark,
      Streaming.dedupWithinWatermark(Streaming.eventsStream(spark, sf), "10 minutes"),
      "t_dedup", OutputMode.Append())
    val keys = batchEvents.select("user_id", "event_type").distinct().count()
    assert(got.count() == keys)
    assert(got.select("user_id", "event_type").distinct().count() == keys)
  }

  test("stream-static broadcast join: stream == batch") {
    val dim = graft.Tables.customer(spark, sf)
    val got = Streaming.runToMemory(spark,
      Streaming.streamStaticJoin(Streaming.eventsStream(spark, sf), dim),
      "t_ssjoin", OutputMode.Complete())
    val want = batchEvents.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_events"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("stream-stream LEFT-OUTER join: stream == batch on the mature region") {
    val got = Streaming.runToMemory(spark,
      Streaming.streamStreamClickBuyOuter(Streaming.eventsStream(spark, sf),
        "10 minutes", "1 minute"),
      "t_sstream_outer", OutputMode.Append())
    val e = batchEvents
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val want = clicks.join(buys,
      col("user_id") === col("b_user") &&
      col("buy_ts") >= col("click_ts") &&
      col("buy_ts") <= col("click_ts") + expr("interval 10 minutes"),
      "leftOuter")
      .select(col("user_id"), col("click_id"), col("click_ts"), col("buy_id"))
    // Null emission happens on state eviction: a click can only prove "no match"
    // once the final watermark passes click_ts + 10 min. The global watermark is the
    // MIN across both input streams of (per-stream max event time - 1 min delay) —
    // at this sparse scale the last purchase can trail the last click by a long gap,
    // so the horizon derives from the min-of-maxes, with a 12-min pullback
    // (1 min delay + 10 min window + 1 min boundary margin). Younger clicks are
    // still in state when the finite stream ends; equivalence holds on the mature
    // region only.
    val maxPerStream = batchEvents
      .agg(max(when(col("event_type") === "click", col("ts"))).as("mc"),
        max(when(col("event_type") === "purchase", col("ts"))).as("mb"))
      .head()
    val horizon = new java.sql.Timestamp(
      math.min(maxPerStream.getTimestamp(0).getTime,
        maxPerStream.getTimestamp(1).getTime) - 12 * 60 * 1000L)
    val gotMature = got.filter(col("click_ts") < lit(horizon))
    val wantMature = want.filter(col("click_ts") < lit(horizon))
    assert(gotMature.count() == wantMature.count() && gotMature.count() > 0)
    assert(gotMature.except(wantMature).isEmpty &&
      wantMature.except(gotMature).isEmpty)
    // and the outer semantics actually fired: some mature clicks carry a NULL buy
    assert(gotMature.filter(col("buy_id").isNull).count() > 0)
  }

  test("stream-stream time-bounded join: stream == batch") {
    val got = Streaming.runToMemory(spark,
      Streaming.streamStreamClickBuy(Streaming.eventsStream(spark, sf),
        "10 minutes", "1 minute"),
      "t_sstream", OutputMode.Append())
    val e = batchEvents
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val want = clicks.join(buys,
      col("user_id") === col("b_user") &&
      col("buy_ts") >= col("click_ts") &&
      col("buy_ts") <= col("click_ts") + expr("interval 10 minutes"))
      .select(col("user_id"), col("click_id"), col("buy_id"))
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("chained stateful operators: join → windowed agg matches batch on mature region") {
    val got = Streaming.runToMemory(spark,
      Streaming.chainedClickBuyWindowCounts(Streaming.eventsStream(spark, sf),
        "10 minutes", "1 minute", "15 minutes"),
      "t_chained", OutputMode.Append())
    val e = batchEvents
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("buy_ts"))
    val want = clicks.join(buys,
        col("user_id") === col("b_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("interval 10 minutes"))
      .groupBy(window(col("click_ts"), "15 minutes"))
      .agg(count(lit(1)).as("n_conv"))
      .select(col("window.start").as("wstart"), col("n_conv"))
    // every emitted window must equal its batch twin exactly...
    val matched = got.as("g").join(want.as("w"), Seq("wstart"))
      .filter(col("g.n_conv") === col("w.n_conv"))
    assert(got.count() > 0)
    assert(matched.count() == got.count())
    // ...and most of the batch windows must have matured past the final watermark
    // (only the tail windows the final watermark hasn't passed may be withheld)
    assert(got.count() >= want.count() - 3)
  }

  test("foreachBatch idempotent sink: union of batch dirs == input exactly once") {
    val out = java.nio.file.Files.createTempDirectory("fb_sink").toString
    val q = Streaming.foreachBatchIdempotent(
        Streaming.eventsStream(spark, sf).select(
          col("event_id"), col("user_id"), col("value")),
        out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/_ckpt")
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/batch=*")
    val want = batchEvents.select(col("event_id"), col("user_id"), col("value"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("mapGroupsWithState running totals converge to batch totals") {
    val got = Streaming.runToMemory(spark,
      Streaming.runningUserTotals(spark, Streaming.eventsStream(spark, sf)).toDF(),
      "t_state", OutputMode.Update())
    // update mode emits one row per key per batch; the last emission per key must
    // equal the batch aggregate
    val last = got.groupBy("user_id").agg(max(col("n")).as("n"))
    val want = batchEvents.groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("wn"))
    val joined = last.join(want, last("user_id") === want("uid"))
    assert(joined.filter(col("n") =!= col("wn")).isEmpty)
  }

  test("flatMapGroupsWithState high-water marks == batch running-max filter") {
    import org.apache.spark.sql.expressions.Window
    val got = Streaming.runToMemory(spark,
      Streaming.userHighWaterMarks(spark, Streaming.eventsStream(spark, sf)).toDF(),
      "t_hwm", OutputMode.Append())
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = batchEvents.withColumn("pm", max(col("value")).over(w))
      .filter(col("pm").isNull || col("value") > col("pm"))
      .select(col("user_id"), col("event_id"), col("value"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("transformWithState running peaks converge to batch aggregates") {
    val got = Streaming.runToMemory(spark,
      Streaming.runningUserPeaks(spark, Streaming.eventsStream(spark, sf)).toDF(),
      "t_tws", OutputMode.Update())
    // update mode emits one row per key per batch; the final n/peak per key must
    // equal the batch count/max
    val last = got.groupBy("user_id")
      .agg(max(col("n")).as("n"), max(col("peak")).as("peak"))
    val want = batchEvents.groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("wn"), max(col("value")).as("wpeak"))
    val joined = last.join(want, last("user_id") === want("uid"))
    assert(joined.filter(col("n") =!= col("wn") || col("peak") =!= col("wpeak")).isEmpty)
    assert(last.count() == want.count())
  }

  test("transformWithState ListState/MapState converge to batch top-3 + type counts") {
    val got = Streaming.runToMemory(spark,
      Streaming.runningUserTopTypes(spark, Streaming.eventsStream(spark, sf)).toDF(),
      "t_tws_list", OutputMode.Update())
    // update mode emits one row per key per batch — the row with the HIGHEST
    // state version is the converged one (n_types alone can plateau while top3
    // still changes across batches, so it is not a safe selector)
    val last = got.groupBy("user_id").agg(
      max_by(col("n_types"), col("ver")).as("n_types"),
      max_by(col("top3"), col("ver")).as("top3"))
    val wantTypes = batchEvents.groupBy(col("user_id").as("uid"))
      .agg(countDistinct(col("event_type")).as("wn"))
    val joined = last.join(wantTypes, last("user_id") === wantTypes("uid"))
    assert(joined.filter(col("n_types") =!= col("wn")).isEmpty)
    // top3 must equal the batch top-3 values per user (order-insensitive state)
    import spark.implicits._
    val wantTop = batchEvents
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .collect().groupBy(_._1).map { case (u, vs) =>
        u -> vs.map(_._2).sorted(Ordering[Double].reverse).take(3)
          .map(v => f"$v%.3f").mkString("|")
      }
    val gotTop = last.select(col("user_id"), col("top3")).as[(Long, String)]
      .collect().toMap
    assert(gotTop == wantTop)
  }

  test("parquet streaming sink writes append results with checkpoint") {
    val out = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Streaming.runToParquet(
      Streaming.tumblingCounts(Streaming.eventsStream(spark, sf), "10 minutes",
        "0 seconds"),
      s"$out/data", s"$out/ckpt")
    // with watermark=0 and a drained finite source, windows older than the max ts
    // are finalized; at least some rows must have been emitted
    val rows = spark.read.parquet(s"$out/data")
    assert(rows.columns.toSet == Set("wstart", "event_type", "n", "total"))
  }

  test("transformWithState event-time timers: sessions emit on close or watermark") {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    val got = Streaming.runToMemory(spark,
      Streaming.timerSessions(spark, Streaming.eventsStream(spark, sf), gapMs,
        "0 seconds").toDF(),
      "t_timer_sessions", OutputMode.Append())
      .as[(Long, Long, Long, Long)].collect().toSet
    // batch mimic: gap-sessionize the same events in-memory (sf0.001 is small)
    val ev = batchEvents.select($"user_id", unix_millis($"ts").as("ms"))
      .as[(Long, Long)].collect()
    val maxTs = ev.map(_._2).max
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ts = rows.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var start = ts.head; var last = ts.head; var n = 0L
      ts.foreach { t =>
        if (n > 0 && t - last > gapMs) { out += ((uid, start, last, n)); start = t; n = 0 }
        last = t; n += 1
      }
      out += ((uid, start, last, n))
      out
    }.toSet
    val provablyClosed = sessions.filter { case (_, _, end, _) => end + gapMs < maxTs }
    assert(got.subsetOf(sessions),
      s"emitted a session the batch mimic doesn't have: ${got.diff(sessions).take(3)}")
    assert(provablyClosed.subsetOf(got),
      s"missed provably-closed sessions: ${provablyClosed.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("timer sessions: late events inside the watermark merge, split, and bridge") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2020-01-01 $hhmm:00")
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = Streaming.timerSessions(spark,
      in.toDF().toDF("user_id", "ts"), gapMs = 30L * 60 * 1000, "1 hour").toDF()
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t_late_sessions").start()
    try {
      // batch 1: 10:00 and 10:45 look like TWO sessions (gap 45 min > 30 min) —
      // but the watermark is far behind, so nothing may be emitted yet
      in.addData((1L, ts("10:00")), (1L, ts("10:45")))
      q.processAllAvailable()
      assert(spark.table("t_late_sessions").count() == 0,
        "emitted before the watermark could rule out late extensions")
      // batch 2: a LATE 10:20 event (legal: above watermark) BRIDGES them into
      // one session; 14:00 advances the watermark to 13:00, finalizing it
      in.addData((1L, ts("10:20")), (1L, ts("14:00")))
      q.processAllAvailable()
      val got = spark.table("t_late_sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, ts("10:00").getTime, ts("10:45").getTime, 3L)), got)
    } finally q.stop()
  }

  test("checkpoint restart: exactly-once across stop, new data, resume") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val ev = batchEvents.select($"event_id", $"user_id", $"value")
    val total = ev.count()
    // phase 1: half the events land, the query drains them and STOPS
    ev.filter($"event_id" % 2 === 0).write.parquet(in)
    def stream = spark.readStream.schema(ev.schema).parquet(in)
      .withColumn("doubled", $"value" * 2)
    Streaming.runToParquet(stream, out, ckpt)
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0 && n1 < total)
    // phase 2: new files arrive while the query is DOWN; a fresh query instance
    // on the same checkpoint must resume from the file-source log — processing
    // only the new files (no replay of phase 1) and missing none of them
    ev.filter($"event_id" % 2 === 1).write.mode("append").parquet(in)
    Streaming.runToParquet(stream, out, ckpt)
    val result = spark.read.parquet(out)
    assert(result.count() == total) // no loss
    assert(result.select("event_id").distinct().count() == total) // no duplicates
  }

  test("foreachBatch sink under Trigger.AvailableNow: upsert handler sees every batch") {
    val store = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val batchIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    Streaming.runForeachBatch(
      Streaming.eventsStream(spark, sf)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      OutputMode.Complete()) { (batch, id) =>
      batchIds.add(id)
      // MERGE-style upsert into an external store: complete mode replays the full
      // aggregate, so put() is the idempotent apply
      batch.collect().foreach(r => store.put(r.getString(0), r.getLong(1)))
    }
    val want = batchEvents.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!batchIds.isEmpty)
    assert(want.forall { case (k, v) => store.get(k) == v })
  }
}
