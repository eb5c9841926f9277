package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Event-table queries: JSON extraction and the batch-equivalents of the streaming
  * operator surface (SURVEY.md §2b "Streaming"). Each windowing query here uses the
  * exact same expressions a Structured Streaming job would (`window`, `session_window`)
  * — the streaming wiring itself (watermarks, output modes, state) lives in
  * graft.streaming and is exercised by ScalaTest with a memory sink, since a DuckDB
  * oracle can only check the time/window semantics, which batch execution shares. */
object EventsQ {

  val queries: Seq[Q] = Seq(
    Q("events_json_extract",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events").filter($"event_id" < 2000)
          .select($"event_id",
            get_json_object($"props", "$.k").as("k_str"),
            from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
              .getField("k").as("k_int"),
            json_tuple($"props", "k").as("k_tup"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
             |  json_extract_string(props, '$.k') AS k_str,
             |  CAST(json_extract(props, '$.k') AS INT) AS k_int,
             |  json_extract_string(props, '$.k') AS k_tup
             |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin)),

    Q("stream_tumbling_batch",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
          .select($"w.start".as("wstart"), $"event_type", $"n", $"total")
          .orderBy($"wstart", $"event_type")
      },
      Some(s"""SELECT make_timestamp(CAST(floor(epoch(ts)/600) AS BIGINT)*600*1000000) AS wstart,
              |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("stream_sliding_batch",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select($"w.start".as("wstart"), $"event_type", $"n")
          .orderBy($"wstart", $"event_type")
      },
      Some("""SELECT make_timestamp((CAST(floor((epoch(ts) - off)/600) AS BIGINT)*600 + off)
             |         * 1000000) AS wstart,
             |  event_type, COUNT(*) AS n
             |FROM events CROSS JOIN (VALUES (0), (300)) offs(off)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Session windows (30 min gap) per user. Spark semantics: a session is [first,
    // last+gap); an event at exactly prev_ts+gap starts a new session.
    Q("stream_session_batch",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
          .select($"user_id", $"w.start".as("session_start"), $"n", $"total")
          .orderBy($"user_id", $"session_start")
      },
      Some(s"""WITH marked AS (
              |  SELECT user_id, ts, value,
              |    CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              |                 + INTERVAL 30 MINUTE
              |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM events),
              |sessions AS (
              |  SELECT user_id, ts, value,
              |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
              |                           ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM marked)
              |SELECT user_id,
              |  CAST(date_trunc('microseconds', MIN(ts)) AS TIMESTAMP) AS session_start,
              |  COUNT(*) AS n, ${sqlDsum("value")} AS total
              |FROM sessions GROUP BY user_id, sid
              |ORDER BY user_id, session_start""".stripMargin)),

    // Keep-first dedup per key in event-time order — the deterministic formulation of
    // dropDuplicates; dropDuplicatesWithinWatermark shares these semantics in streaming.
    Q("stream_dedup_first",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type", $"event_id", $"value")
          .orderBy($"user_id", $"event_type")
      },
      Some("""SELECT user_id, event_type, event_id, value FROM (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |                               ORDER BY ts, event_id) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    // Watermark late-data semantics as a deterministic batch oracle. Events "arrive"
    // in event_id order except every 17th, which is delayed 40 positions; the
    // watermark is the running max event time over ARRIVAL order (strictly before
    // the current row — a streaming watermark lags the data that advanced it) minus
    // 10 minutes, and a row is dropped iff its event time < watermark. Per-window
    // counts then show exactly what a `withWatermark("ts", "10 minutes")` job drops.
    // The streaming wiring itself (graft.streaming) is ScalaTest-verified; this row
    // pins the DROP RULE to the DuckDB oracle. The global arrival-order running max
    // is inherently sequential (real streaming computes the watermark per
    // micro-batch), so the probe is deliberately bounded to 5k rows — it checks
    // semantics, not throughput.
    Q("stream_watermark_late_drop",
      (s, dir) => {
        import s.implicits._
        val arr = t(s, dir, "events").filter($"event_id" < 5000)
          .select($"event_id", $"ts", $"value",
            ($"event_id" + when($"event_id" % 17 === 0, 40).otherwise(0)).as("arrival"))
        val w = Window.orderBy($"arrival", $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val marked = arr
          .withColumn("wm", max($"ts").over(w) - expr("INTERVAL 10 MINUTES"))
          .withColumn("late", coalesce($"ts" < $"wm", lit(false)))
        marked.groupBy(window($"ts", "10 minutes").as("w"))
          .agg(count(lit(1)).as("n_all"),
            sum(when($"late", 1L).otherwise(0L)).as("n_dropped"))
          .select($"w.start".as("wstart"), $"n_all", $"n_dropped",
            ($"n_all" - $"n_dropped").as("n_kept"))
          .orderBy($"wstart")
      },
      Some("""WITH arr AS (
             |  SELECT event_id, ts, value,
             |    event_id + CASE WHEN event_id % 17 = 0 THEN 40 ELSE 0 END AS arrival
             |  FROM events WHERE event_id < 5000),
             |wmk AS (
             |  SELECT event_id, ts, value,
             |    max(ts) OVER (ORDER BY arrival, event_id
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      - INTERVAL 10 MINUTE AS wm
             |  FROM arr)
             |SELECT make_timestamp(CAST(floor(epoch(ts)/600) AS BIGINT)*600*1000000) AS wstart,
             |  COUNT(*) AS n_all,
             |  CAST(SUM(CASE WHEN ts < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             |  COUNT(*) - CAST(SUM(CASE WHEN ts < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
             |FROM wmk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Stream-static join shape: fact events against the customer dim (broadcast side).
    Q("events_static_join",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        val c = t(s, dir, "customer")
        e.join(broadcast(c), e("user_id") === c("c_custkey"))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_events, ${sqlDsum("value")} AS total_value
              |FROM events JOIN customer ON user_id = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("events_minute_histogram",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(date_trunc("minute", $"ts").as("minute"))
          .agg(count(lit(1)).as("n"), davg($"value").as("avg_value"))
          .filter($"n" >= 2)
          .orderBy($"minute")
      },
      Some(s"""SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
              |  COUNT(*) AS n, ${sqlDavg("value")} AS avg_value
              |FROM events GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1""".stripMargin)),

    // Time-series gap fill + LOCF interpolation: per-user daily totals, a generated
    // date spine (sequence/explode — a generator, not a driver loop) over each user's
    // own [min, max] span, then last-observation-carried-forward via
    // last(ignoreNulls) over an ordered row frame. Spine generation and the fill
    // window both partition by user_id, so the whole query is one shuffle family on
    // the same key; day totals are decimal-exact so LOCF values hash identically.
    Q("events_gapfill_locf",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events").filter($"user_id" < 20)
          .groupBy($"user_id", to_date($"ts").as("day"))
          .agg(dsum($"value").as("day_value"))
        val spine = daily.groupBy($"user_id")
          .agg(min($"day").as("d0"), max($"day").as("d1"))
          .select($"user_id",
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "day"), "left")
          .select($"user_id", $"day",
            last($"day_value", ignoreNulls = true).over(w).as("filled_value"),
            $"day_value".isNull.as("was_gap"))
          .orderBy($"user_id", $"day")
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    ${sqlDsum("value")} AS day_value
              |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
              |spine AS (
              |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
              |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1))
              |SELECT s.user_id, s.day,
              |  last_value(d.day_value IGNORE NULLS) OVER (
              |    PARTITION BY s.user_id ORDER BY s.day
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
              |  d.day_value IS NULL AS was_gap
              |FROM spine s LEFT JOIN daily d USING (user_id, day)
              |ORDER BY 1, 2""".stripMargin)),

    // Gap-based sessionization — the classic batch formulation (lag → boundary flag
    // → running sum = session id), complementing the session_window operator
    // (stream_session_batch) with the shape warehouses actually run. Every window is
    // partitioned by user_id, so the plan is one hash shuffle on user and
    // per-user-sorted streams — no global ordering anywhere. Gap arithmetic is done
    // in integer epoch-millis (unix_millis / epoch_ms floor identically in both
    // engines; double epoch seconds would not hash-match).
    Q("events_sessionize_gap",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id")
          .withColumn("prev_ms", unix_millis(lag($"ts", 1).over(w)))
          .withColumn("new_s",
            when($"prev_ms".isNull ||
              unix_millis($"ts") - $"prev_ms" > 1800000L, 1L).otherwise(0L))
          .withColumn("session_no", sum($"new_s").over(run))
          .groupBy($"user_id", $"session_no")
          .agg(min($"ts").as("session_start"), count(lit(1)).as("n_events"),
            (unix_millis(max($"ts")) - unix_millis(min($"ts"))).as("duration_ms"))
          .orderBy($"user_id", $"session_no")
      },
      Some("""WITH f AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |          OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
             |  FROM f)
             |SELECT user_id, session_no, MIN(ts) AS session_start,
             |  COUNT(*) AS n_events,
             |  epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS duration_ms
             |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Ordered funnel conversion (view → click → purchase): each stage's timestamp is
    // the user's first qualifying event STRICTLY AFTER the previous stage. Three
    // conditional min-aggregations, each joined back on user_id — every stage is
    // key-partitioned on the same key (one co-partitioned shuffle chain, no pair
    // expansion: the stage tables carry ONE row per user), and the final rollup is
    // a four-counter global agg. No windows over the global stream.
    Q("events_funnel_conversion",
      (s, dir) => {
        import s.implicits._
        val e = graft.Tables.events(s, dir)
          .filter($"event_type".isin("view", "click", "purchase"))
          .select($"user_id", $"ts", $"event_type")
        val staged = e.groupBy($"user_id").agg(
          min(when($"event_type" === "view", $"ts")).as("t_view"))
        val withClick = e.join(staged, "user_id")
          .groupBy($"user_id", $"t_view").agg(
            min(when($"event_type" === "click" && $"ts" > $"t_view", $"ts"))
              .as("t_click"))
        val withBuy = e.join(withClick, "user_id")
          .groupBy($"user_id", $"t_view", $"t_click").agg(
            min(when($"event_type" === "purchase" && $"ts" > $"t_click", $"ts"))
              .as("t_buy"))
        withBuy.agg(
            count(lit(1)).as("n_users"),
            count($"t_view").as("n_view"),
            count($"t_click").as("n_click"),
            count($"t_buy").as("n_purchase"))
          .select($"n_users", $"n_view", $"n_click", $"n_purchase")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_type FROM events
             |          WHERE event_type IN ('view', 'click', 'purchase')),
             |v AS (SELECT user_id,
             |        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
             |      FROM e GROUP BY 1),
             |c AS (SELECT e.user_id, t_view,
             |        MIN(CASE WHEN event_type = 'click' AND ts > t_view
             |            THEN ts END) AS t_click
             |      FROM e JOIN v ON e.user_id = v.user_id GROUP BY 1, 2),
             |b AS (SELECT e.user_id, t_view, t_click,
             |        MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
             |            THEN ts END) AS t_buy
             |      FROM e JOIN c ON e.user_id = c.user_id GROUP BY 1, 2, 3)
             |SELECT COUNT(*) AS n_users, COUNT(t_view) AS n_view,
             |  COUNT(t_click) AS n_click, COUNT(t_buy) AS n_purchase
             |FROM b""".stripMargin)),

    // Markov transition counts (clickstream path analysis): lag the per-user event
    // sequence by one, count (prev_type → type) pairs. One user-partitioned window
    // + one pair-keyed rollup; the transition matrix output is |types|² rows
    // regardless of corpus size.
    Q("events_markov_transitions",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type", $"event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy($"prev_type", $"event_type")
      },
      Some("""WITH t AS (
             |  SELECT event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events)
             |SELECT prev_type, event_type, COUNT(*) AS n
             |FROM t WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Rolling z-score anomaly flag: per user, compare each value against the
    // mean/std of its trailing 20-row window. Window moments are accumulated in
    // DECIMAL (value cast first, squared in decimal — per the QueryDSL boundary
    // rule) so the sums are partitioning-independent; the final mean/var/flag math
    // is a fixed sequence of exactly-rounded double ops mirrored verbatim in the
    // oracle, so the boolean boundary agrees bit-for-bit. One hash shuffle on
    // user_id at any scale.
    Q("events_anomaly_zscore",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(-19, Window.currentRow)
        val vdec = $"value".cast("decimal(20,6)")
        graft.Tables.events(s, dir)
          .filter($"user_id" < 200)
          .select($"event_id", $"user_id", $"ts", $"value",
            count(lit(1)).over(w).as("n"),
            sum(vdec).over(w).cast("double").as("s1"),
            sum(vdec * vdec).over(w).cast("double").as("s2"))
          .select($"event_id", $"user_id", $"n",
            ($"s1" / $"n").as("mean"),
            (abs($"value" - $"s1" / $"n") >
              lit(2.0) * sqrt(greatest($"s2" / $"n" -
                ($"s1" / $"n") * ($"s1" / $"n"), lit(0.0)))).as("is_anomaly"))
          .orderBy($"event_id")
      },
      Some("""WITH m AS (
             |  SELECT event_id, user_id, value,
             |    COUNT(*) OVER w AS n,
             |    CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value AS DECIMAL(20,6)) *
             |             CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE) AS s2
             |  FROM events WHERE user_id < 200
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, n, s1 / n AS mean,
             |  abs(value - s1 / n) >
             |    2.0 * sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0))
             |    AS is_anomaly
             |FROM m ORDER BY event_id""".stripMargin)),

    // Peak concurrency (max overlapping 5-minute sessions per event type) via the
    // +1/−1 sweep: each interval becomes a start(+1) and end(−1) delta, one window
    // running-sum per type gives instantaneous concurrency, max() the peak. Ends
    // sort before starts at the same instant (half-open intervals). The sweep is
    // 2 rows per input — linear at any scale, where the naive interval self-join
    // is quadratic per hot window.
    Q("events_peak_concurrency",
      (s, dir) => {
        import s.implicits._
        val e = graft.Tables.events(s, dir)
          .select($"event_type", $"ts", $"event_id")
        val deltas = e.select($"event_type", $"ts".as("t"),
            lit(1).as("delta"), $"event_id")
          .unionByName(e.select($"event_type",
            ($"ts" + expr("interval 5 minutes")).as("t"),
            lit(-1).as("delta"), $"event_id"))
        val w = Window.partitionBy($"event_type")
          .orderBy($"t", $"delta", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas
          .withColumn("conc", sum($"delta").over(w))
          .groupBy($"event_type")
          .agg(max($"conc").cast("long").as("peak_concurrent"))
          .orderBy($"event_type")
      },
      Some("""WITH d AS (
             |  SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
             |  UNION ALL
             |  SELECT event_type, ts + INTERVAL 5 MINUTE, -1, event_id FROM events),
             |c AS (
             |  SELECT event_type,
             |    SUM(delta) OVER (PARTITION BY event_type
             |      ORDER BY t, delta, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
             |  FROM d)
             |SELECT event_type, CAST(MAX(conc) AS BIGINT) AS peak_concurrent
             |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // RFM segmentation (recency / frequency / monetary quintiles): one grouped pass
    // builds per-user metrics, then each quintile comes from a BANDED global rank
    // (bandedRowNumber: bucket counts → broadcast prefix-sum offsets → parallel
    // within-bucket rank) + exact NTILE arithmetic — a global `ntile() OVER
    // (ORDER BY ...)` would push the whole |users| frame through ONE reducer,
    // which dies at 100 TB; here the only single-partition sorts are over the
    // tiny bucket frames (days / distinct counts / monetary bands). Deterministic
    // because every rank order is made TOTAL with the user id tiebreak. Monetary
    // sums are decimal-exact.
    Q("events_rfm_segmentation",
      (s, dir) => {
        import s.implicits._
        val m = graft.Tables.events(s, dir)
          .filter($"event_type" === "purchase")
          .groupBy($"user_id")
          .agg(max($"ts").as("last_ts"),
            count(lit(1)).as("frequency"),
            dsum($"value").as("monetary"))
        // bucket keys: each a monotone function of its leading order key
        val r = bandedRowNumber(m, date_trunc("day", $"last_ts"),
          Seq($"last_ts", $"user_id"), "r_rank", "r_n")
        val f = bandedRowNumber(r, $"frequency",
          Seq($"frequency", $"user_id"), "f_rank", "f_n")
        val rfm = bandedRowNumber(f, floor($"monetary" / 100).cast("long"),
          Seq($"monetary", $"user_id"), "m_rank", "m_n")
        rfm.select($"user_id", $"frequency", $"monetary",
            (ntileFromRank($"r_rank", $"r_n", 5) * 100 +
             ntileFromRank($"f_rank", $"f_n", 5) * 10 +
             ntileFromRank($"m_rank", $"m_n", 5)).as("rfm"))
          .orderBy($"user_id")
      },
      Some(s"""WITH m AS (
              |  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
              |    ${sqlDsum("value")} AS monetary
              |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
              |SELECT user_id, frequency, monetary,
              |  NTILE(5) OVER (ORDER BY last_ts, user_id) * 100 +
              |  NTILE(5) OVER (ORDER BY frequency, user_id) * 10 +
              |  NTILE(5) OVER (ORDER BY monetary, user_id) AS rfm
              |FROM m ORDER BY user_id""".stripMargin)),

    // Top event-type trigrams (path mining): two lags per user stream build the
    // 3-step path, a global rollup ranks them. The path vocabulary is |types|³
    // regardless of corpus size, so the second shuffle is tiny.
    Q("events_top_paths",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("p1", lag($"event_type", 2).over(w))
          .withColumn("p2", lag($"event_type", 1).over(w))
          .filter($"p1".isNotNull)
          .select(concat_ws(">", $"p1", $"p2", $"event_type").as("path"))
          .groupBy($"path")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"path")
          .limit(10)
      },
      Some("""WITH t AS (
             |  SELECT lag(event_type, 2) OVER w AS p1,
             |    lag(event_type, 1) OVER w AS p2, event_type
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT p1 || '>' || p2 || '>' || event_type AS path, COUNT(*) AS n
             |FROM t WHERE p1 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // Period-over-period growth: weekly purchase value, lag(1) over the |weeks|-row
    // rollup, ratio vs prior week. The window runs over the tiny aggregate, never
    // the raw stream; sums are decimal-exact so the growth division is the same
    // double op in both engines.
    Q("events_wow_growth",
      (s, dir) => {
        import s.implicits._
        val w = Window.orderBy($"week")
        graft.Tables.events(s, dir)
          .filter($"event_type" === "purchase")
          .groupBy(date_trunc("week", $"ts").as("week"))
          .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
          .withColumn("prev_total", lag($"total", 1).over(w))
          .select($"week", $"n", $"total",
            ($"total" / $"prev_total").as("wow_ratio"))
          .orderBy($"week")
      },
      Some(s"""WITH wk AS (
              |  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
              |    COUNT(*) AS n, ${sqlDsum("value")} AS total
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
              |SELECT week, n, total,
              |  total / lag(total, 1) OVER (ORDER BY week) AS wow_ratio
              |FROM wk ORDER BY week""".stripMargin)),

    // DAU/MAU stickiness: exact distinct users per day and per containing month,
    // joined on the month — two grouped exact-distinct passes plus a broadcast-
    // sized join on the |months|-row side; the ratio divides exact BIGINTs cast
    // to double, so the boundary is engine-stable.
    Q("events_dau_mau",
      (s, dir) => {
        import s.implicits._
        val e = graft.Tables.events(s, dir)
          .select($"user_id", date_trunc("day", $"ts").as("day"),
            date_trunc("month", $"ts").as("month"))
        val dau = e.groupBy($"day", $"month")
          .agg(countDistinct($"user_id").as("dau"))
        val mau = e.groupBy($"month".as("m"))
          .agg(countDistinct($"user_id").as("mau"))
        dau.join(broadcast(mau), $"month" === $"m")
          .select($"day", $"dau", $"mau",
            ($"dau".cast("double") / $"mau").as("stickiness"))
          .orderBy($"day")
      },
      Some("""WITH e AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |    CAST(date_trunc('month', ts) AS TIMESTAMP) AS month
             |  FROM events),
             |dau AS (SELECT day, month, COUNT(DISTINCT user_id) AS dau
             |        FROM e GROUP BY 1, 2),
             |mau AS (SELECT month, COUNT(DISTINCT user_id) AS mau
             |        FROM e GROUP BY 1)
             |SELECT day, dau, mau,
             |  CAST(dau AS DOUBLE) / mau AS stickiness
             |FROM dau JOIN mau USING (month) ORDER BY day""".stripMargin)),

    // Pareto concentration: how much of total event volume each user DECILE
    // carries. Deciles come from a banded global rank over the |users|-row
    // aggregate (bucket = −n, so bucket order IS the n-descending order; ties
    // broken by user id) + exact NTILE arithmetic — no single-reducer ntile
    // window anywhere; the share window runs over the 10-row decile rollup.
    Q("events_power_users_pareto",
      (s, dir) => {
        import s.implicits._
        val perUser = graft.Tables.events(s, dir)
          .groupBy($"user_id").agg(count(lit(1)).as("n"))
        bandedRowNumber(perUser, -$"n", Seq($"n".desc, $"user_id"), "u_rank", "u_n")
          .withColumn("decile", ntileFromRank($"u_rank", $"u_n", 10))
          .groupBy($"decile")
          .agg(count(lit(1)).as("n_users"), sum($"n").as("n_events"))
          .withColumn("share",
            $"n_events".cast("double") /
              sum($"n_events").over(Window.partitionBy()).cast("double"))
          .orderBy($"decile")
      },
      Some("""WITH u AS (
             |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
             |d AS (
             |  SELECT NTILE(10) OVER (ORDER BY n DESC, user_id) AS decile, n
             |  FROM u),
             |g AS (
             |  SELECT decile, COUNT(*) AS n_users, SUM(n) AS n_events
             |  FROM d GROUP BY decile)
             |SELECT decile, n_users, CAST(n_events AS BIGINT) AS n_events,
             |  CAST(n_events AS DOUBLE) / CAST(SUM(n_events) OVER () AS DOUBLE)
             |    AS share
             |FROM g ORDER BY decile""".stripMargin)),

    // Time-weighted average (telemetry semantics: a reading holds until the next
    // one, so each value is weighted by how long it was current). Weights are
    // integer epoch-millis gaps and values are exact integer cents (the column is
    // 2-decimal), so numerator and denominator are exact BIGINT sums — one double
    // division per user at the end, immune to partitioning and float order. One
    // hash shuffle on user_id, per-user sorted lead — linear at any scale.
    Q("events_time_weighted_avg",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        graft.Tables.events(s, dir)
          .select($"user_id", $"ts", $"event_id", $"value")
          .withColumn("dur_ms", unix_millis(lead($"ts", 1).over(w)) - unix_millis($"ts"))
          .filter($"dur_ms".isNotNull)
          .withColumn("cents", round($"value" * 100, 0).cast("long"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum($"dur_ms").as("total_ms"),
            (sum($"cents" * $"dur_ms").cast("double") /
              (sum($"dur_ms") * 100).cast("double")).as("time_weighted_value"))
          .orderBy($"user_id")
      },
      Some("""WITH o AS (
             |  SELECT user_id, value,
             |    epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             |      - epoch_ms(ts) AS dur_ms
             |  FROM events),
             |d AS (
             |  SELECT user_id, dur_ms,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM o WHERE dur_ms IS NOT NULL)
             |SELECT user_id, COUNT(*) AS n_intervals,
             |  CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
             |  CAST(SUM(cents * dur_ms) AS DOUBLE) /
             |    CAST(SUM(dur_ms) * 100 AS DOUBLE) AS time_weighted_value
             |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Overlapping-interval merge (coalesce per-user activity windows into
    // maximal islands — session stitching, availability math, on-call coverage).
    // Each event opens an interval [ts, ts + value·1000 ms]; an island starts
    // where start exceeds the running max end of all predecessors (the classic
    // sort + running-max formulation — one hash shuffle on user, per-user sorted
    // windows, no self-join pair expansion). All arithmetic in integer epoch-ms,
    // so island boundaries and coverage sums are exact on both engines.
    Q("events_interval_merge",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"start_ms", $"end_ms")
        val prevMax = w.rowsBetween(Window.unboundedPreceding, -1)
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        graft.Tables.events(s, dir)
          .select($"user_id", unix_millis($"ts").as("start_ms"),
            (unix_millis($"ts") + round($"value" * 1000, 0).cast("long")).as("end_ms"))
          .withColumn("prev_end", max($"end_ms").over(prevMax))
          .withColumn("new_island",
            when($"prev_end".isNull || $"start_ms" > $"prev_end", 1L).otherwise(0L))
          .withColumn("island", sum($"new_island").over(run))
          .groupBy($"user_id", $"island")
          .agg(count(lit(1)).as("n_merged"),
            min($"start_ms").as("island_start_ms"),
            max($"end_ms").as("island_end_ms"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum($"n_merged").as("n_intervals"),
            sum($"island_end_ms" - $"island_start_ms").as("covered_ms"))
          .orderBy($"user_id")
      },
      Some("""WITH iv AS (
             |  SELECT user_id, epoch_ms(ts) AS start_ms,
             |    epoch_ms(ts) + CAST(round(value * 1000, 0) AS BIGINT) AS end_ms
             |  FROM events),
             |f AS (
             |  SELECT user_id, start_ms, end_ms,
             |    CASE WHEN max(end_ms) OVER (PARTITION BY user_id
             |        ORDER BY start_ms, end_ms
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |      OR start_ms > max(end_ms) OVER (PARTITION BY user_id
             |        ORDER BY start_ms, end_ms
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    THEN 1 ELSE 0 END AS new_island
             |  FROM iv),
             |g AS (
             |  SELECT user_id, start_ms, end_ms,
             |    CAST(SUM(new_island) OVER (PARTITION BY user_id
             |      ORDER BY start_ms, end_ms ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS island
             |  FROM f),
             |i AS (
             |  SELECT user_id, island, COUNT(*) AS n_merged,
             |    MIN(start_ms) AS island_start_ms, MAX(end_ms) AS island_end_ms
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id, COUNT(*) AS n_islands,
             |  CAST(SUM(n_merged) AS BIGINT) AS n_intervals,
             |  CAST(SUM(island_end_ms - island_start_ms) AS BIGINT) AS covered_ms
             |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Inactivity churn: users bucketed by days since their last event, measured
    // against the CORPUS horizon (max ts). The horizon comes from a global
    // window over the PER-USER aggregate — a |users|-row frame, so the
    // single-partition window is bounded (never the raw stream); the fact table
    // is touched once by the keyed rollup. Day arithmetic stays in integer
    // epoch-days, the churn flag is an integer comparison.
    Q("events_inactivity_churn",
      (s, dir) => {
        import s.implicits._
        val perUser = graft.Tables.events(s, dir)
          .groupBy($"user_id")
          .agg(max(unix_millis($"ts")).as("last_ms"), count(lit(1)).as("n_events"))
        perUser
          .withColumn("horizon_ms", max($"last_ms").over(Window.partitionBy()))
          .withColumn("days_inactive",
            floor(($"horizon_ms" - $"last_ms") / 86400000L).cast("long"))
          .withColumn("churned", $"days_inactive" >= 1)
          .groupBy($"churned")
          .agg(count(lit(1)).as("n_users"), sum($"n_events").as("n_events"),
            min($"days_inactive").as("min_days"), max($"days_inactive").as("max_days"))
          .orderBy($"churned")
      },
      Some("""WITH u AS (
             |  SELECT user_id, MAX(epoch_ms(ts)) AS last_ms, COUNT(*) AS n_events
             |  FROM events GROUP BY user_id),
             |h AS (SELECT MAX(last_ms) AS horizon_ms FROM u)
             |SELECT (CAST(floor((horizon_ms - last_ms) / 86400000) AS BIGINT) >= 1)
             |    AS churned,
             |  COUNT(*) AS n_users, CAST(SUM(n_events) AS BIGINT) AS n_events,
             |  MIN(CAST(floor((horizon_ms - last_ms) / 86400000) AS BIGINT))
             |    AS min_days,
             |  MAX(CAST(floor((horizon_ms - last_ms) / 86400000) AS BIGINT))
             |    AS max_days
             |FROM u, h GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Batch equivalent of the CHAINED stateful streaming query
    // (Streaming.chainedClickBuyWindowCounts): watermarked stream-stream join
    // feeding a downstream tumbling-window aggregation — two stateful operators
    // in one plan (Spark 3.5+ multiple-stateful-operator support). In batch the
    // same plan is a key-partitioned join plus a windowed rollup; the streaming
    // wiring is equivalence-tested in StreamingSpec.
    Q("stream_chained_agg_batch",
      (s, dir) => {
        import s.implicits._
        val e = graft.Tables(s, dir, "events")
        val clicks = e.filter($"event_type" === "click")
          .select($"user_id", $"ts".as("click_ts"))
        val buys = e.filter($"event_type" === "purchase")
          .select($"user_id".as("b_user"), $"ts".as("buy_ts"))
        // 2-hour attribution window into 1-hour tumbling counts: at 10 min /
        // 15 min the sparse sf0.01 stream yields n_conv = 1 in every window
        // (a "count" the hash can't distinguish from EXISTS).
        clicks.join(buys,
            $"user_id" === $"b_user" &&
            $"buy_ts" >= $"click_ts" &&
            $"buy_ts" <= $"click_ts" + expr("interval 2 hours"))
          .groupBy(window($"click_ts", "1 hour").as("w"))
          .agg(count(lit(1)).as("n_conv"))
          .select($"w.start".as("wstart"), $"n_conv")
          .orderBy($"wstart")
      },
      Some("""WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
             |b AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
             |j AS (
             |  SELECT c.ts AS click_ts
             |  FROM c JOIN b ON c.user_id = b.user_id
             |   AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 2 HOUR)
             |SELECT make_timestamp(CAST(floor(epoch(click_ts)/3600) AS BIGINT)
             |         * 3600 * 1000000) AS wstart,
             |  COUNT(*) AS n_conv
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Daily proration (revenue-recognition allocation): each synthesized usage
    // interval [ts, ts + minutes) splits its value across the calendar days it
    // overlaps, weighted by exact per-day overlap seconds — the day spine comes
    // from a per-row sequence() generator (fan-out bounded by interval length,
    // never a range join against a global calendar), and per-slice allocations
    // are rounded BEFORE the decimal day rollup so the daily totals are
    // partitioning-independent. All boundary arithmetic is integer epoch math.
    Q("events_prorate_daily",
      (s, dir) => {
        import s.implicits._
        val durS = (greatest(floor($"value" * 10).cast("long") % 2880L, lit(1L)) * 60L)
          .as("dur_s")
        val iv = graft.Tables(s, dir, "events")
          .select($"event_id", $"value", $"ts".as("start_ts"), durS)
          .withColumn("end_ts",
            timestamp_micros(unix_micros($"start_ts") + $"dur_s" * 1000000L))
        val sliced = iv
          .select($"event_id", $"value", $"start_ts", $"end_ts", $"dur_s",
            explode(sequence($"start_ts".cast("date"), $"end_ts".cast("date")))
              .as("day"))
          .withColumn("ov_us",
            least(unix_micros($"end_ts"),
              unix_micros(date_add($"day", 1).cast("timestamp"))) -
            greatest(unix_micros($"start_ts"),
              unix_micros($"day".cast("timestamp"))))
          .filter($"ov_us" > 0)
          .withColumn("alloc",
            round($"value" * ($"ov_us".cast("double") / ($"dur_s" * 1000000L)), 6))
        sliced.groupBy($"day")
          .agg(count(lit(1)).as("n_slices"),
            sum($"alloc".cast("decimal(30,6)")).cast("double").as("allocated"))
          .orderBy($"day")
      },
      Some("""WITH iv AS (
             |  SELECT event_id, value, ts AS start_ts,
             |    greatest(CAST(floor(value * 10) AS BIGINT) % 2880, 1) * 60 AS dur_s
             |  FROM events),
             |iv2 AS (
             |  SELECT *, make_timestamp(epoch_us(start_ts) + dur_s * 1000000)
             |    AS end_ts
             |  FROM iv),
             |sliced AS (
             |  SELECT event_id, value, start_ts, end_ts, dur_s,
             |    CAST(unnest(generate_series(CAST(start_ts AS DATE),
             |      CAST(end_ts AS DATE), INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM iv2),
             |ov AS (
             |  SELECT *,
             |    least(epoch_us(end_ts), epoch_us(CAST(day + 1 AS TIMESTAMP))) -
             |    greatest(epoch_us(start_ts), epoch_us(CAST(day AS TIMESTAMP))) AS ov_us
             |  FROM sliced),
             |a AS (
             |  SELECT day,
             |    round(value * (CAST(ov_us AS DOUBLE) / (dur_s * 1000000)), 6) AS alloc
             |  FROM ov WHERE ov_us > 0)
             |SELECT day, count(*) AS n_slices,
             |  CAST(SUM(CAST(alloc AS DECIMAL(30,6))) AS DOUBLE) AS allocated
             |FROM a GROUP BY day ORDER BY day""".stripMargin)),

    // 2-D activity histogram (hour-of-day × event type) with within-hour shares —
    // the heatmap rollup behind ops dashboards: one grouped pass, then a window
    // share over the 24×|types| AGGREGATED grid (never the fact table).
    Q("events_histogram_2d",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"hh")
        graft.Tables(s, dir, "events")
          .groupBy(hour($"ts").as("hh"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select($"hh", $"event_type", $"n",
            round($"n" / sum($"n").over(w), 9).as("hour_share"))
          .orderBy($"hh", $"event_type")
      },
      Some("""WITH g AS (
             |  SELECT CAST(hour(ts) AS INTEGER) AS hh, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT hh, event_type, n,
             |  round(n / SUM(n) OVER (PARTITION BY hh), 9) AS hour_share
             |FROM g ORDER BY hh, event_type""".stripMargin)),

    // Sequence-pattern matching, MATCH_RECOGNIZE-lite: render each user-day's
    // ordered event path as ONE string (ordered listagg — a single grouped pass,
    // no self-joins) and match the funnel as a regexp subsequence. Day paths are
    // bounded (a user-day's events fit a string), so the per-group state is O(day
    // events) regardless of corpus size; the regexp is a codegen'd RLIKE over the
    // collapsed per-day grain, not the raw event table. This is the general form
    // of events_funnel_conversion: arbitrary ordered patterns (alternation,
    // repetition) without new operator code.
    Q("events_pattern_regexp",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""WITH paths AS (
                |  SELECT user_id, CAST(date_trunc('DAY', ts) AS DATE) AS day,
                |    listagg(event_type, '>')
                |      WITHIN GROUP (ORDER BY ts, event_id) AS path
                |  FROM events GROUP BY 1, 2)
                |SELECT user_id, count(*) AS n_days,
                |  CAST(sum(CASE WHEN path RLIKE 'view.*click.*purchase'
                |                THEN 1 ELSE 0 END) AS BIGINT) AS converting_days
                |FROM paths GROUP BY user_id ORDER BY user_id""".stripMargin)
      },
      Some("""WITH paths AS (
             |  SELECT user_id, CAST(date_trunc('DAY', ts) AS DATE) AS day,
             |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_days,
             |  CAST(sum(CASE WHEN regexp_matches(path, 'view.*click.*purchase')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS converting_days
             |FROM paths GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
