package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AQE-vs-manual-salting skew adjudication (VERDICT r11 stretch ask #8).
  *
  * Builds an EXTREME-skew join input from the sf1 slice — 50% of lineitem
  * rows remapped to ONE hot supplier key — and times three strategies:
  *
  *   plain      SortMergeJoin, AQE skew-join OFF (the naive baseline: the hot
  *              key lands on one reducer)
  *   aqe        SortMergeJoin with AQE skew-join ON, thresholds tuned so the
  *              optimizer can act at this data size (defaults need a 256 MB
  *              partition; sf1's hot partition is ~50 MB — at 100 TB the
  *              DEFAULTS would fire)
  *   salted     graft.ops.SkewJoin.salted(nSalts = 8)
  *
  * Broadcast is disabled throughout: the scenario is "dim too big to
  * broadcast", otherwise BHJ trivializes skew. The dim side is padded so the
  * planner couldn't broadcast it anyway at defaults.
  *
  * Usage: runMain graft.tools.ProbeSkew [sfDir] [reps]
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // Sort-shuffle writer past 64 reduce buckets (round 15, VERDICT r14
      // ask #3): Spark's default bypassMergeThreshold=200 makes every shuffle
      // at the cluster-default 200 partitions use the bypass writer — one
      // file per (map task × bucket); measured 2.5x wall on dedup_minhash_lsh
      // at sf0.1 purely from that. 64 keeps the local 32-bucket shape on the
      // bypass fast path (bit-identical to the committed floors) and gives
      // wide shuffles the single-spill sort writer, as on a real cluster.
      .config("spark.shuffle.sort.bypassMergeThreshold", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val hotKey = 1L
    val fact = graft.Tables(spark, sfDir, "lineitem")
      .select(
        when(pmod($"l_orderkey", lit(2)) === 0, lit(hotKey))
          .otherwise($"l_suppkey").as("l_suppkey"),
        $"l_quantity", $"l_orderkey")
      .localCheckpoint() // freeze the skewed input outside the timed region
    val dim = graft.Tables(spark, sfDir, "supplier")
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
      .localCheckpoint()
    println(s"[skew] fact=${fact.count()} rows, hot-key share=" +
      f"${fact.filter($"l_suppkey" === hotKey).count().toDouble / fact.count()}%.2f, " +
      s"dim=${dim.count()} rows")

    def agg(j: DataFrame): DataFrame =
      j.groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))

    def time(label: String)(mk: => DataFrame): Double = {
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.agg(count(lit(1)), sum($"qty")).head()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[skew] $label%-8s $best%.2f s (min of $reps)")
      best
    }

    def withConf[T](kv: (String, String)*)(body: => T): T = {
      val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val plain = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      time("plain")(agg(fact.hint("merge").join(dim, Seq("l_suppkey"))))
    }
    val aqe = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // sf1's hot partition (~3M rows, ~50 MB) is far below the 256 MB
      // default threshold; scale the knobs down so AQE behaves as it would
      // on a 100 TB hot partition
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2MB") {
      time("aqe")(agg(fact.hint("merge").join(dim, Seq("l_suppkey"))))
    }
    val salted = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      time("salted")(agg(
        graft.ops.SkewJoin.salted(fact, dim, "l_suppkey", nSalts = 8)))
    }
    println(f"[skew] RESULT plain=$plain%.2f aqe=$aqe%.2f salted=$salted%.2f " +
      f"(aqe/salted ratio ${aqe / salted}%.2f)")
    spark.stop()
  }
}
