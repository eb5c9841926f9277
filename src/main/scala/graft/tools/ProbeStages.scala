package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage census (round 15, VERDICT r14 ask #3): run a named query once and
  * print every completed stage's task count + wall time, so partition-shape
  * overhead (e.g. 200 near-empty tasks under the cluster-default shuffle
  * setting) can be attributed to a concrete stage instead of guessed.
  *
  * Usage: runMain graft.tools.ProbeStages <query> [sfDir]
  * Honors SPARK_GRAFT_SHUFFLE_PARTITIONS like ProbeRobust.
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // comma list runs one census per shape in ONE session (warm, host-paired)
    val partsList = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
      .split(",").toSeq
    val parts = partsList.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      // Sort-shuffle writer past 64 reduce buckets (round 15, VERDICT r14
      // ask #3): Spark's default bypassMergeThreshold=200 makes every shuffle
      // at the cluster-default 200 partitions use the bypass writer — one
      // file per (map task × bucket); measured 2.5x wall on dedup_minhash_lsh
      // at sf0.1 purely from that. 64 keeps the local 32-bucket shape on the
      // bypass fast path (bit-identical to the committed floors) and gives
      // wide shuffles the single-spill sort writer, as on a real cluster.
      .config("spark.shuffle.sort.bypassMergeThreshold", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.lineitem(spark, sfDir).count() // warm-up
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = for {
          a <- i.submissionTime; b <- i.completionTime
        } yield b - a
        val rdds = i.rddInfos.map(r => s"${r.name}#${r.numPartitions}")
          .mkString(" <- ")
        stages.add(f"STAGE id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"ms=${ms.getOrElse(-1L)}%6d ${rdds.take(200)}")
      }
    })
    def consume(df: DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
    consume(graft.SparkEntry.queries(q)(spark, sfDir)) // warm the query once
    partsList.foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      stages.clear()
      val t0 = System.nanoTime()
      consume(graft.SparkEntry.queries(q)(spark, sfDir))
      println(f"TOTAL $q ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(shuffle.partitions=$p)")
      Thread.sleep(2000) // let the listener bus drain
      stages.forEach(println(_))
    }
    spark.stop()
  }
}
