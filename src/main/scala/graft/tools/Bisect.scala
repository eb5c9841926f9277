package graft.tools
import org.apache.spark.sql.SparkSession
/** Find which bench-order predecessor slows a target query: runs the first N
  * queries (sorted order, like Bench), then times the target.
  * Usage: runMain graft.tools.Bisect <N> <target> [sfDir] */
object Bisect {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val target = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.lineitem(spark, sfDir).count()
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.take(n)
    names.foreach { q =>
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }
      println(f"PRE  $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val t0 = System.nanoTime()
    try graft.SparkEntry.queries(target)(spark, sfDir).count()
    catch { case e: Throwable => println(s"TARGET FAILED: $e") }
    println(f"TARGET $target ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
