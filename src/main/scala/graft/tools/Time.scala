package graft.tools
import org.apache.spark.sql.SparkSession
/** Isolated per-query timing: runs the named queries N times each, prints seconds.
  * Usage: runMain graft.tools.Time q1,q2 [sfDir] [reps] */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.lineitem(spark, sfDir).count() // warm-up
    args(0).split(",").foreach { q =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        println(f"TIME $q rep$r n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
