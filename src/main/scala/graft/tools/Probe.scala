package graft.tools
import org.apache.spark.sql.SparkSession
import graft.llm.Dedup
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
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
    def tm(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = graft.Tables.documents(spark, sfDir)
    tm("docs.count")(docs.count())
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", 3)
    tm("shingles.count")(sh.count())
    val shc = sh.cache()
    tm("shingles.cache")(shc.count())
    val wide = Dedup.minhashWide(shc, "doc_id", 8)
    tm("minhashWide")(wide.count())
    val cand = Dedup.bandedCandidatesWide(wide, "doc_id", 8, 2)
    tm("candidates")(cand.count())
    val jac = Dedup.jaccardFromShingles(cand, shc.withColumnRenamed("doc_id", "jid"))
    tm("jaccard")(jac.count())
    spark.stop()
  }
}
