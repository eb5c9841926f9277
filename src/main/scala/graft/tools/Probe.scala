package graft.tools
import org.apache.spark.sql.SparkSession
import graft.llm.Dedup
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
