package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-by-stage timing of the brute-force similarity path — where do the
  * seconds go at sf0.1 (2000×64 embeddings, 100k pairs)? */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    def tm(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val e = graft.Tables.embeddings(spark, sfDir)
    tm("embeddings.count")(e.count())
    import graft.llm.Similarity
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        Similarity.normExact(col("embedding")).as("qnorm"))
    val c = e.select(col("vec_id").as("vid"), col("embedding").as("cvec"),
      Similarity.normExact(col("embedding")).as("cnorm"))
    tm("norms.q")(q.count())
    tm("norms.c")(c.count())
    val pairs = q.join(c, col("qid") =!= col("vid"))
    tm("pairs.count")(pairs.count())
    val scored = pairs.withColumn("cosine",
      Similarity.dotExact(col("qvec"), col("cvec")) /
        (col("qnorm") * col("cnorm")))
      .select(col("qid"), col("vid"), col("cosine"))
    tm("scored.count")(scored.count())
    tm("scored.agg")(scored.agg(sum(col("cosine"))).count())
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vid"))
    val nb = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    tm("topk.count")(nb.count())
    val cached = scored.cache()
    tm("scored.cache")(cached.count())
    val nbC = cached.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    tm("topk.cached")(nbC.count())
    val wCheap = Window.partitionBy(col("qid")).orderBy(col("vid"))
    tm("topk.cheapkey")(scored.withColumn("rank", row_number().over(wCheap))
      .filter(col("rank") <= 5).count())
    println(nb.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(160)).mkString("\n"))
    spark.stop()
  }
}
