package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 sf1-tail anatomy probe (VERDICT r13 ask #1): counted-evidence
  * dissection of `text_burrows_delta` and `agg_basket_assoc_rules` — the two
  * queries still above ~3× on the mutated-clone 10× step. For each, the
  * pipeline is re-run stage by stage with per-stage row counts and honest
  * (all-column-hash) consume timings, so growth can be attributed to a frame
  * rather than guessed. Same discipline as ProbeLsh (PLANS.md:335-380).
  *
  * Usage: runMain graft.tools.ProbeTail <sfDir> [burrows|basket|all]
  */
object ProbeTail {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args.lift(1).getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def consume(df: DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(expr("bit_xor(h)")).head()

    graft.Tables.lineitem(spark, sfDir).count() // warm-up

    if (mode == "all" || mode == "burrows") {
      println(s"== text_burrows_delta anatomy @ $sfDir")
      val toks = graft.Tables.documents(spark, sfDir)
        .select($"doc_id", explode(graft.llm.TextFunctions.tokens($"text"))
          .as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("toks materialize")(println(s"[probe] toks rows: ${toks.count()}"))
      println(s"[probe] distinct words: " +
        toks.select($"w").distinct().count())
      val dlen = toks.groupBy($"doc_id").agg(count(lit(1)).as("len"))
      timed("dlen")(println(s"[probe] dlen rows: ${dlen.count()}"))
      val top = timed("top30 agg") {
        toks.groupBy($"w").agg(count(lit(1)).as("cw"))
          .orderBy($"cw".desc, $"w").limit(30)
          .agg(sort_array(collect_list($"w")).as("ws"))
          .localCheckpoint(true)
      }
      val grid = dlen.crossJoin(broadcast(top))
        .select($"doc_id", $"len", explode($"ws").as("w"))
      timed("grid consume")(println(s"[probe] grid rows: ${grid.count()}"))
      val cnt = toks.groupBy($"doc_id", $"w").agg(count(lit(1)).as("cn"))
      timed("cnt (doc,w) agg")(println(s"[probe] cnt rows: ${cnt.count()}"))
      val f = timed("f = grid leftjoin cnt + checkpoint") {
        grid.join(cnt, Seq("doc_id", "w"), "left")
          .na.fill(0L, Seq("cn"))
          .select($"doc_id", $"w",
            ($"cn".cast("double") / $"len".cast("double")).as("fr"))
          .localCheckpoint()
      }
      println(s"[probe] f rows: ${f.count()}")
      val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)
      val stats = f.groupBy($"w")
        .agg(count(lit(1)).as("nd"),
          sum($"fr".cast(DEC)).cast("double").as("sf"),
          sum(($"fr" * $"fr").cast(DEC)).cast("double").as("sff"))
        .select($"w", ($"sf" / $"nd").as("muw"),
          sqrt(($"sff" - $"sf" * $"sf" / $"nd") / $"nd").as("sdw"))
      val z = f.join(broadcast(stats), "w")
        .select($"doc_id", $"w", (($"fr" - $"muw") / $"sdw").as("z"))
      val fin = z.filter($"doc_id" % 2 === 0)
        .join(z.filter($"doc_id" % 2 === 1)
          .select(($"doc_id" - 1).as("doc_id"), $"w", $"z".as("zb")),
          Seq("doc_id", "w"))
        .groupBy($"doc_id")
        .agg((sum(abs($"z" - $"zb").cast(DEC)).cast("double") /
          count(lit(1))).as("delta"))
      timed("stats+z+pairjoin+final consume")(consume(fin))
      toks.unpersist()
    }

    if (mode == "all" || mode == "basket") {
      println(s"== agg_basket_assoc_rules anatomy @ $sfDir")
      val grouped = timed("grouped (order->brand set) + checkpoint") {
        graft.Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_partkey")
          .join(graft.Tables.part(spark, sfDir)
            .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
          .groupBy($"l_orderkey".as("ok"))
          .agg(sort_array(collect_set($"p_brand")).as("arr"))
          .localCheckpoint()
      }
      println(s"[probe] orders: ${grouped.count()}")
      println("[probe] basket-size histogram: " +
        grouped.select(size($"arr").as("k")).groupBy($"k").count()
          .orderBy($"k").collect().map(r => s"${r.get(0)}:${r.get(1)}")
          .mkString(" "))
      val pairsArr = flatten(transform($"arr", (x, i) =>
        transform(slice($"arr", i + 2, size($"arr")), y =>
          struct(x.as("brand_a"), y.as("brand_b")))))
      val exploded = grouped.select(explode(pairsArr).as("p"))
      timed("pair expansion consume")(
        println(s"[probe] expanded pair rows: ${exploded.count()}"))
      val pairs = exploded
        .groupBy($"p.brand_a".as("brand_a"), $"p.brand_b".as("brand_b"))
        .agg(count(lit(1)).as("pair_cnt"))
      timed("pair agg")(println(s"[probe] distinct brand pairs: ${pairs.count()}"))
      val full = graft.SparkEntry.queries("agg_basket_assoc_rules")(spark, sfDir)
      timed("full query consume")(consume(full))
    }
    spark.stop()
  }
}
