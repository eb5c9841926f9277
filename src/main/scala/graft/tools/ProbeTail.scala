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

    // Round-15 (VERDICT r14 ask #2): per-leg candidate volume for
    // sim_ann_recall, after the probe-bounded re-shape. Every leg fixes the
    // query side to the 100-probe audit sample, so candidate counts must grow
    // ~linearly with the corpus (10× at the sf1 step), never quadratically.
    if (mode == "all" || mode == "ann") {
      println(s"== sim_ann_recall anatomy @ $sfDir")
      val vecs = graft.Tables.embeddings(spark, sfDir)
      val n = vecs.count()
      println(s"[probe] corpus vectors: $n")
      val probeQ = vecs.filter($"vec_id" < 100)
      val k = 5
      def legPairs(label: String, df: DataFrame): Unit = {
        val cnt = timed(s"$label pairs")(df.count())
        println(s"[probe] $label candidate/result pairs: $cnt")
      }
      legPairs("exact(100xN)",
        graft.llm.Similarity.bruteForceTopK(probeQ, vecs, k))
      legPairs("lsh H0",
        graft.llm.Similarity.lshBandedTopK(probeQ, vecs, k, 16, 2, 64, 0))
      legPairs("lsh H1",
        graft.llm.Similarity.lshBandedTopK(probeQ, vecs, k, 16, 2, 64, 1))
      legPairs("lsh H2",
        graft.llm.Similarity.lshBandedTopK(probeQ, vecs, k, 16, 2, 64, 2))
      legPairs("ivf nprobe2",
        graft.llm.Similarity.ivfTopK(probeQ, vecs, k, 16, 2))
      // pre-topk candidate volume per LSH leg (the scan-cost driver): count
      // the deduped (qid, vid) pair stream the scorer reads
      def rawCands(mp: Int): Long = {
        import graft.llm.Similarity
        // reconstruct the candidate stream exactly as lshBandedTopK does
        val r = 8
        def bandSigs(df: DataFrame, idAs: String) =
          Similarity.lshBuckets(df, 16, 64)
            .select(col("vec_id").as(idAs),
              posexplode(array((0 until 2).map(b =>
                substring(col("bucket"), b * r + 1, r)): _*))
                .as(Seq("band", "bsig")))
        val qb = bandSigs(probeQ, "qid")
        val qprobes = if (mp == 0) qb else {
          def flipAt(sig: org.apache.spark.sql.Column, i: Int) =
            concat(substring(sig, 1, i),
              when(substring(sig, i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
              substring(sig, i + 2, r - i - 1))
          val flipSets: Seq[Seq[Int]] =
            Seq(Seq.empty[Int]) ++ (0 until r).map(Seq(_)) ++
              (if (mp >= 2) for { i <- 0 until r; j <- (i + 1) until r }
                yield Seq(i, j) else Nil)
          qb.select(col("qid"), col("band"),
            explode(array(flipSets.map(_.foldLeft(col("bsig"))(flipAt)): _*))
              .as("bsig"))
        }
        qprobes.join(bandSigs(vecs, "vid"), Seq("band", "bsig"))
          .filter(col("qid") =!= col("vid"))
          .select("qid", "vid").distinct().count()
      }
      (0 to 2).foreach(d =>
        println(s"[probe] lsh H$d deduped scored-candidate volume: ${rawCands(d)}" +
          s" (brute-force would be ${100 * (n - 1)})"))
      val full = graft.SparkEntry.queries("sim_ann_recall")(spark, sfDir)
      timed("full sim_ann_recall consume")(consume(full))
    }
    spark.stop()
  }
}
