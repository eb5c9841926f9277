package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 superlinear-tail adjudication probe (VERDICT r12 ask #1).
  *
  * `dedup_minhash_lsh` measured 7.0× on the true 10× step and
  * `embed_rq_encode` 4.8×. This tool separates "banding flaw" from
  * "scale-generator artifact" with counted evidence:
  *
  * dedup_minhash_lsh — counts, at a given SF dir:
  *   - docs, LSH buckets, bucket-size histogram tail, Σ C(k,2) raw candidate
  *     slots, and distinct candidate pairs
  *   - the CLONE-PAIR fraction: GenScale builds target/sf1 by cloning every
  *     document 10× with only a 3-char suffix (`" zz<copy>"`,
  *     GenScale.scala:93-95), so all 10 clones share nearly every shingle and
  *     collide in every band. Clones of one original satisfy
  *     id1 ≡ id2 (mod stride); counting pairs in/out of that relation shows
  *     how much of the candidate growth is the generator's dup-hard-case
  *     artifact vs organic near-dup structure.
  *
  * embed_rq_encode — times the pipeline stages (flatten, stage-1 assign,
  * stage-2 residual assign) separately at the SF so the 10×-step ratio can be
  * attributed to a stage rather than guessed.
  *
  * Usage: runMain graft.tools.ProbeLsh <sfDir> [cloneStride]
  *   cloneStride: pass max(doc_id at the BASE sf)+1 when probing target/sf1.
  */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val stride = args.lift(1).flatMap(_.toLongOption)
    val mode = args.lift(2).getOrElse("all") // all | lsh | rq
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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // honest consume: hash every column (a bare count() lets Catalyst prune
    // aggregate VALUE columns — min-structs, distance sums — timing a plan
    // that never computes them; see graft.tools.Time's identical rule)
    def consume(df: DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(expr("bit_xor(h)")).head()

    // ---- dedup_minhash_lsh anatomy (same params as the query: 3-shingles,
    // 8 hashes, 4 bands × 2) ---------------------------------------------
    if (mode != "rq") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    println(s"[probe] docs: $nDocs")

    val sh = timed("shingleFrame") {
      val f = graft.llm.Dedup.shingleFrame(docs, "doc_id", "text", shingleN = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val wide = timed("minhashWide") {
      val w = graft.llm.Dedup.minhashWide(sh, "doc_id", numHashes = 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      w.count(); w
    }

    // band signatures exactly as bandedCandidatesWide builds them
    val nBands = 4
    val sigExpr = (0 until nBands).map { b =>
      val c = (0 until 2).map(s => s"mh${b * 2 + s}").mkString(", ")
      s"$b, concat_ws('|', $c)"
    }.mkString(", ")
    val banded = wide.select(col("doc_id"),
      expr(s"stack($nBands, $sigExpr) as (band, sig)"))
    val buckets = banded.groupBy($"band", $"sig")
      .agg(count(lit(1)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bstats = timed("bucket stats") {
      buckets.agg(
        count(lit(1)).as("n_buckets"),
        sum(($"k" * ($"k" - 1)) / 2).as("raw_pair_slots"),
        max($"k").as("max_bucket"),
        sum(when($"k" > 100, 1).otherwise(0)).as("buckets_gt100"),
        sum(when($"k" > 1000, 1).otherwise(0)).as("buckets_gt1000")).head()
    }
    println(s"[probe] buckets=${bstats.getLong(0)} rawPairSlots=${bstats.get(1)} " +
      s"maxBucket=${bstats.getLong(2)} gt100=${bstats.get(3)} gt1000=${bstats.get(4)}")
    buckets.unpersist()

    val cand = timed("bandedCandidatesWide (distinct pairs)") {
      val c = graft.llm.Dedup
        .bandedCandidatesWide(wide, "doc_id", numHashes = 8, bandSize = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val nCand = cand.count()
    println(s"[probe] distinct candidate pairs: $nCand " +
      f"(${nCand.toDouble / math.max(nDocs, 1)}%.2f per doc)")

    stride.foreach { st =>
      // clone pairs: both ids map to the same base-universe original
      val clonePairs = cand
        .filter(pmod($"id1", lit(st)) === pmod($"id2", lit(st))).count()
      println(f"[probe] clone-induced pairs (id1==id2 mod $st): $clonePairs " +
        f"(${100.0 * clonePairs / math.max(nCand, 1)}%.1f%% of candidates)")
    }

    timed("jaccard verify on candidates") {
      consume(graft.llm.Dedup
        .jaccardFromShingles(cand, sh.withColumnRenamed("doc_id", "jid")))
    }
    cand.unpersist(); wide.unpersist(); sh.unpersist()
    }

    if (mode != "lsh") {
    // ---- embed_rq_encode stage anatomy ----------------------------------
    val flat = timed("rq: flatten embeddings") {
      val f = graft.Tables.embeddings(spark, sfDir)
        .select($"vec_id", posexplode($"embedding").as(Seq("p0", "vf")))
        .select($"vec_id", ($"p0" + 1).as("pos"), $"vf".cast("double").as("v"))
        .localCheckpoint()
      println(s"[probe] rq flat rows: ${f.count()}")
      f
    }
    val cbA = flat.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("aid"), $"pos", $"v".as("av"))
    val s1 = timed("rq: stage-1 assign (x8 fanout + decimal agg)") {
      val r = flat.join(broadcast(cbA), "pos")
        .groupBy($"vec_id", $"aid")
        .agg(sum((($"v" - $"av") * ($"v" - $"av"))
          .cast("decimal(30,12)")).cast("double").as("d2"))
        .groupBy($"vec_id")
        .agg(min(struct($"d2", $"aid")).as("b"))
        .select($"vec_id", $"b.aid".as("c1"), $"b.d2".as("d2_stage1"))
        .localCheckpoint()
      r.count(); r
    }
    timed("rq: stage-2 residual assign") {
      val s1j =
        if (args.contains("bcast-s1")) broadcast(s1)
        else if (args.contains("shuffle-s1")) s1.hint("shuffle_hash")
        else if (args.contains("merge-s1")) s1.hint("merge")
        else s1
      val resid = flat.as("f").join(s1j, "vec_id")
        .join(broadcast(cbA.as("ca")),
          col("f.pos") === col("ca.pos") && $"c1" === col("ca.aid"))
        .select($"vec_id", col("f.pos").as("pos"),
          (col("f.v") - col("ca.av")).as("rv"), $"c1", $"d2_stage1")
      val cbB = flat.filter($"vec_id" >= 8 && $"vec_id" < 16)
        .select(($"vec_id" - 8).cast("int").as("bid"), $"pos",
          ($"v" * 0.125d).as("bv"))
      val s2full = resid.join(broadcast(cbB), "pos")
        .groupBy($"vec_id", $"c1", $"d2_stage1", $"bid")
        .agg(sum((($"rv" - $"bv") * ($"rv" - $"bv"))
          .cast("decimal(30,12)")).cast("double").as("d2"))
        .groupBy($"vec_id", $"c1", $"d2_stage1")
        .agg(min(struct($"d2", $"bid")).as("b"))
        .select($"vec_id", $"c1", $"d2_stage1", $"b.bid", $"b.d2")
      if (args.contains("explain-s2")) s2full.explain("formatted")
      consume(s2full)
    }
    }

    // Breusch–Pagan cost anatomy (VERDICT r12 ask #5): which aggregate of the
    // aux pass carries the 2.3 s of data work at sf0.1?
    if (mode == "bp") {
      val xd = ($"l_quantity" - 25.0d).cast("decimal(18,2)")
      val yd = ($"l_extendedprice" - 40000.0d).cast("decimal(18,2)")
      val li = graft.Tables.lineitem(spark, sfDir)
        .select($"l_quantity", $"l_extendedprice")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      li.count()
      val m1 = timed("bp: m1 moments pass") {
        val m = li.agg(count(lit(1)).as("n"),
            sum(xd).cast("double").as("sx"),
            sum(xd * xd).cast("double").as("sxx"),
            sum(yd).cast("double").as("sy"),
            sum(xd * yd).cast("double").as("sxy"))
          .select($"n",
            (($"sxy" - $"sx" * $"sy" / $"n") /
              ($"sxx" - $"sx" * $"sx" / $"n")).as("b"),
            ($"sy" / $"n").as("ybar_d"), ($"sx" / $"n").as("xbar_d"))
          .localCheckpoint()
        m.count(); m
      }
      def aux = li.crossJoin(broadcast(m1))
        .select($"l_quantity",
          (($"l_extendedprice" - 40000.0d - $"ybar_d") -
            $"b" * ($"l_quantity" - 25.0d - $"xbar_d")).as("e"))
        .select((($"l_quantity" - 25.0d)).as("x"), ($"e" * $"e").as("e2"))
      timed("bp: aux FULL (6 aggs incl decimal(38,4) see)") {
        aux.agg(count(lit(1)).as("n"),
          sum($"x".cast("decimal(18,2)")).cast("double").as("sx"),
          sum(($"x" * $"x").cast("decimal(18,2)")).cast("double").as("sxx"),
          sum($"e2".cast("decimal(30,4)")).cast("double").as("se"),
          sum(($"e2" * $"e2").cast("decimal(38,4)")).cast("double").as("see"),
          sum(($"x" * $"e2").cast("decimal(30,4)")).cast("double").as("sxe")).head()
      }
      timed("bp: aux without see") {
        aux.agg(count(lit(1)).as("n"),
          sum($"x".cast("decimal(18,2)")).cast("double").as("sx"),
          sum(($"x" * $"x").cast("decimal(18,2)")).cast("double").as("sxx"),
          sum($"e2".cast("decimal(30,4)")).cast("double").as("se"),
          sum(($"x" * $"e2").cast("decimal(30,4)")).cast("double").as("sxe")).head()
      }
      timed("bp: aux only see") {
        aux.agg(sum(($"e2" * $"e2").cast("decimal(38,4)")).cast("double").as("see")).head()
      }
      timed("bp: aux only x moments (18,2)") {
        aux.agg(sum($"x".cast("decimal(18,2)")).cast("double").as("sx"),
          sum(($"x" * $"x").cast("decimal(18,2)")).cast("double").as("sxx")).head()
      }
      // long-split candidate: sum a decimal(30,4) column as TWO long sums of
      // its unscaled hi/lo halves, recombining exactly at the end. Validates
      // (a) bit-identical value vs the BigDecimal-path sum, (b) speed.
      timed("bp: se via decimal(30,4) sum x3 reps") {
        (1 to 3).foreach { _ =>
          aux.agg(sum($"e2".cast("decimal(30,4)")).cast("double")).head()
        }
      }
      // split the per-row unscaled long with EXACT integer ops (div, %)
      timed("bp: se via long-split x3 reps") {
        (1 to 3).foreach { _ =>
          aux.select(($"e2".cast("decimal(30,4)") * 10000L).cast("long").as("u"))
            .select(expr("u div 1000000000L").as("q"), ($"u" % 1000000000L).as("r"))
            .agg(((sum($"q").cast("decimal(38,4)") * 1000000000L +
              sum($"r").cast("decimal(38,4)")) / 10000L).cast("double")).head()
        }
      }
      timed("bp: cast-only (checkpoint the cast column) x1") {
        val pre = aux.select($"e2".cast("decimal(30,4)").as("d")).localCheckpoint()
        timed("bp: sum over pre-cast column x3 reps") {
          (1 to 3).foreach { _ => pre.agg(sum($"d").cast("double")).head() }
        }
      }
      timed("bp: double sum baseline x3 reps (not exact, cost floor)") {
        (1 to 3).foreach { _ => aux.agg(sum($"e2")).head() }
      }
      val a1 = aux.agg(sum($"e2".cast("decimal(30,4)")).cast("double")).head().getDouble(0)
      val a2 = aux.select(($"e2".cast("decimal(30,4)") * 10000L).cast("long").as("u"))
        .select(expr("u div 1000000000L").as("q"), ($"u" % 1000000000L).as("r"))
        .agg(((sum($"q").cast("decimal(38,4)") * 1000000000L +
          sum($"r").cast("decimal(38,4)")) / 10000L).cast("double")).head().getDouble(0)
      println(s"[probe] bp: se decimal=$a1 longsplit=$a2 equal=${a1 == a2}")
      li.unpersist()
    }

    // Exact replica of the embed_rq_encode query with a toggle: does
    // checkpointing the tiny s1 frame (one row per vector) change the sf1
    // behavior? (mode rqfull = as shipped; rqfull-ckpt = s1 checkpointed)
    if (mode == "rqfull" || mode == "rqfull-ckpt") {
      timed(s"rq FULL query ($mode)") {
        val flat = graft.Tables.embeddings(spark, sfDir)
          .select($"vec_id", posexplode($"embedding").as(Seq("p0", "vf")))
          .select($"vec_id", ($"p0" + 1).as("pos"), $"vf".cast("double").as("v"))
          .localCheckpoint()
        val cbA = flat.filter($"vec_id" < 8)
          .select($"vec_id".cast("int").as("aid"), $"pos", $"v".as("av"))
        val s1base = flat.join(broadcast(cbA), "pos")
          .groupBy($"vec_id", $"aid")
          .agg(sum((($"v" - $"av") * ($"v" - $"av"))
            .cast("decimal(30,12)")).cast("double").as("d2"))
          .groupBy($"vec_id")
          .agg(min(struct($"d2", $"aid")).as("b"))
          .select($"vec_id", $"b.aid".as("c1"), $"b.d2".as("d2_stage1"))
        val s1pre = if (mode == "rqfull-ckpt") s1base.localCheckpoint() else s1base
        val s1 =
          if (args.contains("bcast-s1")) broadcast(s1pre)
          else if (args.contains("shuffle-s1")) s1pre.hint("shuffle_hash")
          else s1pre
        val resid = flat.as("f").join(s1, "vec_id")
          .join(broadcast(cbA.as("ca")),
            col("f.pos") === col("ca.pos") && $"c1" === col("ca.aid"))
          .select($"vec_id", col("f.pos").as("pos"),
            (col("f.v") - col("ca.av")).as("rv"), $"c1", $"d2_stage1")
        val cbB = flat.filter($"vec_id" >= 8 && $"vec_id" < 16)
          .select(($"vec_id" - 8).cast("int").as("bid"), $"pos",
            ($"v" * 0.125d).as("bv"))
        val s2 = resid.join(broadcast(cbB), "pos")
          .groupBy($"vec_id", $"c1", $"d2_stage1", $"bid")
          .agg(sum((($"rv" - $"bv") * ($"rv" - $"bv"))
            .cast("decimal(30,12)")).cast("double").as("d2"))
          .groupBy($"vec_id", $"c1", $"d2_stage1")
          .agg(min(struct($"d2", $"bid")).as("b"))
        consume(s2.select($"vec_id", $"c1", $"b.bid".as("c2"),
            round($"d2_stage1", 9).as("d2_stage1"),
            round($"b.d2", 9).as("d2_stage2"))
          .orderBy($"vec_id"))
      }
    }
    spark.stop()
  }
}
