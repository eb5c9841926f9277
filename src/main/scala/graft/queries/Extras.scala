package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import QueryDSL._

/** Remaining source formats, the exec-parity pipe stage, and the approximate
  * (BENCH-only, rows-only-checked) operator variants. */
object Extras {

  val queries: Seq[Q] = Seq(
    Q("orc_roundtrip_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/orc_roundtrip"
        t(s, dir, "supplier").coalesce(1).write.mode("overwrite").orc(out)
        s.read.orc(out).orderBy($"s_suppkey")
      },
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    Q("text_roundtrip_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/text_roundtrip"
        t(s, dir, "region").select(concat_ws("|", $"r_regionkey", $"r_name").as("value"))
          .coalesce(1).write.mode("overwrite").text(out)
        s.read.text(out)
          .select(
            split($"value", "\\|").getItem(0).cast("int").as("r_regionkey"),
            split($"value", "\\|").getItem(1).as("r_name"))
          .orderBy($"r_regionkey")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // Round-trip through the built-in XML source/sink (first-class in Spark 4):
    // row-per-element write, schema-driven read back, oracle-checked against the
    // original parquet table.
    Q("xml_roundtrip_scan",
      (s, dir) => {
        import s.implicits._
        val out = s"${Sinks.scratchDir}/xml_roundtrip"
        t(s, dir, "nation").select($"n_nationkey", $"n_name", $"n_regionkey")
          .coalesce(1).write.mode("overwrite")
          .option("rootTag", "nations").option("rowTag", "nation")
          .format("xml").save(out)
        s.read.option("rowTag", "nation")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .format("xml").load(out)
          .orderBy($"n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // Exec-parity opaque stage: rows streamed through a real subprocess (grep) per
    // partition, parsed back, aggregated — oracle-checked against the equivalent
    // relational filter.
    Q("pipe_subprocess_filter",
      (s, dir) => {
        import s.implicits._
        val in = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
        val piped = graft.ops.Pipe.pipeTsv(in,
          graft.ops.Pipe.shellTolerant("grep -E 'A$'"),
          StructType.fromDDL(
            "l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING"))
        piped.groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .orderBy($"l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
              |FROM lineitem WHERE l_returnflag = 'A'
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Approximate operators — BENCH-only per BASELINE.md determinism rules: rows-only
    // driver check (no hash compare against DuckDB), exact twins carry t2 coverage.
    Q("approx_count_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
            approx_count_distinct($"l_suppkey", 0.01).as("approx_supps"))
          .orderBy($"l_returnflag")
      },
      None),

    Q("approx_percentile",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("p50"),
            percentile_approx($"l_extendedprice", lit(0.95), lit(1000)).as("p95"))
          .orderBy($"l_returnflag")
      },
      None),

    // ANN similarity via IVF coarse quantization (codegen'd vec_dot): nlist
    // centroid lists, nprobe probed per query — the skew-robust approximate twin
    // of sim_cosine_topk (BENCH-only, rows-only).
    Q("sim_cosine_topk_ivf",
      (s, dir) => {
        import s.implicits._
        graft.llm.Similarity.ivfTopK(t(s, dir, "embeddings"), k = 5,
            nlist = 16, nprobe = 2)
          .select($"qid", $"rank", $"vid", round($"cosine", 6).as("cosine"))
          .orderBy($"qid", $"rank")
      },
      None),

    // ANN similarity via sign-LSH buckets (codegen'd vec_dot) — the approximate
    // BENCH-scale twin of sim_cosine_topk.
    Q("sim_cosine_topk_lsh",
      (s, dir) => {
        import s.implicits._
        graft.llm.Similarity.lshTopK(t(s, dir, "embeddings"), k = 5,
            numPlanes = 6, dims = 64)
          .select($"qid", $"rank", $"vid", round($"cosine", 6).as("cosine"))
          .orderBy($"qid", $"rank")
      },
      None),

    // Band-split sign-LSH ANN: 16 planes in 2 bands of 8 — each band has 256
    // signature values, so candidate sets stay selective (~n²/256 per band) while
    // OR-over-bands recall beats a single 16-plane signature; candidates are
    // deduped as compact id pairs before the embeddings are fetched for scoring
    // (BENCH-only, rows-only). Band width is the selectivity knob: too few bits
    // per band degenerates toward all-pairs.
    Q("sim_cosine_topk_lsh_banded",
      (s, dir) => {
        import s.implicits._
        graft.llm.Similarity.lshBandedTopK(t(s, dir, "embeddings"), k = 5,
            numPlanes = 16, bands = 2, dims = 64)
          .select($"qid", $"rank", $"vid", round($"cosine", 6).as("cosine"))
          .orderBy($"qid", $"rank")
      },
      None),

    // ANN quality report: recall@5 of the two approximate paths against the exact
    // brute-force ground truth on a bounded probe set (vec_id < 100) — the
    // approximate operators carry a measured quality number, not just a row
    // count. One output row per method. Approximate inputs → BENCH-only,
    // rows-only (float-vs-decimal tie ordering may flip a boundary neighbor).
    //
    // Measured at sf0.01: IVF(nlist=16, nprobe=2) ≈ 0.43, banded LSH ≈ 0.04. The
    // LSH number is the honest sign-LSH theory on this corpus, not a bug: the
    // synthetic embeddings are near-uniform (exact top-5 cosines ≈ 0.33, θ≈70°),
    // so per-plane sign agreement is ~1−θ/π ≈ 0.6 and an 8-bit band keeps a true
    // neighbor with p ≈ 0.6^8 ≈ 2% — weak-similarity corpora need many short
    // bands (candidate volume n²/2^bits per band: the recall/cost knob) or the
    // IVF path, whose nprobe knob buys recall linearly in probe cost.
    Q("sim_ann_recall",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.DataFrame
        val k = 5
        val vecs = t(s, dir, "embeddings")
        // The exact ground-truth pass and the IVF leg each contain an EAGER
        // localCheckpoint (ground truth is reused per method; IVF materializes
        // its one ranked corpus pass) with no data dependency between them —
        // build both from a 2-thread pool so their jobs back-fill each other
        // (guide §2.6), instead of serializing the two barriers. Results are
        // unchanged: the frames are combined only in the final lazy union.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val exactF = scala.concurrent.Future {
          graft.llm.Similarity
            .bruteForceTopK(vecs.filter($"vec_id" < 100), vecs, k)
            .select($"qid", $"vid").localCheckpoint(true) // reused per method
        }
        def recallOf(exact: DataFrame)(method: String, ann: DataFrame): DataFrame =
          // recall = hit fraction over exact's n_queries×k ground-truth pairs;
          // a left-join hit marker keeps the plan broadcast/hash-join only
          exact.join(
              ann.filter($"qid" < 100).select($"qid", $"vid", lit(1).as("hit")),
              Seq("qid", "vid"), "left")
            .agg(
              (count(lit(1)) / k).cast("bigint").as("n_queries"),
              round(sum(coalesce($"hit", lit(0))).cast("double") / count(lit(1)),
                4).as("recall_at_5"))
            .select(lit(method).as("method"), $"n_queries", $"recall_at_5")
        // Every leg bounds its QUERY side to the probe sample (round 15,
        // VERDICT r14 ask #2): the recall estimate only ever reads qid < 100,
        // so ranking the other n−100 queries was pure waste — and the waste
        // scaled as corpus × queries = n² (the 3.4× sf1 probe tail). With the
        // probe set fixed, every leg's candidate volume is LINEAR in the
        // corpus: this is an audit, not a retrieval path (the all-queries
        // retrieval shapes remain benched by sim_cosine_topk_{lsh_banded,ivf}).
        val probeQ = vecs.filter($"vec_id" < 100)
        val lsh = graft.llm.Similarity.lshBandedTopK(probeQ, vecs, k,
          numPlanes = 16, bands = 2, dims = 64, multiprobe = 0)
        // Multi-probe leg (Lv et al. VLDB'07): probes explode the QUERY side
        // only, so bounding the query frame to the probe set keeps candidate
        // volume at |Q|·|C|·(r+1)/2^r — measured recall 0.192 vs 0.038 plain.
        val mp = graft.llm.Similarity.lshBandedTopK(probeQ,
          vecs, k, numPlanes = 16, bands = 2, dims = 64, multiprobe = 1)
        // Hamming-2 leg (round 14): 37 probes/band — the measured top of the
        // banded-LSH recall/volume curve (~29% of brute-force candidate
        // volume at r = 8; see the PLANS.md ANN positioning note)
        val mp2 = graft.llm.Similarity.lshBandedTopK(probeQ,
          vecs, k, numPlanes = 16, bands = 2, dims = 64, multiprobe = 2)
        // centroid training/refinement/list assignment still run over the FULL
        // corpus (the index is corpus-sized by design); only probing is bounded
        val ivfF = scala.concurrent.Future {
          graft.llm.Similarity.ivfTopK(probeQ, vecs, k,
            nlist = 16, nprobe = 2)
        }
        val (exact, ivf) =
          try (scala.concurrent.Await.result(exactF,
              scala.concurrent.duration.Duration.Inf),
            scala.concurrent.Await.result(ivfF,
              scala.concurrent.duration.Duration.Inf))
          finally pool.shutdown()
        val recall = recallOf(exact) _
        recall("ivf_nlist16_nprobe2", ivf)
          .unionAll(recall("lsh_16planes_2bands", lsh))
          .unionAll(recall("lsh_2x8_multiprobe1", mp))
          .unionAll(recall("lsh_2x8_multiprobe2", mp2))
          .orderBy($"method")
      },
      None),

    // Multi-probe banded sign-LSH ANN (the recall-defensible LSH path): each
    // query probes its own band bucket plus all Hamming-1 buckets — per-band
    // true-neighbor recall p^8 + 8·p^7(1-p) (~6x plain banding on this
    // near-uniform corpus) at an (r+1)x candidate cost that scales ONLY with
    // the query side. Eval shape: bounded probe set vs full corpus, like
    // sim_cosine_topk. Approximate → BENCH-only, rows-only.
    Q("sim_cosine_topk_lsh_multiprobe",
      (s, dir) => {
        import s.implicits._
        val vecs = t(s, dir, "embeddings")
        graft.llm.Similarity.lshBandedTopK(vecs.filter($"vec_id" < 200), vecs,
            k = 5, numPlanes = 16, bands = 2, dims = 64, multiprobe = 1)
          .select($"qid", $"rank", $"vid", round($"cosine", 6).as("cosine"))
          .orderBy($"qid", $"rank")
      },
      None),

    // Custom DataSource V2 source (graft.sources.FixedWidthSource): fixed-width
    // text records — the connector extension surface (TableProvider → ScanBuilder →
    // PartitionReader) with column pruning pushed into the reader. Fixture: nation
    // rendered as %6d%-16s%4d lines by a plain text write.
    Q("fixedwidth_source_scan",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_nation")
        if (!new java.io.File(s"$out/_SUCCESS").exists()) {
          t(s, dir, "nation")
            .select(format_string("%6d%-16s%4d",
              $"n_nationkey", $"n_name", $"n_regionkey").as("line"))
            .coalesce(1).write.mode("overwrite").text(out)
        }
        s.read.format("graft.sources.FixedWidthSource")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .option("widths", "6,16,4")
          .load(out)
          .orderBy($"n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY 1")),

    // The V2 SINK half of the fixed-width connector: supplier flows out through the
    // DataWriter (task files + commit messages, abort deletes) and back in through
    // the pruned reader. Doubles stay out of the record (engine-specific rendering);
    // acctbal rides along as a pre-formatted string and is re-cast on read-back by
    // the oracle comparison.
    Q("fixedwidth_sink_roundtrip",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_sink")
        val d = new java.io.File(out)
        if (d.exists()) { // append-only sink: clear prior run's files first
          d.listFiles().foreach(_.delete()); d.delete()
        }
        t(s, dir, "supplier")
          .select($"s_suppkey", $"s_name", $"s_nationkey",
            $"s_acctbal".cast("decimal(18,2)").cast("string").as("bal_str"))
          .write.format("graft.sources.FixedWidthSource")
          .option("widths", "8,24,4,14").mode("append").save(out)
        s.read.format("graft.sources.FixedWidthSource")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT, bal_str STRING")
          .option("widths", "8,24,4,14")
          .load(out)
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey,
             |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal_str
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // DSv2 AGGREGATE pushdown on the fixed-width source, both tiers in one
    // query: the count(*) leg is COMPLETE pushdown — the row count is computed
    // from committed file lengths at planning time (fixed records ⇒ byte
    // arithmetic; the `ascii` option asserts single-byte chars) and ZERO data
    // bytes are read — while the min/max/count(col) leg is PARTIAL pushdown:
    // each file's reader streams once and emits ONE row of partial aggregates
    // that Spark's final aggregate merges (n rows → #files rows across the
    // scan→agg boundary). The 1×1 crossJoin of the two legs is a sanctioned
    // scalar fan-in. FixedWidthSourceSpec plan-asserts both tiers.
    Q("fixedwidth_agg_pushdown",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_agg")
        val d = new java.io.File(out)
        if (!d.exists() ||
            !d.listFiles().exists(_.getName.startsWith("_graft_manifest"))) {
          if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
          t(s, dir, "supplier")
            .select($"s_suppkey", $"s_name", $"s_nationkey")
            .write.format("graft.sources.FixedWidthSource")
            .option("widths", "8,24,4").mode("append").save(out)
        }
        val feed = s.read.format("graft.sources.FixedWidthSource")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
          .option("widths", "8,24,4").option("ascii", "true")
          .load(out)
        val cnt = feed.agg(count(lit(1)).as("n_rows"))
        val mm = feed.agg(
          min($"s_suppkey").as("min_key"), max($"s_suppkey").as("max_key"),
          min($"s_name").as("min_name"), count($"s_nationkey").as("n_nations"))
        cnt.crossJoin(mm)
      },
      Some("""SELECT (SELECT COUNT(*) FROM supplier) AS n_rows,
             |  MIN(s_suppkey) AS min_key, MAX(s_suppkey) AS max_key,
             |  MIN(s_name) AS min_name,
             |  CAST(COUNT(s_nationkey) AS BIGINT) AS n_nations
             |FROM supplier""".stripMargin)),

    // GROUP BY pushdown on the same feed: the reader streams each file once
    // and emits per-group partial rows (count/min/max keyed by the raw source
    // column), so the scan→agg boundary carries #files × |groups| rows instead
    // of every record. Grouping by an expression falls back to a plain scan —
    // FixedWidthSourceSpec asserts both directions.
    Q("fixedwidth_groupby_pushdown",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_agg")
        val d = new java.io.File(out)
        if (!d.exists() ||
            !d.listFiles().exists(_.getName.startsWith("_graft_manifest"))) {
          if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
          t(s, dir, "supplier")
            .select($"s_suppkey", $"s_name", $"s_nationkey")
            .write.format("graft.sources.FixedWidthSource")
            .option("widths", "8,24,4").mode("append").save(out)
        }
        s.read.format("graft.sources.FixedWidthSource")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
          .option("widths", "8,24,4")
          .load(out)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), min($"s_suppkey").as("min_key"),
            max($"s_name").as("max_name"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n, MIN(s_suppkey) AS min_key,
             |  MAX(s_name) AS max_name
             |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DSv2 TOP-N pushdown (SupportsPushDownTopN): ORDER BY + LIMIT reaches the
    // reader, which keeps only the N best lines per file in a bounded sorted
    // buffer (O(N) memory at any file size) — at 100 TB a leaderboard query
    // ships N rows per shard instead of the whole feed. Partial by contract:
    // Spark's final TakeOrdered still owns the global order, the reader-side
    // cut is an I/O/exchange saving (FixedWidthSourceSpec plan-asserts
    // PushedTopN and the null/desc ordering rules).
    Q("fixedwidth_topn_pushdown",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_agg")
        val d = new java.io.File(out)
        if (!d.exists() ||
            !d.listFiles().exists(_.getName.startsWith("_graft_manifest"))) {
          if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
          t(s, dir, "supplier")
            .select($"s_suppkey", $"s_name", $"s_nationkey")
            .write.format("graft.sources.FixedWidthSource")
            .option("widths", "8,24,4").mode("append").save(out)
        }
        s.read.format("graft.sources.FixedWidthSource")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
          .option("widths", "8,24,4")
          .load(out)
          .orderBy($"s_name".desc, $"s_suppkey")
          .limit(8)
          .select($"s_suppkey", $"s_name", $"s_nationkey")
      },
      Some("""SELECT s_suppkey, s_name, s_nationkey
             |FROM supplier ORDER BY s_name DESC, s_suppkey LIMIT 8""".stripMargin)),

    // Vectorized (columnar) DSv2 read path: the reader parses surviving lines
    // straight into on-heap column vectors and emits 4096-row ColumnarBatches;
    // Spark plans the scan columnar and inserts its codegen'd ColumnarToRow
    // above it (FixedWidthSourceSpec plan-asserts the boundary + row/columnar
    // result equality). Same answers as the row path, less per-row allocation
    // — the batch-oriented shape every production scan at 100 TB uses.
    Q("fixedwidth_columnar_scan",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_agg")
        val d = new java.io.File(out)
        if (!d.exists() ||
            !d.listFiles().exists(_.getName.startsWith("_graft_manifest"))) {
          if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
          t(s, dir, "supplier")
            .select($"s_suppkey", $"s_name", $"s_nationkey")
            .write.format("graft.sources.FixedWidthSource")
            .option("widths", "8,24,4").mode("append").save(out)
        }
        s.read.format("graft.sources.FixedWidthSource")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
          .option("widths", "8,24,4").option("columnar", "true")
          .load(out)
          .filter($"s_nationkey" < 10)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n"), max($"s_name").as("max_name"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n, MAX(s_name) AS max_name
             |FROM supplier WHERE s_nationkey < 10
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DSv2 RUNTIME filtering (SupportsRuntimeFiltering): the selective
    // broadcast dimension's observed join keys arrive at the fixed-width scan
    // as a dynamicpruning IN filter at EXECUTION time, so the fact reader
    // row-skips on keys no dim row can match — DPP semantics for a custom
    // connector. The pushdown only saves work (Spark keeps the join above the
    // scan), so results are byte-identical with or without it;
    // FixedWidthSourceSpec plan-asserts the RuntimeFilters attachment.
    Q("fixedwidth_runtime_filter",
      (s, dir) => {
        import s.implicits._
        val out = Sinks.scoped(dir, "fixedwidth_agg")
        val d = new java.io.File(out)
        if (!d.exists() ||
            !d.listFiles().exists(_.getName.startsWith("_graft_manifest"))) {
          if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
          t(s, dir, "supplier")
            .select($"s_suppkey", $"s_name", $"s_nationkey")
            .write.format("graft.sources.FixedWidthSource")
            .option("widths", "8,24,4").mode("append").save(out)
        }
        val feed = s.read.format("graft.sources.FixedWidthSource")
          .schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT")
          .option("widths", "8,24,4")
          .load(out)
        val dim = t(s, dir, "nation")
          .filter($"n_name".isin("NATION_3", "NATION_7", "NATION_11"))
          .select($"n_nationkey", $"n_name")
        feed.join(broadcast(dim), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_suppliers"),
            min($"s_suppkey").as("min_key"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n_suppliers,
             |  MIN(s_suppkey) AS min_key
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Typed Dataset[T] pipeline (case-class Encoder, lambda filter, groupByKey +
    // mapGroups): the type-safe API leg of the engine. The lambda stages pay a
    // deserialize/serialize boundary — documented trade-off vs the Column API (use
    // typed ops where compile-time safety matters, Columns on hot paths). The
    // per-group fold accumulates in exact BigDecimal (valueOf = shortest-string,
    // the same double→decimal semantics as Spark's cast — see QueryDSL), so the
    // result is partitioning-independent and oracle-exact.
    Q("typed_dataset_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_quantity", $"l_returnflag")
          .as[Extras.Line]
          .filter(_.l_quantity > 10.0)
          .groupByKey(_.l_returnflag)
          .mapGroups { (flag, it) =>
            var n = 0L
            var sum = java.math.BigDecimal.ZERO
            it.foreach { li =>
              n += 1
              sum = sum.add(java.math.BigDecimal.valueOf(li.l_quantity))
            }
            (flag, n, sum.doubleValue())
          }
          .toDF("l_returnflag", "n", "sum_qty")
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_quantity > 10.0
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )

  /** Case-class row for the typed Dataset leg. */
  case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)
}
