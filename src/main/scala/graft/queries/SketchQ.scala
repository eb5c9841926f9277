package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Deterministically-checkable probabilistic structures + importance-based
  * data selection.
  *
  * The HLL/KLL rows in [[Scale]] are rows-only by design (their estimates are
  * implementation-defined). This family closes that gap from the other side:
  * Count-Min and Bloom are probabilistic in their GUARANTEES but their
  * CONTENTS are pure integer arithmetic once the hash family is fixed — the
  * sketch matrix and the packed bitset are bit-reproducible on any engine, so
  * both construction AND use (point query, membership gate) are hash-matched
  * against DuckDB recomputing the same arithmetic. At 100 TB both structures
  * are the classic bounded-state reducers: the CMS matrix is d×w cells and the
  * Bloom bitset m bits regardless of input size, built with map-side partial
  * aggregation and mergeable by cell-wise sum / word-wise OR.
  *
  * `text_dsir_importance` is DSIR-shaped data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): hashed
  * n-gram bucket counts for a target domain vs the raw corpus, per-document
  * importance = target-mass / raw-mass over the document's token buckets.
  * Kept exactly reproducible by integer bucket counts and a single IEEE
  * double division of two exact integers (no logs, no libm).
  *
  * Reference scope anchor: the reference pipes arbitrary per-record scores
  * through tasks (reference/README.md:53-77); these are the engine-side
  * equivalents a data team would otherwise script.
  */
object SketchQ {

  /** Pairwise-independent-style hash family h_j(x) = ((a_j·x + b_j) mod p)
    * mod width, p = 2³¹−1 (Mersenne). Fixed small odd multipliers keep
    * a_j·x < 2⁶³ for any 48-bit key. */
  private val hashA = Seq(31L, 97L, 193L, 389L)
  private val hashB = Seq(7L, 11L, 13L, 17L)
  private val hashP = 2147483647L

  /** Spark column for h_j(key) mod width with j itself a column (0-based). */
  private def hashCol(key: org.apache.spark.sql.Column,
      j: org.apache.spark.sql.Column, width: Long) = {
    val a = element_at(array(hashA.map(lit): _*), j + 1)
    val b = element_at(array(hashB.map(lit): _*), j + 1)
    ((a * key + b) % hashP) % width
  }

  /** DuckDB spelling of [[hashCol]] (j is a 0-based SQL expression). */
  private def sqlHash(key: String, j: String, width: Long): String =
    s"((list_value(31,97,193,389)[$j + 1] * ($key) + " +
      s"list_value(7,11,13,17)[$j + 1]) % 2147483647) % $width"

  private val cmsDepth = 4
  private val cmsWidth = 64L

  private val bloomK = 3
  private val bloomBits = 4096L

  /** 48-bit integer content digest (md5 prefix) — the Bloom/DSIR key. */
  private def digest48(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  val queries: Seq[Q] = Seq(

    // Count-Min sketch CONSTRUCTION (Cormode & Muthukrishnan 2005) over the
    // event stream's user_id frequency: d=4 hash rows × w=64 counters. The
    // sketch is the groupBy result itself — each (row, col) cell is an exact
    // integer count, so the whole matrix hash-matches an oracle that redoes
    // the arithmetic. Scale shape: explode×4 is map-side; the single shuffle
    // carries at most d·w=256 partial cells per map task (map-side combine),
    // and two sketches merge by cell-wise ADDITION — the property that lets
    // 1000 executors each sketch their shard and reduce in O(d·w).
    Q("agg_countmin_sketch",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"user_id",
            explode(array((0 until cmsDepth).map(lit): _*)).as("d"))
          .select($"d", hashCol($"user_id", $"d", cmsWidth).as("c"))
          .groupBy($"d", $"c").agg(count(lit(1)).as("cnt"))
          .select($"d".cast("long").as("d"), $"c", $"cnt")
          .orderBy($"d", $"c")
      },
      Some(s"""WITH h AS (
              |  SELECT d, ${sqlHash("user_id", "d", 64L)} AS c
              |  FROM events, unnest(range(0, 4)) t(d))
              |SELECT d, c, COUNT(*) AS cnt
              |FROM h GROUP BY d, c ORDER BY d, c""".stripMargin)),

    // Count-Min sketch POINT QUERY: estimate(x) = min over rows of
    // cell[d][h_d(x)], reported for the 10 heaviest users against their exact
    // counts. The CMS one-sided guarantee (estimate ≥ exact, excess ≤ εN with
    // probability 1−δ) is visible in the hash-checked `overcount` column —
    // every value is provably ≥ 0, and the oracle recomputing the same sketch
    // pins the exact collision pattern. Top-10 via orderBy+limit
    // (TakeOrdered — no global sort materializes).
    Q("agg_countmin_estimate",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val sketch = ev
          .select($"user_id",
            explode(array((0 until cmsDepth).map(lit): _*)).as("d"))
          .select($"d", hashCol($"user_id", $"d", cmsWidth).as("c"))
          .groupBy($"d", $"c").agg(count(lit(1)).as("cnt"))
        val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_cnt"))
        val est = exact
          .select($"user_id",
            explode(array((0 until cmsDepth).map(lit): _*)).as("d"))
          .select($"user_id", $"d", hashCol($"user_id", $"d", cmsWidth).as("c"))
          .join(broadcast(sketch), Seq("d", "c"))
          .groupBy($"user_id").agg(min($"cnt").as("cms_est"))
        exact.join(est, "user_id")
          .select($"user_id", $"exact_cnt", $"cms_est",
            ($"cms_est" - $"exact_cnt").as("overcount"))
          .orderBy($"exact_cnt".desc, $"user_id").limit(10)
      },
      Some(s"""WITH sk AS (
              |  SELECT d, ${sqlHash("user_id", "d", 64L)} AS c, COUNT(*) AS cnt
              |  FROM events, unnest(range(0, 4)) t(d) GROUP BY 1, 2),
              |exact AS (
              |  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY 1),
              |probes AS (
              |  SELECT e.user_id, t.d, ${sqlHash("e.user_id", "t.d", 64L)} AS c
              |  FROM exact e, unnest(range(0, 4)) t(d)),
              |est AS (
              |  SELECT p.user_id, MIN(sk.cnt) AS cms_est
              |  FROM probes p JOIN sk ON sk.d = p.d AND sk.c = p.c
              |  GROUP BY 1)
              |SELECT e.user_id, e.exact_cnt, est.cms_est,
              |  est.cms_est - e.exact_cnt AS overcount
              |FROM exact e JOIN est USING (user_id)
              |ORDER BY e.exact_cnt DESC, e.user_id LIMIT 10""".stripMargin)),

    // Bloom filter CONSTRUCTION over the existing-corpus content digests
    // (even doc_ids — the incremental-dedup store side), packed 32 bits per
    // word so the shift never reaches the sign bit (DuckDB's `<<` range-errors
    // on 1<<63; 32-bit packing sidesteps the engine divergence). Output = the
    // non-zero words of the m=4096-bit bitset — bit-identical cross-engine.
    // Merge property: two shards' bitsets OR together, so construction is one
    // bounded-state aggregation no matter the corpus size.
    Q("agg_bloom_bitset",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").filter($"doc_id" % 2 === 0)
          .select(digest48($"text").as("key"))
          .select(explode(array((0 until bloomK).map(lit): _*)).as("j"), $"key")
          .select(hashCol($"key", $"j", bloomBits).as("pos")).distinct()
          .select(($"pos" / 32).cast("long").as("word_idx"),
            expr("shiftleft(1L, cast(pos % 32 as int))").as("bit"))
          .groupBy($"word_idx").agg(expr("bit_or(bit)").as("word_val"))
          .orderBy($"word_idx")
      },
      Some(s"""WITH pos AS (
              |  SELECT DISTINCT
              |    ${sqlHash(s"(${QueryDSL.sqlHexInt("md5(text)", 1, 12)})",
                   "j", 4096L)} AS pos
              |  FROM documents, unnest(range(0, 3)) t(j)
              |  WHERE doc_id % 2 = 0)
              |SELECT pos // 32 AS word_idx,
              |  bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word_val
              |FROM pos GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bloom MEMBERSHIP GATE — the production prefilter in front of the
    // incremental-dedup store join: incoming docs (odd ids, plus injected
    // copies of the first 10 even docs re-keyed to fresh odd ids so true
    // positives exist) are checked against the existing-corpus Bloom filter;
    // only maybe-members proceed to the exact digest join. The filter is
    // bounded (m bits) hence ALWAYS broadcastable — at 100 TB the gate prunes
    // the incoming batch map-side before any shuffle reaches the store.
    // Output per incoming doc: the gate's verdict and ground truth; Bloom's
    // no-false-negative contract means bloom_maybe ≥ actual row-wise, and the
    // false positives the oracle reproduces are the εm collision pattern.
    Q("dedup_bloom_gate",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val existing = docs.filter($"doc_id" % 2 === 0)
          .select(digest48($"text").as("key"))
        val incoming = docs.filter($"doc_id" % 2 === 1)
          .select($"doc_id", $"text")
          .unionByName(docs.filter($"doc_id" % 2 === 0 && $"doc_id" < 20)
            .select(($"doc_id" * 2 + 1000001).as("doc_id"), $"text"))
          .select($"doc_id", digest48($"text").as("key"))
        val positions = existing
          .select(explode(array((0 until bloomK).map(lit): _*)).as("j"), $"key")
          .select(hashCol($"key", $"j", bloomBits).as("pos")).distinct()
        val probe = incoming
          .select($"doc_id", $"key",
            explode(array((0 until bloomK).map(lit): _*)).as("j"))
          .select($"doc_id", $"key", hashCol($"key", $"j", bloomBits).as("pos"))
          .join(broadcast(positions.withColumn("hit", lit(1))),
            Seq("pos"), "left")
          .groupBy($"doc_id", $"key")
          .agg((count($"hit") === bloomK).as("bloom_maybe"))
        probe
          .join(existing.distinct().withColumn("present", lit(1)),
            Seq("key"), "left")
          .select($"doc_id", $"bloom_maybe", $"present".isNotNull.as("actual"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH ex AS (
              |  SELECT DISTINCT ${QueryDSL.sqlHexInt("md5(text)", 1, 12)} AS key
              |  FROM documents WHERE doc_id % 2 = 0),
              |pos AS (
              |  SELECT DISTINCT ${sqlHash("key", "j", 4096L)} AS pos
              |  FROM ex, unnest(range(0, 3)) t(j)),
              |inc AS (
              |  SELECT doc_id, ${QueryDSL.sqlHexInt("md5(text)", 1, 12)} AS key
              |  FROM documents WHERE doc_id % 2 = 1
              |  UNION ALL
              |  SELECT doc_id * 2 + 1000001,
              |    ${QueryDSL.sqlHexInt("md5(text)", 1, 12)}
              |  FROM documents WHERE doc_id % 2 = 0 AND doc_id < 20),
              |probepos AS (
              |  SELECT i.doc_id, i.key, ${sqlHash("i.key", "t.j", 4096L)} AS pos
              |  FROM inc i, unnest(range(0, 3)) t(j)),
              |probe AS (
              |  SELECT pp.doc_id, pp.key,
              |    COUNT(p.pos) = 3 AS bloom_maybe
              |  FROM probepos pp LEFT JOIN pos p ON p.pos = pp.pos
              |  GROUP BY 1, 2)
              |SELECT pr.doc_id, pr.bloom_maybe,
              |  ex.key IS NOT NULL AS actual
              |FROM probe pr LEFT JOIN ex ON ex.key = pr.key
              |ORDER BY pr.doc_id""".stripMargin)),

    // DSIR-shaped importance scoring (Xie et al. 2023): featurize each doc as
    // hashed token buckets (B=1024), estimate a target-domain (src0/src1) and
    // a raw-corpus bucket distribution as exact integer counts, score each doc
    // by Σ c_target[h(tok)] / Σ c_raw[h(tok)] over its token occurrences —
    // the ratio-of-masses linearization of the n-gram importance weight, kept
    // exact: integer sums, one IEEE double division (bit-identical on any
    // engine; no logs). Scale shape: both bucket tables are bounded (≤B rows)
    // and BROADCAST; the token explode is map-side; one shuffle groups by doc.
    // At 100 TB the raw counts would come from a sampled shard — the
    // estimator, not the plan, changes.
    Q("text_dsir_importance",
      (s, dir) => {
        import s.implicits._
        import graft.llm.{TextFunctions => TF}
        val docs = t(s, dir, "documents")
        // three consumers (raw counts, target counts, the per-doc join) would
        // each re-run the md5-bucket tokenization; one checkpoint computes it
        // once (same pattern as the LPA edge list)
        val toks = docs
          .select($"doc_id", $"source", explode(TF.tokens($"text")).as("tok"))
          .select($"doc_id", $"source",
            (digest48($"tok") % 1024L).as("bucket"))
          .localCheckpoint()
        val rawCnt = toks.groupBy($"bucket").agg(count(lit(1)).as("c_raw"))
        val tgtCnt = toks.filter($"source".isin("src0", "src1"))
          .groupBy($"bucket").agg(count(lit(1)).as("c_tgt"))
        toks
          .join(broadcast(rawCnt), "bucket")
          .join(broadcast(tgtCnt), Seq("bucket"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(coalesce($"c_tgt", lit(0L))).as("sum_tgt"),
            sum($"c_raw").as("sum_raw"))
          .select($"doc_id", $"n_tok", $"sum_tgt", $"sum_raw",
            ($"sum_tgt".cast("double") / $"sum_raw".cast("double"))
              .as("importance"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, source,
              |    (${QueryDSL.sqlHexInt("md5(tok)", 1, 12)}) % 1024 AS bucket
              |  FROM (SELECT doc_id, source, unnest(list_filter(
              |          regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'),
              |          x -> x <> '')) AS tok
              |        FROM documents)),
              |raw AS (SELECT bucket, COUNT(*) AS c_raw FROM toks GROUP BY 1),
              |tgt AS (SELECT bucket, COUNT(*) AS c_tgt FROM toks
              |        WHERE source IN ('src0', 'src1') GROUP BY 1)
              |SELECT t.doc_id, COUNT(*) AS n_tok,
              |  CAST(SUM(COALESCE(g.c_tgt, 0)) AS BIGINT) AS sum_tgt,
              |  CAST(SUM(r.c_raw) AS BIGINT) AS sum_raw,
              |  CAST(SUM(COALESCE(g.c_tgt, 0)) AS DOUBLE) /
              |    CAST(SUM(r.c_raw) AS DOUBLE) AS importance
              |FROM toks t
              |JOIN raw r USING (bucket)
              |LEFT JOIN tgt g USING (bucket)
              |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin))
  )
}
