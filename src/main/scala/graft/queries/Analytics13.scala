package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDSL._

/** Analytics wave 13 — the evaluation-metric gap: the engine scores corpora
  * (quality, dedup, retrieval rankings) but until now could not grade a
  * GENERATED artifact against a reference, nor a ranking against graded
  * relevance, nor a scalar score against a binary outcome. These are the
  * metrics an LLM data/eval pipeline runs after every training round:
  *
  *  - ROUGE-N (summary/reference overlap, the summarization eval standard)
  *  - BLEU-2 (clipped n-gram precision + brevity penalty, the MT standard)
  *  - nDCG@10 (graded-relevance ranking quality over the embedding space)
  *  - MRR@10  (first-relevant-rank reciprocal, the QA/retrieval standard)
  *  - Mann–Whitney AUC (does a scalar score discriminate a binary label —
  *    the classifier-free discrimination readout)
  *
  * Determinism: ROUGE/BLEU/MRR/AUC are built from integer counts and exact
  * rationals; nDCG's log2 discounts and BLEU's exp(·) brevity penalty are
  * libm, so their outputs are quantized to 9 decimals BEFORE further
  * arithmetic (the Bartlett cross-scale lesson, Analytics12). All pair text
  * metrics join on hashed n-gram keys — never all-pairs; everything is
  * groupBy/join shaped and scales linearly in corpus size.
  */
object Analytics13 {

  private val DEC = org.apache.spark.sql.types.DataTypes.createDecimalType(30, 12)

  /** (doc_id, pos, w) token frame — whitespace tokens, empties dropped. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")

  /** Per-pair clipped n-gram overlap: candidate = even doc_id, reference =
    * doc_id+1 (the deterministic pairing). Returns one row per candidate:
    * (doc_id, ov = Σ_g min(c_cand, c_ref), nc = Σ c_cand, nr = Σ c_ref).
    * Pure count algebra — a (doc, gram) groupBy then a gram equi-join within
    * the pair, never a cross. */
  private def clippedOverlap(grams: DataFrame): DataFrame = {
    val cnt = grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val tot = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val c = cnt.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("g"), col("c").as("cc"))
    val r = cnt.filter(col("doc_id") % 2 === 1)
      .select((col("doc_id") - 1).as("doc_id"), col("g"), col("c").as("rc"))
    val ov = c.join(r, Seq("doc_id", "g"))
      .groupBy(col("doc_id")).agg(sum(least(col("cc"), col("rc"))).as("ov"))
    tot.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("n").as("nc"))
      .join(tot.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("doc_id"), col("n").as("nr")), Seq("doc_id"))
      .join(ov, Seq("doc_id"), "left")
      .na.fill(0L, Seq("ov"))
  }

  /** Bigram frame (doc_id, g = "w1 w2") via a per-doc lead — one shuffle,
    * partitioned by doc_id (never a global window). */
  private def bigrams(toks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("w2", lead(col("w"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2")).as("g"))
  }

  private val sqlToks =
    """toks AS (
      |  SELECT doc_id, w, pos FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |           generate_subscripts(string_split(text, ' '), 1) AS pos
      |    FROM documents) WHERE w <> '')""".stripMargin

  private val sqlGramCtes =
    s"""WITH $sqlToks,
       |uni AS (SELECT doc_id, w AS g FROM toks),
       |bg AS (
       |  SELECT doc_id, g FROM (
       |    SELECT doc_id,
       |      w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |    FROM toks) WHERE g IS NOT NULL)""".stripMargin

  /** Oracle CTE producing (doc_id, ov, nc, nr) for gram frame `src`. */
  private def sqlOverlap(src: String, pfx: String): String =
    s"""${pfx}cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM $src GROUP BY 1, 2),
       |${pfx}tot AS (SELECT doc_id, COUNT(*) AS n FROM $src GROUP BY 1),
       |${pfx}ov AS (
       |  SELECT c.doc_id, SUM(LEAST(c.c, r.c)) AS ov
       |  FROM ${pfx}cnt c JOIN ${pfx}cnt r
       |    ON r.doc_id = c.doc_id + 1 AND r.g = c.g
       |  WHERE c.doc_id % 2 = 0 GROUP BY 1),
       |${pfx}pair AS (
       |  SELECT tc.doc_id, COALESCE(o.ov, 0) AS ov, tc.n AS nc, tr.n AS nr
       |  FROM ${pfx}tot tc
       |  JOIN ${pfx}tot tr ON tr.doc_id = tc.doc_id + 1
       |  LEFT JOIN ${pfx}ov o ON o.doc_id = tc.doc_id
       |  WHERE tc.doc_id % 2 = 0)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ROUGE-1/ROUGE-2 between deterministic (even, even+1) document pairs —
    // the summary-vs-reference overlap scores. Everything is exact count
    // rationals: P = ov/nc, R = ov/nr, F = 2PR/(P+R) with a zero-overlap
    // guard; identical double parenthesization in the oracle. Word-soup
    // documents share vocabulary, so ROUGE-1 is structurally positive while
    // ROUGE-2 exercises the near-zero branch — both readouts are honest.
    Q("text_rouge_ngram",
      (s, dir) => {
        import s.implicits._
        // Round-15 persist-sizing rule: a 1-row-group parquet source caches
        // as ONE partition (cached plans are outside AQE reach), serializing
        // every cache read; repartition by doc_id to defaultParallelism
        // BEFORE persist — which also co-partitions the per-doc bigram
        // window and the doc-keyed groupBys downstream.
        val toks = tokens(t(s, dir, "documents").select($"doc_id", $"text"))
          .repartition(s.sparkContext.defaultParallelism, $"doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val o1 = clippedOverlap(toks.select($"doc_id", $"w".as("g")))
        val o2 = clippedOverlap(bigrams(toks))
          .select($"doc_id", $"ov".as("ov2"), $"nc".as("nc2"), $"nr".as("nr2"))
        def fScore(p: Column, r: Column): Column =
          when(p + r > 0.0d, lit(2.0d) * p * r / (p + r)).otherwise(lit(0.0d))
        val p1 = $"ov".cast("double") / $"nc"
        val r1 = $"ov".cast("double") / $"nr"
        val p2 = $"ov2".cast("double") / $"nc2"
        val r2 = $"ov2".cast("double") / $"nr2"
        val res = o1.join(o2, Seq("doc_id"))
          .select($"doc_id",
            round(p1, 9).as("rouge1_p"),
            round(r1, 9).as("rouge1_r"),
            round(fScore(p1, r1), 9).as("rouge1_f"),
            round(fScore(p2, r2), 9).as("rouge2_f"))
          .orderBy($"doc_id")
        toks.unpersist()
        res
      },
      Some(s"""$sqlGramCtes,
              |${sqlOverlap("uni", "u")},
              |${sqlOverlap("bg", "b")}
              |SELECT u.doc_id,
              |  round(CAST(u.ov AS DOUBLE) / u.nc, 9) AS rouge1_p,
              |  round(CAST(u.ov AS DOUBLE) / u.nr, 9) AS rouge1_r,
              |  round(CASE WHEN CAST(u.ov AS DOUBLE) / u.nc
              |                   + CAST(u.ov AS DOUBLE) / u.nr > 0.0
              |    THEN 2.0 * (CAST(u.ov AS DOUBLE) / u.nc)
              |           * (CAST(u.ov AS DOUBLE) / u.nr)
              |         / ((CAST(u.ov AS DOUBLE) / u.nc)
              |            + (CAST(u.ov AS DOUBLE) / u.nr))
              |    ELSE 0.0 END, 9) AS rouge1_f,
              |  round(CASE WHEN CAST(b.ov AS DOUBLE) / b.nc
              |                   + CAST(b.ov AS DOUBLE) / b.nr > 0.0
              |    THEN 2.0 * (CAST(b.ov AS DOUBLE) / b.nc)
              |           * (CAST(b.ov AS DOUBLE) / b.nr)
              |         / ((CAST(b.ov AS DOUBLE) / b.nc)
              |            + (CAST(b.ov AS DOUBLE) / b.nr))
              |    ELSE 0.0 END, 9) AS rouge2_f
              |FROM upair u JOIN bpair b ON b.doc_id = u.doc_id
              |ORDER BY u.doc_id""".stripMargin)),

    // BLEU-2 over the same pairing: clipped modified precisions p1/p2 (exact
    // rationals) composed as sqrt(p1·p2) — sqrt is correctly-rounded IEEE in
    // both engines, so no libm drift — times the brevity penalty
    // exp(1 − nr/nc), whose libm exp runs on a 9-decimal-quantized input and
    // is itself quantized before the final product (Analytics12 ln rule).
    Q("text_bleu_ngram",
      (s, dir) => {
        import s.implicits._
        // Round-15 persist-sizing rule: a 1-row-group parquet source caches
        // as ONE partition (cached plans are outside AQE reach), serializing
        // every cache read; repartition by doc_id to defaultParallelism
        // BEFORE persist — which also co-partitions the per-doc bigram
        // window and the doc-keyed groupBys downstream.
        val toks = tokens(t(s, dir, "documents").select($"doc_id", $"text"))
          .repartition(s.sparkContext.defaultParallelism, $"doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val o1 = clippedOverlap(toks.select($"doc_id", $"w".as("g")))
        val o2 = clippedOverlap(bigrams(toks))
          .select($"doc_id", $"ov".as("ov2"), $"nc".as("nc2"))
        val p1 = $"ov".cast("double") / $"nc"
        val p2 = $"ov2".cast("double") / $"nc2"
        val bp = when($"nc" >= $"nr", lit(1.0d))
          .otherwise(round(exp(round(lit(1.0d) - $"nr".cast("double") / $"nc", 9)), 9))
        val res = o1.join(o2, Seq("doc_id"))
          .select($"doc_id",
            round(p1, 9).as("p1"),
            round(p2, 9).as("p2"),
            round(bp, 9).as("bp"),
            round(bp * sqrt(p1 * p2), 9).as("bleu2"))
          .orderBy($"doc_id")
        toks.unpersist()
        res
      },
      Some(s"""$sqlGramCtes,
              |${sqlOverlap("uni", "u")},
              |${sqlOverlap("bg", "b")},
              |m AS (
              |  SELECT u.doc_id,
              |    CAST(u.ov AS DOUBLE) / u.nc AS p1,
              |    CAST(b.ov AS DOUBLE) / b.nc AS p2,
              |    CASE WHEN u.nc >= u.nr THEN 1.0
              |      ELSE round(exp(round(1.0 - CAST(u.nr AS DOUBLE) / u.nc, 9)), 9)
              |    END AS bp
              |  FROM upair u JOIN bpair b ON b.doc_id = u.doc_id)
              |SELECT doc_id, round(p1, 9) AS p1, round(p2, 9) AS p2,
              |  round(bp, 9) AS bp, round(bp * sqrt(p1 * p2), 9) AS bleu2
              |FROM m ORDER BY doc_id""".stripMargin)),

    // nDCG@10 over the exact-cosine ranking (graded relevance: 2 = same
    // label, 1 = adjacent label, 0 otherwise — gains 2^rel−1 ∈ {0,1,3}).
    // IDCG reorders the RETRIEVED list ideally (the local nDCG@k form —
    // self-contained, no corpus-wide relevant count needed). Each log2
    // discount is ln(rank+1)/ln 2 quantized to 9 decimals before dividing
    // into the gain; term sums are decimal-exact.
    Q("sim_ndcg_eval",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val ranked = graft.llm.Similarity
          .bruteForceTopK(e.filter($"vec_id" < 20), e, k = 10)
          .select($"qid", $"rank", $"vid")
        val lbl = e.select($"vec_id", $"label")
        val j = ranked
          .join(broadcast(lbl.select($"vec_id".as("qid"), $"label".as("ql"))), "qid")
          .join(broadcast(lbl.select($"vec_id".as("vid"), $"label".as("vl"))), "vid")
          .withColumn("rel", when($"ql" === $"vl", 2)
            .when(abs($"ql" - $"vl") === 1, 1).otherwise(0))
          .withColumn("gain", (pow(lit(2.0d), $"rel".cast("double")) - 1.0d))
        def disc(rk: Column): Column =
          round(log(rk.cast("double") + 1.0d) / log(lit(2.0d)), 9)
        val iw = Window.partitionBy($"qid")
          .orderBy($"gain".desc, $"rank")
        val terms = j
          .withColumn("irank", row_number().over(iw))
          .withColumn("term", ($"gain" / disc($"rank")).cast(DEC))
          .withColumn("iterm", ($"gain" / disc($"irank")).cast(DEC))
        terms.groupBy($"qid")
          .agg(sum(($"rel" > 0).cast("int")).as("n_rel"),
            sum($"term").cast("double").as("dcg"),
            sum($"iterm").cast("double").as("idcg"))
          .select($"qid", $"n_rel", round($"dcg", 9).as("dcg"),
            round($"idcg", 9).as("idcg"),
            round(when($"idcg" > 0.0d, $"dcg" / $"idcg").otherwise(lit(0.0d)), 9)
              .as("ndcg10"))
          .orderBy($"qid")
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |         generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |norms AS (
             |  SELECT vec_id,
             |    sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
             |  FROM flat GROUP BY 1),
             |dots AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS vid,
             |    CAST(SUM(CAST(q.v * c.v AS DECIMAL(30,12))) AS DOUBLE) AS dot
             |  FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id <> c.vec_id
             |  WHERE q.vec_id < 20 GROUP BY 1, 2),
             |ranked AS (
             |  SELECT qid, vid, rank FROM (
             |    SELECT d.qid, d.vid,
             |      ROW_NUMBER() OVER (PARTITION BY d.qid
             |        ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.vid) AS rank
             |    FROM dots d
             |    JOIN norms nq ON nq.vec_id = d.qid
             |    JOIN norms nc ON nc.vec_id = d.vid) WHERE rank <= 10),
             |j AS (
             |  SELECT r.qid, r.rank,
             |    CASE WHEN ql.label = vl.label THEN 2
             |         WHEN abs(ql.label - vl.label) = 1 THEN 1 ELSE 0 END AS rel
             |  FROM ranked r
             |  JOIN embeddings ql ON ql.vec_id = r.qid
             |  JOIN embeddings vl ON vl.vec_id = r.vid),
             |g AS (
             |  SELECT qid, rank, rel,
             |    pow(2.0, CAST(rel AS DOUBLE)) - 1.0 AS gain,
             |    ROW_NUMBER() OVER (PARTITION BY qid
             |      ORDER BY pow(2.0, CAST(rel AS DOUBLE)) - 1.0 DESC, rank)
             |      AS irank
             |  FROM j),
             |agg AS (
             |  SELECT qid,
             |    SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_rel,
             |    CAST(SUM(CAST(gain / round(ln(CAST(rank AS DOUBLE) + 1.0)
             |      / ln(2.0), 9) AS DECIMAL(30,12))) AS DOUBLE) AS dcg,
             |    CAST(SUM(CAST(gain / round(ln(CAST(irank AS DOUBLE) + 1.0)
             |      / ln(2.0), 9) AS DECIMAL(30,12))) AS DOUBLE) AS idcg
             |  FROM g GROUP BY 1)
             |SELECT qid, CAST(n_rel AS BIGINT) AS n_rel, round(dcg, 9) AS dcg,
             |  round(idcg, 9) AS idcg,
             |  round(CASE WHEN idcg > 0.0 THEN dcg / idcg ELSE 0.0 END, 9)
             |    AS ndcg10
             |FROM agg ORDER BY qid""".stripMargin)),

    // MRR@10 over the same ranking with binary same-label relevance: one
    // corpus-level row (n_queries, n_hit, mrr10). Reciprocal ranks are exact
    // small rationals; the mean is a decimal sum over ≤20 probe values.
    Q("sim_mrr_eval",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        val ranked = graft.llm.Similarity
          .bruteForceTopK(e.filter($"vec_id" < 20), e, k = 10)
          .select($"qid", $"rank", $"vid")
        val lbl = e.select($"vec_id", $"label")
        val firsts = ranked
          .join(broadcast(lbl.select($"vec_id".as("qid"), $"label".as("ql"))), "qid")
          .join(broadcast(lbl.select($"vec_id".as("vid"), $"label".as("vl"))), "vid")
          .filter($"ql" === $"vl")
          .groupBy($"qid").agg(min($"rank").as("first_rank"))
        val probes = ranked.select($"qid").distinct()
        probes.join(firsts, Seq("qid"), "left")
          .select($"qid",
            coalesce(lit(1.0d) / $"first_rank", lit(0.0d)).cast(DEC).as("rr"))
          .agg(count(lit(1)).as("n_queries"),
            sum(($"rr" > 0).cast("int")).as("n_hit"),
            round(sum($"rr").cast("double") / count(lit(1)), 9).as("mrr10"))
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |         generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |norms AS (
             |  SELECT vec_id,
             |    sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
             |  FROM flat GROUP BY 1),
             |dots AS (
             |  SELECT q.vec_id AS qid, c.vec_id AS vid,
             |    CAST(SUM(CAST(q.v * c.v AS DECIMAL(30,12))) AS DOUBLE) AS dot
             |  FROM flat q JOIN flat c ON q.pos = c.pos AND q.vec_id <> c.vec_id
             |  WHERE q.vec_id < 20 GROUP BY 1, 2),
             |ranked AS (
             |  SELECT qid, vid, rank FROM (
             |    SELECT d.qid, d.vid,
             |      ROW_NUMBER() OVER (PARTITION BY d.qid
             |        ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.vid) AS rank
             |    FROM dots d
             |    JOIN norms nq ON nq.vec_id = d.qid
             |    JOIN norms nc ON nc.vec_id = d.vid) WHERE rank <= 10),
             |firsts AS (
             |  SELECT r.qid, MIN(r.rank) AS first_rank
             |  FROM ranked r
             |  JOIN embeddings ql ON ql.vec_id = r.qid
             |  JOIN embeddings vl ON vl.vec_id = r.vid
             |  WHERE ql.label = vl.label GROUP BY 1),
             |rr AS (
             |  SELECT p.qid,
             |    CAST(COALESCE(CAST(1.0 AS DOUBLE) / f.first_rank, 0.0)
             |      AS DECIMAL(30,12)) AS rr
             |  FROM (SELECT DISTINCT qid FROM ranked) p
             |  LEFT JOIN firsts f ON f.qid = p.qid)
             |SELECT COUNT(*) AS n_queries,
             |  CAST(SUM(CASE WHEN rr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |  round(CAST(SUM(rr) AS DOUBLE) / COUNT(*), 9) AS mrr10
             |FROM rr""".stripMargin)),

    // Tie-aware Mann–Whitney AUC: does line quantity discriminate returned
    // lineitems? AUC = [#(pos>neg) + ½#(pos=neg)] / (n₁n₀), computed from the
    // DISTINCT-score spine (l_quantity's integer domain, ≤50 values at any
    // SF — the sanctioned bounded global window) with per-score pos/neg
    // counts: wins = Σ n₁(s)·cumN₀(<s), ties = Σ n₁(s)·n₀(s). All integer
    // arithmetic until one final double division; honest ≈0.5 readout on
    // this synthetic slice (the statistic is the operator).
    Q("stats_auc_mannwhitney",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_quantity".cast("int").as("sc"),
            ($"l_returnflag" === "R").cast("long").as("y"))
        val d = li.groupBy($"sc")
          .agg(sum($"y").as("n1"), sum(lit(1L) - $"y").as("n0"))
        val w = Window.orderBy($"sc")
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = d.withColumn("c0", coalesce(sum($"n0").over(w), lit(0L)))
        cum.agg(
            sum($"n1").as("n_pos"), sum($"n0").as("n_neg"),
            sum($"n1" * $"c0").as("wins"), sum($"n1" * $"n0").as("ties"))
          .select($"n_pos", $"n_neg",
            (($"wins" * 2 + $"ties").cast("double") / 2.0d).as("u_stat"),
            round(($"wins" * 2 + $"ties").cast("double") /
              (lit(2.0d) * $"n_pos" * $"n_neg"), 9).as("auc"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(l_quantity AS INT) AS sc,
             |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n1,
             |    SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS n0
             |  FROM lineitem GROUP BY 1),
             |cum AS (
             |  SELECT sc, n1, n0,
             |    COALESCE(SUM(n0) OVER (ORDER BY sc
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c0
             |  FROM d),
             |agg AS (
             |  SELECT SUM(n1) AS n_pos, SUM(n0) AS n_neg,
             |    SUM(n1 * c0) AS wins, SUM(n1 * n0) AS ties
             |  FROM cum)
             |SELECT CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_neg AS BIGINT) AS n_neg,
             |  CAST(wins * 2 + ties AS DOUBLE) / 2.0 AS u_stat,
             |  round(CAST(wins * 2 + ties AS DOUBLE)
             |    / (2.0 * n_pos * n_neg), 9) AS auc
             |FROM agg""".stripMargin))
  )
}
