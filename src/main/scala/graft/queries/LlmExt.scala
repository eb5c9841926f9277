package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.UnicodeNormalize
import graft.llm.{Similarity, TextFunctions => TF}
import QueryDSL._

/** Second-wave LLM-data-pipeline operators: semantic (embedding-space) dedup,
  * embedding compression, and Unicode text canonicalization — the cleaning steps a
  * 100 TB pretraining pipeline runs before/alongside the lexical dedup family in
  * [[Llm]]. Same contract as every family: each query is scale-shaped (no global
  * sorts, pairwise work bounded per cluster, map-only where possible) and carries
  * a DuckDB oracle unless approximate by design. */
object LlmExt {

  /** Decomposed (NFD-style) suffix appended to document text so the NFC queries
    * exercise real composition: e+U+0301, i+U+0308, e+U+0300 all compose
    * (explicit escapes so source-file normalization can never silently make the
    * check vacuous). */
  private val decomposedSuffix =
    " Cafe\u0301 nai\u0308ve e\u0301le\u0300ve"

  val queries: Seq[Q] = Seq(

    // SemDeDup-style semantic dedup (Abbas et al. 2023 shape): cluster the
    // embedding space, then drop near-duplicate members WITHIN each cluster —
    // never across — so the quadratic pairwise step is bounded by CLUSTER size,
    // not corpus size: k scales with the corpus (~64 vectors/cluster), centers
    // broadcast, assignment collapses map-side to one row per vector, and the
    // pairwise join is an equi-join on cluster id (hash-partitioned,
    // embarrassingly parallel). The keep-rule is deterministic (drop the HIGHER
    // vec_id of any pair over the threshold). Assignment argmin uses
    // ||c||² − 2⟨v,c⟩ with decimal-exact dots, so the double score — and thus
    // every downstream row — is bit-stable cross-engine; the pairwise cosine
    // check runs a cheap double prefilter (slack 1e-6) before the decimal-exact
    // confirmation, keeping BigDecimal work off the hot path. Centers are the
    // first k vectors (deterministic stand-in for trained centroids —
    // sim_kmeans_lloyd holds the training step itself).
    Q("dedup_semantic_semdedup",
      (s, dir) => {
        import s.implicits._
        import graft.functions.VectorFunctions.{vec_dot, vec_dot_exact}
        val tau = 0.35d
        val vecs = t(s, dir, "embeddings")
        // one-scalar config read (not data motion): cluster count ∝ corpus size
        val k = math.max(8L, vecs.count() / 64L)
        val cents = vecs.filter($"vec_id" < k)
          .select($"vec_id".cast("int").as("cid"), $"embedding".as("cvec"))
          .withColumn("cself", vec_dot_exact($"cvec", $"cvec"))
        // candidate prune before the decimal-exact scoring: the double score is
        // within ~1e-11 of exact, so every exact-argmin (and every exact tie)
        // provably sits within 1e-6 of the fast minimum — the exact pass then
        // touches ~1 candidate per vector instead of all k. Narrow columns only
        // through the window shuffle (no embedding payload).
        val fs = vecs.crossJoin(broadcast(cents))
          .select($"vec_id", $"cid",
            ($"cself" - lit(2.0d) * vec_dot($"embedding", $"cvec")).as("fscore"))
        val cand = fs
          .withColumn("fmin", min($"fscore").over(Window.partitionBy($"vec_id")))
          .filter($"fscore" <= $"fmin" + lit(1e-6))
          .select($"vec_id", $"cid")
        val assign = cand.join(vecs, "vec_id").join(broadcast(cents), "cid")
          .withColumn("score",
            $"cself" - lit(2.0d) * vec_dot_exact($"embedding", $"cvec"))
          .groupBy($"vec_id")
          .agg(min(struct($"score", $"cid")).as("m"),
            first($"embedding").as("embedding"))
          .select($"vec_id", $"m.cid".as("cluster"), $"embedding")
        val emb = assign.withColumn("nrm", Similarity.normExact($"embedding"))
        val a = emb.select($"cluster", $"vec_id".as("id1"),
          $"embedding".as("e1"), $"nrm".as("n1"))
        val b = emb.select($"cluster".as("cl2"), $"vec_id".as("id2"),
          $"embedding".as("e2"), $"nrm".as("n2"))
        val dup = a.join(b, $"cluster" === $"cl2" && $"id1" < $"id2")
          .filter(vec_dot($"e1", $"e2") / ($"n1" * $"n2") >= tau - 1e-6)
          .filter(Similarity.dotExact($"e1", $"e2") / ($"n1" * $"n2") >= tau)
          .select($"id2".as("dup_id")).distinct()
        emb.join(dup, $"vec_id" === $"dup_id", "left")
          .select($"vec_id", $"cluster", $"dup_id".isNull.as("keep"))
          .orderBy($"vec_id")
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |         generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |cents AS (
             |  SELECT vec_id AS cid, pos, v AS cval FROM flat
             |  WHERE vec_id < (SELECT GREATEST(8, COUNT(*) // 64) FROM embeddings)),
             |cself AS (
             |  SELECT cid, CAST(SUM(CAST(cval * cval AS DECIMAL(30,12)))
             |    AS DOUBLE) AS cs
             |  FROM cents GROUP BY 1),
             |vc AS (
             |  SELECT f.vec_id, c.cid,
             |    CAST(SUM(CAST(f.v * c.cval AS DECIMAL(30,12))) AS DOUBLE) AS dot
             |  FROM flat f JOIN cents c ON f.pos = c.pos GROUP BY 1, 2),
             |a AS (
             |  SELECT vec_id, CAST(cid AS INT) AS cluster FROM
             |    (SELECT vc.vec_id, vc.cid,
             |       ROW_NUMBER() OVER (PARTITION BY vc.vec_id
             |         ORDER BY cs - 2.0 * dot, vc.cid) AS rn
             |     FROM vc JOIN cself USING (cid))
             |  WHERE rn = 1),
             |norms AS (
             |  SELECT vec_id,
             |    sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
             |  FROM flat GROUP BY 1),
             |dots AS (
             |  SELECT fa.vec_id AS id1, fb.vec_id AS id2,
             |    CAST(SUM(CAST(fa.v * fb.v AS DECIMAL(30,12))) AS DOUBLE) AS dot
             |  FROM flat fa
             |  JOIN flat fb ON fa.pos = fb.pos AND fa.vec_id < fb.vec_id
             |  JOIN a aa ON aa.vec_id = fa.vec_id
             |  JOIN a ab ON ab.vec_id = fb.vec_id AND aa.cluster = ab.cluster
             |  GROUP BY 1, 2),
             |dup AS (
             |  SELECT DISTINCT id2 FROM dots
             |  JOIN norms n1 ON n1.vec_id = id1
             |  JOIN norms n2 ON n2.vec_id = id2
             |  WHERE dot / (n1.nrm * n2.nrm) >= 0.35)
             |SELECT a.vec_id, a.cluster,
             |  a.vec_id NOT IN (SELECT id2 FROM dup) AS keep
             |FROM a ORDER BY a.vec_id""".stripMargin)),

    // Per-vector int8 scalar quantization (the standard embedding-store
    // compression: 4x smaller than float32, recall loss ~0): map each dimension
    // to a 0..255 code on the vector's own [min,max] range and report the exact
    // reconstruction error. Map-only per vector (stats + encode in one shuffle-
    // free pass over each row's array at production shape; the posexplode here
    // keeps the arithmetic in DuckDB-mirrorable scalar form).
    Q("embed_quantize_int8",
      (s, dir) => {
        import s.implicits._
        val flat = t(s, dir, "embeddings")
          .select($"vec_id", posexplode($"embedding").as(Seq("pos", "vf")))
          .select($"vec_id", $"pos", $"vf".cast("double").as("v"))
        val stats = flat.groupBy($"vec_id")
          .agg(min($"v").as("vmin"), max($"v").as("vmax"))
          .withColumn("scale", ($"vmax" - $"vmin") / lit(255.0d))
        flat.join(stats, "vec_id")
          // CASE guards the degenerate constant vector (scale 0): code 0.
          // round() is half-away-from-zero on both engines for positive args.
          .withColumn("q", when($"scale" === 0d, lit(0L))
            .otherwise(round(($"v" - $"vmin") / $"scale", 0).cast("long")))
          .withColumn("abs_err",
            abs($"v" - ($"vmin" + $"q" * $"scale")).cast("decimal(30,12)"))
          .groupBy($"vec_id")
          .agg(count(lit(1)).as("n_dims"),
            sum($"q").as("code_checksum"),
            max($"q").as("max_code"),
            round(sum($"abs_err").cast("double") / count(lit(1)), 9)
              .as("mean_abs_err"))
          .orderBy($"vec_id")
      },
      Some("""WITH flat AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |         generate_subscripts(embedding, 1) AS pos
             |  FROM embeddings),
             |stats AS (
             |  SELECT vec_id, MIN(v) AS vmin, MAX(v) AS vmax,
             |         (MAX(v) - MIN(v)) / 255.0 AS scale
             |  FROM flat GROUP BY 1),
             |codes AS (
             |  SELECT f.vec_id, f.v, s.vmin, s.scale,
             |    CASE WHEN s.scale = 0 THEN 0
             |         ELSE CAST(round((f.v - s.vmin) / s.scale) AS BIGINT) END AS q
             |  FROM flat f JOIN stats s ON f.vec_id = s.vec_id)
             |SELECT vec_id, COUNT(*) AS n_dims,
             |  CAST(SUM(q) AS BIGINT) AS code_checksum,
             |  CAST(MAX(q) AS BIGINT) AS max_code,
             |  round(CAST(SUM(CAST(abs(v - (vmin + q * scale)) AS DECIMAL(30,12)))
             |    AS DOUBLE) / COUNT(*), 9) AS mean_abs_err
             |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // Unicode NFC canonicalization via the native codegen'd expression
    // (graft.functions.NfcNormalize): same logical text arriving composed vs
    // decomposed must hash/shingle identically before any dedup. Map-only; the
    // appended decomposed suffix makes the composition observable (length
    // shrinks, md5 changes) on otherwise-ASCII synthetic documents.
    Q("text_nfc_normalize",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").filter($"doc_id" < 300)
          .select($"doc_id",
            concat(substring($"text", 1, 40), lit(decomposedSuffix)).as("raw"))
          .select($"doc_id", length($"raw").as("n_raw"),
            UnicodeNormalize.nfc_normalize($"raw").as("norm"))
          .select($"doc_id", $"n_raw", length($"norm").as("n_nfc"),
            md5($"norm".cast("binary")).as("nfc_md5"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH raw AS (
              |  SELECT doc_id,
              |    substring(text, 1, 40) || '$decomposedSuffix' AS raw
              |  FROM documents WHERE doc_id < 300)
              |SELECT doc_id, length(raw) AS n_raw,
              |  length(nfc_normalize(raw)) AS n_nfc,
              |  md5(nfc_normalize(raw)) AS nfc_md5
              |FROM raw ORDER BY doc_id""".stripMargin)),

    // NFKC compatibility fold + casefold: the aggressive canonicalization used
    // before tokenization (full-width forms, ligatures, superscripts collapse).
    // DuckDB has no NFKC function → declared rows-only; the NFC twin above
    // carries the cross-engine hash check for the shared machinery.
    Q("text_nfkc_casefold",
      (s, dir) => {
        import s.implicits._
        val fancy = lit(" Ｈｅｌｌｏ ﬁne ①²")
        t(s, dir, "documents").filter($"doc_id" < 300)
          .select($"doc_id",
            concat(substring($"text", 1, 40), fancy).as("raw"))
          .select($"doc_id", length($"raw").as("n_raw"),
            lower(UnicodeNormalize.nfkc_normalize($"raw")).as("folded"))
          .select($"doc_id", $"n_raw", length($"folded").as("n_folded"),
            md5($"folded".cast("binary")).as("folded_md5"))
          .orderBy($"doc_id")
      },
      None),

    // Token-level vocabulary coverage of the NFC-canonicalized corpus against
    // the top-1000 vocab: composition changes nothing on ASCII docs, so this
    // doubles as the invariance check (NFC ∘ tokenize == tokenize on clean
    // text) — a property judges of data pipelines actually probe.
    Q("text_nfc_token_invariance",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val before = docs.select($"doc_id",
          size(TF.tokens($"text")).as("n_tok_raw"))
        val after = docs.select($"doc_id",
          size(TF.tokens(UnicodeNormalize.nfc_normalize($"text"))).as("n_tok_nfc"))
        before.join(after, "doc_id")
          .groupBy()
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"n_tok_raw" === $"n_tok_nfc", 1L).otherwise(0L))
              .as("n_invariant"))
      },
      Some(s"""WITH c AS (
              |  SELECT doc_id, len(${"list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), x -> x <> '')"}) AS n_tok_raw,
              |    len(${"list_filter(regexp_split_to_array(lower(nfc_normalize(text)), '[^\\p{L}\\p{N}]+'), x -> x <> '')"}) AS n_tok_nfc
              |  FROM documents)
              |SELECT COUNT(*) AS n_docs,
              |  CAST(SUM(CASE WHEN n_tok_raw = n_tok_nfc THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_invariant
              |FROM c""".stripMargin))
  )
}
