package graft.queries

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
    // never across — so the quadratic pairwise step is bounded by cluster size,
    // not corpus size. At 100 TB: k grows with the corpus (clusters stay ~fixed
    // size), centers broadcast, the pairwise join is an equi-join on cluster id
    // (hash-partitioned, embarrassingly parallel), and the keep-rule is
    // deterministic (drop the HIGHER vec_id of any pair over the threshold).
    // Centers here are the first k vectors (deterministic stand-in for trained
    // centroids — sim_kmeans_lloyd holds the training step itself).
    Q("dedup_semantic_semdedup",
      (s, dir) => {
        import s.implicits._
        val k = 8
        val tau = 0.35d
        val flat = t(s, dir, "embeddings")
          .select($"vec_id", posexplode($"embedding").as(Seq("pos", "vf")))
          .select($"vec_id", $"pos", $"vf".cast("double").as("v"))
        val cents = flat.filter($"vec_id" < k)
          .select($"vec_id".cast("int").as("cid"), $"pos", $"v".as("cval"))
        // assignment: argmin over broadcast centers, decimal-exact distances so
        // the argmin (and thus every downstream row) is bit-stable cross-engine
        val assign = flat.join(broadcast(cents), Seq("pos"))
          .select($"vec_id", $"cid",
            (($"v" - $"cval") * ($"v" - $"cval")).cast("decimal(30,12)").as("sq"))
          .groupBy($"vec_id", $"cid")
          .agg(sum($"sq").cast("double").as("d2"))
          .groupBy($"vec_id")
          .agg(min(struct($"d2", $"cid")).as("m"))
          .select($"vec_id", $"m.cid".as("cluster"))
        val emb = t(s, dir, "embeddings")
          .join(assign, "vec_id")
          .select($"vec_id", $"cluster", $"embedding",
            Similarity.normExact($"embedding").as("nrm"))
        val a = emb.select($"cluster", $"vec_id".as("id1"),
          $"embedding".as("e1"), $"nrm".as("n1"))
        val b = emb.select($"cluster".as("cl2"), $"vec_id".as("id2"),
          $"embedding".as("e2"), $"nrm".as("n2"))
        val dup = a.join(b, $"cluster" === $"cl2" && $"id1" < $"id2")
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
             |cents AS (SELECT vec_id AS cid, pos, v AS cval FROM flat WHERE vec_id < 8),
             |d AS (
             |  SELECT f.vec_id, c.cid,
             |    CAST(SUM(CAST((f.v - c.cval) * (f.v - c.cval) AS DECIMAL(30,12)))
             |      AS DOUBLE) AS d2
             |  FROM flat f JOIN cents c ON f.pos = c.pos GROUP BY 1, 2),
             |a AS (
             |  SELECT vec_id, CAST(cid AS INT) AS cluster FROM
             |    (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
             |       ORDER BY d2, cid) AS rn FROM d)
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
