package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDSL._
import graft.llm.{TextFunctions => TF}

/** Search/retrieval-side operators over the document corpus: inverted-index
  * construction, BM25 relevance scoring, and hierarchical path rollups. These are
  * the index-build and ranking primitives a corpus pipeline runs AFTER cleaning —
  * the reference's pipelines end at opaque transforms, so these are engine-native
  * extensions (same rationale as [[Analytics]]).
  *
  * Scale notes: index construction is one explode + one shuffle on the term key
  * (the posting list per term is built by the same map-side-combined aggregation
  * that powers word count); BM25 needs only the tf/df/dl aggregates plus a
  * broadcast of the per-corpus scalars (N, avgdl) — no per-query rescan of the
  * corpus. Determinism per [[QueryDSL]]: posting lists render sorted, score sums
  * use a fixed association order, log-based scores round to 9 digits (the
  * tf-idf precedent).
  */
object Retrieval {

  val queries: Seq[Q] = Seq(

    // Inverted index build: term → (document frequency, total term frequency,
    // bounded posting-list head). df/tf are plain aggregates; the top-20 posting
    // head goes through the native TopKPerGroup operator, whose map-side k-row
    // partials keep every buffer O(20) — a collect_set-then-slice would
    // accumulate a stopword term's ENTIRE posting list in one aggregation
    // buffer before slicing, exactly the skew OOM a 100 TB index build must
    // avoid. (A production index would write full postings as bucketed parquet
    // runs — the shard_shuffle_write query covers that layout.)
    Q("text_inverted_index",
      (s, dir) => {
        import s.implicits._
        val terms = t(s, dir, "documents")
          .select($"doc_id", explode(TF.tokens($"text")).as("term"))
        val stats = terms.groupBy($"term")
          .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("tf_total"))
        val heads = graft.plans.TopK.perGroup(
            terms.distinct(), Seq("term"), $"doc_id", k = 20, descending = false)
          .groupBy($"term")
          .agg(concat_ws(",",
            transform(array_sort(collect_list($"doc_id")),
              x => x.cast("string"))).as("posting_head"))
        stats.join(heads, Seq("term")).orderBy($"term")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id,
             |    unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |           x -> x <> '')) AS term
             |  FROM documents)
             |SELECT term,
             |  count(DISTINCT doc_id) AS df,
             |  CAST(count(*) AS BIGINT) AS tf_total,
             |  array_to_string(
             |    list_transform(
             |      list_slice(list_sort(list_distinct(list(doc_id))), 1, 20),
             |      x -> CAST(x AS VARCHAR)), ',') AS posting_head
             |FROM terms GROUP BY term ORDER BY term""".stripMargin)),

    // BM25 ranking (k1 = 1.2, b = 0.75) for a fixed 3-term query. The corpus
    // scalars (N, avgdl) broadcast; tf/df/dl are the only shuffled aggregates.
    // The per-document score sums its ≤3 term contributions in a FIXED pivoted
    // order (conditional aggregates, not a float SUM over an unordered group),
    // so the double result is partitioning-independent; ln() matches across
    // engines (tf-idf precedent) and the output rounds to 9 digits.
    Q("text_bm25_score",
      (s, dir) => {
        import s.implicits._
        val qTerms = Seq("spark", "join", "merge")
        val docs = t(s, dir, "documents")
          .select($"doc_id", TF.tokens($"text").as("toks"))
          .select($"doc_id", $"toks", size($"toks").cast("bigint").as("dl"))
        val scalars = docs.agg(
          count(lit(1)).as("n_docs"),
          sum($"dl").as("total_tokens"))
        val terms = docs.select($"doc_id", $"dl", explode($"toks").as("term"))
          .filter($"term".isin(qTerms: _*))
        val tf = terms.groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
        val df = terms.select($"doc_id", $"term").distinct()
          .groupBy($"term").agg(count(lit(1)).as("df"))
        val avgdl = $"total_tokens".cast("double") / $"n_docs"
        val idf = log(($"n_docs".cast("double") - $"df" + lit(0.5)) /
          ($"df" + lit(0.5)) + lit(1.0))
        val contrib = idf * ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / avgdl))
        val scored = tf.join(broadcast(df), Seq("term")).crossJoin(broadcast(scalars))
          .select($"doc_id", $"term", contrib.as("c"))
        val perTerm = qTerms.map(qt =>
          coalesce(max(when($"term" === qt, $"c")), lit(0.0d)))
        scored.groupBy($"doc_id")
          .agg((perTerm(0) + perTerm(1) + perTerm(2)).as("raw"))
          .select($"doc_id", round($"raw", 9).as("bm25"))
          .orderBy($"bm25".desc, $"doc_id")
          .limit(20)
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |                x -> x <> '') AS toks
             |  FROM documents),
             |d2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM docs),
             |scalars AS (SELECT count(*) AS n_docs,
             |                   CAST(SUM(dl) AS BIGINT) AS total_tokens FROM d2),
             |terms AS (
             |  SELECT doc_id, dl, unnest(toks) AS term FROM d2),
             |ft AS (SELECT * FROM terms WHERE term IN ('spark', 'join', 'merge')),
             |tf AS (SELECT doc_id, dl, term, count(*) AS tf
             |       FROM ft GROUP BY doc_id, dl, term),
             |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM ft GROUP BY term),
             |scored AS (
             |  SELECT tf.doc_id, tf.term,
             |    ln((n_docs * 1.0 - df + 0.5) / (df + 0.5) + 1.0) *
             |      (tf * 2.2) /
             |      (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n_docs)))
             |      AS c
             |  FROM tf JOIN df ON df.term = tf.term CROSS JOIN scalars)
             |SELECT doc_id,
             |  round((COALESCE(MAX(CASE WHEN term = 'spark' THEN c END), 0.0) +
             |         COALESCE(MAX(CASE WHEN term = 'join'  THEN c END), 0.0)) +
             |         COALESCE(MAX(CASE WHEN term = 'merge' THEN c END), 0.0), 9)
             |    AS bm25
             |FROM scored GROUP BY doc_id
             |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),

    // Hierarchical path rollup: explode each document's (synthesized) storage path
    // into its cumulative prefixes (site → section → page) and count docs + chars
    // per prefix — the trie-shaped directory audit (du -s per level) as one
    // generator + one aggregation. Map-side combine keeps the shuffle at
    // O(distinct prefixes); no recursion, no driver walk.
    Q("text_path_hierarchy",
      (s, dir) => {
        import s.implicits._
        val segs = array(
          concat(lit("site"), ($"doc_id" % 3).cast("string")),
          concat(lit("sec"), ($"doc_id" % 5).cast("string")),
          concat(lit("page"), ($"doc_id" % 25).cast("string")))
        t(s, dir, "documents")
          .select($"doc_id", $"n_chars", segs.as("segs"))
          .select($"doc_id", $"n_chars",
            explode(transform(sequence(lit(1), size($"segs")),
              i => struct(i.as("level"),
                array_join(slice($"segs", lit(1), i), "/").as("prefix")))).as("p"))
          .groupBy($"p.level".as("level"), $"p.prefix".as("prefix"))
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
          .orderBy($"level", $"prefix")
      },
      Some("""WITH u AS (
             |  SELECT doc_id, n_chars,
             |    ['site' || CAST(doc_id % 3 AS VARCHAR),
             |     'sec'  || CAST(doc_id % 5 AS VARCHAR),
             |     'page' || CAST(doc_id % 25 AS VARCHAR)] AS segs
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, n_chars,
             |    unnest(list_transform(generate_series(1, len(segs)),
             |      i -> {'level': i, 'prefix': array_to_string(list_slice(segs, 1, i), '/')}))
             |      AS p
             |  FROM u)
             |SELECT CAST(p.level AS INTEGER) AS level, p.prefix AS prefix,
             |  count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM e GROUP BY p.level, p.prefix ORDER BY level, prefix""".stripMargin)),

    // Jaro-Winkler record linkage over the part-name vocabulary via the NATIVE
    // graft expressions (graft.functions.JaroWinklerSimilarity — codegen'd, no
    // UDF). Candidate pairs are BANDED by first word before scoring (an equi-join
    // on the band key), so the pair space is per-band quadratic in DISTINCT names
    // — bounded by vocabulary, not corpus size; the full-corpus analogue would
    // band by prefix/length exactly like the fuzzy-edit dedup path. Scores round
    // to 9 digits (shared double formula, same policy as tf-idf) and the
    // threshold compares the ROUNDED value so the keep/drop boundary is
    // engine-exact.
    Q("dedup_jaro_names",
      (s, dir) => {
        import s.implicits._
        import graft.functions.StringSimFunctions.{jaro_similarity, jaro_winkler_similarity}
        val names = t(s, dir, "part").select($"p_name").distinct()
          .select($"p_name", substring_index($"p_name", " ", 1).as("band"))
        val a = names.select($"band", $"p_name".as("name1"))
        val b = names.select($"band", $"p_name".as("name2"))
        a.join(b, Seq("band"))
          .filter($"name1" < $"name2")
          .select($"name1", $"name2",
            round(jaro_similarity($"name1", $"name2"), 9).as("jaro"),
            round(jaro_winkler_similarity($"name1", $"name2"), 9).as("jw"))
          .filter($"jw" >= 0.5)
          .orderBy($"name1", $"name2")
      },
      Some("""WITH names AS (
             |  SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS band FROM part)
             |SELECT a.p_name AS name1, b.p_name AS name2,
             |  round(jaro_similarity(a.p_name, b.p_name), 9) AS jaro,
             |  round(jaro_winkler_similarity(a.p_name, b.p_name), 9) AS jw
             |FROM names a JOIN names b
             |  ON a.band = b.band AND a.p_name < b.p_name
             |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 9) >= 0.5
             |ORDER BY name1, name2""".stripMargin)),

    // Bigram language-model surprisal (perplexity-style quality scoring — the
    // classic LM-based corpus filter): add-1-smoothed bigram probabilities
    // p(w2|w1) = (c(w1w2)+1)/(c(w1)+V) are exact integer ratios; each bigram's
    // −ln p goes through DECIMAL before the per-document sum, so the mean
    // surprisal is partitioning-independent (a raw double SUM over an unordered
    // group is not). Counts shuffle on the bigram key; the unigram/vocab side is
    // a broadcast (vocabulary ≪ corpus — the standard LM-scoring join shape).
    Q("text_bigram_surprisal",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", TF.tokens($"text").as("toks"))
        val bg = docs.select($"doc_id", explode(TF.ngrams($"toks", 2)).as("bg"))
        val c2 = bg.groupBy($"bg").agg(count(lit(1)).as("c2"))
        val uni = docs.select(explode($"toks").as("w"))
          .groupBy($"w").agg(count(lit(1)).as("c1"))
          .withColumn("v", count(lit(1)).over(Window.partitionBy()))
        val surpr = -log(($"c2" + 1).cast("double") / ($"c1" + $"v"))
        bg.join(c2, Seq("bg"))
          .join(broadcast(uni), substring_index($"bg", " ", 1) === $"w")
          .select($"doc_id", surpr.cast("decimal(30,12)").as("s"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round((sum($"s").cast("double") / count(lit(1))), 6).as("mean_surprisal"))
          .orderBy($"doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |                x -> x <> '') AS toks
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id,
             |    unnest(list_transform(generate_series(1, len(toks) - 1),
             |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
             |  FROM docs WHERE len(toks) >= 2),
             |c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY bg),
             |u0 AS (SELECT unnest(toks) AS w FROM docs),
             |uni AS (SELECT w, count(*) AS c1 FROM u0 GROUP BY w),
             |uni2 AS (SELECT w, c1, count(*) OVER () AS v FROM uni),
             |j AS (
             |  SELECT bg.doc_id,
             |    CAST(-ln(CAST(c2.c2 + 1 AS DOUBLE) / (uni2.c1 + uni2.v))
             |      AS DECIMAL(30,12)) AS s
             |  FROM bg JOIN c2 USING (bg)
             |  JOIN uni2 ON split_part(bg.bg, ' ', 1) = uni2.w)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  round(CAST(SUM(s) AS DOUBLE) / count(*), 6) AS mean_surprisal
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
