package graft

import graft.dedup.NearDedup
import graft.functions.{TextFunctions, VectorFunctions}
import graft.multimodal.Multimodal
import graft.similarity.Knn
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal plumbing) over the `documents` / `embeddings`
  * fixtures. SQL-expressible ones carry a DuckDB oracle; sketch-based ones
  * (minhash/simhash/LSH) are deterministic but checked rows-only here and
  * exactly in the ScalaTest suite.
  */
object TrainingDataQueries {

  val all: Seq[QDef] = Seq(

    // ---- exact dedup by normalized content hash ----
    QDef("q09_dedup_exact",
      (s, dir) => NearDedup.exactByContent(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
             |FROM documents
             |GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
             |ORDER BY doc_id""".stripMargin)),

    // ---- token counting ----
    QDef("q20_token_stats",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_actual"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS n_tokens,
             |length(text) AS n_chars_actual
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- quality signals ----
    QDef("q21_quality",
      (s, dir) => {
        val t = col("text")
        val nChars = length(t).cast("double")
        val nTok = TextFunctions.tokenCount(t).cast("double")
        Tables.documents(s, dir).select(col("doc_id"),
          nChars.cast("long").as("n_chars"),
          nTok.cast("long").as("n_tokens"),
          round(nChars / greatest(nTok, lit(1.0)), 4).as("mean_token_len"),
          round(length(regexp_replace(t, "[^.,!?;:]", "")).cast("double") /
            greatest(nChars, lit(1.0)), 4).as("punct_ratio"),
          round(length(regexp_replace(t, "[^0-9]", "")).cast("double") /
            greatest(nChars, lit(1.0)), 4).as("digit_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, length(text) AS n_chars,
             |len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS n_tokens,
             |round(CAST(length(text) AS DOUBLE) / greatest(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)), 1), 4) AS mean_token_len,
             |round(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 4) AS punct_ratio,
             |round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 4) AS digit_ratio
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- language identification (heuristic; vs ground-truth lang col) ----
    QDef("q22_lang_detect",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred")),
      None),

    // ---- sentiment (lexicon scorer; replaces reference N2) ----
    QDef("q23_sentiment",
      (s, dir) => Tables.documents(s, dir)
        .select(TextFunctions.sentiment(col("text")).as("sentiment"))
        .groupBy(col("sentiment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("sentiment")),
      None),

    // ---- MinHash + LSH near-dup (verified by exact Jaccard) ----
    QDef("q24_minhash_pairs",
      (s, dir) => NearDedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          shingleLen = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b")),
      None),

    // ---- MinHash over char shingles (CJK-safe variant of q24). Char
    //      n-grams are far denser than word shingles, so longer shingles
    //      (6) and fewer/wider bands (8x8) keep the candidate set sparse:
    //      P(collide | j=0.9) ≈ 97%, P(collide | j=0.3) ≈ 0.5%. ----
    QDef("q38_minhash_char",
      (s, dir) => NearDedup.minhashPairsChar(Tables.documents(s, dir), "doc_id", "text",
          shingleLen = 6, k = 64, bands = 8, threshold = 0.6)
        .orderBy(col("id_a"), col("id_b")),
      None),

    // ---- SimHash near-dup (custom Catalyst expression) ----
    QDef("q25_simhash_pairs",
      (s, dir) => NearDedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
          maxHamming = 6)
        .orderBy(col("id_a"), col("id_b")),
      None),

    // ---- exact n-gram Jaccard within a blocking key ----
    QDef("q26_ngram_jaccard",
      (s, dir) => NearDedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          blockCol = "lang", n = 3, threshold = 0.3)
        .orderBy(col("block"), col("id_a"), col("id_b")),
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, lang,
             |    CASE WHEN len(toks) >= 3 THEN
             |      list_distinct(list_transform(range(1, len(toks) - 1),
             |        i -> array_to_string(toks[i:i+2], ' ')))
             |    ELSE [] END AS sh
             |  FROM t)
             |SELECT a.lang AS block, a.doc_id AS id_a, b.doc_id AS id_b,
             |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             |        greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS jaccard
             |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             |      greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.3
             |ORDER BY block, id_a, id_b""".stripMargin)),

    // ---- brute-force cosine top-k (baseline ANN) ----
    QDef("q27_knn_brute",
      (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        Knn.bruteForceTopK(embs.filter(col("vec_id") < 10), embs,
            "vec_id", "embedding", 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
             |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cosine,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) DESC, e.vec_id) AS rank
             |  FROM embeddings q, embeddings e
             |  WHERE q.vec_id < 10 AND e.vec_id != q.vec_id)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // ---- LSH-bucketed approximate top-k (scale path; recall tested in suite) ----
    QDef("q28_knn_lsh",
      (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        Knn.lshTopK(embs.filter(col("vec_id") < 10), embs,
            "vec_id", "embedding", dim = 64, k = 5, nBits = 16, bands = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ---- embedding cosine threshold join (exact baseline, oracle-checked;
    //      NearDedup.embeddingPairs is the LSH scale path, recall-tested in
    //      the suite — this fixture has no near-dup vectors, max cos 0.51) ----
    QDef("q34_embedding_dedup",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        a.crossJoin(b)
          .filter(col("id_a") < col("id_b"))
          .withColumn("cosine", round(VectorFunctions.cosine(col("va"), col("vb")), 6))
          .filter(col("cosine") >= 0.45)
          .select(col("id_a"), col("id_b"), col("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- composite quality score (fully oracle-checked arithmetic) ----
    QDef("q35_quality_score",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")),
      Some("""WITH q AS (
             |  SELECT doc_id,
             |    CAST(length(text) AS DOUBLE) AS n_chars,
             |    CAST(greatest(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)), 1) AS DOUBLE) AS n_tok,
             |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) AS punct,
             |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
             |    CAST(len(list_intersect(list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)),
             |      ['the','a','of','and','to','in','is','it','you','that','was','for','on','are','with','as','this','have','not','be'])) AS DOUBLE) AS stop_hits
             |  FROM documents)
             |SELECT doc_id,
             |  round(least(n_chars / 500.0, 1.0) * 0.3
             |      + greatest(0.0, 1.0 - round(punct / greatest(n_chars, 1.0), 4) * 5.0) * 0.25
             |      + greatest(0.0, 1.0 - round(digits / greatest(n_chars, 1.0), 4) * 5.0) * 0.2
             |      + least(round(stop_hits / n_tok, 4) * 4.0, 1.0) * 0.25, 4) AS quality
             |FROM q ORDER BY doc_id""".stripMargin)),

    // ---- IVF approximate top-k (coarse-quantizer cells + nProbe re-rank;
    //      recall vs brute force tested in the suite) ----
    QDef("q37_knn_ivf",
      (s, dir) => {
        val embs = Tables.embeddings(s, dir)
        Knn.ivfTopK(embs.filter(col("vec_id") < 10), embs,
            "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ---- BPE-ish subword counting + doc fingerprint cardinality ----
    QDef("q36_subword_stats",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.subwordCount(col("text")).cast("long").as("n_subwords"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_words"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_subwords,
             |len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS n_words
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- multimodal plumbing: binary payload -> stub decode -> features ----
    QDef("q33_multimodal_features",
      (s, dir) => {
        val media = Multimodal.asMedia(Tables.documents(s, dir), "doc_id", "text", "text")
        media
          .withColumn("features", Multimodal.decodeFeatures(col("payload"), 8))
          .select(col("media_id"), col("kind"),
            col("meta.n_bytes").as("n_bytes"),
            round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
            round(element_at(col("features"), 8).cast("double"), 6).as("f7"))
          .orderBy(col("media_id"))
      },
      None))
}
