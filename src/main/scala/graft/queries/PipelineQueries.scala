package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Declared queries for the beyond-reference pipeline operators
  * (SURVEY.md §2.3): dedup, similarity search, text analysis, multimodal.
  *
  * Oracle coverage: operators whose arithmetic is ANSI-SQL-expressible
  * (exact dedup, token stats, fingerprints, binary metadata) carry DuckDB
  * oracle SQL; the hash-family operators (MinHash/SimHash/LSH — Spark
  * xxhash64 has no DuckDB twin) are deterministic but rows-only checked
  * here and semantically tested in ScalaTest instead. */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): MetaFrame =
    Tables.loadMeta(s, dir, name)

  /** Shared candidate-pair generation for the exact-cosine queries — the
    * pair query and the connected-components query MUST stay bit-identical
    * (same filter, same fold) for their oracles to agree, so both build from
    * this one definition (and from [[CosinePairsSql]] on the oracle side). */
  private def cosinePairs(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val emb = t(s, d, "embeddings").df.filter(col("vec_id") < 300)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= 0.3)
  }

  /** DuckDB twin of [[cosinePairs]]: CTEs `e` (bounded vectors) and `pairs`
    * (id_a, id_b, cos) with the bit-identical left-to-right dot fold. */
  private val CosinePairsSql: String =
    "e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300), " +
    "pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
    "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
    "(sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
    "sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos " +
    "FROM e a JOIN e b ON a.vec_id < b.vec_id) "

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------ text analysis
    "text_tokencount" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
        .withColumn("n_subtokens", TextFunctions.subTokenCount(col("text")))
        .select("doc_id", "n_tokens", "n_subtokens")
        .orderBy("doc_id")),

    "text_quality" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
        .withColumn("avg_token_len", round(TextFunctions.avgTokenLen(col("text")), 4))
        .withColumn("stopword_hits", TextFunctions.stopwordCount(col("text"), TextFunctions.DefaultStopwords))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .select("doc_id", "n_tokens", "avg_token_len", "stopword_hits", "quality")
        .orderBy("doc_id")),

    "text_lang_distribution" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars").cast(DecimalType(18, 2))).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("lang").df),

    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")),

    // heuristic language-ID: deterministic but not SQL-expressible → rows-only
    "text_langid_pred" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("pred_lang", TextFunctions.langId(col("text")))
        .groupBy("pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("pred_lang").df),

    // ------------------------------------------------------------- dedup
    "dedup_exact_hash" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents").df, "doc_id", "text")
        .orderBy("content_hash")),

    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minHashLsh(t(s, d, "documents").df, "doc_id", "text")
        .orderBy("doc_id")),

    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashSignatures(t(s, d, "documents").df, "doc_id", "text")
        .orderBy("doc_id")),

    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardBestMatch(t(s, d, "documents").df, "doc_id", "text", blockCol = "lang")
        .orderBy("id")),

    "dedup_embedding_cosine" -> ((s, d) =>
      Dedup.embeddingNearDup(t(s, d, "embeddings").df, "vec_id", "embedding",
          dim = 64, threshold = 0.3, nbits = 4)
        .orderBy("id_a", "id_b")),

    // exact all-pairs reference for the LSH-bucketed near-dup above, on a
    // bounded id-range so the quadratic term stays test-sized; DuckDB
    // recomputes the identical left-to-right double fold (list_zip+list_sum)
    "dedup_embedding_cosine_exact" -> ((s, d) =>
      cosinePairs(s, d)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b")),

    // exact connected components (min-label propagation to fixpoint) over
    // the oracle-reproducible cosine candidate pairs; DuckDB re-derives the
    // components with a recursive reachability CTE
    "dedup_cc_exact" -> ((s, d) =>
      Dedup.connectedComponents(
        cosinePairs(s, d).select("id_a", "id_b"), "id_a", "id_b").orderBy("id")),

    // group-level MinHash sketch (TypedImperativeAggregate): per-source
    // signature, then pairwise estimated Jaccard between sources —
    // hash-family arithmetic → rows-only check, semantics in ScalaTest
    "dedup_source_sketch_sim" -> ((s, d) => {
      import graft.expressions.MinHashSketchAgg.{minhashSketch, sketchJaccard}
      import graft.functions.TextFunctions.shingles
      val sketches = t(s, d, "documents").df
        .select(col("source"), transform(shingles(col("text")), sh => xxhash64(sh)).as("hs"))
        .groupBy("source")
        .agg(minhashSketch(col("hs"), 64).as("sig"))
      val a = sketches.select(col("source").as("src_a"), col("sig").as("sig_a"))
      val b = sketches.select(col("source").as("src_b"), col("sig").as("sig_b"))
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
                round(sketchJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
        .orderBy("src_a", "src_b")
    }),

    // -------------------------------------------------- similarity search
    "sim_topk_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings").df
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, "query_id", "query_vec", k = 10)
        .orderBy("query_id", "rank")
    }),

    // end-to-end IVF index path (quantize → probe 2 cells → rank): fully
    // oracle-checked because every step is windows + the reproducible fold
    "sim_topk_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings").df
      val centroids = emb.filter(col("vec_id") % 64 === 0)
        .select((col("vec_id") / 64).cast("int").as("cell_id"), col("embedding").as("centroid_vec"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, "cell_id", "centroid_vec",
          queries, "query_id", "query_vec", k = 10, nprobe = 2)
        .orderBy("query_id", "rank")
    }),

    "sim_topk_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings").df
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.lshTopK(emb, "vec_id", "embedding", queries, "query_id", "query_vec",
          dim = 64, k = 10, nbits = 4)
        .orderBy("query_id", "rank")
    }),

    // --------------------------------------------------------- multimodal
    // frame sampling over binary payloads: row-local slice + explode
    // (deterministic stub decode → rows-only check; plumbing is real)
    "mm_frame_sample" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.attachBinary(t(s, d, "documents").df, "doc_id", "text", "video")
      Multimodal.sampleFrames(media, stride = 2)
        .select("id", "frame_idx", "frame_len")
        .orderBy("id", "frame_idx")
    }),

    // partition-local typed feature extraction (mapPartitions, the JVM
    // analogue of mapInPandas): stub decoder → rows-only check
    "mm_features" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.attachBinary(t(s, d, "documents").df, "doc_id", "text", "image")
      Multimodal.extractFeatures(Multimodal.asMediaDataset(media))
        .toDF()
        .select(col("id"), col("modality"), col("dim"),
          round(element_at(col("features"), 1), 6).as("f0"))
        .orderBy("id")
    }),

    "mm_binary_meta" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          sha2(col("payload"), 256).as("payload_sha256"))
        .orderBy("doc_id")),
  )

  val oracleSql: Map[String, String] = Map(
    "text_tokencount" ->
      ("SELECT doc_id, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens, " +
       "CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subtokens " +
       "FROM documents ORDER BY doc_id"),

    "text_quality" ->
      ("WITH q AS (SELECT doc_id, text, " +
       "CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens, " +
       "CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), " +
       "t -> t IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS stopword_hits " +
       "FROM documents) " +
       "SELECT doc_id, n_tokens, " +
       "round(CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens, 4) AS avg_token_len, " +
       "stopword_hits, " +
       "round(" +
       " CAST(CASE WHEN n_tokens < 5 THEN 0.2 WHEN n_tokens > 5000 THEN 0.3 ELSE 1.0 END AS DOUBLE) * 0.4 + " +
       " CAST(CASE WHEN CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens < 2.0 OR " +
       "       CAST(length(text) - n_tokens + 1 AS DOUBLE) / n_tokens > 12.0 THEN 0.4 ELSE 1.0 END AS DOUBLE) * 0.3 + " +
       " CAST(CASE WHEN CAST(stopword_hits AS DOUBLE) / n_tokens > 0.05 AND " +
       "       CAST(stopword_hits AS DOUBLE) / n_tokens < 0.6 THEN 1.0 ELSE 0.6 END AS DOUBLE) * 0.3, 4) AS quality " +
       "FROM q ORDER BY doc_id"),

    "text_lang_distribution" ->
      ("SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars, " +
       "CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_chars " +
       "FROM documents GROUP BY lang ORDER BY lang"),

    "text_fingerprint" ->
      ("SELECT doc_id, CAST(SUM((length(w) * 131 + ascii(w)) * (length(w) + 7)) AS BIGINT) AS fingerprint " +
       "FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents) " +
       "GROUP BY doc_id ORDER BY doc_id"),

    "dedup_exact_hash" ->
      ("SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS dup_count " +
       "FROM documents GROUP BY md5(text) ORDER BY content_hash"),

    // exact re-derivation of the blocked shingle-set Jaccard best-match:
    // 3-token shingles (whole text when <3 tokens), block = lang,
    // jaccard = |intersect| / |distinct union|, ties broken on partner id
    "dedup_ngram_jaccard" ->
      ("WITH toks AS (SELECT doc_id, lang, list_distinct(" +
       "CASE WHEN len(ts) < 3 THEN [text] " +
       "ELSE [array_to_string(ts[i:i+2], ' ') FOR i IN generate_series(1, len(ts)-2)] END) AS sh " +
       "FROM (SELECT doc_id, lang, text, regexp_split_to_array(text, '\\s+') AS ts FROM documents)), " +
       "pairs AS (SELECT a.doc_id AS id, b.doc_id AS id_b, " +
       "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
       "len(list_distinct(list_concat(a.sh, b.sh))) AS j " +
       "FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id <> b.doc_id) " +
       "SELECT id, id_b AS best_match, round(j, 6) AS jaccard FROM " +
       "(SELECT id, id_b, j, row_number() OVER (PARTITION BY id ORDER BY j DESC, id_b) AS rn " +
       "FROM pairs) WHERE rn = 1 ORDER BY id"),

    "mm_binary_meta" ->
      ("SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, " +
       "md5(text) AS payload_md5, sha256(text) AS payload_sha256 " +
       "FROM documents ORDER BY doc_id"),

    // DuckDB's list_sum(list_transform(list_zip(a,b), ...)) reproduces the
    // engine's left-to-right double-precision dot fold bit-for-bit, so the
    // exact similarity path is fully oracle-checkable.
    "sim_topk_brute" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 5), " +
       "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, " +
       "list_sum(list_transform(list_zip(e.embedding, q.query_vec), " +
       "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
       "(sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
       "sqrt(list_sum(list_transform(q.query_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos " +
       "FROM embeddings e, q WHERE e.vec_id <> q.query_id) " +
       "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos, 6) AS cos FROM " +
       "(SELECT query_id, neighbor_id, cos, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored) " +
       "WHERE rank <= 10 ORDER BY query_id, rank"),

    "sim_topk_ivf" ->
      ("WITH cent AS (SELECT CAST(vec_id / 64 AS INTEGER) AS cell_id, embedding AS centroid_vec " +
       "FROM embeddings WHERE vec_id % 64 = 0), " +
       "q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 5), " +
       "assign AS (SELECT vec_id, cell_id FROM (" +
       "SELECT e.vec_id, c.cell_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
       "list_sum(list_transform(list_zip(e.embedding, c.centroid_vec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
       "(sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
       "sqrt(list_sum(list_transform(c.centroid_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) DESC, c.cell_id) AS rn " +
       "FROM embeddings e CROSS JOIN cent c) WHERE rn = 1), " +
       "probe AS (SELECT query_id, query_vec, cell_id FROM (" +
       "SELECT q.query_id, q.query_vec, c.cell_id, row_number() OVER (PARTITION BY q.query_id ORDER BY " +
       "list_sum(list_transform(list_zip(q.query_vec, c.centroid_vec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
       "(sqrt(list_sum(list_transform(q.query_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
       "sqrt(list_sum(list_transform(c.centroid_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) DESC, c.cell_id) AS rn " +
       "FROM q CROSS JOIN cent c) WHERE rn <= 2), " +
       "cand AS (SELECT p.query_id, e.vec_id AS neighbor_id, " +
       "list_sum(list_transform(list_zip(e.embedding, p.query_vec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
       "(sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
       "sqrt(list_sum(list_transform(p.query_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos " +
       "FROM probe p JOIN assign a ON a.cell_id = p.cell_id " +
       "JOIN embeddings e ON e.vec_id = a.vec_id WHERE e.vec_id <> p.query_id) " +
       "SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cos, 6) AS cos FROM " +
       "(SELECT query_id, neighbor_id, cos, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM cand) " +
       "WHERE rank <= 10 ORDER BY query_id, rank"),

    "dedup_cc_exact" ->
      ("WITH RECURSIVE " + CosinePairsSql + ", " +
       "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs WHERE cos >= 0.3 " +
       "UNION SELECT id_b AS src, id_a AS dst FROM pairs WHERE cos >= 0.3), " +
       "reach(src, dst) AS (SELECT src, dst FROM edges " +
       "UNION SELECT r.src, ed.dst FROM reach r JOIN edges ed ON r.dst = ed.src) " +
       "SELECT src AS id, least(src, min(dst)) AS component FROM reach " +
       "GROUP BY src ORDER BY id"),

    "dedup_embedding_cosine_exact" ->
      ("WITH " + CosinePairsSql +
       "SELECT id_a, id_b, round(cos, 6) AS cos FROM pairs WHERE cos >= 0.3 " +
       "ORDER BY id_a, id_b"),
  )
}
