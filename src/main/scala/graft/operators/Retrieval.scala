package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse keyword retrieval (SURVEY.md §2.3 extensions): BM25 top-k — the
  * lexical counterpart of the dense-ANN family in [[Similarity]], and the
  * standard first-stage retriever for RAG / hard-negative mining over a
  * training corpus (Robertson & Zaragoza 2009; the Lucene-style
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` non-negative idf).
  *
  * DETERMINISM: per-(query, doc, term) scores quantize to integer MICRO
  * units once — idf quantizes to micro-nats at the term level (the
  * [[Corpus]] LM convention, cross-engine-stable under `round(·1e6)`), the
  * tf-normalization factor is a fixed parenthesization of IEEE ops over
  * identical operands — and the per-(query, doc) reduce then sums LONGS,
  * so results are bit-identical at any partitioning and the ranking
  * (score desc, doc asc) can never diverge from the SQL oracle over a
  * summation order.
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * Tokenization is the repo-wide convention (non-empty whitespace
    * tokens, case-sensitive); query terms are DISTINCT per query (bag
    * membership, Lucene-style — query-side repetition does not boost).
    *
    * Scale shape: the corpus never moves — tf/dl/df are per-term and
    * per-doc reduces over the token explosion; the (small) query-term set
    * joins the term-statistics table first, and that enriched term list
    * is BROADCAST to the postings scan, so the only corpus-sized shuffle
    * is the final (query, doc) score reduce, and the top-k per query is
    * the O(k)-state [[graft.expressions.TopKAgg]] with map-side partials
    * (never a global sort). Queries must be a SMALL set (they ride a
    * broadcast) — the contract of every query-driven operator in this
    * repo.
    *
    * Returns (query_id, rank, doc_id, score_micro), rank 1..k by
    * (score_micro desc, doc_id asc). */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(k1 >= 0, "k1 must be non-negative")
    require(b >= 0 && b <= 1, "b must be in [0, 1]")
    val (tfdl, idf) = corpusStats(docs, idCol, textCol)
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
    // enrich the small query-term set with term stats, then broadcast it
    // to the postings scan — the corpus-side tf table never shuffles here
    val qstats = idf.join(broadcast(qterms), Seq("term"))
    scoreAndRank(tfdl.join(broadcast(qstats), Seq("term")), k, k1, b)
  }

  /** The shared corpus-statistics build: `tfdl` = per-(doc, term) tf with
    * the doc length as a whole-partition window over the ALREADY-REDUCED
    * tf table (one doc-key exchange instead of a second corpus aggregate
    * plus a corpus-sized doc_id join), and `idf` = per-term micro-nat idf
    * quantized ONCE (round of identical doubles is engine-stable;
    * everything downstream is exact), with corpus constants riding a
    * 1-row broadcast, never a driver collect. */
  private def corpusStats(
      docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wdoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val tfdl = tf.withColumn("dl", sum(col("tf")).over(wdoc))
    val consts = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tf.agg(sum(col("tf")).as("total_dl")))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfc.crossJoin(broadcast(consts))
      .select(col("term"),
        round(log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * lit(1e6))
          .cast("long").as("idf_micro"),
        col("avgdl"))
    (tfdl, idf)
  }

  /** BM25 with pseudo-relevance-feedback query expansion (the
    * Rocchio/RM-family first-stage trick): round 1 retrieves each query's
    * top `fbDocs` documents, the top `fbTerms` terms of those documents by
    * Σ tf·idf (an exact LONG — integer tf times the already-quantized
    * micro idf, so the feedback ranking is integer-deterministic with term
    * tiebreaks) join the original term set, and round 2 scores the
    * expanded bag through the SAME tail. Recovers vocabulary-mismatch
    * docs the literal terms miss.
    *
    * Scale shape: the corpus stats build once and serve both rounds; the
    * feedback-doc set is (queries × fbDocs) rows — it BROADCASTS onto the
    * tf table to collect feedback term scores, the expanded term set
    * broadcasts back onto the postings scan, and both rounds keep the
    * broadcast-only join discipline of [[bm25TopK]] (plan-pinned). */
  def bm25ExpandedTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      fbDocs: Int = 3,
      fbTerms: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(fbDocs >= 1, "fbDocs must be at least 1")
    require(fbTerms >= 1, "fbTerms must be at least 1")
    val (tfdl, idf) = corpusStats(docs, idCol, textCol)
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
    val qstats = idf.join(broadcast(qterms), Seq("term"))
    val fb = scoreAndRank(tfdl.join(broadcast(qstats), Seq("term")), fbDocs, k1, b)
      .select(col("query_id"), col("doc_id"))
    val fscore = tfdl.join(broadcast(fb), Seq("doc_id"))
      .join(idf.select(col("term"), col("idf_micro")), Seq("term"))
      .groupBy("query_id", "term")
      .agg(sum(col("tf") * col("idf_micro")).as("s"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("s").desc, col("term").asc)
    val ftop = fscore.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= fbTerms)
      .select("query_id", "term")
    val eterms = qterms.select("query_id", "term").union(ftop).distinct()
    val eqstats = idf.join(broadcast(eterms), Seq("term"))
    scoreAndRank(tfdl.join(broadcast(eqstats), Seq("term")), k, k1, b)
  }

  /** Dirichlet-smoothed query-likelihood top-k (Zhai & Lafferty 2001) —
    * the other classical sparse scorer next to BM25, and the standard
    * LM-retrieval baseline: rank docs by
    * `Σ_t∈q ln(1 + tf_td/(μ·P(t|C))) + |q|·ln(μ/(dl_d + μ))`, the
    * rank-equivalent decomposition of the smoothed query likelihood whose
    * first sum runs over MATCHED terms only — which is what lets the
    * scorer run off the same postings join as BM25 instead of touching
    * every (query, doc) pair. `P(t|C)` is the collection unigram model
    * (cf_t / total collection tokens). Candidates are docs matching ≥ 1
    * query term (the inverted-index contract; an unmatched doc's score is
    * pure background mass and is never a useful answer).
    *
    * DETERMINISM (the BM25 conventions): each matched term quantizes ONCE
    * — `round(ln(1 + tf/(μ·p)) · 1e6)` over fixed-parenthesization
    * doubles — the per-(query, doc) reduce sums LONGS, and the per-doc
    * length norm `round(ln(μ/(dl+μ)) · |q| · 1e6)` quantizes once and
    * adds as a long; ranking is the shared [[rankTopK]] tail.
    *
    * Scale shape is [[bm25TopK]]'s: corpus stats are per-term/per-doc
    * reduces, the (small) query-term set broadcasts onto the postings
    * scan, and per-query top-k is the O(k)-state TopKAgg.
    *
    * Returns (query_id, rank, doc_id, score_micro), rank 1..k by
    * (score_micro desc, doc_id asc); scores are ≤ 0 in micro-nats. */
  def qlDirichletTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      mu: Double = 2000.0): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(mu > 0, "mu must be positive")
    val (tfdl, _) = corpusStats(docs, idCol, textCol)
    val totals = tfdl.agg(sum(col("tf")).as("total_cf"))
    val pbg = tfdl.groupBy("term").agg(sum(col("tf")).as("cf"))
      .crossJoin(broadcast(totals))
      .select(col("term"),
        (col("cf").cast("double") / col("total_cf")).as("p_bg"))
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
    val qn = qterms.groupBy("query_id").agg(count(lit(1)).as("qn"))
    val qstats = pbg.join(broadcast(qterms), Seq("term"))
    val matched = tfdl.join(broadcast(qstats), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("dl"),
        round(log(lit(1.0) + col("tf").cast("double") / (lit(mu) * col("p_bg"))) * lit(1e6))
          .cast("long").as("tsm"))
      .groupBy("query_id", "doc_id", "dl")
      .agg(sum(col("tsm")).as("m"))
    val scores = matched.join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("m") + round(log(lit(mu) / (col("dl") + lit(mu))) * col("qn") * lit(1e6))
          .cast("long")).as("score_micro"))
    rankTopK(scores, k)
  }

  private def queryTerms(
      queries: DataFrame, queryIdCol: String, queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol).as("query_id"),
        explode(split(coalesce(col(queryTextCol), lit("")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .distinct()

  /** Shared scoring tail over an enriched postings frame carrying
    * (query_id, doc_id, tf, dl, idf_micro, avgdl) — the SAME fixed
    * parenthesization (mirrored verbatim in the oracle SQL) for the
    * inline and indexed paths, which is what makes them bit-equal.
    *
    * ID CONTRACT (the [[Similarity.knnGraph]] rule): an INTEGRAL doc id
    * rides the O(k)-state [[graft.expressions.TopKAgg]] through its
    * lossless long slot and is cast back to its original type on output;
    * any other id type (string, decimal, fractional) ranks through the
    * equivalent per-query window formulation — same
    * (score desc, doc_id asc) total order — because squeezing those
    * through a long cast would NULL (non-ANSI) or collide the ids. */
  private def scoreAndRank(enriched: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    val scores = enriched
      .select(col("query_id"), col("doc_id"),
        round(col("idf_micro").cast("double") *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))))
          .cast("long").as("term_score_micro"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("term_score_micro")).as("score_micro"))
    rankTopK(scores, k)
  }

  /** The shared per-query ranking tail over (query_id, doc_id,
    * score_micro) rows — the ID CONTRACT half of [[scoreAndRank]],
    * factored out so every scorer (BM25, query-likelihood) ranks through
    * one code path. */
  private def rankTopK(scores: DataFrame, k: Int): DataFrame = {
    import graft.expressions.TopKAgg.topKByScore
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = scores.schema("doc_id").dataType
    val integralId = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integralId)
      scores
        .select(col("query_id"),
          struct(col("score_micro").cast("double").as("score"),
            col("doc_id").cast("long").as("id")).as("__c"))
        .groupBy("query_id")
        .agg(topKByScore(col("__c"), k).as("__topk"))
        .select(col("query_id"), posexplode(col("__topk")))
        .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").cast(idType).as("doc_id"), col("col.score").cast("long").as("score_micro"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score_micro").desc, col("doc_id").asc)
      scores.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .select(col("query_id"), col("__rk").cast("long").as("rank"),
          col("doc_id"), col("score_micro"))
    }
  }

  /** The persisted-index kind tag ([[graft.sources.MetaPersist]]). */
  val IndexKind = "bm25_index"

  /** Materialize the full BM25 index — one row per posting carrying every
    * query-time statistic: (term, doc_id, tf, dl, idf_micro, avgdl). The
    * corpus-wide tf⋈idf join is paid ONCE here (index build) instead of
    * per query batch; avgdl rides as a constant column so the artifact is
    * self-contained and scoring is bit-exact after reload (a sidecar
    * double would round-trip through JSON). Written via
    * [[graft.sources.MetaPersist.writeModel]], kind-tagged so a scorer
    * handed the wrong artifact fails loudly at load. */
  def bm25Index(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit =
    graft.sources.MetaPersist.writeModel(
      bm25IndexFrame(docs, idCol, textCol),
      path, IndexKind, Map("id" -> idCol, "text" -> textCol))

  /** The [[bm25Index]] frame without the persistence step — one row per
    * posting: (term, doc_id, tf, dl, idf_micro, avgdl). The in-memory
    * handle the incremental path composes over. */
  def bm25IndexFrame(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val (tfdl, idf) = corpusStats(docs, idCol, textCol)
    tfdl.join(idf, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("idf_micro"), col("avgdl"))
  }

  /** Incremental index refresh: merge DOC-DISJOINT batch indexes into one
    * index frame equal to the one-shot [[bm25IndexFrame]] over the union
    * corpus — so ingestion pipelines refresh the retrieval index by
    * indexing only the NEW batch and merging, never re-tokenizing the
    * whole corpus (the [[Graph.coOccurrenceMergeStores]] precedent
    * applied to retrieval). Posting rows (term, doc_id, tf, dl) are
    * per-doc facts and compose by plain union; the corpus-GLOBAL columns
    * (df → idf_micro, avgdl) are stale after composition and recompute
    * here from the merged postings with the IDENTICAL arithmetic and
    * quantization as the one-shot build — counts are exact longs and the
    * idf/avgdl doubles see the same operands, so the merged index is
    * BIT-EQUAL to the one-shot one (spec-pinned) and anything served from
    * it ranks identically.
    *
    * Caveats (both structural): batches must be doc-disjoint (a doc
    * re-indexed in two batches would double its postings — dedup upstream
    * with the ingestion layer's exactly-once discipline), and token-LESS
    * docs leave no posting rows, so they are invisible to the merged
    * n_docs constant (the one-shot build counts them; every other score
    * component is unaffected).
    *
    * Scale shape: one union + one distinct over (doc_id, dl) + one
    * term-key reduce; the 1-row constants ride a broadcast. Nothing
    * re-reads the corpus text. */
  def bm25MergeIndexes(indexes: Seq[DataFrame]): DataFrame = {
    require(indexes.nonEmpty, "need at least one index to merge")
    val postings = indexes
      .map(_.select(col("term"), col("doc_id"), col("tf"), col("dl")))
      .reduce(_ unionAll _)
    // (doc_id, dl) is one row per doc by the posting-row construction
    val docsSide = postings.select(col("doc_id"), col("dl")).distinct()
    val consts = docsSide.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    val idf = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(consts))
      .select(col("term"),
        round(log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * lit(1e6))
          .cast("long").as("idf_micro"),
        col("avgdl"))
    postings.join(idf, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("idf_micro"), col("avgdl"))
  }

  /** [[bm25TopKIndexed]] over an in-memory index frame (a
    * [[bm25IndexFrame]] / [[bm25MergeIndexes]] result): same broadcast
    * discipline, same scoring tail, no persistence round-trip. */
  def bm25TopKFromIndex(
      index: DataFrame,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
    scoreAndRank(index.join(broadcast(qterms), Seq("term")), k, k1, b)
  }

  /** Ranking evaluation (recall@k, DCG@k, nDCG@k) of any ranked candidate
    * list against a relevance-judgment table (qrels: one row per known
    * (query, doc) with an integer grade ≥ 1; unjudged retrieved docs count
    * as grade 0, the TREC convention) — the measurement half of the
    * retrieval stack: a retriever you can't score is a retriever you can't
    * tune.
    *
    * DETERMINISM: each rank position's gain quantizes ONCE —
    * `round(1e6 · rel / log2(rank + 1))` over integer rel and rank — and
    * DCG/IDCG are LONG sums of those terms; nDCG is one long/long IEEE
    * divide quantized once. The ideal ordering ranks judgments by
    * (grade desc, doc asc), so every number is bit-stable against the SQL
    * oracle.
    *
    * Scale shape: the ranked list is top-k-truncated per query and qrels
    * are sparse positives — both query-keyed, bounded tables; one left
    * join on (query, doc), one IDCG window over qrels with rank pushdown,
    * per-query reduces. Nothing corpus-sized enters.
    *
    * Returns one row per query in `ranked`: (query_id, n_retrieved,
    * n_relevant, hits, recall_micro, rr_micro, dcg_micro, idcg_micro,
    * ndcg_micro) — `rr_micro` is the reciprocal rank of the first
    * relevant hit (`round(1e6 / rank)`, the MRR summand); recall/ndcg
    * are NULL for queries with no judged-relevant docs and rr for
    * queries with no relevant hit retrieved. */
  def evalRanking(
      ranked: DataFrame,
      qrels: DataFrame,
      k: Int = 10,
      queryIdCol: String = "query_id",
      idCol: String = "doc_id",
      rankCol: String = "rank",
      relCol: String = "rel"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val gain = (rel: Column, rank: Column) =>
      round((rel.cast("double") * lit(1e6)) / log2(rank + lit(1L))).cast("long")
    val r = ranked
      .filter(col(rankCol) <= k)
      .select(col(queryIdCol).as("query_id"), col(idCol), col(rankCol).as("__rank"))
      .join(qrels.select(col(queryIdCol).as("query_id"), col(idCol),
        col(relCol).as("__rel")), Seq("query_id", idCol.toString), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    val perQuery = r.groupBy("query_id").agg(
      count(lit(1)).as("n_retrieved"),
      sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("hits"),
      min(when(col("__rel") > 0, col("__rank"))).as("__fr"),
      sum(gain(col("__rel"), col("__rank"))).as("dcg_micro"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col(relCol).desc, col(idCol).asc)
    val ideal = qrels
      .select(col(queryIdCol).as("query_id"), col(idCol), col(relCol))
      .withColumn("__irank", row_number().over(wIdeal).cast("long"))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_relevant"),
        sum(when(col("__irank") <= k, gain(col(relCol), col("__irank")))
          .otherwise(0L)).as("idcg_micro"))
    perQuery.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"), col("n_retrieved"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"), col("hits"),
        when(col("n_relevant") > 0,
          round((col("hits").cast("double") * lit(1e6)) / col("n_relevant"))
            .cast("long")).as("recall_micro"),
        when(col("__fr").isNotNull,
          round(lit(1e6) / col("__fr")).cast("long")).as("rr_micro"),
        col("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        when(col("idcg_micro") > 0,
          round((col("dcg_micro").cast("double") * lit(1e6)) / col("idcg_micro"))
            .cast("long")).as("ndcg_micro"))
  }

  /** Reciprocal-Rank-Fusion of N ranked candidate lists (Cormack,
    * Clarke & Büttcher 2009): the standard hybrid-retrieval combiner —
    * fuse a sparse BM25 list with a dense ANN list without comparing
    * their incommensurable scores, using only each list's RANKS:
    * `rrf(d) = Σ_lists 1/(k0 + rank_list(d))`, then re-rank the candidate
    * union. k0=60 is the paper's constant.
    *
    * DETERMINISM: each per-list contribution quantizes ONCE to integer
    * micro units — `round(1e6 / (k0 + rank))` over an integer rank is a
    * single IEEE divide of identical operands, engine-stable — and the
    * fuse is a LONG sum, so the fused ordering can never diverge from
    * the SQL oracle. Ties break by id ascending.
    *
    * Scale shape: inputs are already top-k-truncated per query (they come
    * from this repo's top-k operators), so the candidate union is at most
    * `lists.size × listK` rows per query — bounded, query-local data. The
    * re-rank window partitions by query over that bounded set; no
    * corpus-sized state ever reaches this operator (the heavy lifting
    * stays in the upstream retrievers). Id columns keep their original
    * type end-to-end (the [[Similarity]]-family convention).
    *
    * Each list must expose (`queryIdCol`, `rankCol`, `idCol`) with
    * union-compatible types. Returns (query_id, rank, <idCol>,
    * rrf_micro, n_lists), rank 1..k by (rrf_micro desc, id asc);
    * `n_lists` = how many input lists proposed the candidate. */
  def rrfFuse(
      lists: Seq[DataFrame],
      k: Int = 10,
      k0: Int = 60,
      queryIdCol: String = "query_id",
      idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 1, "k must be at least 1")
    require(k0 >= 1, "k0 must be at least 1")
    val contrib = lists.map(_.select(
        col(queryIdCol).as("query_id"),
        col(idCol),
        round(lit(1e6) / (lit(k0.toLong) + col(rankCol)))
          .cast("long").as("__c")))
      .reduce(_ union _)
    val fused = contrib.groupBy("query_id", idCol)
      .agg(sum(col("__c")).as("rrf_micro"), count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol),
        col("rrf_micro"), col("n_lists"))
  }

  /** BM25 top-k against a materialized [[bm25Index]]: the corpus is never
    * re-tokenized — query terms broadcast straight onto the index scan
    * and the shared scoring tail runs unchanged, so results are
    * BIT-EQUAL to the inline [[bm25TopK]] over the same corpus (pinned
    * in OpsSpec). */
  def bm25TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val index = graft.sources.MetaPersist.readModel(spark, path, IndexKind).df
    bm25TopKFromIndex(index, queries, queryIdCol, queryTextCol, k, k1, b)
  }
}
