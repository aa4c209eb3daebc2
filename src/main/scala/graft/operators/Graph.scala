package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge

/** Link-graph centrality (SURVEY.md §2.3 extensions): integer-quantized
  * PageRank for corpus curation — the seed-quality / domain-importance
  * signal web-corpus pipelines rank domains with (Page et al. 1999; used
  * for crawl prioritization and source weighting in public web-corpus
  * recipes). Expressed join-by-join on DataFrames, not a graph library.
  *
  * DETERMINISM (the repo-wide micro-unit discipline): ranks live in
  * integer MICRO units (1.0 ≡ 1,000,000), every per-edge contribution is
  * damped and floor-divided in integer arithmetic BEFORE the per-target
  * sum, and integer sums are order-independent — so the result is
  * bit-identical at any partitioning and exactly re-derivable by unrolled
  * ANSI-SQL CTEs (the oracle form). No doubles anywhere.
  */
object Graph {

  /** Reliable checkpoint when a checkpoint dir is set, executor-local
    * otherwise — the [[Dedup]] iterative-loop convention. */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Integer PageRank over a directed edge list. Per iteration, every
    * node's new rank is
    *
    *   base + Σ_incoming (dampingMicro · (r_src div out_deg(src))) div 10⁶
    *
    * with base = 10⁶ − dampingMicro and all ranks starting at 10⁶ (one
    * unit of un-normalized mass per node — PageRank up to a constant
    * factor, the form that needs no global N in the inner loop). Dangling
    * nodes (no outgoing edges) keep receiving but contribute nothing —
    * their mass share leaks, the standard simplification when ranks are
    * used as an ORDERING signal rather than a probability. Duplicate and
    * NULL-endpoint edges are dropped up front; out-degree counts distinct
    * targets.
    *
    * Scale shape: per iteration exactly two shuffles — the ranks⋈edges
    * join on src and the contribution sum on dst — both on graph keys,
    * nothing driver-side; each round is checkpointed so the plan stays
    * O(1) deep regardless of `iterations`. Overflow bound: per-target
    * sums stay within Long for total graph mass up to ~9·10¹² micro-units
    * per receiving node; the damping multiply needs any SINGLE node's rank
    * below ~10¹³ micro (≈10⁷ nodes' worth of mass concentrated on one
    * hub) — beyond that, scale `dampingMicro` precision down.
    *
    * Returns one row per node: (id, rank_micro), id typed as the edge
    * endpoint columns. */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      dampingMicro: Long = 850000L): DataFrame = {
    require(iterations >= 1 && iterations <= 100, "iterations must be in [1, 100]")
    require(dampingMicro >= 0 && dampingMicro <= 1000000L,
      "dampingMicro must be in [0, 1000000]")
    val base = 1000000L - dampingMicro
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("__deg"))
    // edges with out-degree attached, checkpointed once: the loop's join
    // input never recomputes the distinct or the degree reduce
    val ewd = truncate(e0.join(deg, Seq("src")))
    val nodes = truncate(
      e0.select(col("src").as("id")).union(e0.select(col("dst").as("id"))).distinct())
    var ranks = truncate(nodes.withColumn("rank_micro", lit(1000000L)))
    var inflight: DataFrame = null
    try {
      var i = 0
      while (i < iterations) {
        val contrib = ewd
          .join(ranks, ewd("src") === ranks("id"))
          // `div` is Spark's exact integer floor-division on longs — the
          // double `/` would round above 2^53 and break bit-reproducibility
          .select(col("dst"),
            expr(s"(${dampingMicro}L * (rank_micro div __deg)) div 1000000L").as("__c"))
          .groupBy("dst").agg(sum(col("__c")).as("__s"))
        val next = truncate(
          nodes.join(contrib, nodes("id") === contrib("dst"), "left")
            .select(nodes("id"),
              (lit(base) + coalesce(col("__s"), lit(0L))).as("rank_micro")))
        inflight = next
        graftbridge.freeCheckpoint(ranks)
        ranks = next
        inflight = null
        i += 1
      }
    } catch {
      case t: Throwable =>
        if (inflight != null && (inflight ne ranks)) graftbridge.freeCheckpoint(inflight)
        graftbridge.freeCheckpoint(ranks)
        graftbridge.freeCheckpoint(ewd)
        graftbridge.freeCheckpoint(nodes)
        throw t
    }
    graftbridge.freeCheckpoint(ewd)
    graftbridge.freeCheckpoint(nodes)
    ranks
  }

  /** Cluster-size audit over a connected-components labeling (any
    * (node, component) frame, e.g. [[Dedup.connectedComponents]]'s
    * output) — the OVER-MERGE detector for the dedup families: a banding
    * threshold set too loose shows up as one giant component absorbing
    * the corpus, and this histogram is where that becomes a number
    * (`nodes_share_micro` of the top size class). Two key-bounded reduces
    * (component sizes, then size classes — ≤ distinct sizes rows) plus a
    * broadcast 1-row total; the share quantizes once
    * (`round((size · count · 1e6) / total_nodes)`).
    *
    * Returns (component_size, n_components, n_nodes, nodes_share_micro),
    * one row per observed size class. */
  def componentSizes(
      cc: DataFrame,
      componentCol: String = "component"): DataFrame = {
    val hist = cc.groupBy(col(componentCol)).agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .withColumn("n_nodes", col("component_size") * col("n_components"))
    hist.crossJoin(broadcast(cc.agg(count(lit(1)).as("__n"))))
      .select(col("component_size"), col("n_components"), col("n_nodes"),
        round((col("n_nodes") * lit(1e6)) / col("__n")).cast("long")
          .as("nodes_share_micro"))
  }
}
