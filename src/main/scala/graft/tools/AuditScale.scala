package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: runs the heavy pipeline queries at a given sf, printing row
  * counts, wall time, and asserting no CartesianProduct/BroadcastNestedLoop
  * appears in any physical plan. Run: `sbt "runMain graft.tools.AuditScale [sfDir]"`. */
object AuditScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heavy = Seq(
      "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
      "dedup_embedding_cosine", "sim_topk_brute", "sim_topk_lsh",
      "text_fingerprint", "join_asof", "dedup_exact_hash")
    var bad = 0
    heavy.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // brute-force top-k intentionally uses a broadcast nested loop on the
      // tiny query set; everything else must be hash/sort based
      val flagged = cartesian || (bnlj && name != "sim_topk_brute")
      if (flagged) bad += 1
      println(f"[audit] $name%-24s rows=$n%-8d ${secs}%.2fs cartesian=$cartesian bnlj=$bnlj${if (flagged) "  <-- BAD" else ""}")
    }
    println(s"[audit] flagged=$bad")
    spark.stop()
  }
}
