package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-rehearsal data amplifier: writes an sf1-equivalent dataset derived
  * from the driver's sf0.1 tables (no sf1 testdata is shipped and
  * `/root/testdata` is read-only), `copies`× the rows with the join graph
  * preserved:
  *
  *  - fact/dim tables that scale with sf (customer, supplier, part, orders,
  *    lineitem, events): `copies` key-shifted replicas — every key column
  *    (pk and fk alike) is offset by `i * KeyStride`, so each replica joins
  *    only within itself and fan-out per key is exactly the original;
  *  - region/nation: copied once (fixed-cardinality dims, TPC-H style);
  *  - documents: doc_id shifted; the text rewrite depends on `vocabMode`:
  *      - `"bijection"` (default): for replica i>0 every whitespace token
  *        is rewritten to a 16-hex (64-bit) digest keyed by i. The token
  *        map is injective up to digest collisions — negligible at this
  *        vocabulary size (birthday bound ≈ n²/2⁶⁵) — so token counts,
  *        shingle structure and within-replica Jaccard are preserved to
  *        that approximation while replicas share ~no shingles; the
  *        near-dup workload scales linearly instead of planting every doc
  *        in a 10-way duplicate clique (which would quadratically blow up
  *        any shingle-indexed join and measure a different workload, not a
  *        bigger one). The price: replica vocabularies are DISJOINT, so an
  *        LM trained on (or frozen against) the amplified corpus scores
  *        replica tokens as unseen and a quality gate drops most amplified
  *        docs — LM-gated composites measure collapsed work, not 10× work.
  *      - `"reuse"`: replica i>0 keeps the SOURCE vocabulary but
  *        deterministically permutes each doc's token sequence (sort by
  *        md5(token, position, i) — a replica-keyed total order). The
  *        token MULTISET is unchanged, so unigram LM statistics and the
  *        gate's keep fraction match the source exactly, while n-gram
  *        locality is destroyed: two independent hash-orders of a diverse
  *        token sequence share ~no 3-gram shingles, so replicas are not
  *        near-dups of the source or of each other and dedup stages still
  *        scale linearly. Use for LM-gated composite entries; keep
  *        bijection for dedup-focused entries (disjointness is the
  *        stronger guarantee there).
  *  - embeddings: vec_id shifted; replica i's vectors are component-rotated
  *    by i positions — norms and within-replica cosines are bit-preserved,
  *    cross-replica similarity is scrambled. KeyStride is a multiple of 64
  *    so the `vec_id % 64` centroid pattern recurs per replica.
  *
  * Run: `sbt "runMain graft.tools.Amplify [outDir] [copies]"`.
  */
object Amplify {
  val KeyStride = 10000000L // > any sf0.1 key; multiple of 64

  /** Key columns to offset per table (pk + fks, so each replica is a closed
    * join subgraph). */
  val KeyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def replica(df: DataFrame, table: String, i: Int, vocabMode: String = "bijection"): DataFrame = {
    val off = KeyStride * i
    val shifted = KeyCols(table).foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(off)))
    table match {
      case "documents" if i > 0 && vocabMode == "reuse" =>
        // replica-keyed deterministic permutation of the token sequence:
        // (position makes duplicate tokens' keys unique → total order)
        val keyed = transform(split(col("text"), "\\s+"),
          (t, idx) => struct(
            md5(concat_ws("#", t, idx.cast("string"), lit(i))).as("k"), t.as("t")))
        val ordered = array_sort(keyed, (l, r) =>
          when(l("k") < r("k"), -1).when(l("k") > r("k"), 1).otherwise(0))
        shifted
          .withColumn("text", array_join(transform(ordered, s => s("t")), " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "documents" if i > 0 =>
        shifted
          .withColumn("text",
            array_join(
              transform(split(col("text"), "\\s+"),
                t => substring(md5(concat_ws("#", t, lit(i))), 1, 16)),
              " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      case "embeddings" if i > 0 =>
        val rot = i % 64
        shifted.withColumn("embedding",
          concat(slice(col("embedding"), rot + 1, 64 - rot), slice(col("embedding"), 1, rot)))
      case _ => shifted
    }
  }

  def amplify(spark: SparkSession, srcDir: String, outDir: String, copies: Int,
      vocabMode: String = "bijection"): Unit = {
    require(Set("bijection", "reuse").contains(vocabMode),
      s"vocabMode must be bijection or reuse, got $vocabMode")
    Tables.All.foreach { table =>
      val base = Tables.load(spark, srcDir, table)
      val out =
        if (!KeyCols.contains(table)) base // region/nation: fixed dims
        else (0 until copies).map(i => replica(base, table, i, vocabMode))
          .reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"[amplify] $table ($vocabMode) -> $outDir/$table.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/scale/sf1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val vocabMode = args.lift(2).getOrElse("bijection")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    amplify(spark, "/root/testdata/sf0.1", outDir, copies, vocabMode)
    spark.stop()
  }
}
