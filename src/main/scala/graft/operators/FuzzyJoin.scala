package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching (SURVEY.md §2.3 extensions): the
  * entity-resolution primitive — find all string pairs within Levenshtein
  * distance `maxDist` WITHOUT the quadratic all-pairs scan, using the
  * PassJoin segment-partition principle (Li, Deng, Jiang, Feng:
  * "PassJoin: A Partition-based Method for Similarity Joins", VLDB 2012):
  * partition one side's string into `maxDist + 1` contiguous segments;
  * any pair within distance `maxDist` must, by pigeonhole, share at least
  * one segment EXACTLY (an alignment with ≤ d errors leaves ≥ 1 of d+1
  * segments untouched), and that segment's position shifts by at most the
  * errors before it (≤ d). So candidates reduce to an EQUI-join on
  * (segment index, source length, segment text) between one side's
  * segments and the other side's bounded substring probes — recall is
  * STRUCTURALLY exact, and every candidate confirms with the codegen'd
  * `levenshtein` before emission, so precision is exact too.
  *
  * Scale shape: segments are (d+1) rows per string, probes
  * O((d+1)·(2d+1)²) rows per string — both LINEAR in the corpus for the
  * small `maxDist` entity resolution uses (1–3); the only shuffle is the
  * segment-key equi-join (Σfreq² over segment keys, the inverted-index
  * cost class of the MinHash/winnow families, never corpus²); confirm is
  * row-local. Strings shorter than d+1 chars cannot host d+1 non-empty
  * segments, so the pigeonhole does not apply — they ride a separate
  * bounded branch (short × ≤2d-length partners, both tiny by
  * construction) instead of being silently dropped.
  *
  * DETERMINISM: Levenshtein distance is integer dynamic programming —
  * bit-identical across engines, so the oracle is DuckDB's own
  * `levenshtein` over the quadratic reference. */
object FuzzyJoin {

  /** All intra-corpus pairs with `levenshtein(strA, strB) <= maxDist`,
    * id_a < id_b, each pair once: (id_a, id_b, dist). NULL strings never
    * match. */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 6,
      "maxDist must be in [1, 6] (probe count grows as (d+1)(2d+1)^2)")
    val base = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        length(col(strCol)).as("__len"))
    val cand = candidates(base, base, maxDist)
      .filter(col("id_a") < col("id_b"))
    confirm(cand, maxDist)
  }

  /** Two-table variant: every (left, right) pair within `maxDist` —
    * record linkage between two entity tables. Returns
    * (id_a, id_b, dist) with id_a from `a` and id_b from `b`. */
  def editDistanceJoin(
      a: DataFrame,
      idColA: String,
      strColA: String,
      b: DataFrame,
      idColB: String,
      strColB: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 6,
      "maxDist must be in [1, 6] (probe count grows as (d+1)(2d+1)^2)")
    val ba = a.filter(col(strColA).isNotNull)
      .select(col(idColA).as("__id"), col(strColA).as("__s"),
        length(col(strColA)).as("__len"))
    val bb = b.filter(col(strColB).isNotNull)
      .select(col(idColB).as("__id"), col(strColB).as("__s"),
        length(col(strColB)).as("__len"))
    confirm(candidates(ba, bb, maxDist), maxDist)
  }

  /** One-call entity resolution: fuzzy pairs → connected components →
    * canonical election. Every input row (including NULL-string rows,
    * which can never match and stay singletons) gets exactly one output
    * row: (idCol, component, canonical_id, is_canonical, n_members).
    * The canonical member is the highest `scoreCol` (id-asc tiebreak),
    * or the minimum id when no score is given — both deterministic.
    *
    * Scale shape: pairs are the PassJoin equi-join (linear candidates),
    * components are checkpointed O(log n) pointer jumping over the pair
    * graph only, and assignment + election ride ONE component-key
    * exchange (all three windows share the partitioning). */
  def entityResolve(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      scoreCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = editDistancePairs(df, idCol, strCol, maxDist)
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "__cc_id")
    val score = scoreCol.map(col).getOrElse(lit(0L))
    val assigned = df
      .join(comp, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"),
        score.as("__score"))
    val order = Window.partitionBy(col("component"))
      .orderBy(col("__score").desc, col(idCol).asc)
    val whole = Window.partitionBy(col("component"))
    assigned
      .withColumn("canonical_id", first(col(idCol)).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_members", count(lit(1)).over(whole))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
      .select(col(idCol), col("component"), col("canonical_id"),
        col("is_canonical"), col("n_members"))
  }

  /** Candidate pairs (id_a, id_b, __sa, __sb), distinct, from the
    * segment ⋈ probe equi-join plus the short-string branch. Both inputs
    * carry (__id, __s, __len). */
  private def candidates(a: DataFrame, b: DataFrame, d: Int): DataFrame = {
    // ---- side A: d+1 even segments per string (segment j of a length-l
    // string spans [floor(j·l/(d+1)), floor((j+1)·l/(d+1))), 1-based
    // substring positions)
    val segStart = (j: Column, l: Column) => floor(j * l / (d + 1)) + 1
    val aSeg = a.filter(col("__len") >= d + 1)
      .select(col("__id").as("id_a"), col("__s").as("__sa"),
        col("__len").as("__la"),
        explode(sequence(lit(0), lit(d))).as("__i"))
      .withColumn("__p", segStart(col("__i"), col("__la")))
      .withColumn("__sl", segStart(col("__i") + 1, col("__la")) - col("__p"))
      .filter(col("__sl") >= 1)
      .select(col("id_a"), col("__sa"), col("__i"), col("__la"),
        expr("substring(__sa, __p, __sl)").as("__seg"))
    // ---- side B: for every candidate source length l within ±d of its
    // own length, the substrings matching segment i's length at positions
    // shifted by at most ±d — the PassJoin probe set
    val bProbe = b
      .select(col("__id").as("id_b"), col("__s").as("__sb"),
        col("__len").as("__lb"),
        explode(sequence(greatest(col("__len") - d, lit(d + 1)),
          col("__len") + d)).as("__la"))
      .withColumn("__i", explode(sequence(lit(0), lit(d))))
      .withColumn("__p0", segStart(col("__i"), col("__la")))
      .withColumn("__sl", segStart(col("__i") + 1, col("__la")) - col("__p0"))
      .filter(col("__sl") >= 1)
      .withColumn("__sh", explode(sequence(lit(-d), lit(d))))
      .withColumn("__p", col("__p0") + col("__sh"))
      .filter(col("__p") >= 1 && col("__p") + col("__sl") - 1 <= col("__lb"))
      .select(col("id_b"), col("__sb"), col("__i"), col("__la"),
        expr("substring(__sb, __p, __sl)").as("__seg"))
    val main = aSeg.join(bProbe, Seq("__i", "__la", "__seg"))
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
    // ---- short-string branch: |s| <= d can't host d+1 non-empty
    // segments; partners must have length <= |s| + d <= 2d. The length
    // band |la − lb| <= d is encoded as an EQUI key — each short string
    // explodes to its <= 2d+1 admissible partner lengths and hash-joins
    // on the partner's exact length — so the branch plans a shuffled
    // hash join like the main path (the naive non-equi form planned a
    // CartesianProduct once both sides' size ESTIMATES passed the
    // broadcast threshold, which the 100× rehearsal flagged). Work
    // within a length pair is inherently all-pairs; short strings are a
    // sliver of any real corpus, and the length domain is <= 2d+1 keys.
    val aShort = a.filter(col("__len") <= d)
      .select(col("__id").as("id_a"), col("__s").as("__sa"),
        explode(sequence(greatest(col("__len") - d, lit(0)),
          col("__len") + d)).as("__lb"))
    val bShortish = b.filter(col("__len") <= 2 * d)
      .select(col("__id").as("id_b"), col("__s").as("__sb"),
        col("__len").as("__lb"))
    val short = aShort.join(bShortish, Seq("__lb"))
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
    main.unionByName(short).distinct()
  }

  private def confirm(cand: DataFrame, d: Int): DataFrame =
    cand
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
}
