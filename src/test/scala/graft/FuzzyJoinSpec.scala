package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** PassJoin edit-distance fuzzy matching: the STRUCTURAL guarantee under
  * test is exact recall — the segment/probe equi-join plus the bounded
  * short-string branch must produce the identical pair set to the
  * quadratic all-pairs `levenshtein` scan, for every corpus thrown at it
  * (mutated clones, unrelated strings, empties, NULLs, unicode). */
class FuzzyJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  private def corpus(rows: (Long, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("id", "s")
  }

  /** Quadratic reference: all intra pairs (id_a < id_b) within d. */
  private def bruteIntra(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows if sa != null
      (ib, sb) <- rows if sb != null && ia < ib
      dist = levenshteinDist(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def got(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // deterministic mutated-clone corpus: every string derived from a seed
  // word by 0-3 scripted edits, so pairs exist at every distance
  private val seedRows: Seq[(Long, String)] = {
    val seeds = Seq("window", "batch", "stream", "shuffle", "partition",
      "data", "date", "cat", "a", "", "sketch")
    seeds.zipWithIndex.flatMap { case (w, i) =>
      val base = i * 10L
      Seq(
        base -> w,
        (base + 1) -> (w + "s"),                                  // insert at end
        (base + 2) -> (if (w.nonEmpty) w.substring(1) else "x"),  // delete at front
        (base + 3) -> (if (w.length > 2) w.substring(0, 1) + "z" + w.substring(2)
                       else w + "zz"))                            // substitute mid
    }
  }

  test("exact recall + precision vs quadratic scan, d = 1..3, mixed corpus") {
    for (d <- 1 to 3) {
      val res = got(FuzzyJoin.editDistancePairs(corpus(seedRows: _*), "id", "s", d))
      assert(res == bruteIntra(seedRows, d), s"mismatch at d=$d")
    }
  }

  test("short strings (len <= d) are matched, not dropped") {
    val rows = Seq(1L -> "a", 2L -> "ab", 3L -> "b", 4L -> "", 5L -> "abc",
      6L -> "xy")
    for (d <- 1 to 2) {
      val res = got(FuzzyJoin.editDistancePairs(corpus(rows: _*), "id", "s", d))
      assert(res == bruteIntra(rows, d), s"mismatch at d=$d")
    }
  }

  test("NULL strings never match and never crash") {
    val rows = Seq(1L -> "data", 2L -> null, 3L -> "date")
    val res = got(FuzzyJoin.editDistancePairs(corpus(rows: _*), "id", "s", 1))
    assert(res == Set((1L, 3L, 1L)))
  }

  test("two-table join: exact vs quadratic, ids NOT deduped across tables") {
    val left = Seq(1L -> "spark", 2L -> "flink", 3L -> "beam")
    val right = Seq(1L -> "sparks", 2L -> "blink", 9L -> "zzzzzz")
    val res = got(FuzzyJoin.editDistanceJoin(
      corpus(left: _*), "id", "s", corpus(right: _*), "id", "s", maxDist = 1))
    val want = (for {
      (ia, sa) <- left; (ib, sb) <- right
      dist = levenshteinDist(sa, sb) if dist <= 1
    } yield (ia, ib, dist.toLong)).toSet
    assert(res == want)
    assert(want.contains((1L, 1L, 1L)), "same-id cross-table pair must survive")
  }

  test("multi-char unicode strings survive the substring arithmetic") {
    val rows = Seq(1L -> "café", 2L -> "cafe", 3L -> "cafés")
    val res = got(FuzzyJoin.editDistancePairs(corpus(rows: _*), "id", "s", 1))
    assert(res == bruteIntra(rows, 1))
  }

  test("maxDist outside [1, 6] is rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(corpus(1L -> "a"), "id", "s", 0)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(corpus(1L -> "a"), "id", "s", 7)
    }
  }

  test("entityResolve: row conservation, min-id canonical, NULL singleton") {
    val rows = Seq(1L -> "data", 2L -> "date", 3L -> "daze", 4L -> "zzzz",
      5L -> null, 6L -> "data")
    // d=1 components: {1 data, 2 date, 6 data} (1-2, 1-6 at d<=1; 2-3 is
    // d=2 so 3 is NOT in via 2... but 2->3 is 'date'->'daze' = 1 sub, IS in)
    val got = FuzzyJoin.entityResolve(corpus(rows: _*), "id", "s", maxDist = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "one row per input row")
    // data~date~daze~data all chain into one component, min id 1
    for (id <- Seq(1L, 2L, 3L, 6L))
      assert(got(id) == ((1L, 1L, id == 1L, 4L)), s"id=$id: ${got(id)}")
    assert(got(4L) == ((4L, 4L, true, 1L)), "unmatched string is a singleton")
    assert(got(5L) == ((5L, 5L, true, 1L)), "NULL string is a singleton")
  }

  test("entityResolve: score column elects the canonical, id breaks ties") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "data", 10L), (2L, "date", 30L), (3L, "daze", 30L),
      (9L, "solo", 5L)).toDF("id", "s", "q")
    val got = FuzzyJoin.entityResolve(df, "id", "s", maxDist = 1, Some("q"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // component {1,2,3}: top score 30 shared by 2 and 3 — id asc wins → 2
    assert(got(1L) == ((2L, false)))
    assert(got(2L) == ((2L, true)))
    assert(got(3L) == ((2L, false)))
    assert(got(9L) == ((9L, true)))
  }

  test("identical strings at distance 0 are emitted once per id pair") {
    val rows = Seq(1L -> "same", 2L -> "same", 3L -> "same")
    val res = got(FuzzyJoin.editDistancePairs(corpus(rows: _*), "id", "s", 2))
    assert(res == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }
}
