package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Round-13 operations layer: sessionization, funnels, data-quality
  * constraints, snapshot diff, canary scan, graph centrality, BM25. */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  private def ev(rows: (Long, Long, String, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.map { case (id, u, t, typ) => (id, u, Timestamp.valueOf(t), typ) }
      .toDF("event_id", "user_id", "ts", "event_type")
  }

  // ------------------------------------------------------------ sessionize

  test("sessionize: strict-gap boundary, tie-stable order, per-user counters") {
    val df = ev(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:01:40", "click"),      // +100 s: same session
      (3L, 1L, "2024-01-01 00:31:40", "view"),       // +1800 s exactly: continues
      (4L, 1L, "2024-01-01 01:01:41", "purchase"),   // +1801 s: NEW session
      (5L, 2L, "2024-01-01 12:00:00", "view"),       // other user: own counter
      (7L, 3L, "2024-01-01 00:00:00", "view"),       // tie on ts with 6 —
      (6L, 3L, "2024-01-01 00:00:00", "click"))      // id order decides lag order
    val got = Events.sessionize(df, "user_id", "ts", "event_id", gapSeconds = 1800)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))).toMap
    assert(got(1L) == ((None, 1L)), s"$got")
    assert(got(2L) == ((Some(100000000L), 1L)), s"$got")
    assert(got(3L) == ((Some(1800000000L), 1L)), "gap exactly at bound continues")
    assert(got(4L) == ((Some(1801000000L), 2L)), "strictly over the gap opens a session")
    assert(got(5L) == ((None, 1L)), "fresh counter per user")
    assert(got(6L) == ((None, 1L)) && got(7L) == ((Some(0L), 1L)),
      s"ties: lower event id is the earlier event: $got")
  }

  test("sessionStats rolls up exact integer bounds per (user, session)") {
    val df = ev(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:10:00", "click"),
      (3L, 1L, "2024-01-01 02:00:00", "view"),       // new session (gap 1800)
      (4L, 2L, "2024-01-01 00:00:00", "view"))
    val got = Events.sessionStats(df, "user_id", "ts", "event_id", "event_type",
        gapSeconds = 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5), r.getLong(6)))).toMap
    assert(got((1L, 1L)) == ((2L, 600000000L, 2L)), s"$got")
    assert(got((1L, 2L)) == ((1L, 0L, 1L)), s"single-event session: duration 0: $got")
    assert(got((2L, 1L)) == ((1L, 0L, 1L)), s"$got")
  }

  // ---------------------------------------------------------------- funnel

  test("funnel: greedy strictly-increasing chain, prefix semantics") {
    val df = ev(
      // A completes all three in order
      (1L, 1L, "2024-01-01 00:00:01", "view"),
      (2L, 1L, "2024-01-01 00:00:02", "click"),
      (3L, 1L, "2024-01-01 00:00:03", "purchase"),
      // B: purchase happens BEFORE the click chain reaches it → depth 2
      (4L, 2L, "2024-01-01 00:00:01", "purchase"),
      (5L, 2L, "2024-01-01 00:00:02", "view"),
      (6L, 2L, "2024-01-01 00:00:03", "click"),
      // C: click at the SAME instant as view — strict increase rejects it
      (7L, 3L, "2024-01-01 00:00:01", "view"),
      (8L, 3L, "2024-01-01 00:00:01", "click"),
      // D: only unrelated events
      (9L, 4L, "2024-01-01 00:00:01", "error"))
    val got = Events.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L)._1 == 3L, s"$got")
    assert(got(2L)._1 == 2L, "purchase before the qualifying click never counts")
    assert(got(3L)._1 == 1L, "same-instant next step violates strict increase")
    assert(got(4L) == ((0L, None, None)), s"no steps: zero depth, NULL times: $got")
    // t_last is the time of the deepest completed step
    assert(got(1L)._3.contains(got(1L)._2.get + 2000000L), s"$got")
  }

  test("funnel per-user step cap is one-sided: keeps the earliest occurrences") {
    val df = ev(
      (1L, 1L, "2024-01-01 00:00:05", "view"),
      (2L, 1L, "2024-01-01 00:00:01", "view"),       // earliest view kept at cap 1
      (3L, 1L, "2024-01-01 00:00:03", "click"))
    val got = Events.funnel(df, "user_id", "ts", "event_type", Seq("view", "click"),
        maxStepEventsPerUser = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2L, s"cap keeps earliest view (t=1) so click@3 qualifies: $got")
  }
}
