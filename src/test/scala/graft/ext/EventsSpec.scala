package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, String, String)],
      steps: Seq[String] = Seq("a", "b", "c"),
      window: Long = 3600L): Map[Long, (Option[String], Option[String], Int, Boolean)] = {
    val df = rows.map { case (u, t, w) => (u, t, ts(w)) }.toDF("u", "t", "w")
    Events.funnel(df, "u", "t", "w", steps, window)
      .collect().map { r =>
        r.getLong(0) -> ((Option(r.getTimestamp(2)).map(_.toString),
          Option(r.getTimestamp(3)).map(_.toString),
          r.getInt(4), r.getBoolean(5)))
      }.toMap
  }

  test("funnel: first-touch anchor, greedy earliest matching, full conversion") {
    val got = run(Seq(
      (1L, "a", "2024-01-01 10:00:00"), // anchor (earliest a)
      (1L, "a", "2024-01-01 10:30:00"), // later a ignored
      (1L, "b", "2024-01-01 10:10:00"),
      (1L, "b", "2024-01-01 10:20:00"), // greedy: earliest b after anchor wins
      (1L, "c", "2024-01-01 10:15:00"))) // after ts_2=10:10 -> converts
    assert(got(1L) == ((Some("2024-01-01 10:10:00.0"),
      Some("2024-01-01 10:15:00.0"), 3, true)))
  }

  test("funnel: steps before the anchor or at the same timestamp do not advance") {
    val got = run(Seq(
      // u2: b fired BEFORE the first a — order violated, depth 1
      (2L, "b", "2024-01-01 09:00:00"), (2L, "a", "2024-01-01 10:00:00"),
      // u3: b simultaneous with a — strict > refuses the tie
      (3L, "a", "2024-01-01 10:00:00"), (3L, "b", "2024-01-01 10:00:00"),
      // u4: b one second later — advances
      (4L, "a", "2024-01-01 10:00:00"), (4L, "b", "2024-01-01 10:00:01")))
    assert(got(2L)._3 == 1 && got(3L)._3 == 1 && got(4L)._3 == 2)
    assert(!got(2L)._4 && !got(4L)._4)
  }

  test("funnel: the window anchors at step 1, not at the previous step; lapsed steps don't count") {
    val got = run(Seq(
      // b inside the hour, c at anchor+61min: deadline is anchor-based -> no c
      (5L, "a", "2024-01-01 10:00:00"), (5L, "b", "2024-01-01 10:59:00"),
      (5L, "c", "2024-01-01 11:01:00"),
      // c exactly AT the deadline (anchor + 3600 s) still counts (<=)
      (6L, "a", "2024-01-01 10:00:00"), (6L, "b", "2024-01-01 10:30:00"),
      (6L, "c", "2024-01-01 11:00:00")))
    assert(got(5L) == ((Some("2024-01-01 10:59:00.0"), None, 2, false)))
    assert(got(6L)._3 == 3 && got(6L)._4)
  }

  test("funnel: missing middle step blocks later steps; non-entrants absent; off-funnel types ignored") {
    val got = run(Seq(
      // u7: a then c but never b -> depth 1, c cannot attach
      (7L, "a", "2024-01-01 10:00:00"), (7L, "c", "2024-01-01 10:05:00"),
      // u8 never fired a -> not an entrant, absent from the output
      (8L, "b", "2024-01-01 10:00:00"), (8L, "c", "2024-01-01 10:05:00"),
      // u9: noise types between steps change nothing
      (9L, "a", "2024-01-01 10:00:00"), (9L, "x", "2024-01-01 10:01:00"),
      (9L, "b", "2024-01-01 10:02:00")))
    assert(got(7L) == ((None, None, 1, false)))
    assert(!got.contains(8L))
    assert(got(9L)._3 == 2)
  }

  test("funnel: partitioning-invariant; argument validation") {
    val rows = (0 until 60).flatMap { i =>
      Seq((i.toLong, "a", s"2024-01-01 10:00:${i % 50 + 10}"),
        (i.toLong, "b", s"2024-01-01 11:00:${i % 40 + 10}"),
        (i.toLong, "c", s"2024-01-02 09:00:${i % 30 + 10}"))
    }
    val base = run(rows, window = 86400L)
    val repart = {
      val df = rows.map { case (u, t, w) => (u, t, ts(w)) }
        .toDF("u", "t", "w").repartition(11)
      Events.funnel(df, "u", "t", "w", Seq("a", "b", "c"), 86400L)
        .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    }
    assert(base.view.mapValues(_._3).toMap == repart)
    assert(base.values.forall(_._3 == 3)) // every synthetic user converts
    val df = rows.take(3).map { case (u, t, w) => (u, t, ts(w)) }.toDF("u", "t", "w")
    intercept[IllegalArgumentException](Events.funnel(df, "u", "t", "w", Nil, 10L))
    intercept[IllegalArgumentException](
      Events.funnel(df, "u", "t", "w", Seq("a", "a"), 10L))
    intercept[IllegalArgumentException](
      Events.funnel(df, "u", "t", "w", Seq("a"), 0L))
  }

  private def runPaths(rows: Seq[(Long, Long, String, String)], length: Int,
      minSupport: Long = 1L): Map[Seq[String], (Long, Long)] = {
    val df = rows.map { case (u, id, t, w) => (u, id, t, ts(w)) }
      .toDF("u", "id", "t", "w")
    Events.frequentPaths(df, "u", "t", "w", "id", length, minSupport)
      .collect().map { r =>
        (0 until length).map(r.getString) ->
          ((r.getLong(length), r.getLong(length + 1)))
      }.toMap
  }

  test("frequentPaths: sliding occurrences vs distinct-user support; timeline ends close runs") {
    // user 1 loops a->b three times (a b a b a b): the a->b bigram occurs 3
    // times but contributes ONE user; user 2 fires a->b once
    val rows = (1 to 6).map(i =>
      (1L, i.toLong, if (i % 2 == 1) "a" else "b", s"2024-01-01 10:00:0$i")) ++
      Seq((2L, 1L, "a", "2024-01-01 11:00:00"), (2L, 2L, "b", "2024-01-01 11:00:01"))
    val got = runPaths(rows, 2)
    assert(got(Seq("a", "b")) == ((4L, 2L)))
    assert(got(Seq("b", "a")) == ((2L, 1L)))
    // no wrap-around: user 1's trailing b and user 2's trailing b end runs
    assert(got.keySet == Set(Seq("a", "b"), Seq("b", "a")))
    // trigrams (4 sliding windows over user 1's six events): a b a x2, b a b x2
    val tri = runPaths(rows, 3)
    assert(tri == Map(Seq("a", "b", "a") -> ((2L, 1L)),
      Seq("b", "a", "b") -> ((2L, 1L))))
    // support threshold filters on occurrences
    assert(runPaths(rows, 2, minSupport = 3L).keySet == Set(Seq("a", "b")))
  }

  test("frequentPaths: timestamp ties resolve by the tie column; users never cross; validation") {
    // two simultaneous events ordered by id: the path is a->b, never b->a
    val tied = Seq((1L, 1L, "a", "2024-01-01 10:00:00"),
      (1L, 2L, "b", "2024-01-01 10:00:00"))
    assert(runPaths(tied, 2) == Map(Seq("a", "b") -> ((1L, 1L))))
    // consecutive events of DIFFERENT users never form a path
    val split = Seq((1L, 1L, "a", "2024-01-01 10:00:00"),
      (2L, 2L, "b", "2024-01-01 10:00:01"))
    assert(runPaths(split, 2).isEmpty)
    // partitioning-invariant counts
    val rows = (0 until 200).map(i =>
      ((i % 7).toLong, i.toLong, Seq("a", "b", "c")(i % 3), f"2024-01-01 ${10 + i / 60}%02d:00:${i % 60}%02d"))
    val a = runPaths(rows, 3)
    val b = {
      val df = rows.map { case (u, id, t, w) => (u, id, t, ts(w)) }
        .toDF("u", "id", "t", "w").repartition(13)
      Events.frequentPaths(df, "u", "t", "w", "id", 3, 1L)
        .collect().map(r => (0 until 3).map(r.getString) -> ((r.getLong(3), r.getLong(4)))).toMap
    }
    assert(a == b)
    val df = tied.map { case (u, id, t, w) => (u, id, t, ts(w)) }.toDF("u", "id", "t", "w")
    intercept[IllegalArgumentException](Events.frequentPaths(df, "u", "t", "w", "id", 1))
    intercept[IllegalArgumentException](Events.frequentPaths(df, "u", "t", "w", "id", 2, 0L))
  }
}
