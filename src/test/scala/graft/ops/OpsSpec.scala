package graft.ops

import java.time.LocalDate

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val li = graft.io.Tables.load(spark, TestSpark.Sf0001, "lineitem")
  private val from = LocalDate.of(1998, 1, 1)
  private val to = LocalDate.of(1998, 1, 7)

  test("dropAudit removes Id/insert_datetime case-insensitively (P1)") {
    val df = Seq((1L, "x")).toDF("a", "b")
      .withColumn("iD", lit(9L)).withColumn("INSERT_datetime", lit("t"))
    assert(Ops.dropAudit(df).columns.toSeq == Seq("a", "b"))
    // untouched when absent
    assert(Ops.dropAudit(Seq((1, 2)).toDF("x", "y")).columns.toSeq == Seq("x", "y"))
  }

  test("window predicate: inclusive day start, inclusive day-end −3ms (P3/F3)") {
    val rows = Seq(
      ("start", "1998-01-01 00:00:00.000"),
      ("just_before_start", "1997-12-31 23:59:59.999"),
      ("end_997", "1998-01-07 23:59:59.997"),
      ("end_998", "1998-01-07 23:59:59.998")
    ).toDF("name", "s").withColumn("d", col("s").cast("timestamp_ntz"))
    val in = rows.filter(Ops.windowPredicate("d", from, to)).select("name").as[String].collect().toSet
    assert(in == Set("start", "end_997"))
  }

  test("windowed reload: conservation + idempotence + window refresh (A5)") {
    val target = li.filter(col("l_shipdate") < lit(java.time.LocalDateTime.of(1999, 1, 1, 0, 0)))
    val once = Ops.windowedReload(target, li, "l_shipdate", from, to)
    // rows outside the window are exactly the target's outside-rows
    val outsideBefore = target.filter(!Ops.windowPredicate("l_shipdate", from, to)).count()
    assert(once.filter(!Ops.windowPredicate("l_shipdate", from, to)).count() == outsideBefore)
    // rows inside the window are exactly the source's inside-rows
    val insideSrc = li.filter(Ops.windowPredicate("l_shipdate", from, to)).count()
    assert(once.filter(Ops.windowPredicate("l_shipdate", from, to)).count() == insideSrc)
    // applying the reload twice equals applying once
    val twice = Ops.windowedReload(once, li, "l_shipdate", from, to)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("changedKeys = modified-in-window minus created-in-window (J1)") {
    val src = Seq(
      // pk, created, updated
      (1L, "2024-01-02", "2024-01-06"), // modified in window, created before → changed
      (2L, "2024-01-05", "2024-01-06"), // created in window → excluded
      (3L, "2024-01-02", "2024-01-12"), // modified after window → excluded
      (4L, "2024-01-01", "2024-01-09")  // changed (boundary end day)
    ).toDF("pk", "c", "u")
      .select(col("pk"), col("c").cast("timestamp_ntz").as("c"), col("u").cast("timestamp_ntz").as("u"))
    val got = Ops.changedKeys(src, "pk", "c", "u", LocalDate.of(2024, 1, 5), LocalDate.of(2024, 1, 9))
      .as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("upsert replaces changed keys, leaves others byte-identical (A4)") {
    val target = Seq((1L, "old"), (2L, "keep")).toDF("pk", "v")
    val source = Seq((1L, "new"), (2L, "ignored"), (3L, "fresh")).toDF("pk", "v")
    val changed = Seq(1L, 3L).toDF("pk")
    val got = Ops.upsert(target, source, "pk", changed).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "new"), (2L, "keep"), (3L, "fresh")))
  }

  test("keyedDelete/keyedFetch are anti/semi joins (A3/S3)") {
    val t = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    val keys = Seq(2L).toDF("pk")
    assert(Ops.keyedDelete(t, "pk", keys).select("pk").as[Long].collect().toSet == Set(1L, 3L))
    assert(Ops.keyedFetch(t, "pk", keys).select("pk").as[Long].collect().toSet == Set(2L))
  }

  test("left_anti vs SQL NOT IN: equivalent only under non-null keys (J1 doc, SURVEY §7.4.3)") {
    // SQL `pk NOT IN (subquery)` returns EMPTY if the subquery yields any
    // NULL; left_anti (= NOT EXISTS) keeps non-matching rows. The engine
    // uses left_anti and relies on primary keys being non-null — this test
    // pins the behavioral difference the survey documents.
    val modified = Seq(Some(1L), Some(2L)).toDF("pk")
    val createdWithNull = Seq(Some(2L), None).toDF("pk")
    val antiResult = modified.join(createdWithNull, Seq("pk"), "left_anti")
      .as[Option[Long]].collect().toSet
    assert(antiResult == Set(Some(1L))) // NOT IN would have returned nothing
  }

  test("asOfJoin picks the latest right row at or before each left row") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq( // key, time, id, px
      (1L, t("2024-01-01 10:00:00"), 100L, 5.0),
      (1L, t("2024-01-01 10:05:00"), 101L, 6.0),
      (2L, t("2024-01-01 10:01:00"), 102L, 9.0)
    ).toDF("k", "qt", "qid", "px")
    val trades = Seq( // key, time, id
      (1L, t("2024-01-01 10:03:00"), 1L), // after quote 100 → px 5.0
      (1L, t("2024-01-01 10:05:00"), 2L), // tie with quote 101 → <= visible → 6.0
      (2L, t("2024-01-01 10:00:30"), 3L), // before any quote for key 2 → null
      (3L, t("2024-01-01 12:00:00"), 4L)  // key with no quotes at all → null
    ).toDF("k", "tt", "tid")
    val got = Ops.asOfJoin(trades, quotes, "k", "tt", "qt", "tid", "qid")
      .select($"tid", $"asof.px".as("px")).as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(5.0), 2L -> Some(6.0), 3L -> None, 4L -> None))
  }

  test("asOfJoin forward picks the earliest right row at or after each left row") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L, 5.0),
      (1L, t("2024-01-01 10:05:00"), 101L, 6.0),
      (2L, t("2024-01-01 10:01:00"), 102L, 9.0)
    ).toDF("k", "qt", "qid", "px")
    val trades = Seq(
      (1L, t("2024-01-01 10:03:00"), 1L), // next quote is 101 → 6.0
      (1L, t("2024-01-01 10:05:00"), 2L), // tie with quote 101 → >= visible → 6.0
      (1L, t("2024-01-01 10:06:00"), 5L), // after the last quote → null
      (2L, t("2024-01-01 10:00:30"), 3L), // before quote 102 → 9.0
      (3L, t("2024-01-01 12:00:00"), 4L)  // key with no quotes at all → null
    ).toDF("k", "tt", "tid")
    val got = Ops.asOfJoin(trades, quotes, "k", "tt", "qt", "tid", "qid",
        direction = "forward")
      .select($"tid", $"asof.px".as("px")).as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(6.0), 2L -> Some(6.0), 5L -> None, 3L -> Some(9.0), 4L -> None))
    intercept[IllegalArgumentException](
      Ops.asOfJoin(trades, quotes, "k", "tt", "qt", "tid", "qid", direction = "nearest"))
  }

  test("saltedJoin: same result as a plain join, keys spread over salts") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val right = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("k", "w")
    val plain = left.join(right, Seq("k")).select("k", "v", "w")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", 4).select("k", "v", "w")
      .as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 4)
  }

  test("explain: window scan pushes the between-filter into the parquet scan") {
    val plan = Ops.windowScan(li, "l_shipdate", from, to)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_shipdate")),
      s"no pushdown in plan:\n$plan")
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rangeJoin: |Δt| == tolerance is included (adjacent-band pair), beyond excluded") {
    // 00:01:00 vs 00:02:00 sit in ADJACENT 60 s bands with Δt exactly the
    // tolerance — one case pins both the band expansion and the closed bound
    val l = Seq((1L, ts("2024-01-01 00:01:00"))).toDF("l_id", "lts")
    val r = Seq((10L, ts("2024-01-01 00:02:00")), (11L, ts("2024-01-01 00:02:00.000001")),
      (12L, ts("2024-01-01 00:00:30"))).toDF("r_id", "rts")
    val got = Ops.rangeJoin(l, r, "lts", "rts", java.time.Duration.ofSeconds(60))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 12L))) // 11 is 60.000001 s away
  }

  test("intervalJoin: brute-force equivalence on deterministic spans, touching included") {
    // 40 left x 40 right intervals with varying starts/spans (all <= 60 s):
    // banding must reproduce the cross-join-with-predicate pair set exactly
    val mk = (n: Int, off: Int) => (0 until n).map { i =>
      val s = ts("2024-01-01 00:00:00").getTime + (i * 37000L + off * 1000L)
      (i.toLong, new java.sql.Timestamp(s), new java.sql.Timestamp(s + (i % 61) * 1000L))
    }
    val l = mk(40, 0).toDF("l_id", "s", "e")
    val r = mk(40, 29).toDF("r_id", "s", "e")
    val got = Ops.intervalJoin(l, r, "s", "e", "s", "e", java.time.Duration.ofSeconds(60))
    assert(got.columns.toSeq == Seq("l_id", "s", "e", "r_id", "s_r", "e_r"))
    val gotPairs = got.select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val brute = l.crossJoin(r.toDF("r_id", "rs", "re"))
      .filter(col("s") <= col("re") && col("rs") <= col("e"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(gotPairs == brute, s"banded=${gotPairs.size} brute=${brute.size}")
    // touching endpoints count (closed intervals)
    val t1 = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:10"))).toDF("l_id", "s", "e")
    val t2 = Seq((2L, ts("2024-01-01 00:00:10"), ts("2024-01-01 00:00:20"))).toDF("r_id", "s", "e")
    assert(Ops.intervalJoin(t1, t2, "s", "e", "s", "e",
      java.time.Duration.ofSeconds(60), guard = false).count() == 1L)
  }

  test("intervalJoin property: banded == brute force on random interval sets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = ts("2024-01-01 00:00:00").getTime
    // starts spread over ~6 band-widths, spans up to exactly the band width
    val genIv = Gen.zip(Gen.choose(0L, 360000L), Gen.choose(0L, 60000L))
    val genSide = Gen.resize(14, Gen.nonEmptyListOf(genIv)).map(_.zipWithIndex.map {
      case ((off, span), i) =>
        (i.toLong, new java.sql.Timestamp(base + off), new java.sql.Timestamp(base + off + span))
    })
    val prop = Prop.forAll(genSide, genSide) { (ls, rs) =>
      val l = ls.toDF("l_id", "s", "e")
      val r = rs.toDF("r_id", "s", "e")
      val got = Ops.intervalJoin(l, r, "s", "e", "s", "e",
          java.time.Duration.ofSeconds(60), guard = false)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (li, lsr, le) <- ls; (ri, rsr, re) <- rs
        if lsr.getTime <= re.getTime && rsr.getTime <= le.getTime
      } yield (li, ri)).toSet
      got == want
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop).passed)
  }

  test("intervalJoin: an oversized span fails the guard loudly, not silently under-recalls") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:02:30"))).toDF("l_id", "s", "e")
    val r = Seq((2L, ts("2024-01-01 00:01:00"), ts("2024-01-01 00:01:30"))).toDF("r_id", "s", "e")
    val ex = intercept[IllegalStateException](
      Ops.intervalJoin(l, r, "s", "e", "s", "e", java.time.Duration.ofSeconds(60)))
    assert(ex.getMessage.contains("max span"))
  }

  test("rangeJoin: identically-named time columns work; right side gets _r suffix") {
    // the canonical event-correlation shape — both streams call it `ts`
    // (pre-fix this threw AnalysisException: ambiguous reference)
    val l = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("id", "ts")
    val r = Seq((2L, ts("2024-01-01 00:00:30"))).toDF("id", "ts")
    val out = Ops.rangeJoin(l, r, "ts", "ts", java.time.Duration.ofSeconds(60))
    assert(out.columns.toSeq == Seq("id", "ts", "id_r", "ts_r"))
    assert(out.select("id", "id_r").as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
  }

  test("rangeJoin: band temp column dodges existing __band0; bad suffix fails fast") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "keep")).toDF("id", "ts", "__band0")
    val r = Seq((2L, ts("2024-01-01 00:00:01"))).toDF("rid", "rts")
    val out = Ops.rangeJoin(l, r, "ts", "rts", java.time.Duration.ofSeconds(60))
    assert(out.select("__band0").as[String].collect().toSeq == Seq("keep"))
    // suffixing cannot disambiguate when the suffixed name ALSO exists
    val clash = Seq((2L, ts("2024-01-01 00:00:01"))).toDF("ts", "ts_r")
    intercept[IllegalArgumentException](
      Ops.rangeJoin(l.select("id", "ts"), clash, "ts", "ts", java.time.Duration.ofSeconds(60)))
  }

  test("rangeJoin: degenerate band cardinality fails loudly with the observed count") {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // 20k rows collapsed into ~2 minutes (the r13 failure mode: a wrong-unit
    // read compressing 30 days 1000×) → a 60 s tolerance yields ~3 bands —
    // the guard must name the degeneration instead of letting the banded
    // join go quadratic
    val collapsed = spark.range(20000)
      .select(col("id"), timestamp_micros(expr("id * 6000")).as("ts")) // 6 ms apart
    val e = intercept[IllegalStateException](
      Ops.rangeJoin(collapsed, collapsed, "ts", "ts", java.time.Duration.ofSeconds(60)))
    assert(e.getMessage.contains("band degeneration"), e.getMessage)
    assert(e.getMessage.contains("20000 rows"), e.getMessage)
    // an explicit opt-out still builds the join (caller takes the risk)
    assert(Ops.rangeJoin(collapsed.limit(10), collapsed, "ts", "ts",
      java.time.Duration.ofSeconds(60), guardBands = false).columns.nonEmpty)
    // healthy spread (one row per minute over ~2 weeks) passes untouched
    val spread = spark.range(20000)
      .select(col("id"), timestamp_micros(expr("id * 60000000")).as("ts"))
    assert(Ops.rangeJoin(spread.limit(5), spread, "ts", "ts",
      java.time.Duration.ofSeconds(60)).columns.nonEmpty)
    // and dimension-sized frames skip the check entirely (< minRows)
    assert(Ops.rangeJoin(collapsed.limit(5), collapsed.limit(100), "ts", "ts",
      java.time.Duration.ofSeconds(60)).columns.nonEmpty)
  }

  test("rangeJoin: AQE splits a hot band instead of serializing it into one task") {
    import org.apache.spark.sql.functions.{pmod, timestamp_millis}
    // a burst of events inside ONE tolerance band is the operator's skew
    // hazard: every burst row hashes to one shuffle partition. The 100 TB
    // posture is AQE skew-join splitting that partition across tasks —
    // pin it with production-shaped data and test-sized thresholds.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val base = 1704100000000L // fixed epoch ms; session TZ is UTC
      // left: 40k rows crammed into one 60s band + 10k spread over cold bands
      val hotL = spark.range(40000).select((col("id") + 1000000).as("l_id"),
        timestamp_millis(lit(base) + pmod(col("id"), lit(60)) * 1000).as("lts"))
      val coldL = spark.range(10000).select(col("id").as("l_id"),
        timestamp_millis(lit(base) + lit(86400000L) + col("id") * 120000).as("lts"))
      // right: 20 rows in the hot band + 5k cold rows at the same 120s grid
      val hotR = spark.range(20).select((col("id") + 2000000).as("r_id"),
        timestamp_millis(lit(base) + col("id") * 1000).as("rts"))
      val coldR = spark.range(5000).select((col("id") + 3000000).as("r_id"),
        timestamp_millis(lit(base) + lit(86400000L) + col("id") * 120000).as("rts"))
      val joined = Ops.rangeJoin(hotL.unionByName(coldL), hotR.unionByName(coldR),
        "lts", "rts", java.time.Duration.ofSeconds(60))
      // toRdd.count() executes THIS dataset's own query execution, so the
      // adaptive plan below is the FINAL one (a .count() would plan a
      // separate aggregation and leave this plan unfinalized)
      val n = joined.queryExecution.toRdd.count()
      // hot: all 40000×20 pairs are ≤59s apart; cold: Δt=0 for ids <5000
      assert(n == 40000L * 20 + 5000, s"unexpected pair count $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"hot band was not skew-split by AQE — burst bands serialize into one task:\n$plan")
    } finally keys.foreach(k => saved(k) match {
      case Some(v) => conf.set(k, v)
      case None => conf.unset(k)
    })
  }

  test("upsertExact keeps audit-named data columns that upsert drops") {
    // a CDC source whose pk is literally 'id': the copy contract's audit
    // drop must not apply on the exact variant
    val target = Seq((1L, "old", "t1"), (2L, "keep", "t2"))
      .toDF("id", "payload", "insert_datetime")
    val source = Seq((1L, "new", "t9")).toDF("id", "payload", "insert_datetime")
    val keys = source.select("id")
    val exact = Ops.upsertExact(target, source, "id", keys)
    assert(exact.columns.toSeq == Seq("id", "payload", "insert_datetime"))
    assert(exact.as[(Long, String, String)].collect().toSet ==
      Set((1L, "new", "t9"), (2L, "keep", "t2")))
    // the copy-contract variant on the same frames throws: the fresh side
    // loses its pk/audit columns and can no longer union with the target
    intercept[org.apache.spark.sql.AnalysisException](
      Ops.upsert(target, source, "id", keys).collect())
  }

  test("maintainDailyAgg: window days replaced, others kept, stragglers fenced") {
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(to_date(col("ts")).as("day")).agg(sum(col("v")).as("total"))
    val stale = Seq(
      ("2024-01-04", 100L), // outside window: must survive untouched
      ("2024-01-05", 999L)) // inside window: must be replaced
      .toDF("day", "total").withColumn("day", col("day").cast("date"))
    val source = Seq(
      ("2024-01-05 10:00:00", 7L), ("2024-01-05 11:00:00", 5L),
      ("2024-01-03 09:00:00", 1000L)) // straggler outside window: fenced out
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = Ops.maintainDailyAgg(stale, source, "day",
      LocalDate.of(2024, 1, 5), LocalDate.of(2024, 1, 9))(agg)
      .select(col("day").cast("string"), col("total"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("2024-01-04" -> 100L, "2024-01-05" -> 12L))
  }

  test("maintainDailyAgg keeps NULL-day stale rows (outside any window)") {
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(to_date(col("ts")).as("day")).agg(sum(col("v")).as("total"))
    val stale = Seq((Some("2024-01-04"), 100L), (None, 55L))
      .toDF("day", "total").withColumn("day", col("day").cast("date"))
    val source = Seq(("2024-01-05 10:00:00", 7L))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = Ops.maintainDailyAgg(stale, source, "day",
      LocalDate.of(2024, 1, 5), LocalDate.of(2024, 1, 9))(agg)
      .select(col("day").cast("string"), col("total"))
      .as[(Option[String], Long)].collect().toMap
    // the NULL-day rollup row survives maintenance instead of silently
    // vanishing through the !predicate NULL evaluation
    assert(got == Map(Some("2024-01-04") -> 100L, None -> 55L,
      Some("2024-01-05") -> 7L))
  }

  test("globalOrdinals equals the naive global row_number, any partitioning") {
    val docs = graft.io.Tables.load(spark, graft.TestSpark.Sf0001, "documents")
      .select("doc_id")
    val naive = docs.withColumn("ordinal",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("doc_id")) - 1)
      .as[(Long, Long)].collect().toMap.view.mapValues(_.toLong).toMap
    val got = Ops.globalOrdinals(docs, Seq(col("doc_id")), numParts = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == naive)
    // partitioning-invariant: the global order fixes the assignment
    val re = Ops.globalOrdinals(docs.repartition(13), Seq(col("doc_id")), numParts = 3)
      .as[(Long, Long)].collect().toMap
    assert(re == naive)
    // ordinals are contiguous 0..n-1
    assert(got.values.toSeq.sorted == (0L until got.size.toLong))
    intercept[IllegalArgumentException](Ops.globalOrdinals(docs, Nil, 8))
    intercept[IllegalArgumentException](
      Ops.globalOrdinals(docs.withColumn("ordinal", lit(1)), Seq(col("doc_id")), 8))
  }

  test("explain: upsert broadcasts the changed-key side") {
    val target = Seq((1L, "old")).toDF("pk", "v")
    val source = Seq((1L, "new")).toDF("pk", "v")
    val plan = Ops.upsert(target, source, "pk", Seq(1L).toDF("pk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"no broadcast join in plan:\n$plan")
  }
}
