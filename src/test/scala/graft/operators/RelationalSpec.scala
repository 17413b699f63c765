package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L), // exactly 30 min → same session
      (1L, ts("2024-01-01 11:00:01"), 3L), // 30 min + 1 s → new session
      (2L, ts("2024-01-01 10:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val out = Relational.sessionStats(
        Relational.sessionize(df, col("user_id"), col("ts"), 1800, Seq(col("event_id"))),
        col("user_id"))
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 2L, 1800L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("topKPerGroup keeps k rows per key with rank") {
    val df = Seq(("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 9.0)).toDF("k", "v")
    val out = Relational.topKPerGroup(df, Seq(col("k")), Seq(col("v").desc), 2)
    assert(out.filter(col("k") === "a").count() == 2)
    assert(out.filter(col("k") === "a" && col("rn") === 1).select("v").as[Double].head() == 3.0)
  }

  test("pivotAgg fills missing combinations with 0") {
    val df = Seq((1L, "x", 2.0), (1L, "x", 3.0), (2L, "y", 7.0)).toDF("id", "t", "v")
    val out = Relational.pivotAgg(df, col("id"), "t", Seq("x", "y"), col("v")).orderBy("id")
    val rows = out.select("x", "y").as[(Double, Double)].collect()
    assert(rows.toSeq == Seq((5.0, 0.0), (0.0, 7.0)))
  }

  test("timeBucketAgg buckets into tumbling windows") {
    val df = Seq((ts("2024-01-01 10:05:00"), "a", 1.0), (ts("2024-01-01 10:55:00"), "a", 2.0),
      (ts("2024-01-01 11:05:00"), "a", 4.0)).toDF("ts", "t", "v")
    val out = Relational.timeBucketAgg(df, col("ts"), "1 hour", Seq(col("t")), col("v"))
      .orderBy("bucket_start").select("bucket_start", "sum_value").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("2024-01-01 10:00:00", 3.0), ("2024-01-01 11:00:00", 4.0)))
  }

  test("asOfJoin picks the latest at-or-before right row per key") {
    val trades = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "B", 10L), (4L, "A", 5L))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 50L, 9.0))
      .toDF("sym", "ts", "px")
    val out = Relational.asOfJoin(trades, quotes, key = "sym", ts = "ts", rightVals = Seq("px"))
      .orderBy("trade_id").select("trade_id", "asof_px").collect()
    assert(out(0).getDouble(1) == 1.0)  // equal ts: at-or-before includes it
    assert(out(1).getDouble(1) == 2.0)  // latest of the two prior quotes
    assert(out(2).isNullAt(1))          // B's only quote is in the future
    assert(out(3).isNullAt(1))          // before any quote
  }

  test("nearestJoin picks the closer side; exact-distance ties prefer backward") {
    val l = Seq((1L, "A", 100L), (2L, "A", 201L), (3L, "A", 1000L),
      (4L, "B", 50L), (5L, "A", 150L)).toDF("id", "k", "ts")
    val r = Seq(("A", 90L, 1.0), ("A", 210L, 2.0), ("A", 995L, 3.0), ("C", 50L, 9.0))
      .toDF("k", "ts", "v")
    val out = Relational.nearestJoin(l, r, key = "k", ts = "ts", rightVals = Seq("v"))
      .orderBy("id").select("id", "nearest_v", "nearest_dt_sec").collect()
    assert(out(0).getDouble(1) == 1.0 && out(0).getDouble(2) == -10.0) // 90 beats 210
    assert(out(1).getDouble(1) == 2.0 && out(1).getDouble(2) == 9.0)   // 210 beats 90
    assert(out(2).getDouble(1) == 3.0 && out(2).getDouble(2) == -5.0)
    assert(out(3).isNullAt(1) && out(3).isNullAt(2)) // B has no right rows
    // ts 150: rights at 90 (d60) and 210 (d60) — exact tie → backward
    assert(out(4).getDouble(1) == 1.0 && out(4).getDouble(2) == -60.0)
  }

  test("nearestJoin: maxGapSeconds nulls far matches per side") {
    val l = Seq((1L, "A", 1000L), (2L, "A", 95L)).toDF("id", "k", "ts")
    val r = Seq(("A", 90L, 1.0)).toDF("k", "ts", "v")
    val out = Relational.nearestJoin(l, r, "k", "ts", Seq("v"), maxGapSeconds = Some(100))
      .orderBy("id").select("id", "nearest_v").collect()
    assert(out(0).isNullAt(1))           // 910s away > 100s gap
    assert(out(1).getDouble(1) == 1.0)   // 5s away
  }

  test("nearestJoin: equal-ts right matches at distance zero; both windows share one exchange") {
    val l = Seq((1L, "A", 100L)).toDF("id", "k", "ts")
    val r = Seq(("A", 100L, 7.0), ("A", 101L, 8.0)).toDF("k", "ts", "v")
    val out = Relational.nearestJoin(l, r, "k", "ts", Seq("v"))
    val row = out.head()
    assert(row.getAs[Double]("nearest_v") == 7.0)
    assert(row.getAs[Double]("nearest_dt_sec") == 0.0)
    assert(graft.PlanShapes.windowCount(out) === 1,
      "backward and forward frames must share a single WindowExec")
  }

  test("nearestJoin: null left keys pass through unmatched; reserved names rejected") {
    val l = Seq((Some("A"), 1L, 100L), (None, 2L, 100L))
      .map { case (k, id, t) => (k.orNull, id, t) }.toDF("k", "id", "ts")
    val r = Seq(("A", 90L, 1.0)).toDF("k", "ts", "v")
    val out = Relational.nearestJoin(l, r, "k", "ts", Seq("v")).orderBy("id").collect()
    assert(out(0).getDouble(3) == 1.0)
    assert(out(1).isNullAt(3))
    intercept[IllegalArgumentException] {
      Relational.nearestJoin(l.withColumn("nearest_v", lit(1)), r, "k", "ts", Seq("v"))
    }
  }

  test("asOfJoin: null keys never match each other (equi semantics)") {
    val left = Seq((1L, Option(7L), 10L), (2L, Option.empty[Long], 10L)).toDF("lid", "k", "ts")
    val right = Seq((Option(7L), 5L, 100L), (Option.empty[Long], 5L, 999L)).toDF("k", "ts", "rv")
    val got = Relational.asOfJoin(left, right, "k", "ts", Seq("rv"))
      .select("lid", "asof_rv").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(100L))
    assert(got(2L).isEmpty, "null-key left row must not pick up the null-key right row")
  }

  test("rangeJoin matches containment exactly across bin boundaries") {
    val points = Seq(0L, 5L, 64L, 100L, 149L, 150L, 263L).toDF("p")
    val ranges = Seq(
      (1L, 0L, 149L),    // spans 3 bins at width 64
      (2L, 100L, 200L),  // overlaps range 1
      (3L, 300L, 200L),  // inverted — matches nothing
      (4L, 263L, 263L))  // single-point range
      .toDF("rid", "s", "e")
    val got = Relational.rangeJoin(points, ranges, col("p"), col("s"), col("e"), binWidth = 64)
      .select("rid", "p").as[(Long, Long)].collect().toSet
    val expected = (for {
      p <- Seq(0L, 5L, 64L, 100L, 149L, 150L, 263L)
      (rid, s, e) <- Seq((1L, 0L, 149L), (2L, 100L, 200L), (4L, 263L, 263L))
      if p >= s && p <= e
    } yield (rid, p)).toSet
    assert(got == expected)
    // each qualifying pair appears exactly once (no bin-duplication)
    val rows = Relational.rangeJoin(points, ranges, col("p"), col("s"), col("e"), binWidth = 64).count()
    assert(rows == expected.size)
  }

  test("intervalJoin matches the naive overlap join, exactly once per pair") {
    val left = Seq(
      (1L, 0L, 149L),    // spans 3 bins at width 64
      (2L, 100L, 200L),
      (3L, 640L, 640L),  // point interval on a bin edge
      (4L, 50L, 40L))    // inverted — matches nothing
      .toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 140L, 160L), // overlaps 1 and 2 across a bin boundary
      (11L, 0L, 700L),   // giant interval overlapping everything valid
      (12L, 641L, 650L), // adjacent to 3 but NOT overlapping (closed ends)
      (13L, 630L, 640L)) // touches 3 exactly at the shared endpoint
      .toDF("rid", "rs", "re")
    val got = Relational.intervalJoin(left, right,
        col("ls"), col("le"), col("rs"), col("re"), binWidth = 64)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val expected = for {
      (lid, ls, le) <- List((1L, 0L, 149L), (2L, 100L, 200L), (3L, 640L, 640L))
      (rid, rs, re) <- List((10L, 140L, 160L), (11L, 0L, 700L), (12L, 641L, 650L), (13L, 630L, 640L))
      if ls <= re && rs <= le
    } yield (lid, rid)
    assert(got.toSet == expected.toSet)
    assert(got.size == expected.size, "each overlapping pair must appear exactly once")
  }

  test("radiusJoin2D matches the naive distance join exactly once per pair") {
    val left = Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0), (3L, 5.0, 5.0))
      .toDF("lid", "lx", "ly")
    val right = Seq(
      (10L, 3.0, 4.0),     // dist 5 from (0,0) — exactly on the closed radius
      (11L, 4.0, 4.0),     // dist √32 ≈ 5.66 — outside
      (12L, 10.5, 10.5),   // near (2); also 7.78 from (3) — outside for (3)
      (13L, -1.0, -1.0),   // √2 from (0,0) — negative-coordinate floors
      (14L, 5.0, 5.0))     // identical to (3) — dist 0, cell-boundary point
      .toDF("rid", "rx", "ry")
    val got = Relational.radiusJoin2D(left, right,
        col("lx"), col("ly"), col("rx"), col("ry"), radius = 5.0, cellSize = 5.0)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val expected = for {
      (lid, lx, ly) <- List((1L, 0.0, 0.0), (2L, 10.0, 10.0), (3L, 5.0, 5.0))
      (rid, rx, ry) <- List((10L, 3.0, 4.0), (11L, 4.0, 4.0), (12L, 10.5, 10.5),
        (13L, -1.0, -1.0), (14L, 5.0, 5.0))
      if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= 25.0
    } yield (lid, rid)
    assert(got.toSet == expected.toSet, s"got ${got.toSet}")
    assert(got.size == expected.size, "each qualifying pair must appear exactly once")
    intercept[IllegalArgumentException] { // cellSize < radius breaks 3x3 completeness
      Relational.radiusJoin2D(left, right, col("lx"), col("ly"), col("rx"), col("ry"),
        radius = 5.0, cellSize = 4.0)
    }
  }

  test("melt reshapes wide to long with type promotion and dropNulls") {
    val wide = Seq((1L, 10, Some(2.5)), (2L, 20, None))
      .toDF("k", "a", "b")
    val got = Relational.melt(wide, Seq("k"), Seq("a", "b"))
      .as[(Long, String, Option[Double])].collect().toSet
    assert(got == Set((1L, "a", Some(10.0)), (1L, "b", Some(2.5)),
      (2L, "a", Some(20.0)), (2L, "b", None))) // int promoted to double
    val dropped = Relational.melt(wide, Seq("k"), Seq("a", "b"), dropNulls = true)
      .as[(Long, String, Option[Double])].collect().toSet
    assert(dropped == Set((1L, "a", Some(10.0)), (1L, "b", Some(2.5)),
      (2L, "a", Some(20.0)))) // only the null measure row goes, not its siblings
    intercept[IllegalArgumentException] {
      Relational.melt(wide, Seq("k"), Seq("a"), varName = "k")
    }
    intercept[IllegalArgumentException] {
      Relational.melt(wide, Seq("k"), Seq.empty)
    }
    // no shuffle: melt is a narrow Expand over the input
    val plan = Relational.melt(wide, Seq("k"), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"melt must not shuffle:\n$plan")
  }

  test("saltedJoin equals the plain join on skewed keys") {
    val fact = ((0 until 500).map(i => (1L, i.toDouble)) ++ Seq((2L, -1.0), (3L, -2.0)))
      .toDF("k", "v") // key 1 is hot
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val salted = Relational.saltedJoin(fact, dim, "k", nSalts = 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head().getDouble(0) == plain.agg(sum("v")).head().getDouble(0))
    assert(salted.columns.toSeq == plain.columns.toSeq) // no __salt leakage
  }

  test("asOfJoin carries the whole most-recent right ROW even when its values are null") {
    // most recent quote has px=null: the output must be (null, "x") from
    // that row — not mix the older px=1.0 with the newer src="x"
    val trades = Seq((1L, "A", 25L)).toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", 10L, Some(1.0), "y"), ("A", 20L, None, "x"))
      .toDF("sym", "ts", "px", "src")
    val out = Relational.asOfJoin(trades, quotes, "sym", "ts", Seq("px", "src")).head()
    assert(out.isNullAt(out.fieldIndex("asof_px")))
    assert(out.getString(out.fieldIndex("asof_src")) == "x")
  }

  test("asOfJoin rejects reserved column names") {
    val l = Seq((1L, "A", 10L)).toDF("__side", "sym", "ts")
    val r = Seq(("A", 5L, 1.0)).toDF("sym", "ts", "px")
    assertThrows[IllegalArgumentException] {
      Relational.asOfJoin(l, r, "sym", "ts", Seq("px"))
    }
  }

  test("timeWeightedAvg weights by holding duration, not observation count") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val obs = Seq(
      // value 10 held for 90s, value 20 held for 10s, final obs open
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:01:30"), 20.0),
      (1L, ts("2024-01-01 00:01:40"), 99.0),
      (2L, ts("2024-01-01 00:00:00"), 7.0)) // single obs → null twap
      .toDF("entity", "ts", "v")
    val out = Relational.timeWeightedAvg(obs, col("entity"), col("ts"), col("v"))
      .orderBy("entity").collect()
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == (10.0 * 90 + 20.0 * 10) / 100) // 11.0
    assert(out(1).getLong(1) == 1L && out(1).isNullAt(2))
  }

  test("pointInTimeJoin matches the containing interval, honors holes and boundaries") {
    val dim = Seq(
      ("u1", "a", ts("2024-01-01 10:00:00"), Option(ts("2024-01-01 11:00:00"))),
      ("u1", "b", ts("2024-01-01 11:00:00"), Option(ts("2024-01-01 12:00:00"))),
      // hole 12:00-13:00 (retired interval), then an open current version
      ("u1", "c", ts("2024-01-01 13:00:00"), Option.empty[Timestamp]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val facts = Seq(
      (1L, "u1", ts("2024-01-01 10:30:00")), // mid-interval → a
      (2L, "u1", ts("2024-01-01 11:00:00")), // at valid_from → NEW version b
      (3L, "u1", ts("2024-01-01 12:30:00")), // inside the hole → null
      (4L, "u1", ts("2024-01-01 09:00:00")), // before first version → null
      (5L, "u3", ts("2024-01-01 10:30:00")), // unknown key → null
      (6L, "u1", ts("2024-01-01 13:00:00"))) // at open version's start → c
      .toDF("fid", "k", "ts")
    val got = Relational.pointInTimeJoin(facts, dim, key = "k", factTs = "ts",
        attrCols = Seq("attr"))
      .select("fid", "pit_attr").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("a"))
    assert(got(2L).contains("b"))
    assert(got(3L).isEmpty, "fact inside a dimension hole must not match the stale version")
    assert(got(4L).isEmpty)
    assert(got(5L).isEmpty)
    assert(got(6L).contains("c"))
  }

  test("pointInTimeJoin on a gap-free Scd.fromChangeLog dimension matches every fact") {
    val log = Seq(
      (7L, ts("2024-01-01 10:00:00"), "x", 1L),
      (7L, ts("2024-01-01 11:00:00"), "x", 2L), // duplicate state → collapsed
      (7L, ts("2024-01-01 12:00:00"), "y", 3L))
      .toDF("user_id", "ts", "state", "event_id")
    val dim = graft.etl.Scd.fromChangeLog(log, Seq("user_id"), Seq("state"), "ts", Seq("event_id"))
    val facts = Seq(
      (1L, 7L, ts("2024-01-01 11:30:00")), // mid collapsed interval → x
      (2L, 7L, ts("2024-01-01 23:00:00"))) // open current version → y
      .toDF("fid", "user_id", "ts")
    val got = Relational.pointInTimeJoin(facts, dim, key = "user_id", factTs = "ts",
        attrCols = Seq("state"))
      .select("fid", "pit_state").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("x") && got(2L).contains("y"))
  }
}
