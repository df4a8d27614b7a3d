package graft

import org.apache.spark.sql.functions._

class EventsSpec extends SparkTestBase {

  test("every events query runs non-empty at sf0.001 and has an oracle") {
    ops.Events.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfSmoke).count() > 0, s"$name empty")
    }
    assert(ops.Events.queries.keySet == ops.Events.oracle.keySet)
  }

  test("sketch cardinalities are deterministic and close to exact") {
    // sketchCardinality is deliberately NOT a registered query (cross-
    // engine HLL sketches can't hash-match an oracle); this spec is its
    // gate, anchored to the oracle-hash-gated exact twin e11b.
    val a = ops.Events.sketchCardinality(spark, sfSmoke)
    val b = ops.Events.sketchCardinality(spark, sfSmoke)
    assert(a.exceptAll(b).count() == 0, "HLL must be deterministic in-engine")
    // e11b is the oracle-hash-gated exact twin; the sketch must land
    // within HLL tolerance of it, which closes the gate on e11 itself.
    val exact = ops.Events.queries("e11b_exact_cardinality")(spark, sfSmoke)
      .select(col("event_type"), col("n_users").as("exact_users"))
    val joined = a.join(exact, "event_type")
    val off = joined.filter(
      abs(col("approx_users") - col("exact_users")) >
        col("exact_users") * 0.15).count()
    assert(off == 0, "approx_count_distinct drifted >15% from exact")
  }

  test("e15: per-day sketch union keeps sketch accuracy (mergeability, " +
      "the partial-aggregation property) at both SFs") {
    Seq(sfSmoke, sfVerify).foreach { sf =>
      val rows = ops.Events.queries("e15_sketch_merge")(spark, sf).collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Boolean]("merge_consistent")),
        s"hll_union_agg of daily sketches lost accuracy at $sf")
    }
  }

  test("e40: salt recommendation brings the hot key under the task " +
      "budget, and the decision flips with the axis shape") {
    // sfVerify, not sfSmoke: the direct case needs per-key rows under
    // the task budget, and key COUNTS scale with SF while per-key
    // rows stay flat — at sf0.001 every axis salts (budget 32, the
    // card's pinned default since round 14; override via
    // spark.graft.skew.reducerBudget), from sf0.01 up the balanced
    // user axis flips to direct
    val rows = ops.Events.queries("e40_skew_salt_decision")(spark, sfVerify)
      .collect().map(r => r.getAs[String]("axis") -> r).toMap
    rows.values.foreach { r =>
      val target = r.getAs[Long]("target_task_rows")
      val saltN = r.getAs[Long]("salt_n")
      val post = r.getAs[Long]("post_salt_max_rows")
      val maxK = r.getAs[Long]("max_key_rows")
      assert(saltN >= 1)
      // ceil-division theorem the card relies on: splitting the hot
      // key ceil(max/target)-ways provably lands under the budget
      assert(post <= math.max(target, 1),
        s"post-salt bound $post exceeds target $target")
      assert(post * saltN >= maxK, "split must cover every hot-key row")
      assert((r.getAs[String]("decision") == "salt") == (saltN > 1))
    }
    // fixture shape: 5 event types over a 313-row budget must salt;
    // the user axis is balanced (max 99 rows/user) and stays direct
    assert(rows("event_type").getAs[String]("decision") == "salt")
    assert(rows("user_id").getAs[String]("decision") == "direct")
    // the GATED row is PINNED to the literal 32-reducer budget (r14
    // ADVICE, fixed in r15): its DuckDB twin cannot see the session
    // conf, so setting the live knob must NOT flip this row's hash —
    // conf-invariance is the contract now
    withConfs("spark.graft.skew.reducerBudget" -> "4") {
      val alt = ops.Events.queries("e40_skew_salt_decision")(
        spark, sfVerify).collect()
        .map(r => r.getAs[String]("axis") -> r).toMap
      assert(alt("event_type").getAs[Long]("target_task_rows") ==
        rows("event_type").getAs[Long]("target_task_rows"))
      assert(alt("event_type").getAs[String]("decision") ==
        rows("event_type").getAs[String]("decision"))
    }
    // the LIVE surfaces (saltedAggAuto's conf-reading ladder, the
    // graft_skew TVF's p argument) are where a deployment prices its
    // own width: the same axis at p=4 flips to direct — the per-task
    // target ceil(10000/4) swallows the hot event_type key (2017
    // rows) — fewer reducers, less imbalance to fix
    val live4 = ops.Events.skewCardFor(Tables.load(spark, sfVerify,
        "events"),
      Seq("event_type" -> coalesce(col("event_type"), lit("<null>"))),
      4L).collect().map(r => r.getAs[String]("axis") -> r).toMap
    assert(live4("event_type").getAs[Long]("target_task_rows") >
      rows("event_type").getAs[Long]("target_task_rows"))
    assert(live4("event_type").getAs[String]("decision") == "direct")
  }

  test("e44/graft_skew: the SQL card equals the gated e40 axis row " +
      "bit-for-bit (both surfaces share skewCardFor)") {
    val sql = ops.Events.queries("e44_skew_card_sql")(spark, sfSmoke)
      .collect().map(_.toSeq.toSeq).toSeq
    val scala = ops.Events.queries("e40_skew_salt_decision")(spark, sfSmoke)
      .filter(col("axis") === "event_type")
      .collect().map(_.toSeq.toSeq).toSeq
    assert(sql == scala, s"SQL $sql != Scala $scala")
    // argument validation: the parameter-oriented error class, not a
    // ClassCastException (the SqlServing requireArity principle)
    graft.functions.registerAll(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_skew('/x', 'events', 'k', 0)")
    }
    assert(e.getMessage.contains("graft_skew"))
  }

  test("e41: drop curve is monotone, the max-jitter delay provably " +
      "admits everything, and exactly the smallest SLO-meeting delay " +
      "is recommended") {
    val rows = ops.Events.queries("e41_watermark_delay_curve")(
      spark, sfVerify).orderBy(col("delay_s")).collect()
    val dropped = rows.map(_.getAs[Long]("n_dropped"))
    assert(dropped.zip(dropped.tail).forall { case (a, b) => a >= b },
      "larger allowed lateness cannot drop more events")
    // lateness <= the late event's own jitter <= 1799 s < 1800 s
    assert(dropped.last == 0L, "the 1800 s delay must admit every event")
    rows.foreach { r =>
      val share = r.getAs[Double]("drop_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Boolean]("meets_slo") == (share <= 0.005))
    }
    val rec = rows.filter(_.getAs[Boolean]("is_recommended"))
    assert(rec.length == 1, "exactly one recommended delay")
    assert(rec.head.getAs[Long]("delay_s") ==
      rows.filter(_.getAs[Boolean]("meets_slo"))
        .map(_.getAs[Long]("delay_s")).min)
  }

  test("e42: session accounting conserves, ties to e03's gated total, " +
      "and the sizing columns are internally consistent") {
    val rows = ops.Events.queries("e42_state_peak_card")(spark, sfVerify)
      .collect()
    val started = rows.map(_.getAs[Long]("n_started")).sum
    val expired = rows.map(_.getAs[Long]("n_expired")).sum
    assert(started == expired, "every opened session must expire")
    val e03Total = ops.Events.queries("e03_user_sessions")(spark, sfVerify)
      .agg(sum("n_sessions")).collect()(0).getLong(0)
    assert(started == e03Total,
      s"interval model ($started) must agree with e03's islands ($e03Total)")
    val gp = rows.map(_.getAs[Long]("peak_open")).max
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak_open")
      // a dense-spine day with no deltas and nothing carried in can
      // legitimately peak at 0 (round-14 entering-count fix); any day
      // that STARTS a session holds it open at least an instant
      assert(peak >= 0 && peak <= started)
      if (r.getAs[Long]("n_started") > 0) assert(peak >= 1)
      assert(r.getAs[Long]("state_kb") == peak * 4L)
      assert(r.getAs[Long]("rec_partitions") == (gp + 511) / 512)
    }
  }

  test("e43: the gated curve matches an independent Lindley recursion " +
      "and is monotone in the cap") {
    val rows = ops.Events.queries("e43_admission_backlog_curve")(
      spark, sfVerify).orderBy(col("cap_rows")).collect()
    assert(rows.length == 3)
    // independent reference: replay backlog_t = max(0, b + a_t - cap)
    // directly over the dense epoch counts in Scala
    val sparse = Tables.load(spark, sfVerify, "events")
      .selectExpr("unix_micros(ts) div 600000000 as e")
      .groupBy("e").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (e0, e1) = (sparse.keys.min, sparse.keys.max)
    val dense = (e0 to e1).map(e => sparse.getOrElse(e, 0L))
    rows.foreach { r =>
      val cap = r.getAs[Long]("cap_rows")
      var b = 0L; var peak = 0L; var nb = 0L
      dense.foreach { a =>
        b = math.max(0L, b + a - cap)
        peak = math.max(peak, b); if (b > 0) nb += 1
      }
      assert(r.getAs[Long]("peak_backlog") == peak, s"peak at cap=$cap")
      assert(r.getAs[Long]("final_backlog") == b, s"final at cap=$cap")
      assert(r.getAs[Long]("backlogged_epochs") == nb, s"nb at cap=$cap")
      assert(r.getAs[Boolean]("drained") == (b == 0L))
    }
    val peaks = rows.map(_.getAs[Long]("peak_backlog"))
    assert(peaks.zip(peaks.tail).forall { case (a, c) => a >= c },
      "a higher cap cannot deepen the backlog")
  }

  test("decision cards are partition-independent: identical rows under " +
      "a different shuffle layout (the resumable/deterministic claim " +
      "behind the md5-coin and two-phase-scan constructions)") {
    val cards = Seq("e40_skew_salt_decision", "e41_watermark_delay_curve",
      "e42_state_peak_card", "e43_admission_backlog_curve",
      "e44_skew_card_sql")
    val base = cards.map(c =>
      c -> ops.Events.queries(c)(spark, sfSmoke).collect().toSeq).toMap
    withConfs("spark.sql.shuffle.partitions" -> "3") {
      cards.foreach { c =>
        val alt = ops.Events.queries(c)(spark, sfSmoke).collect().toSeq
        assert(alt == base(c), s"$c changed with partition count")
      }
    }
  }

  test("funnel steps are monotone and conversion bounded") {
    val r = ops.Events.queries("e13_funnel_steps")(spark, sfSmoke).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && p >= 0,
      s"funnel must narrow monotonically: view=$v click=$c purchase=$p")
    val conv = r.getDouble(3)
    assert(conv >= 0.0 && conv <= 1.0)
  }

  test("sessionization invariants: per-user session count ≤ event count; " +
      "islands (e03) and session_window (e04) agree on total sessions") {
    val e03 = ops.Events.queries("e03_user_sessions")(spark, sfSmoke)
    val bad = e03.filter(col("n_sessions") > col("n_events")).count()
    assert(bad == 0)
    val total03 = e03.agg(sum("n_sessions")).collect()(0).getLong(0)
    val total04 = ops.Events.queries("e04_session_window")(spark, sfSmoke).count()
    assert(total03 == total04,
      s"islands=$total03 vs session_window=$total04")
  }

  test("streaming window counts equal the batch computation (e07 vs e01)") {
    val batch = ops.Events.queries("e01_hourly_type_counts")(spark, sfSmoke)
      .select("hour_start", "event_type", "n")
    val stream = ops.Events.queries("e07_stream_hourly_counts")(spark, sfSmoke)
    assert(stream.exceptAll(batch).count() == 0 &&
      batch.exceptAll(stream).count() == 0)
  }

  test("e27: chained streaming rollup agrees with e01's hourly counts " +
      "on the closed horizon and keeps bucket invariants") {
    import org.apache.spark.sql.functions._
    val e27 = ops.Events.queries("e27_stream_chained_agg")(spark, sfSmoke)
      .cache()
    // invariants: ≤ 6 ten-minute buckets per hour; the peak bucket is
    // bounded by the hour total; every count positive
    assert(e27.filter(col("n_buckets") > 6 || col("n_buckets") < 1)
      .count() == 0)
    assert(e27.filter(col("peak_10m") > col("n_events")).count() == 0)
    // the hour totals must equal e01's independent batch hourly counts
    // wherever the gate's closed horizon includes the hour
    val batch = ops.Events.queries("e01_hourly_type_counts")(spark, sfSmoke)
      .select(col("hour_start"), col("event_type"), col("n"))
    val joined = e27.select(col("hour_start"), col("event_type"),
        col("n_events")).join(batch, Seq("hour_start", "event_type"))
    assert(joined.count() == e27.count(),
      "gated hours missing from the batch computation")
    assert(joined.filter(col("n_events") =!= col("n")).count() == 0,
      "chained rollup totals diverge from the single-level batch counts")
    e27.unpersist()
  }

  test("e31: a step mix-change alarms while the trailing baseline " +
      "still remembers the old mix, then RE-STABILIZES once the " +
      "window rolls past it — the static-baseline monitor (e30's " +
      "semantics) would alarm forever") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def hourRows(h: Int, a: Int, b: Int) =
      (0 until a).map(i => ("A",
        new java.sql.Timestamp(base + h * 3600000L + i * 10000L))) ++
      (0 until b).map(i => ("B",
        new java.sql.Timestamp(base + h * 3600000L + 2000000L + i * 1000L)))
    // hours 0-5: 45 A + 5 B; hours 6-13: the PERMANENT step change to
    // 5 A + 45 B (identical counts per hour, so stable hours read
    // PSI ≈ 0 exactly)
    val rows = (0 until 14).flatMap(h =>
      if (h < 6) hourRows(h, 45, 5) else hourRows(h, 5, 45))
    val src = MemoryStream[(String, java.sql.Timestamp)]
    src.addData(rows: _*)
    val out = ops.Events.trailingDriftCore(spark,
        src.toDF().toDF("event_type", "ts"),
        rows.toDF("event_type", "ts"), "e31_spec_out")
      .collect()
      .map(r => (((r.getTimestamp(0).getTime - base) / 3600000L).toInt,
        r.getString(3))).toMap
    // hour 0 has no trailing data (undefined baseline, excluded);
    // hours 11+ are not closed under the 2 h horizon
    assert(out.keySet == (1 to 10).toSet,
      s"closed hours with a defined baseline: ${out.keys.toSeq.sorted}")
    (1 to 5).foreach(h => assert(out(h) == "stable",
      s"pre-shift hour $h must be stable, got ${out(h)}"))
    // the shift hour and its successor compare against a baseline that
    // is mostly the OLD mix — the alarm
    assert(out(6) == "investigate" && out(7) == "investigate",
      s"step change must alarm: h6=${out(6)} h7=${out(7)}")
    assert(out(8) != "stable", s"h8 baseline still carries one old hour")
    // once the trailing window holds only post-shift hours, the NEW
    // mix is the norm — re-stabilized, where a static baseline would
    // still read 'investigate' forever
    assert(out(9) == "stable" && out(10) == "stable",
      s"monitor must re-stabilize: h9=${out(9)} h10=${out(10)}")
  }

  test("e29: the chained stream join→rollup equals the batch join " +
      "rolled up over the same closed horizon") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e29 = ops.Events.queries("e29_stream_join_rollup")(spark, sfSmoke)
    val ev = Tables.load(spark, sfSmoke, "events")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val cutoff = ev.filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type").agg(max($"ts").as("m"))
      .agg((min($"m") - expr("INTERVAL 3 HOURS")).as("cutoff"))
    val batch = c.join(p, $"user_id" === $"p_user" &&
        $"p_ts" >= $"c_ts" &&
        $"p_ts" <= $"c_ts" + expr("INTERVAL 30 MINUTES"))
      .groupBy(date_trunc("hour", $"c_ts").as("hour_start"))
      .agg(count(lit(1)).as("n_attributed"),
        sum(unix_micros($"p_ts") - unix_micros($"c_ts"))
          .as("gap_us_total"))
      .crossJoin(broadcast(cutoff))
      .filter($"hour_start" + expr("INTERVAL 1 HOUR") <= $"cutoff")
      .select($"hour_start", $"n_attributed", $"gap_us_total")
    assert(e29.exceptAll(batch).count() == 0 &&
      batch.exceptAll(e29).count() == 0,
      "streaming join→rollup diverged from the batch rollup")
  }

  test("e28: dynamic-gap sessions use the running-max interval end — " +
      "an open long-gap interval absorbs later short-gap events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("e28")
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    Seq(
      // user 1: click (10-min gap) then view 15 min later — the click
      // interval closes first, so TWO singleton sessions
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(15), 1L, "view", 0.0, "{}"),
      // user 2: view@0 holds [0, 30) open; click@5 ends at 15, so a
      // LAST-EVENT-GAP rule would split before view@20 — the correct
      // running-max merge keeps one session of 3
      (3L, ts(0), 2L, "view", 0.0, "{}"),
      (4L, ts(5), 2L, "click", 0.0, "{}"),
      (5L, ts(20), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Events.queries("e28_dynamic_gap_sessions")(spark, dir)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toSeq
    assert(r.filter(_._1 == 1L).map(_._2) == Seq(1L, 1L),
      s"user 1 should split into two singleton sessions: $r")
    assert(r.filter(_._1 == 2L).map(_._2) == Seq(3L),
      s"user 2 must stay ONE session under running-max merging: $r")
    // fixture-level conservation: sessionization never drops events
    val e28 = ops.Events.queries("e28_dynamic_gap_sessions")(spark, sfSmoke)
    assert(e28.agg(sum("n_events")).collect()(0).getLong(0) ==
      Tables.load(spark, sfSmoke, "events").count())
  }

  test("e17 cohort retention: day-0 row is the cohort maximum and " +
      "cohort sizes sum to the user universe") {
    import spark.implicits._
    val rows = ops.Events.queries("e17_cohort_retention")(spark, sfVerify)
      .collect()
    val byCohort = rows.groupBy(_.getDate(0))
    byCohort.foreach { case (day, rs) =>
      val day0 = rs.find(_.getLong(1) == 0L)
        .getOrElse(fail(s"cohort $day has no day-0 row")).getLong(2)
      assert(rs.forall(_.getLong(2) <= day0),
        s"cohort $day: retention above cohort size")
    }
    val users = Tables.load(spark, sfVerify, "events")
      .select($"user_id").distinct().count()
    val cohortSum = byCohort.values
      .map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum
    assert(cohortSum == users,
      s"day-0 cohort sizes $cohortSum must partition the $users users")
  }
}
