package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** GlobalRank — the distributed total rank (range sort + per-partition
  * offsets): equal to `row_number()` over the same total order, with
  * NO WindowExec anywhere in its plan (the partition-less window it
  * replaces is the one-task-sorts-everything shape PlanShapeSpec bans
  * board-wide).
  */
class GlobalRankSpec extends SparkTestBase {

  test("GlobalRank == partition-less row_number over the same total " +
      "order; the plan has no WindowExec; ranks survive input " +
      "repartitioning") {
    import spark.implicits._
    val base = Tables.load(spark, sfVerify, "documents")
      .select($"doc_id", $"n_chars")
    // a deliberately shuffled input: ranks must depend on the ORDER
    // ARGUMENT only, never on incoming partitioning
    val shuffled = base.repartition(13, $"n_chars")
    val got = GlobalRank(shuffled,
        Seq($"n_chars".desc, $"doc_id".asc), "rnk")
      .select($"doc_id", $"rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = base
      .withColumn("rnk", row_number().over(
        Window.orderBy($"n_chars".desc, $"doc_id".asc)))
      .select($"doc_id", $"rnk".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(want),
      s"GlobalRank must equal the window form; first diffs: " +
        s"${got.zip(want).filter(p => p._1 != p._2).take(3).mkString(",")}")

    val ranked = GlobalRank(shuffled,
      Seq($"n_chars".desc, $"doc_id".asc), "rnk")
    ranked.collect() // AQE: codegen spans appear in the FINAL plan
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "GlobalRank must not plan any window operator")
    // the r15 Catalyst-native pin: the rank is ONE codegen'd projection
    // over the checkpointed sort (offsets are a literal-map lookup) —
    // no per-row external-Row detour, no join, no exchange downstream.
    // Codegen'd operators print as "*(n) Op" in treeString form.
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"the rank must be join- and exchange-free downstream:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("Project") && l.contains("*(") && l.contains("rnk")),
      s"the rank projection must stay inside whole-stage codegen:\n$plan")
  }

  test("GlobalRank internal-name collision fails fast, not silent " +
      "corruption (r14 ADVICE)") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "__gr_mid")
    val e = intercept[IllegalArgumentException] {
      GlobalRank(df, Seq($"id"), "rnk")
    }
    assert(e.getMessage.contains("__gr_mid"), s"wrong error: $e")
  }

  test("groupedNtile == ntile().over(partitionBy(group)) for every " +
      "(group-size, k) shape, window-free (the t21/t27 rewrite's " +
      "closed-form NTILE proof)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4114L)
    // group sizes deliberately spanning every NTILE regime: n < k,
    // n == k, n % k == 0, n % k != 0, singleton groups
    val rows = (0 until 40).flatMap { g =>
      val n = 1 + rnd.nextInt(37)
      (0 until n).map(i => (s"g$g", rnd.nextLong() % 10000, g * 1000L + i))
    }
    Seq(1, 3, 7, 10).foreach { k =>
      val df = rows.toDF("g", "v", "id")
      val got = GlobalRank.groupedNtile(df, Seq("g"),
          Seq($"v", $"id"), k, "ntl")
        .select($"id", $"ntl")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.withColumn("ntl", ntile(k).over(
          Window.partitionBy($"g").orderBy($"v", $"id")))
        .select($"id", $"ntl")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"k=$k: closed-form NTILE diverged, " +
        s"first diffs: ${got.toSeq.sortBy(_._1)
          .filter(p => want(p._1) != p._2).take(3).mkString(",")}")
    }
    val plan = GlobalRank.groupedNtile(rows.toDF("g", "v", "id"),
      Seq("g"), Seq($"v", $"id"), 3, "ntl")
    assert(!plan.queryExecution.executedPlan.toString.contains("Window"),
      "groupedNtile must not plan any window operator")
    // the r15 partition-less form: one global group via the broadcast
    // (off=1, n=total) row — equal to the partition-less ntile window
    val gGot = GlobalRank.groupedNtile(rows.toDF("g", "v", "id"),
        Seq.empty, Seq($"v", $"id"), 7, "ntl")
      .select($"id", $"ntl")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gWant = rows.toDF("g", "v", "id")
      .withColumn("ntl", ntile(7).over(Window.orderBy($"v", $"id")))
      .select($"id", $"ntl")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gGot == gWant, "partition-less closed-form NTILE diverged")
  }

  test("grouped closed forms keep null-key groups, exactly like the " +
      "windows they replace (r14 ADVICE: the join-back is null-safe)") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L, 5L), (None, 2L, 7L), (None, 3L, 9L),
        (Some("a"), 4L, 2L))
      .toDF("g", "id", "v")
    val cum = GlobalRank.groupedCumsum(df, Seq("g"), Seq($"id"),
        $"v", "cum")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(cum == Map(1L -> 5L, 4L -> 7L, 2L -> 7L, 3L -> 16L),
      s"null group must accumulate as one group, got $cum")
    val ntl = GlobalRank.groupedNtile(df, Seq("g"), Seq($"id"), 2, "t")
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(ntl == Map(1L -> 1, 4L -> 2, 2L -> 1, 3L -> 2),
      s"null group must tile as one group, got $ntl")
  }

  test("rankFunctions == the rank/dense_rank/percent_rank/cume_dist " +
      "windows — heavy ties, null order values, null-key and singleton " +
      "groups, grouped AND partition-less, descending order — " +
      "window-free (the r15 guard-rewrite's tie-aware closed forms)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1515L)
    val rows = (0 until 30).flatMap { g =>
      (0 until 1 + rnd.nextInt(40)).map { i =>
        // ~6 distinct order values → every peer set has many rows;
        // 10% null order values (one peer set per group); some rows
        // carry a NULL group key
        val v: Option[Long] =
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(6).toLong)
        (if (g % 7 == 0) None else Some(s"g${g % 5}"), g * 1000L + i, v)
      }
    } :+ ((Some("solo"), 999999L, Some(3L))) // n=1: percent_rank = 0.0
    val fns = Seq(("rank", "r"), ("dense_rank", "dr"),
      ("percent_rank", "pr"), ("cume_dist", "cd"))
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4))
    // shuffled input: the answer depends on (group, order values) only
    val df = rows.toDF("g", "id", "v").repartition(9, $"id")
    for (grouped <- Seq(true, false)) {
      val group = if (grouped) Seq("g") else Seq.empty[String]
      val closed = GlobalRank.rankFunctions(df, group,
          Seq($"v".desc), Seq("v"), fns)
        .select($"id", $"r", $"dr", $"pr", $"cd")
      val got = closed.collect().map(key).toMap
      val w =
        if (grouped) Window.partitionBy($"g").orderBy($"v".desc)
        else Window.orderBy($"v".desc)
      val want = rows.toDF("g", "id", "v").select($"id",
          rank().over(w).as("r"), dense_rank().over(w).as("dr"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .collect().map(key).toMap
      assert(got == want, s"grouped=$grouped: closed-form rank family " +
        s"diverged; first diffs: ${got.toSeq.sortBy(_._1)
          .filter(p => want(p._1) != p._2).take(3).mkString(",")}")
      assert(!closed.queryExecution.executedPlan.toString
          .contains("Window"),
        "rankFunctions must not plan any window operator")
    }
    // the singleton group's spec-pinned edge: percent_rank is DEFINED
    // as 0.0 at n=1, never a 0/0 NaN
    val solo = GlobalRank.rankFunctions(
        rows.toDF("g", "id", "v").filter($"g" === "solo"),
        Seq("g"), Seq($"v"), Seq("v"), fns)
      .select($"pr", $"cd").head()
    assert(solo.getDouble(0) == 0.0 && solo.getDouble(1) == 1.0)
  }

  test("groupedShift == lag/lead windows — group boundaries yield the " +
      "default, present-but-null donor values stay null (never the " +
      "default), null-key groups, partition-less, window-free (the " +
      "r15 guard-rewrite's offset closed form)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1551L)
    val rows = (0 until 25).flatMap { g =>
      (0 until 1 + rnd.nextInt(7)).map { i => // small groups: many edges
        val v: Option[Long] =
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextLong() % 100)
        (if (g % 6 == 0) None else Some(s"g${g % 4}"), g * 100L + i, v)
      }
    }
    val df = rows.toDF("g", "id", "v").repartition(7, $"v")
    for ((delta, fn) <- Seq(
        (2, (c: org.apache.spark.sql.Column,
             w: org.apache.spark.sql.expressions.WindowSpec) =>
          lag(c, 2, -999L).over(w)),
        (-1, (c: org.apache.spark.sql.Column,
              w: org.apache.spark.sql.expressions.WindowSpec) =>
          lead(c, 1, -999L).over(w)));
        grouped <- Seq(true, false)) {
      val group = if (grouped) Seq("g") else Seq.empty[String]
      val got = GlobalRank.groupedShift(df, group, Seq($"id"),
          $"v", delta, lit(-999L), "s")
        .select($"id", $"s")
        .collect().map(r =>
          r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
      val w =
        if (grouped)
          org.apache.spark.sql.expressions.Window.partitionBy($"g")
            .orderBy($"id")
        else org.apache.spark.sql.expressions.Window.orderBy($"id")
      val want = rows.toDF("g", "id", "v")
        .select($"id", fn($"v", w).as("s"))
        .collect().map(r =>
          r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
      assert(got == want, s"delta=$delta grouped=$grouped: shift " +
        s"closed form diverged; first diffs: ${got.toSeq.sortBy(_._1)
          .filter(p => want(p._1) != p._2).take(3).mkString(",")}")
    }
    val plan = GlobalRank.groupedShift(df, Seq("g"), Seq($"id"),
      $"v", 1, lit(null), "s")
    assert(!plan.queryExecution.executedPlan.toString.contains("Window"),
      "groupedShift must not plan any window operator")
  }

  test("groupedRunningSum/Count == the sum/count windows over " +
      "UNBOUNDED PRECEDING..CURRENT ROW — ROWS and RANGE (ties " +
      "included) flavors, negative values, null values (sum stays " +
      "NULL until the first non-null), null-key groups, " +
      "partition-less, window-free except the task-bounded " +
      "pid-partitioned scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(5151L)
    val rows = (0 until 20).flatMap { g =>
      (0 until 1 + rnd.nextInt(30)).map { i =>
        val v: Option[Long] = if (rnd.nextInt(4) == 0) None
          else Some(rnd.nextLong() % 50) // negatives included
        (if (g % 5 == 0) None else Some(s"g${g % 3}"), g * 1000L + i,
          v, rnd.nextInt(6).toLong) // x: heavy ties for RANGE peers
      }
    }
    val df = rows.toDF("g", "id", "v", "x").repartition(9, $"id")
    val W = org.apache.spark.sql.expressions.Window
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
    for (grouped <- Seq(true, false)) {
      val group = if (grouped) Seq("g") else Seq.empty[String]
      def spec(order: Seq[org.apache.spark.sql.Column]) =
        if (grouped) W.partitionBy($"g").orderBy(order: _*)
        else W.orderBy(order: _*)
      // ROWS frame: total order (x, id)
      val rowsW = spec(Seq($"x", $"id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val gotRows = asMap(GlobalRank.groupedRunningSum(df, group,
        Seq($"x", $"id"), $"v", "rs").select($"id", $"rs"))
      val wantRows = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", sum($"v").over(rowsW).as("rs")))
      assert(gotRows == wantRows, s"grouped=$grouped ROWS running sum " +
        s"diverged; first diffs: ${gotRows.toSeq.sortBy(_._1)
          .filter(p => wantRows(p._1) != p._2).take(3).mkString(",")}")
      // RANGE frame (SQL's default): ties on x — all peers included
      val rangeW = spec(Seq($"x"))
      val gotRange = asMap(GlobalRank.groupedRunningSum(df, group,
        Seq($"x"), $"v", "rs", Some(Seq("x"))).select($"id", $"rs"))
      val wantRange = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", sum($"v").over(rangeW).as("rs")))
      assert(gotRange == wantRange, s"grouped=$grouped RANGE running " +
        s"sum diverged; first diffs: ${gotRange.toSeq.sortBy(_._1)
          .filter(p => wantRange(p._1) != p._2).take(3).mkString(",")}")
      // counts: count(v) skips nulls, count(*) counts rows
      val gotCnt = asMap(GlobalRank.groupedRunningCount(df, group,
        Seq($"x", $"id"), $"v".isNotNull.cast("long"), "rc")
        .select($"id", $"rc"))
      val wantCnt = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", count($"v").over(rowsW).as("rc")))
      assert(gotCnt == wantCnt, s"grouped=$grouped running count(v) " +
        "diverged")
      val gotStar = asMap(GlobalRank.groupedRunningCount(df, group,
        Seq($"x"), lit(1L), "rc", Some(Seq("x"))).select($"id", $"rc"))
      val wantStar = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", count(lit(1)).over(rangeW).as("rc")))
      assert(gotStar == wantStar, s"grouped=$grouped RANGE running " +
        "count(*) diverged")
    }
    // plan pin: the only window is the task-bounded pid-partitioned
    // running scan (the groupedCumsum discipline)
    val planStr = GlobalRank.groupedRunningSum(df, Seq("g"),
      Seq($"x", $"id"), $"v", "rs").queryExecution.executedPlan.toString
    val windowLines = planStr.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty &&
        windowLines.forall(_.contains("__gr_pid")),
      "every groupedRunningSum window must be partitioned by the " +
        s"frozen pid; got:\n${windowLines.mkString("\n")}")
  }

  test("groupedRunningExtremum == min/max windows over UNBOUNDED " +
      "PRECEDING..CURRENT ROW — ROWS and RANGE flavors, null values " +
      "skipped (all-null prefixes stay null), null-key groups, " +
      "partition-less; groupedFullAgg == the no-ORDER-BY full-frame " +
      "aggregates") {
    import spark.implicits._
    val rnd = new scala.util.Random(5115L)
    val rows = (0 until 20).flatMap { g =>
      (0 until 1 + rnd.nextInt(25)).map { i =>
        val v: Option[Long] = if (rnd.nextInt(4) == 0) None
          else Some(rnd.nextLong() % 50)
        (if (g % 5 == 0) None else Some(s"g${g % 3}"), g * 1000L + i,
          v, rnd.nextInt(5).toLong)
      }
    }
    val df = rows.toDF("g", "id", "v", "x").repartition(9, $"id")
    val W = org.apache.spark.sql.expressions.Window
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
    for (grouped <- Seq(true, false); isMin <- Seq(true, false)) {
      val group = if (grouped) Seq("g") else Seq.empty[String]
      def spec(order: Seq[org.apache.spark.sql.Column]) =
        if (grouped) W.partitionBy($"g").orderBy(order: _*)
        else W.orderBy(order: _*)
      val fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (isMin) min else max
      // ROWS over a total order
      val rowsW = spec(Seq($"x", $"id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val gotR = asMap(GlobalRank.groupedRunningExtremum(df, group,
        Seq($"x", $"id"), $"v", isMin, "e").select($"id", $"e"))
      val wantR = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", fn($"v").over(rowsW).as("e")))
      assert(gotR == wantR, s"grouped=$grouped isMin=$isMin ROWS " +
        s"running extremum diverged; first diffs: ${gotR.toSeq
          .sortBy(_._1).filter(p => wantR(p._1) != p._2).take(3)
          .mkString(",")}")
      // RANGE (default frame) over ties-heavy x: peer-inclusive
      val gotRg = asMap(GlobalRank.groupedRunningExtremum(df, group,
        Seq($"x"), $"v", isMin, "e", Some(Seq("x")))
        .select($"id", $"e"))
      val wantRg = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", fn($"v").over(spec(Seq($"x"))).as("e")))
      assert(gotRg == wantRg, s"grouped=$grouped isMin=$isMin RANGE " +
        "running extremum diverged")
      // full-frame: constant per group
      val gotF = asMap(GlobalRank.groupedFullAgg(df, group,
        fn($"v"), "e").select($"id", $"e"))
      val wantF = asMap(rows.toDF("g", "id", "v", "x")
        .select($"id", fn($"v").over(spec(Seq($"x"))
          .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
          .as("e")))
      assert(gotF == wantF, s"grouped=$grouped isMin=$isMin full-frame " +
        "aggregate diverged")
    }
    // full-frame sum + count(*) against the windows
    val gotS = GlobalRank.groupedFullAgg(df, Seq("g"),
        sum($"v".cast("long")), "s")
      .select($"id", $"s").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val wantS = rows.toDF("g", "id", "v", "x")
      .select($"id", sum($"v").over(W.partitionBy($"g")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(gotS == wantS, "full-frame sum diverged")
    // the plan pin: no windows at all in the full-agg form; only the
    // pid-partitioned ones in the running form
    assert(!GlobalRank.groupedFullAgg(df, Seq("g"), max($"v"), "e")
      .queryExecution.executedPlan.toString.contains("Window"),
      "groupedFullAgg must not plan any window operator")
    val planStr = GlobalRank.groupedRunningExtremum(df, Seq("g"),
      Seq($"x", $"id"), $"v", isMin = true, "e")
      .queryExecution.executedPlan.toString
    val wl = planStr.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(wl.nonEmpty && wl.forall(_.contains("__gr_pid")),
      "every groupedRunningExtremum window must be partitioned by " +
        s"the frozen pid; got:\n${wl.mkString("\n")}")
  }

  test("groupedEdgeValue == first_value/last_value/nth_value windows " +
      "with partition-edge frames — NULL edge values stay null, nth " +
      "past the group size yields null, null-key groups, " +
      "partition-less, window-free") {
    import spark.implicits._
    val rnd = new scala.util.Random(1155L)
    val rows = (0 until 20).flatMap { g =>
      (0 until 1 + rnd.nextInt(5)).map { i => // sizes 1-5: nth(3) often off-frame
        val v: Option[Long] =
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong() % 100)
        (if (g % 6 == 0) None else Some(s"g${g % 4}"), g * 100L + i, v)
      }
    }
    val df = rows.toDF("g", "id", "v").repartition(5, $"v")
    val W = org.apache.spark.sql.expressions.Window
    type C = org.apache.spark.sql.Column
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
        .toMap
    for (grouped <- Seq(true, false)) {
      val group = if (grouped) Seq("g") else Seq.empty[String]
      val base = if (grouped) W.partitionBy($"g").orderBy($"id")
        else W.orderBy($"id")
      val full = base.rowsBetween(W.unboundedPreceding,
        W.unboundedFollowing)
      for ((tgt, wantCol) <- Seq[((C, C) => C, C)](
          (((off: C, _: C) => off), first($"v").over(full)),
          (((_: C, mx: C) => mx), last($"v").over(full)),
          (((off: C, _: C) => off + lit(2)),
            nth_value($"v", 3).over(full)))) {
        val got = asMap(GlobalRank.groupedEdgeValue(df, group,
          Seq($"id"), $"v", tgt, "e").select($"id", $"e"))
        val want = asMap(rows.toDF("g", "id", "v")
          .select($"id", wantCol.as("e")))
        assert(got == want, s"grouped=$grouped edge value diverged; " +
          s"first diffs: ${got.toSeq.sortBy(_._1)
            .filter(p => want(p._1) != p._2).take(3).mkString(",")}")
      }
    }
    val plan = GlobalRank.groupedEdgeValue(df, Seq("g"), Seq($"id"),
      $"v", (off, _) => off, "e")
    assert(!plan.queryExecution.executedPlan.toString.contains("Window"),
      "groupedEdgeValue must not plan any window operator")
  }

  test("groupedCumsum == sum().over(partitionBy(group).orderBy(order)) " +
      "running frame, window-free, partition-independent (the m07 " +
      "packing rewrite's two-pass scan proof)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1407L)
    val rows = (0 until 25).flatMap { g =>
      (0 until 1 + rnd.nextInt(50)).map(i =>
        (s"g$g", g * 1000L + i, rnd.nextInt(500).toLong))
    }
    // shuffled input: the scan must depend on (group, order) only
    val df = rows.toDF("g", "id", "v").repartition(11, $"v")
    val got = GlobalRank.groupedCumsum(df, Seq("g"), Seq($"id"),
        $"v", "cum")
      .select($"id", $"cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.toDF("g", "id", "v")
      .withColumn("cum", sum($"v").over(Window.partitionBy($"g")
        .orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "two-pass grouped cumsum diverged from the " +
      s"window form; first diffs: ${got.toSeq.sortBy(_._1)
        .filter(p => want(p._1) != p._2).take(3).mkString(",")}")
    // r15: the in-partition running sum rides a window PARTITIONED BY
    // the frozen pid — task-bounded by construction, the one window
    // class the flooded-partition sweep admits. The pin: every window
    // in the plan is the pid-partitioned one; no corpus-share window.
    val planStr = GlobalRank.groupedCumsum(df, Seq("g"), Seq($"id"),
      $"v", "cum").queryExecution.executedPlan.toString
    val windowLines = planStr.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty &&
        windowLines.forall(_.contains("__gr_pid")),
      "every groupedCumsum window must be partitioned by the frozen " +
        s"pid; got:\n${windowLines.mkString("\n")}")
    // the non-negativity contract fails loudly, not silently wrong
    val neg = Seq(("a", 1L, -5L)).toDF("g", "id", "v")
    val e = intercept[Exception] {
      GlobalRank.groupedCumsum(neg, Seq("g"), Seq($"id"), $"v", "cum")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-negative")), s"wrong error: $e")
  }
}
