package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream analytics over the `events` fixture: tumbling windows,
  * sessionization (both Spark-native `session_window` and the
  * SQL-expressible islands formulation), JSON extraction, and a
  * Structured-Streaming window aggregation whose result is checked
  * against the same DuckDB oracle as its batch twin — demonstrating that
  * the streaming path computes the batch-equivalent answer.
  *
  * The reference has no event-time semantics at all (SURVEY.md §2.3 —
  * its only time axis is the flush ticker), so everything here is
  * extension surface (§2.4), designed Spark-first: event-time windows are
  * hash-partition-friendly aggregations; sessionization uses window
  * functions (one shuffle per user partition) rather than any
  * driver-side loop.
  *
  * Timestamp precision: `events.ts` is ns in parquet; both Spark (via
  * Tables.load's nanos→micros conversion) and DuckDB (native ns→µs
  * truncation) floor to microseconds, so raw `ts`-derived outputs agree.
  * Gap comparisons use integer epoch-microseconds on both sides to avoid
  * interval-semantics differences.
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Shared 30-minute session gap in microseconds. */
  private val GapUs = 1800L * 1000 * 1000

  /** e32's gap axis in minutes: brackets the shipped 30-minute gap
    * (= GapUs) two steps each way. */
  private val SessionGapsMin = Seq(5, 15, 30, 60, 120)

  /** e14's once-per-(JVM, fixture) connector-seeding guard. */
  private val e14Seeded =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** e46's persisted skew card, written once per (JVM, fixture) — the
    * ServingIndexes build-once discipline. */
  private val e46Card =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DRIVER-LOCAL scratch space for the gated streaming rows (e34/e35
    * DLQ queues, e39's terminal heartbeat): a temp directory with a
    * JVM-exit recursive cleanup, so repeated invocations don't leak one
    * directory per run (r14 ADVICE). The path is driver-local BY
    * ASSUMPTION — fine for the single-JVM gates these rows are, but a
    * multi-node deployment of the same punctuation/DLQ patterns must
    * point the equivalent option at shared storage (the sinks'
    * `dead_letter_path` and any heartbeat source accept any
    * Hadoop-visible URI; only the GATE defaults to local scratch).
    */
  // ONE shutdown hook draining a queue of scratch dirs — a hook per
  // call would accumulate a thread per run in a long-lived driver
  // (bench loops run e39 hundreds of times; review r15)
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val scratchHookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      var p = scratchDirs.poll()
      while (p != null) { rm(p.toFile); p = scratchDirs.poll() }
    }))
    true
  }

  private[graft] def scratchDir(prefix: String): String = {
    require(scratchHookInstalled)
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  /** HLL++ sketch cardinalities (approx_count_distinct). Not a
    * registered query: DuckDB's approx_count_distinct uses a different
    * sketch, so values can never hash-match an oracle — keeping it on
    * the board meant a permanent `no_oracle` asterisk in CORRECTNESS.
    * The exact semantics stay driver-gated through its hash-green twin
    * e11b (count DISTINCT of the same columns); EventsSpec gates THIS
    * form in-engine: deterministic across runs, and within HLL
    * tolerance of e11b's exact counts.
    */
  def sketchCardinality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id").as("approx_users"),
        approx_count_distinct($"props", 0.02).as("approx_props"))
      .orderBy($"event_type")
  }

  /** e30's per-(window, type) PSI contribution — p09's dialect-shared
    * expression retargeted at (window count c_w / total n_w) vs
    * (baseline count c_base / total n_base), Laplace-smoothed over the
    * n_types universe; exact integer inputs, identical doubles in both
    * engines, rounded to DECIMAL before the per-window sum.
    */
  private val PsiWindowTermSql =
    """cast(round(
      |  (cast(c_w + 1 as double) / cast(n_w + n_types as double) -
      |   cast(c_base + 1 as double) / cast(n_base + n_types as double)) *
      |  ln((cast(c_w + 1 as double) / cast(n_w + n_types as double)) /
      |     (cast(c_base + 1 as double) / cast(n_base + n_types as double))),
      |  6)
      |as decimal(14,6))""".stripMargin

  /** e31 core — TRAILING-baseline drift monitor, e30's production fix:
    * e30 compares each closed hour against a STATIC whole-corpus
    * baseline, so a permanent mix shift alarms forever; production
    * drift detection re-baselines on a trailing window (here: the 3
    * prior hours), so a step change alarms while the baseline still
    * remembers the old mix and re-stabilizes once the trailing window
    * has rolled past it — the spec drives exactly that trajectory on a
    * synthetic step-change stream.
    *
    * The streaming half is a CHAINED two-stateful-operator query (the
    * e27 discipline): an hourly windowed count feeding a SLIDING
    * (3 h, 1 h) windowed sum — per event type, the trailing window
    * [h−3h, h) materializes as the sliding window whose end is h, both
    * levels evicting on the propagated watermark, no intermediate
    * topic. The current-hour counts and the closed-horizon cutoff come
    * batch-side from the same fixture (e30's mirror image: there the
    * STREAM carried the current mix and the baseline was batch; here
    * the stream carries the novel artifact — the trailing baseline —
    * and e30 already gates streaming current-hour emission). The
    * comparison join is hours×types — broadcast-tiny at any scale.
    * Hours with no trailing data yet (the stream's opening hours) have
    * no defined baseline and are excluded (inner join on hours present
    * on both sides); the per-hour type grid is the union of current
    * and baseline types, Laplace-smoothed over its own size, PSI terms
    * rounded to DECIMAL before the per-hour sum (p09/e30 discipline).
    */
  private[graft] def trailingDriftCore(s: SparkSession,
      streamEvents: DataFrame, batchEvents: DataFrame,
      gateName: String): DataFrame = {
    import s.implicits._
    // one row, but each un-materialized reference is a full events
    // scan (max ts) — and baseT below is referenced three times
    val cutoffDf = batchEvents
      .agg((max($"ts") - expr("INTERVAL 2 HOURS")).as("cutoff"))
      .localCheckpoint()
    val hourly = streamEvents
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val trailing = hourly
      .groupBy(window(window_time($"window"), "3 hours", "1 hour"),
        $"event_type")
      .agg(sum($"n").as("c_base"))
    val baseT = graft.streaming.MemoryGate.append(s, trailing, gateName)
      .join(broadcast(cutoffDf), $"window.end" <= $"cutoff")
      .select($"window.end".as("hour_start"), $"event_type",
        $"c_base".cast("long").as("c_base"))
    // curK is referenced by THREE subtrees below (hours, grid, cells)
    // and cells by two (tot + the final join); un-materialized, each
    // reference re-plans the full events scan + aggregation — the r15
    // plan audit counted 92 Exchanges / 221 nodes on this one query.
    // Both frames are calendar-bounded (hours × event types), so a
    // narrow localCheckpoint collapses the duplicated subtrees to one
    // scan each (guide §2.4 / §3.3: materialize a reused bounded
    // intermediate instead of re-deriving it) — clean A/B in
    // OPTIMIZATION_r16.md; results byte-identical, oracle-gated.
    val curK = batchEvents
      .select(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .groupBy($"hour_start", $"event_type").agg(count(lit(1)).as("c_w"))
      .join(broadcast(cutoffDf),
        $"hour_start" + expr("INTERVAL 1 HOUR") <= $"cutoff")
      .select($"hour_start", $"event_type", $"c_w")
      .localCheckpoint()
    val hours = curK.select($"hour_start").distinct()
      .join(baseT.select($"hour_start").distinct(), "hour_start")
    val grid = hours.join(
      curK.select($"hour_start", $"event_type")
        .union(baseT.select($"hour_start", $"event_type")).distinct(),
      "hour_start")
    val cells = grid
      .join(curK, Seq("hour_start", "event_type"), "left")
      .join(baseT, Seq("hour_start", "event_type"), "left")
      .select($"hour_start", $"event_type",
        coalesce($"c_w", lit(0L)).as("c_w"),
        coalesce($"c_base", lit(0L)).as("c_base"))
      .localCheckpoint()
    val tot = cells.groupBy($"hour_start")
      .agg(sum($"c_w").as("n_w"), sum($"c_base").as("n_base"),
        count(lit(1)).as("n_types"))
    cells.join(broadcast(tot), "hour_start")
      .withColumn("term", expr(PsiWindowTermSql))
      .groupBy($"hour_start")
      .agg(sum($"c_w").as("n_events"), sum($"term").as("psi_d"))
      .select($"hour_start", $"n_events",
        expr("round(cast(psi_d as double), 6)").as("psi"))
      .withColumn("drift_status",
        when($"psi" > 0.25, lit("investigate"))
          .when($"psi" > 0.1, lit("watch"))
          .otherwise(lit("stable")))
      .orderBy($"hour_start")
  }

  /** Decomposable-aggregate descriptors for [[saltedAggAuto]]: the
    * two-phase salted rewrite only exists for aggregates that split
    * into a per-(key, salt) partial and an exact combine, so the API
    * admits exactly those (count → sum of partial counts; sum/min/max
    * → themselves; avg → a (sum, count) struct partial with the
    * division in the combine; approx-distinct → DataSketches HLL
    * partials merged by `hll_union_agg` — sketch register merge is
    * exact, so the salted estimate EQUALS the direct one, the
    * mergeability claim e15/e36 serve; note the direct arm uses the
    * same `hll_sketch_agg`, NOT `approx_count_distinct`, whose HLL++
    * registers are a different sketch and would flip estimates across
    * mode changes). Note the double-sum caveat: FLOAT sums (including
    * avg's sum partial) re-associate under salting (same as any
    * shuffle-order change), so a mode flip in the auto ladder can move
    * the last ulps run to run — callers hash-gating float output
    * round it (e09's discipline); [[saltedAggWith]] logs a warning on
    * float SaltSum/SaltAvg columns to make the trap visible.
    */
  sealed trait SaltAgg { def alias: String }
  final case class SaltCount(alias: String) extends SaltAgg
  final case class SaltSum(c: Column, alias: String) extends SaltAgg
  final case class SaltMin(c: Column, alias: String) extends SaltAgg
  final case class SaltMax(c: Column, alias: String) extends SaltAgg
  final case class SaltAvg(c: Column, alias: String) extends SaltAgg
  final case class SaltApproxDistinct(c: Column, alias: String)
    extends SaltAgg

  /** The e40 card arithmetic for ANY axis set — one narrow scan, the
    * axes fanned out per-row (explode of structs, never a self-union
    * re-read), per-(axis, key) counts with map-side partials, then
    * the ceil-division sizing columns. Shared by the gated e40 row
    * (three fixture axes at the pinned budget) and the `graft_skew`
    * SQL TVF (caller-chosen axis and budget) so the two surfaces
    * cannot drift. Callers pass `k` expressions that are already
    * string-typed and null-coalesced — the key text is part of the
    * axis contract.
    */
  private[graft] def skewCardFor(df: DataFrame,
      axes: Seq[(String, Column)], p: Long): DataFrame =
    df.select(explode(array(axes.map { case (name, k) =>
        struct(lit(name).as("axis"), k.as("k"))
      }: _*)).as("ak"))
      .select(col("ak.axis").as("axis"), col("ak.k").as("k"))
      .groupBy(col("axis"), col("k")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("axis"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total_rows"),
        max(col("cnt")).as("max_key_rows"))
      .withColumn("max_share",
        round(col("max_key_rows") / col("total_rows").cast("double"), 6))
      .withColumn("skew_factor",
        round((col("max_key_rows") * col("n_keys")) /
          col("total_rows").cast("double"), 6))
      .withColumn("target_task_rows",
        expr(s"(total_rows + $p - 1) div $p"))
      .withColumn("salt_n", expr(
        "(max_key_rows + target_task_rows - 1) div target_task_rows"))
      .withColumn("post_salt_max_rows",
        expr("(max_key_rows + salt_n - 1) div salt_n"))
      .withColumn("decision",
        when(col("salt_n") > 1, lit("salt")).otherwise(lit("direct")))
      .orderBy(col("axis"))

  /** The e40 sizing for ONE axis, consumed live: per-key counts of
    * `keys` over `df` (one column-pruned pass, map-side partials),
    * then the card's ceil-division arithmetic — target = ⌈total/P⌉
    * rows per balanced task, salt_n = ⌈max_key/target⌉ the fan-out
    * that provably brings the hottest key back under it (1 = the
    * axis is balanced at budget P; the rewrite would be pure loss).
    * Separated from [[saltedAggAuto]] so the switch DECISION is
    * spec-pinnable without plan forensics.
    */
  private[graft] def saltDecision(s: SparkSession, df: DataFrame,
      keys: Seq[String], p: Long): Long = {
    val card = df.select(keys.map(col): _*)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")), max(col("cnt"))).head()
    if (card.isNullAt(0)) 1L // empty frame: nothing to salt
    else {
      val total = card.getLong(0)
      val maxKey = card.getLong(1)
      val target = math.max(1L, (total + p - 1) / p)
      (maxKey + target - 1) / target
    }
  }

  /** e40's decision card promoted from a REPORT into ENGINE BEHAVIOR
    * (the round-13 verdict's top item): a groupBy wrapper that picks
    * the direct single-shuffle aggregation or e09's two-phase salted
    * rewrite per call, using the same stats-first budget-switch
    * discipline that already guards the containment candidate
    * generator and the ANN probe/refine literals.
    *
    * The ladder (conf `spark.graft.agg.salt` ∈ {auto, direct, salt},
    * overridable per call):
    *  - `direct` / `salt`: forced — zero sizing cost (forced salt
    *    fans out `spark.graft.agg.saltN`-ways, default 16, e09's
    *    historical constant).
    *  - `auto`: frames whose optimizer scan estimate sits under
    *    `spark.graft.agg.saltBudgetBytes` (default 1 GiB) go DIRECT
    *    with zero jobs — a sub-budget aggregation cannot be
    *    meaningfully skew-bound, and a wrong call costs one slow task,
    *    not a plan. Above the budget the [[saltDecision]] sizing pass
    *    runs (deliberately NOT a checkpoint: the card projects to the
    *    key columns, so the extra pass is a column-pruned narrow scan
    *    — at 100 TB that is far cheaper than materializing the full
    *    working set to executor disks, and an advisory sizing
    *    tolerates a nondeterministic frame where a plan-identity
    *    switch would not) and its salt_n picks the plan: 1 → direct,
    *    else the two-phase rewrite at exactly that fan-out.
    *
    * `spread` seeds the salt (any roughly-uniform per-row expression;
    * defaults to a per-row id). The salt value NEVER affects results
    * for the admitted aggregate set — it only routes rows — so a
    * speculative/retried task re-deriving different salts is safe.
    *
    * Recurring pipelines at 100 TB should persist the e40 card and
    * force the mode per axis instead of paying the sizing pass per
    * run — the card IS this decision, precomputed ("an autotuner
    * reads exactly this card before choosing e09's plan").
    */
  def saltedAggAuto(s: SparkSession, df: DataFrame, keys: Seq[String],
      aggs: Seq[SaltAgg], spread: Option[Column] = None,
      mode: Option[String] = None,
      budgetBytes: Option[Long] = None,
      cardDir: Option[String] = None): DataFrame = {
    // misuse must fail BEFORE the auto arm pays a sizing job
    require(aggs.nonEmpty, "saltedAggAuto needs at least one aggregate")
    val m = mode.getOrElse(s.conf.get("spark.graft.agg.salt", "auto"))
    val saltN: Long = (m, cardDir) match {
      case ("direct", _) => 1L
      case ("salt", _) => s.conf.get("spark.graft.agg.saltN", "16").toLong
      // ARTIFACT-FIRST sizing (round 15, the serving-tier discipline):
      // a recurring pipeline persists the e40 card once and every run
      // reads its decision instead of re-paying the sizing pass — the
      // card IS this decision, precomputed. Forced modes still win
      // (they are the zero-cost override the card feeds into).
      case ("auto", Some(cd)) => saltFromCard(s, cd, keys)
      case ("auto", None) => saltPlanFor(s, df, keys, budgetBytes)
      case (other, _) => throw new IllegalArgumentException(
        s"spark.graft.agg.salt must be auto|direct|salt, got '$other'")
    }
    saltedAggWith(s, df, keys, aggs, saltN, spread)
  }

  /** Read the persisted e40/e44 card's decision for ONE axis — the
    * read-the-card-back path the round-14 verdict asked for. The card
    * is any parquet written from [[skewCardFor]]'s output (or the
    * `graft_skew` TVF's rows); the axis name contract is
    * `keys.mkString(",")`, matching how a card writer names the axis
    * it priced. Bounded read: one row per axis. A MISSING axis fails
    * loudly — an artifact-first caller asked for a decision that was
    * never priced; silently falling back to live sizing would hide a
    * stale-card deployment bug.
    */
  private[graft] def saltFromCard(s: SparkSession, cardDir: String,
      keys: Seq[String]): Long = {
    val axis = keys.mkString(",")
    val rows = s.read.parquet(cardDir)
      .filter(col("axis") === axis)
      .select(col("salt_n").cast("long"), col("decision"))
      .collect()
    require(rows.nonEmpty,
      s"saltedAggAuto(cardDir=$cardDir): no card row for axis " +
        s"'$axis' - write the skew card for this axis first " +
        "(Events.skewCardFor / graft_skew) or drop cardDir to size live")
    require(rows.length == 1,
      s"saltedAggAuto(cardDir=$cardDir): ${rows.length} card rows for " +
        s"axis '$axis' - the card must hold one decision per axis")
    if (rows.head.getString(1) == "direct") 1L else rows.head.getLong(0)
  }

  /** The `auto` arm of [[saltedAggAuto]]'s ladder, exposed so callers
    * that aggregate REPEATEDLY over frames with one size profile (the
    * components loop: the join's per-key fan-in is the edge frame's
    * degree histogram on every hop) can price ONCE and reuse the
    * decision via [[saltedAggWith]] — deciding per iteration pays an
    * optimizer pass (and, above budget, a card job) per hop for the
    * same answer (measured +0.7 s on the gated components rows,
    * SCALE.md round 14).
    */
  private[graft] def saltPlanFor(s: SparkSession, df: DataFrame,
      keys: Seq[String], budgetBytes: Option[Long] = None): Long = {
    val budget = budgetBytes.getOrElse(
      s.conf.get("spark.graft.agg.saltBudgetBytes",
        (1L << 30).toString).toLong)
    if (PlanSizing.scanBytes(df) <= BigInt(budget)) 1L
    else {
      val p = s.conf.getOption("spark.graft.skew.reducerBudget")
        .getOrElse(s.conf.get("spark.sql.shuffle.partitions")).toLong
      saltDecision(s, df, keys, p)
    }
  }

  /** The decided-plan builder behind [[saltedAggAuto]]: the direct
    * single-shuffle aggregation at `saltN` ≤ 1, the two-phase salted
    * rewrite at exactly that fan-out otherwise.
    */
  private[graft] def saltedAggWith(s: SparkSession, df: DataFrame,
      keys: Seq[String], aggs: Seq[SaltAgg], saltN: Long,
      spread: Option[Column] = None): DataFrame = {
    require(aggs.nonEmpty, "saltedAggWith needs at least one aggregate")
    // The rewrite injects working columns (__salt, __p0..__pN) via
    // withColumn — a caller frame already carrying one of those names
    // would be silently overwritten and the aggregation corrupted, and
    // an agg alias equal to a grouping key yields a duplicate output
    // column. Both are contract violations; fail loudly (the
    // PrefixScan 'b'/'v' discipline — r14 ADVICE).
    val reserved = "__salt" +: aggs.indices.map(i => s"__p$i")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"saltedAggWith reserves column names ${reserved.mkString(", ")}; " +
        s"input frame already has: ${clash.mkString(", ")}")
    val aliasClash = aggs.map(_.alias).filter(keys.contains)
    require(aliasClash.isEmpty,
      "aggregate aliases may not collide with grouping keys: " +
        aliasClash.mkString(", "))
    warnFloatSums(df, aggs)
    val keyCols = keys.map(col)
    if (saltN <= 1L) {
      df.groupBy(keyCols: _*).agg(
        directAgg(aggs.head), aggs.tail.map(directAgg): _*)
    } else {
      val sprd = spread.getOrElse(monotonically_increasing_id())
      val partials = aggs.zipWithIndex.map { case (a, i) =>
        partialAgg(a, s"__p$i")
      }
      val combines = aggs.zipWithIndex.map { case (a, i) =>
        combineAgg(a, s"__p$i")
      }
      df.withColumn("__salt",
          pmod(crc32(sprd.cast("string")), lit(saltN)))
        .groupBy((keyCols :+ col("__salt")): _*)
        .agg(partials.head, partials.tail: _*)
        .groupBy(keyCols: _*)
        .agg(combines.head, combines.tail: _*)
    }
  }

  private def directAgg(a: SaltAgg): Column = a match {
    case SaltCount(n) => count(lit(1)).as(n)
    case SaltSum(c, n) => sum(c).as(n)
    case SaltMin(c, n) => min(c).as(n)
    case SaltMax(c, n) => max(c).as(n)
    case SaltAvg(c, n) => avg(c).as(n)
    // the same sketch family as the salted arm — see the SaltAgg doc
    case SaltApproxDistinct(c, n) =>
      hll_sketch_estimate(hll_sketch_agg(c)).as(n)
  }

  private def partialAgg(a: SaltAgg, pn: String): Column = a match {
    case SaltCount(_) => count(lit(1)).as(pn)
    case SaltSum(c, _) => sum(c).as(pn)
    case SaltMin(c, _) => min(c).as(pn)
    case SaltMax(c, _) => max(c).as(pn)
    // avg is NOT mergeable as a value; its (sum, count) pair is
    case SaltAvg(c, _) =>
      struct(sum(c).as("s"), count(c).as("n")).as(pn)
    case SaltApproxDistinct(c, _) => hll_sketch_agg(c).as(pn)
  }

  private def combineAgg(a: SaltAgg, pn: String): Column = a match {
    case SaltCount(n) => sum(col(pn)).as(n)
    case SaltSum(_, n) => sum(col(pn)).as(n)
    case SaltMin(_, n) => min(col(pn)).as(n)
    case SaltMax(_, n) => max(col(pn)).as(n)
    // sum-of-sums / sum-of-counts: all-null groups stay null (the
    // 0-count division yields null, matching avg's semantics)
    case SaltAvg(_, n) =>
      (sum(col(s"$pn.s")) / sum(col(s"$pn.n"))).as(n)
    case SaltApproxDistinct(_, n) =>
      hll_sketch_estimate(hll_union_agg(col(pn))).as(n)
  }

  private lazy val saltLog =
    org.slf4j.LoggerFactory.getLogger("graft.ops.Events")

  /** The float-reassociation trap, surfaced (r14 verdict): a mode flip
    * in the auto ladder regroups a float sum, moving its last ulps run
    * to run. Warn — don't fail: the e09 rounding discipline is the
    * sanctioned fix and rejecting doubles outright would ban the
    * board's own gated usage.
    */
  private def warnFloatSums(df: DataFrame, aggs: Seq[SaltAgg]): Unit = {
    val sums = aggs.collect {
      case SaltSum(c, n) => (c, n, "SaltSum")
      case SaltAvg(c, n) => (c, n, "SaltAvg")
    }
    if (sums.nonEmpty) {
      val sch = df.select(sums.map(_._1): _*).schema
      sch.zip(sums).foreach { case (f, (_, n, what)) =>
        if (f.dataType == org.apache.spark.sql.types.DoubleType ||
            f.dataType == org.apache.spark.sql.types.FloatType)
          saltLog.warn(s"saltedAgg: $what('$n') sums a " +
            s"${f.dataType.simpleString} column - float sums " +
            "re-associate when the salt mode changes (run-to-run " +
            "nondeterminism in the last ulps under the auto ladder); " +
            "round the result (the e09 discipline) or cast to DECIMAL " +
            "for exact sums")
        else if (f.dataType
            .isInstanceOf[org.apache.spark.sql.types.DecimalType])
          saltLog.warn(s"saltedAgg: $what('$n') aggregates a " +
            s"${f.dataType.simpleString} column - the two-phase " +
            "salted form widens decimal precision across two sums " +
            "(and divides at a different scale for SaltAvg), so the " +
            "RESULT TYPE can differ from the direct arm's and flip " +
            "with the auto ladder's mode; cast the result to a fixed " +
            "decimal type at the call site for a mode-stable schema " +
            "(review r15)")
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e09_salted_agg" -> { (s, dir) =>
      import s.implicits._
      // Skew-safe two-phase aggregation, gated THROUGH the live auto
      // path (round 14): event_type has only 5 values, so a direct
      // groupBy concentrates each key on one reducer at scale.
      // [[saltedAggAuto]] sizes the axis (budget 0 forces the sizing
      // pass at every SF — what this row certifies is the real
      // decision machinery, not a hand-forced rewrite), derives the
      // e40 ceil-division salt_n, and emits the two-phase plan:
      // phase 1 groups on (key, salt), phase 2 combines the partials.
      // Result is identical to the direct aggregation at ANY salt
      // fan-out (the oracle IS the direct form; the float sum is
      // rounded, the e09 discipline).
      // SaltAvg rides the same gate since round 15: the (sum, count)
      // struct partial with the division in the combine — the oracle
      // is plain avg(), so the decomposition itself is hash-gated
      // (rounded, the float discipline warnFloatSums points at).
      saltedAggAuto(s, ev(s, dir), Seq("event_type"),
        Seq(SaltCount("n"), SaltSum($"value", "pv"),
          SaltAvg($"value", "av")),
        spread = Some($"event_id"), budgetBytes = Some(0L))
        .select($"event_type", $"n", round($"pv", 2).as("total_value"),
          round($"av", 2).as("avg_value"))
        .orderBy($"event_type")
    },

    "e40_skew_salt_decision" -> { (s, dir) =>
      import s.implicits._
      // SHUFFLE-SKEW DECISION CARD — the number behind "should this
      // groupBy salt?". e09 demonstrates the two-phase salted rewrite
      // and d09 its components variant; THIS row emits the go/no-go
      // that picks between them and the direct plan, per candidate
      // shuffle axis (event_type: ~5 keys, user_id: the natural key,
      // day: calendar-bounded). A hash shuffle cannot split one key,
      // so the hottest key's row count lower-bounds the slowest
      // reducer at ANY partition count; target = ceil(total/P) is the
      // balanced-task budget at P reducers, salt_n = ceil(max_key /
      // target) the fan-out that brings the hot key back under it
      // (salt_n = 1 → "direct": the rewrite costs a second agg and is
      // pure loss on balanced axes), post_salt_max the proven bound
      // after the split. skew_factor = max/avg is the conventional
      // diagnostic reported alongside. Scale shapes: the 3-axis
      // fan-out is per-row over ONE narrow 3-column scan (no
      // self-union re-reads); the only data-sized shuffle is the
      // (axis, key) count with map-side partials; everything after is
      // 3 rows. AQE handles JOIN skew at runtime, but aggregation
      // salting is a plan-time rewrite — an autotuner reads exactly
      // this card before choosing e09's plan — and since round 14 one
      // DOES: saltedAggAuto derives exactly this arithmetic live,
      // reading spark.graft.skew.reducerBudget with the SESSION's
      // shuffle.partitions as its fallback. The gated card pins the
      // LITERAL budget 32 instead (the board's documented deployment
      // width) and deliberately ignores the conf: the DuckDB twin
      // hardcodes the same 32, so a session that sets the live knob
      // must not silently flip this row's hash (r14 ADVICE). An
      // autotuner prices its own cluster through the conf-reading
      // live path (saltedAggAuto) or the graft_skew TVF's p argument,
      // never through this fixture row.
      val P = 32L
      skewCardFor(ev(s, dir), Seq(
        "day" -> to_date($"ts").cast("string"),
        "event_type" -> coalesce($"event_type", lit("<null>")),
        "user_id" -> coalesce($"user_id".cast("string"), lit("<null>"))
      ), P)
    },

    "e44_skew_card_sql" -> { (s, dir) =>
      // The autotuner surface in SQL (round 14, the s47/s48/d37
      // discipline applied to the skew card): this row's entire query
      // is the text a SQL-only client types before deciding whether a
      // groupBy needs e09's salted rewrite — graft_skew over the raw
      // table, axis and reducer budget as literal arguments. The TVF
      // defers to the exact Scala core the gated e40 row runs
      // (Events.skewCardFor), so both surfaces are hash-gated against
      // the same arithmetic and neither can drift.
      graft.functions.registerAll(s)
      s.sql(s"SELECT * FROM graft_skew('$dir', 'events', " +
        "'event_type', 32)")
    },

    "e46_salted_agg_card" -> { (s, dir) =>
      import s.implicits._
      // The e40 card's PERSISTENCE round trip, gated (round 15): a
      // recurring 100 TB pipeline prices each shuffle axis ONCE
      // (skewCardFor), persists the card, and every later run reads
      // the decision instead of re-paying the sizing pass — the
      // artifact-first discipline the serving tier already follows.
      // This row runs the full loop: write the event_type axis card
      // (once per JVM x fixture, like the serving indexes), aggregate
      // THROUGH saltedAggAuto(cardDir=...) — which reads salt_n back
      // from the artifact and skips the sizing job — and hash-gate
      // against the same direct-form oracle as e09. The decision only
      // routes rows (any salt_n yields identical results), so the
      // card's pinned p=32 stays deterministic across session layouts
      // (the e40 rule).
      val cd = e46Card.computeIfAbsent(dir, { _ =>
        val d = scratchDir("graft-e46-card")
        skewCardFor(ev(s, dir), Seq(
            "event_type" -> coalesce($"event_type", lit("<null>"))), 32L)
          .write.mode("overwrite").parquet(d)
        d
      })
      saltedAggAuto(s, ev(s, dir), Seq("event_type"),
        Seq(SaltCount("n"), SaltSum($"value", "pv")),
        spread = Some($"event_id"), cardDir = Some(cd))
        .select($"event_type", $"n", round($"pv", 2).as("total_value"))
        .orderBy($"event_type")
    },

    "e45_topk_sql" -> { (s, dir) =>
      // The bounded rank-then-filter surface in SQL (round 15, the
      // e44 discipline applied to TopKPerKey): this row's entire query
      // is the text the flooded-window guard tells a SQL-only client
      // to type instead of `row_number() OVER (PARTITION BY key ORDER
      // BY v DESC) <= k` — the TVF runs the bounded-heap operator (≤k
      // rows per key survive before any sort; the window that assigns
      // rnk sees a k-bounded frame), so the sanctioned alternative is
      // itself oracle-gated, not just named in a warning. Ties on
      // (key, ord) are interchangeable everywhere, so the multiset is
      // engine-deterministic (the hash gate's requirement).
      graft.functions.registerAll(s)
      s.sql(s"SELECT * FROM graft_topk('$dir', 'events', " +
        "'event_type', 'value', 3) ORDER BY key, rnk")
    },

    "e41_watermark_delay_curve" -> { (s, dir) =>
      import s.implicits._
      // WATERMARK-DELAY OPERATING CURVE — the allowed-lateness lever
      // priced as a gated number: every withWatermark() call in the
      // e-family hard-codes a delay, and the honest way to choose it
      // is this curve (drop share at each candidate delay, plus the
      // smallest delay meeting a 0.5% completeness SLO). The fixture
      // is generated in event-time order, so ARRIVAL is modeled as
      // ts + a deterministic md5-coin ingest delay (uniform 0..30 min
      // — the p07 coin: engine-reproducible, partition-independent);
      // an event's watermark at arrival is the max event-time among
      // strictly-earlier arrivals, and it is dropped at delay d when
      // watermark - ts > d. Scale shape: the global running max is
      // NOT a single-task window — it decomposes into the two-phase
      // prefix-scan (per-arrival-hour bucket maxima, an exclusive
      // prefix max over the tiny hours-sized bucket frame, broadcast
      // back, plus a bounded within-bucket running max), the same
      // discipline a 100 TB arrival log forces. Bucket width is the
      // skew knob: the in-bucket window sorts one bucket per task, so
      // at 100 TB the hour constant narrows (to minutes) until one
      // bucket's arrivals fit a task — the structure is
      // width-agnostic. The curve itself is five conditional sums in
      // ONE pass, unpivoted.
      val HourUs = 3600L * 1000 * 1000
      val delays = Seq(0L, 60L, 300L, 900L, 1800L)
      val base = ev(s, dir)
        .select($"event_id", unix_micros($"ts").as("ts_us"))
        .withColumn("delay_s", expr(
          "cast(conv(substr(md5(cast(event_id as string)), 1, 8), " +
            "16, 10) as bigint) % 1800"))
        .withColumn("arr_us", $"ts_us" + $"delay_s" * 1000000L)
        .withColumn("bucket", expr(s"arr_us div $HourUs"))
      // the exclusive prefix max runs over the BUCKET frame: one row
      // per arrival hour, bounded by the corpus's time span, never by
      // its row count — the PrefixScan contract (window-free; see its
      // scaladoc for why, and PrefixScanSpec for the property proof)
      val buckets = PrefixScan.exclusive(
          base.groupBy($"bucket").agg(max($"ts_us").as("bmax")),
          $"bucket", $"bmax", PrefixScan.MaxOp, zero = -1L)
        .select($"bucket", $"prefix".as("pmax"))
      val inBucket = Window.partitionBy($"bucket")
        .orderBy($"arr_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val lat = base
        .withColumn("prevb", max($"ts_us").over(inBucket))
        .join(broadcast(buckets), "bucket")
        .withColumn("late_us", greatest(lit(0L),
          greatest(coalesce($"prevb", lit(-1L)),
            coalesce($"pmax", lit(-1L))) - $"ts_us"))
      // the recommendation (smallest SLO-meeting delay) is a coalesce
      // over the static ascending delay list on the ONE-ROW counts
      // frame — no window, no second evaluation of the upstream; the
      // rounding matches drop_share's exactly so the flag and the
      // share can never disagree at the SLO boundary
      val aggs = count(lit(1)).as("n") +: delays.map(d =>
        sum(when($"late_us" > d * 1000000L, 1L).otherwise(0L)).as(s"c$d"))
      lat.agg(aggs.head, aggs.tail: _*)
        .withColumn("rec_s", coalesce(delays.map(d =>
          when(round(col(s"c$d") / $"n".cast("double"), 6) <= 0.005,
            lit(d))): _*))
        .select($"n", $"rec_s", explode(array(delays.map(d =>
          struct(lit(d).as("delay_s"), col(s"c$d").as("n_dropped"))): _*))
          .as("r"))
        .select($"r.delay_s".as("delay_s"), $"r.n_dropped".as("n_dropped"),
          round($"r.n_dropped" / $"n".cast("double"), 6).as("drop_share"),
          $"rec_s")
        .withColumn("meets_slo", $"drop_share" <= 0.005)
        .withColumn("is_recommended",
          coalesce($"delay_s" === $"rec_s", lit(false)))
        .drop("rec_s")
        .orderBy($"delay_s")
    },

    "e42_state_peak_card" -> { (s, dir) =>
      import s.implicits._
      // STATE-STORE SIZING CARD — the number behind every stateful
      // e-family query's RocksDB footprint: session-window state
      // lives from a session's first event until the watermark passes
      // last-event + gap, so PEAK CONCURRENT OPEN SESSIONS is what
      // sizes state memory and picks the state-partition count (the
      // 100 TB failure mode is a state store that grew past executor
      // memory because nobody priced the peak). Sessions come from
      // the e03 islands form; each emits interval deltas (+1 at
      // start, -1 at expiry, expiry-before-start on ties), and the
      // running sum's maximum is the peak. The global running sum
      // reuses e41's two-phase discipline — per-hour bucket partial
      // sums and peaks, the exclusive bucket-offset prefix computed
      // window-free on the collapsed hours-bounded array, offsets
      // added back to in-bucket peaks — so no partition-less window
      // touches a corpus-sized frame. Per day: sessions started and
      // expired, the day's peak open sessions, its state footprint at
      // 4 KB/session, and the globally recommended state-partition
      // count at 512 sessions/partition (constant across rows, like
      // p22's straggler ratio; computed from the day frame after an
      // eager checkpoint so the corpus pipeline runs once).
      val DayUs = 86400L * 1000 * 1000
      val HourUs = 3600L * 1000 * 1000
      val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val sess = ev(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        .withColumn("prev", lag($"us", 1).over(byUser))
        .withColumn("new_sess",
          when($"prev".isNull || $"us" - $"prev" >= GapUs, 1).otherwise(0))
        .withColumn("sess_id", sum($"new_sess")
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"sess_id")
        .agg(min($"us").as("start_us"),
          (max($"us") + GapUs).as("expire_us"))
      val deltas = sess.select(explode(array(
          struct($"start_us".as("t"), lit(1L).as("d")),
          struct($"expire_us".as("t"), lit(-1L).as("d")))).as("e"))
        .select($"e.t".as("t"), $"e.d".as("d"))
        .withColumn("bucket", expr(s"t div $HourUs"))
      // ties sort (t, d): a session expiring at the instant another
      // starts is freed first — adjacent sessions never double-count.
      // Run values over equal-(t, d) runs are permutation-invariant
      // (each step adds the same delta), so the max hash-gates.
      // Bucket width is the skew knob: the in-bucket window sorts one
      // bucket per task, so at 100 TB the hour constant narrows (to
      // minutes) until a bucket's deltas fit a task — the two-phase
      // structure is width-agnostic (same note as e41).
      val inb = Window.partitionBy($"bucket").orderBy($"t", $"d")
        .rowsBetween(Window.unboundedPreceding, 0)
      // per-bucket partial sums and peaks; the exclusive bucket-offset
      // prefix comes from the shared PrefixScan (hours-bounded,
      // window-free — property-proven against the sequential scan),
      // checkpointed so its one in-bucket window pass isn't re-run
      // for both consumers of perBucket
      val perBucket = deltas.withColumn("run", sum($"d").over(inb))
        .groupBy($"bucket")
        .agg(max($"run").as("b_peak"), sum($"d").as("b_sum"))
        .localCheckpoint()
      val gPeaks = perBucket
        .join(broadcast(PrefixScan.exclusive(perBucket, $"bucket",
          $"b_sum", PrefixScan.SumOp, zero = 0L)), "bucket")
        .select(expr("bucket div 24").as("day_id"),
          ($"b_peak" + $"prefix").as("g_peak"))
        .groupBy($"day_id").agg(max($"g_peak").as("delta_peak"))
      // DAY-ENTERING CANDIDATE (round-13 advisory → round-14 fix):
      // the delta samples alone understate a day entered with N open
      // sessions whose in-day deltas are all expiries (they report
      // N-1) and MISS a day spanned by open sessions with no deltas
      // at all. The running count between a day's start and its first
      // delta IS the entering count — the exclusive prefix sum of the
      // per-day delta sums — so the day spine densifies over
      // [first, last] delta day and each day's peak is
      // max(entering, delta peak). The global max is unaffected (a
      // day's entering count never exceeds the previous day's peak);
      // only the per-day sizing column tightens.
      val perDayRaw = perBucket
        .groupBy(expr("bucket div 24").as("day_id"))
        .agg(sum($"b_sum").as("d_sum"))
      val perDay = perDayRaw
        .agg(min($"day_id").as("d0"), max($"day_id").as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("day_id"))
        .join(perDayRaw, Seq("day_id"), "left")
        .select($"day_id", coalesce($"d_sum", lit(0L)).as("d_sum"))
      val entering = PrefixScan.exclusive(perDay, $"day_id", $"d_sum",
          PrefixScan.SumOp, zero = 0L)
        .select($"bucket".as("day_id"), $"prefix".as("entering"))
      val st = sess.groupBy(expr(s"start_us div $DayUs").as("day_id"))
        .agg(count(lit(1)).as("n_started"))
      val ex = sess.groupBy(expr(s"expire_us div $DayUs").as("day_id"))
        .agg(count(lit(1)).as("n_expired"))
      val days = entering // the dense day frame is the spine now
        .join(gPeaks, Seq("day_id"), "left")
        .join(st, Seq("day_id"), "left")
        .join(ex, Seq("day_id"), "left")
        .select($"day_id", coalesce($"n_started", lit(0L)).as("n_started"),
          coalesce($"n_expired", lit(0L)).as("n_expired"),
          greatest(coalesce($"delta_peak", lit(0L)), $"entering")
            .as("peak_open"))
        .localCheckpoint() // days-sized; upstream corpus pass runs once
      val global = days.agg(max($"peak_open").as("global_peak"))
      days.crossJoin(broadcast(global))
        .select(
          expr("date_add(date'1970-01-01', cast(day_id as int))").as("day"),
          $"n_started", $"n_expired", $"peak_open",
          ($"peak_open" * 4L).as("state_kb"),
          expr("(global_peak + 511) div 512").as("rec_partitions"))
        .orderBy($"day")
    },

    "e43_admission_backlog_curve" -> { (s, dir) =>
      import s.implicits._
      // ADMISSION-CONTROL SIZING CURVE — the one scale knob the
      // REFERENCE itself exposes (B5: max_records_per_trigger,
      // SURVEY §2.1), priced: a per-trigger cap below the arrival
      // rate grows an unbounded backlog, one near the mean rides
      // bursts, one above drains them — and the decision needs the
      // Lindley recursion backlog_t = max(0, backlog_{t-1} +
      // arrivals_t - cap), which has the closed form
      // P_t - min_{s<=t} P_s over prefix sums of (arrivals - cap).
      // Per cap (0.9x / 1.1x / 1.5x the mean arrival rate, so the
      // curve keeps its shape at every SF): peak backlog, epochs
      // spent backlogged, the final backlog and its drained flag, and
      // utilization. Scale shapes: one corpus scan to 10-minute epoch
      // counts (map-side partials); the dense epoch series
      // (calendar-bounded, like e41's buckets) rides the promoted
      // PrefixScan.lindleyStats since round 14 — the queue recursion
      // in closed prefix form as a LINEAR per-cap fold in the one
      // audited bounded-fold home (property-proven there against the
      // sequential recursion, alongside e41/e42's per-bucket
      // exclusive form; this consumer needs only terminal stats, so
      // the quadratic per-bucket explode would be pure loss — round
      // 14 measured 0.18 s vs 7.3 s at sf0.1's ~4.3k epochs). No
      // partition-less window, no driver loop.
      val EpochUs = 600L * 1000 * 1000
      // epoch counts are calendar-bounded (like e41's buckets); the
      // eager checkpoint lets the bounds agg and the densify join
      // both read them with ONE corpus scan
      val sparse = ev(s, dir)
        .select(expr(s"unix_micros(ts) div $EpochUs").as("epoch"))
        .groupBy($"epoch").agg(count(lit(1)).as("a"))
        .localCheckpoint()
      val bounds = sparse.agg(min($"epoch").as("e0"),
        max($"epoch").as("e1"), sum($"a").as("total"))
      // densify over [min, max] — zero-arrival epochs drain backlog —
      // and fan out per cap BEFORE the fold so the grouped pass runs
      // once per cap over its own collapsed row
      val perCap = bounds
        .select($"total", ($"e1" - $"e0" + 1).as("n_epochs"),
          explode(expr("sequence(e0, e1)")).as("epoch"))
        .join(sparse, Seq("epoch"), "left")
        .select($"total", $"n_epochs", $"epoch",
          coalesce($"a", lit(0L)).as("a"),
          explode(array(Seq(9L, 11L, 15L).map(m => lit(m)): _*)).as("m"))
        .withColumn("cap",
          expr("(total * m + 10 * n_epochs - 1) div (10 * n_epochs)"))
      PrefixScan.lindleyStats(perCap, $"epoch", $"a" - $"cap",
          groups = Seq("m", "cap", "total", "n_epochs"))
        .select(
          round($"m" / lit(10.0), 1).as("cap_x_mean"),
          $"cap".as("cap_rows"),
          $"peak_backlog",
          $"backlogged_buckets".as("backlogged_epochs"),
          $"final_backlog",
          ($"final_backlog" === 0L).as("drained"),
          round($"total" / ($"cap" * $"n_epochs").cast("double"), 6)
            .as("utilization"))
        .orderBy($"cap_x_mean")
    },

    "e10_sliding_windows" -> { (s, dir) =>
      import s.implicits._
      // Sliding event-time windows (1 h length, 30 min slide): each
      // event lands in two buckets. Oracle replicates via an explicit
      // two-offset unnest — pinning Spark's window() bucket assignment
      // to first principles.
      ev(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"window.start".as("win_start"), $"event_type", $"n")
        .orderBy($"win_start", $"event_type")
    },

    "e11b_exact_cardinality" -> { (s, dir) =>
      import s.implicits._
      // Exact twin of e11: the same cardinalities via count(DISTINCT) —
      // hash-gated against DuckDB, so e11's semantics are oracle-checked
      // even though the HLL sketch values themselves can't be (different
      // sketch per engine). The spec asserts e11's approximations land
      // within HLL tolerance of these exact counts.
      ev(s, dir)
        .groupBy($"event_type")
        .agg(
          countDistinct($"user_id").as("n_users"),
          countDistinct($"props").as("n_props"))
        .orderBy($"event_type")
    },

    "e13_funnel_steps" -> { (s, dir) =>
      import s.implicits._
      // Ordered-funnel analytics: users who viewed, then clicked AFTER
      // their first view, then purchased AFTER that first qualifying
      // click — the strictly-ordered conversion funnel. ONE events scan
      // and ONE user_id shuffle: each step is a conditional min over
      // the SAME user partition (three chained Window projections share
      // a single exchange — each step's cutoff is the previous window's
      // result, which a single groupBy can't express), then a per-user
      // dedup agg and a global count. The old per-step agg+join chain
      // read events five times and shuffled three (the scan-audit
      // finding); every filter here rides one pass. No sort frames —
      // unordered min over the full partition; ts comparisons are on
      // the µs-floored timestamps both engines agree on.
      val w = Window.partitionBy($"user_id")
      val per = ev(s, dir)
        .filter($"event_type".isin("view", "click", "purchase"))
        .select($"user_id", $"event_type", $"ts")
        .withColumn("v_ts",
          min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("c_ts", min(when(
          $"event_type" === "click" && $"ts" > $"v_ts", $"ts")).over(w))
        .withColumn("p_ts", min(when(
          $"event_type" === "purchase" && $"ts" > $"c_ts", $"ts")).over(w))
        .groupBy($"user_id").agg(max($"v_ts").as("v_ts"),
          max($"c_ts").as("c_ts"), max($"p_ts").as("p_ts"))
      per.agg(count($"v_ts").as("n_view_users"),
          count($"c_ts").as("n_click_after_view"),
          count($"p_ts").as("n_purchase_funnel"))
        .withColumn("conversion",
          round($"n_purchase_funnel" / $"n_view_users".cast("double"), 6))
    },

    "e14_kinesis_roundtrip_agg" -> { (s, dir) =>
      import s.implicits._
      // The CONNECTOR is part of the oracle-gated surface: the events
      // table flows out through the DSv2 Kinesis sink (JSON payloads,
      // batched PutRecords) and back in through the DSv2 source (shard
      // iterators), then aggregates — and must hash-match DuckDB run
      // directly on the parquet. Multiset delivery + order-insensitive
      // aggregation make the round trip deterministic.
      //
      // This is a deliberate LOCAL-MODE self-test of the connector (the
      // FakeKinesis registry is per-JVM, like every fake-backed test in
      // the suite); a cluster deployment would point both legs at real
      // Kinesis. Seeding is per-(JVM, sfDir), idempotent and guarded —
      // repeated builder calls return a plan without re-running the
      // write, and nothing ever clears a seeded stream underneath a
      // previously returned DataFrame.
      val fakeName = "e14-roundtrip"
      // hex, not math.abs: abs(Int.MinValue) is negative
      val stream = s"events-rt-${Integer.toHexString(dir.hashCode)}"
      e14Seeded.computeIfAbsent(s"$fakeName|$stream", { _ =>
        graft.sink.FakeKinesis.named(fakeName).numShards.set(4)
        ev(s, dir)
          .select($"event_id".cast("string").as("partitionKey"),
            to_json(struct($"event_type", $"value")).cast("binary")
              .as("data"))
          .write.format("kinesis-graft")
          .option("aws_region_name", "us-east-1")
          .option("stream", stream)
          .option("client", s"fake:$fakeName")
          .mode("append").save()
        java.lang.Boolean.TRUE
      })
      s.read.format("kinesis-graft")
        .option("aws_region_name", "us-east-1")
        .option("stream", stream)
        .option("client", s"fake:$fakeName")
        .load()
        .select(from_json($"data".cast("string"),
          lit("struct<event_type:string,value:double>")).as("e"))
        .groupBy($"e.event_type".as("event_type"))
        // Sum as DECIMAL(18,2): fixture values are exact 2-dp, so the
        // decimal sum is exact and ORDER-INSENSITIVE — shard-delivery
        // order is nondeterministic here (parallel write tasks interleave
        // into FakeKinesis), and a double sum's rounding could otherwise
        // flip near a .005 boundary vs DuckDB's parquet-order sum.
        .agg(count(lit(1)).as("n"),
          sum($"e.value".cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy($"event_type")
    },

    "e34_dlq_replay_agg" -> { (s, dir) =>
      import s.implicits._
      // The dead-letter loop CLOSED, driver-gated (e14's discipline
      // extended with the drop-repair leg): a persistent request
      // fault sheds one split of the events table into the parquet
      // quarantine (on_persistent_error=drop + dead_letter_path —
      // the reference can only COUNT its drops, batchproducer.go
      // StatsBatch); the healthy split delivers directly; the fault
      // clears and replayDeadLetters re-sends the quarantine and
      // removes exactly what it consumed. The aggregate over what the
      // SOURCE then reads back must hash-match DuckDB on the raw
      // parquet — i.e. at-least-once delivery WITH the repair leg
      // loses nothing and (fault cleared, so no re-quarantine)
      // duplicates nothing. Deterministic like e14: multiset delivery
      // + order-insensitive DECIMAL aggregation; seeding is
      // per-(JVM, sfDir), idempotent and guarded.
      val fakeName = "e34-dlq"
      val stream = s"events-dlq-${Integer.toHexString(dir.hashCode)}"
      e14Seeded.computeIfAbsent(s"$fakeName|$stream", { _ =>
        val fake = graft.sink.FakeKinesis.named(fakeName)
        fake.numShards.set(4)
        val dlq = scratchDir("graft-e34-dlq") + "/q"
        val opts = Map(
          "aws_region_name" -> "us-east-1", "stream" -> stream,
          "client" -> s"fake:$fakeName", "on_persistent_error" -> "drop",
          "max_attempts_per_record" -> "2", "base_backoff_ms" -> "1",
          "dead_letter_path" -> dlq)
        def wire(f: org.apache.spark.sql.Column) = ev(s, dir).filter(f)
          .select($"event_id".cast("string").as("partitionKey"),
            to_json(struct($"event_type", $"value")).cast("binary")
              .as("data"))
        // leg 1: the fault window — every request the unlucky split's
        // delivery makes throws, so the whole split load-sheds into
        // the quarantine (attempt-capped, tiny backoff)
        fake.failNextRequests.set(Int.MaxValue)
        graft.sink.KinesisSink.write(wire($"event_id" % 7 === 0), opts)
        fake.failNextRequests.set(0) // the fault clears
        // leg 2: the healthy split delivers directly
        graft.sink.KinesisSink.write(wire($"event_id" % 7 =!= 0), opts)
        // leg 3: replay drains the quarantine — the loop closes
        graft.sink.KinesisSink.replayDeadLetters(s, opts)
        java.lang.Boolean.TRUE
      })
      s.read.format("kinesis-graft")
        .option("aws_region_name", "us-east-1")
        .option("stream", stream)
        .option("client", s"fake:$fakeName")
        .load()
        .select(from_json($"data".cast("string"),
          lit("struct<event_type:string,value:double>")).as("e"))
        .groupBy($"e.event_type".as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum($"e.value".cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy($"event_type")
    },

    "e35_dlq_replay_under_fault" -> { (s, dir) =>
      import s.implicits._
      // e34's HARDER path, driver-gated: the replay itself hits a LIVE
      // fault. Leg 1 quarantines one split under a persistent fault;
      // leg 2 delivers the healthy split; leg 3 replays WHILE THE
      // FAULT STILL HOLDS — replayDeadLetters snapshots the consumed
      // file set FIRST, so its own re-quarantined rows land in NEW
      // files that survive the post-replay deletion (deleting them
      // would silently lose the whole split and flip this hash); leg 4
      // heals the fault and replays again, closing the loop. The
      // source read-back must aggregate to the raw-events truth:
      // nothing lost across TWO quarantine generations, nothing
      // duplicated (a faulted request never ingests). Deterministic
      // like e34 — the persistent-fault legs make each record's path
      // scheduling-independent (all of A re-quarantines in leg 3, all
      // delivers in leg 4), so the gate proves the hard path at every
      // run, not just when the scheduler cooperates.
      val fakeName = "e35-dlq"
      val stream = s"events-dlq2-${Integer.toHexString(dir.hashCode)}"
      e14Seeded.computeIfAbsent(s"$fakeName|$stream", { _ =>
        val fake = graft.sink.FakeKinesis.named(fakeName)
        fake.numShards.set(4)
        val dlq = scratchDir("graft-e35-dlq") + "/q"
        val opts = Map(
          "aws_region_name" -> "us-east-1", "stream" -> stream,
          "client" -> s"fake:$fakeName", "on_persistent_error" -> "drop",
          "max_attempts_per_record" -> "2", "base_backoff_ms" -> "1",
          "dead_letter_path" -> dlq)
        def wire(f: org.apache.spark.sql.Column) = ev(s, dir).filter(f)
          .select($"event_id".cast("string").as("partitionKey"),
            to_json(struct($"event_type", $"value")).cast("binary")
              .as("data"))
        // leg 1: persistent fault — the unlucky split quarantines
        fake.failRequests.set(true)
        graft.sink.KinesisSink.write(wire($"event_id" % 7 === 0), opts)
        fake.failRequests.set(false)
        // leg 2: the healthy split delivers directly
        graft.sink.KinesisSink.write(wire($"event_id" % 7 =!= 0), opts)
        // leg 3: replay under the STILL-LIVE fault — everything it
        // consumed re-quarantines into fresh files
        fake.failRequests.set(true)
        graft.sink.KinesisSink.replayDeadLetters(s, opts)
        fake.failRequests.set(false)
        // leg 4: the healed replay drains generation 2 — loop closed
        graft.sink.KinesisSink.replayDeadLetters(s, opts)
        java.lang.Boolean.TRUE
      })
      s.read.format("kinesis-graft")
        .option("aws_region_name", "us-east-1")
        .option("stream", stream)
        .option("client", s"fake:$fakeName")
        .load()
        .select(from_json($"data".cast("string"),
          lit("struct<event_type:string,value:double>")).as("e"))
        .groupBy($"e.event_type".as("event_type"))
        .agg(count(lit(1)).as("n"),
          sum($"e.value".cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .orderBy($"event_type")
    },

    "e39_stream_asof_attribution" -> { (s, dir) =>
      import s.implicits._
      // STREAMING as-of — e08's attribution computed through
      // Structured Streaming with the custom stateful operator
      // (AsofEnricher: flatMapGroupsWithState keyed by user; see its
      // doc for the watermark-finality discipline that makes "latest
      // prior click, however old" correct under out-of-order arrival
      // — no built-in streaming operator expresses it, the interval
      // join bounds both sides). Gated against e08's ASOF JOIN oracle
      // verbatim: the streamed enrichment must converge to the batch
      // truth on the bounded fixture. Finality is STRICTLY below the
      // watermark since round 14 (the enricher's closed 1 ms
      // boundary), so a bounded replay needs the watermark pushed
      // PAST the last real event — the standard terminal-punctuation
      // pattern: union ONE far-future heartbeat click for a sentinel
      // user outside the fixture. Clicks never emit rows, so the
      // output set is untouched; the heartbeat's only effect is the
      // final watermark jump that flushes the horizon events (both
      // file sources drain in the first batch, the watermark moves at
      // batch end, and the no-data batch's timeout re-arm emits
      // everything — same convergence as before, now at exact µs
      // attribution precision).
      val real = Tables.loadStream(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"ts", $"event_id", $"event_type")
      val hbDir = scratchDir("graft-e39-heartbeat")
      Seq((-1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
          -1L, "click"))
        .toDF("user_id", "ts", "event_id", "event_type")
        .select(real.schema.fields.map(f =>
          col(f.name).cast(f.dataType)): _*)
        .write.mode("overwrite").parquet(hbDir)
      val src = real
        .unionByName(s.readStream.schema(real.schema).parquet(hbDir))
        .withWatermark("ts", "0 seconds")
      graft.streaming.MemoryGate.append(s,
        graft.streaming.AsofEnricher.enrich(s, src),
        "e39_out_" + Integer.toHexString(dir.hashCode))
        .orderBy($"purchase_id")
    },

    "e36_sketch_rollup_serving" -> { (s, dir) =>
      import s.implicits._
      // e15's mergeability claim SERVED: the per-(day, type) HLL
      // rollup is a WRITTEN day-partitioned artifact (ServingIndexes
      // .sketchRollup, built once per JVM), and a 14-day range
      // cardinality is answered by unioning the range's sketches —
      // the date filter prunes the artifact read to the range's
      // partitions, and the raw events contribute only the EXACT
      // count this gate needs for its tolerance check (a production
      // query trusts the sketch; the gate must not). Gated like e15:
      // the estimate itself stays out of the hash (engine-specific
      // registers); the boolean — merged-from-artifact estimate
      // within 5 % of exact (lgK=12 RSE ~1.6 %, so ≥3σ) — is what a
      // degraded rollup would flip.
      val idx = ServingIndexes.sketchRollup(s, dir)
      val lo = to_date(lit("2024-01-08"))
      val hi = to_date(lit("2024-01-21"))
      val merged = s.read.parquet(s"$idx/daily")
        .filter($"day" >= lo && $"day" <= hi)
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      val exact = ev(s, dir)
        .filter(to_date($"ts") >= lo && to_date($"ts") <= hi)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"))
      merged.join(exact, "event_type")
        .select($"event_type", $"n_users",
          (abs($"est" - $"n_users") <= $"n_users" * 0.05)
            .as("rollup_consistent"))
        .orderBy($"event_type")
    },

    "e37_quantile_rollup_serving" -> { (s, dir) =>
      import s.implicits._
      // e23's quantile-mergeability claim SERVED (e36's twin for the
      // trilogy's quantile member): the per-(day, type) KLL rollup is
      // a written day-partitioned artifact; a 14-day range median is
      // a fold over the range's ≤14 tiny day states — the raw events
      // contribute only the gate's exact leg. Hash-gated like e23:
      // the exact interpolated median over the range plus a boolean
      // asserting the MERGED-from-artifact sketch's median sits
      // within ±0.05 empirical rank of 0.5 on the range's values
      // (KLL k=200 rank error ~1.7%, so ~3x headroom); a rollup that
      // degraded rank accuracy flips it.
      val idx = ServingIndexes.quantileRollup(s, dir)
      val lo = to_date(lit("2024-01-08"))
      val hi = to_date(lit("2024-01-21"))
      val merged = s.read.parquet(s"$idx/daily")
        .filter($"day" >= lo && $"day" <= hi)
        .groupBy($"event_type")
        .agg(collect_list($"sk").as("sks"))
        .withColumn("msk", expr(
          "aggregate(slice(sks, 2, size(sks) - 1), sks[0], " +
            "(acc, x) -> kll_sketch_merge_double(acc, x))"))
        .select($"event_type",
          expr("kll_sketch_get_quantile_double(msk, 0.5d)").as("m_med"))
      val inRange = ev(s, dir)
        .filter(to_date($"ts") >= lo && to_date($"ts") <= hi)
      inRange.join(merged, "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          round(percentile($"value", lit(0.5)), 4).as("exact_med"),
          (sum(when($"value" <= $"m_med", 1L).otherwise(0L)) /
            count(lit(1)).cast("double")).as("m_rank"))
        .select($"event_type", $"n", $"exact_med",
          (abs($"m_rank" - 0.5) <= 0.05).as("rollup_rank_ok"))
        .orderBy($"event_type")
    },

    "e38_topk_rollup_serving" -> { (s, dir) =>
      import s.implicits._
      // The frequent-items member of the rollup-served sketch trio
      // (e36 HLL cardinality, e37 KLL quantiles, this — t15's
      // combine-of-states answered from a WRITTEN day-partitioned
      // artifact): the 14-day range's top-5 users per type come from
      // combining ≤14 tiny day states per type; raw events contribute
      // only the gate's exact leg. t15's discipline: ranking and row
      // selection run on EXACT counts (never sketch-internal tie
      // handling), and the gated boolean pins estimate == exact
      // (capacity >> distinct users, so the sketch is provably exact
      // here; at a real vocabulary it becomes within-epsilon).
      val idx = ServingIndexes.topkRollup(s, dir)
      val lo = to_date(lit("2024-01-08"))
      val hi = to_date(lit("2024-01-21"))
      val merged = s.read.parquet(s"$idx/daily")
        .filter($"day" >= lo && $"day" <= hi)
        .groupBy($"event_type")
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(st), 50)")
          .as("e"))
        .select($"event_type", explode($"e").as("e"))
        .select($"event_type", $"e.item".as("user_id"),
          $"e.count".as("est_n"))
      val exact = ev(s, dir)
        .filter(to_date($"ts") >= lo && to_date($"ts") <= hi)
        .groupBy($"event_type", $"user_id")
        .agg(count(lit(1)).as("n"))
      // bounded-heap cut to 5 per type BEFORE the rank window (round
      // 14): the per-(type, user) aggregate frame scales with the
      // user universe, so rank-then-filter sorted a corpus share per
      // type in one task; the window now ranks ≤5 rows per key
      val w = Window.partitionBy($"event_type")
        .orderBy($"n".desc, $"user_id")
      graft.plans.TopKPerKey(exact, Seq("event_type"),
          struct($"n" * -1, $"user_id"), 5)
        .withColumn("rnk", row_number().over(w))
        .join(merged, Seq("event_type", "user_id"), "left")
        .select($"event_type", $"user_id", $"n", $"rnk",
          coalesce($"est_n" === $"n", lit(false)).as("sketch_ok"))
        .orderBy($"event_type", $"rnk")
    },

    "e15_sketch_merge" -> { (s, dir) =>
      import s.implicits._
      // Sketch MERGEABILITY is the 100 TB property: per-partition (here
      // per-day) HLL sketches union into the global sketch without
      // touching raw data again — the algebraic shape that lets a
      // 1000-executor cluster build cardinalities with one tiny-state
      // shuffle, and lets a warehouse keep daily sketch rollups and
      // answer any date-range distinct-count from them. This query
      // builds DataSketches HLL per (day, type), unions per type, and
      // emits a gated BOOLEAN (plus the exact count): both the merged
      // and the direct estimate must sit within 5 % of the exact
      // count (lgK=12 RSE is ~1.6 %, so 5 % is ≥3σ — and in-engine
      // the check is deterministic, same data → same sketch). Bitwise
      // merged==direct would be the wrong gate: once a sketch leaves
      // exact list mode the union's promotion path differs slightly
      // from direct building (measured at sf0.1: 1488 vs 1494 vs 1500
      // exact) — union preserves ACCURACY, not register identity. The
      // estimates themselves stay out of the hash (engine-specific
      // sketches — the e11 lesson); the accuracy-after-merge property
      // is what's gated: if union-of-partials ever degraded the
      // estimate, the driver's hash gate goes red.
      val daily = ev(s, dir)
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(hll_sketch_agg($"user_id").as("sk"))
      val merged = daily.groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("merged_est"))
      val direct = ev(s, dir).groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("direct_est"),
          countDistinct($"user_id").as("n_users"))
      val tol = $"n_users" * 0.05
      merged.join(direct, "event_type")
        .select($"event_type", $"n_users",
          (abs($"merged_est" - $"n_users") <= tol &&
            abs($"direct_est" - $"n_users") <= tol).as("merge_consistent"))
        .orderBy($"event_type")
    },

    "e16_stream_sessions" -> { (s, dir) =>
      import s.implicits._
      // Streaming SESSIONIZATION parity, closing the streaming set
      // (e07 windows, d10 dedup, e14 connector): the same session_window
      // aggregation as e04, computed through Structured Streaming's
      // merging session state and hash-gated against e04's batch oracle.
      // Complete mode on the bounded fixture; a production stream would
      // run append with the watermark closing sessions (the
      // StatefulSessionizer spec covers watermark semantics).
      graft.streaming.MemoryGate.complete(s,
        Tables.loadStream(s, dir, "events")
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"))
          .select($"session_window.start".as("session_start"), $"user_id",
            $"n_events"),
        "e16_out_" + Integer.toHexString(dir.hashCode))
        .orderBy($"user_id", $"session_start")
    },

    "e12_props_map" -> { (s, dir) =>
      import s.implicits._
      // MapType coverage: parse props into map<string,int>, explode to
      // key/value rows, aggregate per key per type — schema-on-read over
      // semi-structured payloads with complex types.
      ev(s, dir)
        .withColumn("m", from_json($"props", lit("map<string,int>")))
        .select($"event_type", explode($"m").as(Seq("k", "v")))
        .groupBy($"event_type", $"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("total_v"))
        .orderBy($"event_type", $"k")
    },

    "e17_cohort_retention" -> { (s, dir) =>
      import s.implicits._
      // Cohort retention: users grouped by first-seen day, retention =
      // distinct active users at day offsets 0..7 — the standard
      // engagement matrix. Two aggregations shuffle user-count-sized
      // data, not event-count-sized: the cohort map is one row per
      // user, and the rejoin hits the event stream on its user_id key
      // (co-partitionable with any user-keyed layout at 100 TB; the
      // cohort side broadcasts while users fit, and degrades to a
      // shuffle join on the SAME key when they don't).
      val e = ev(s, dir).select($"user_id", to_date($"ts").as("day"))
      val cohorts = e.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      e.join(cohorts, "user_id")
        .withColumn("day_offset",
          datediff($"day", $"cohort_day").cast("long"))
        .filter($"day_offset" <= 7)
        .groupBy($"cohort_day", $"day_offset")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_day", $"day_offset")
    },

    "e01_hourly_type_counts" -> { (s, dir) =>
      import s.implicits._
      // Tumbling 1h event-time window per type. window() start aligns to
      // the epoch hour, so DuckDB's date_trunc('hour', ts) is identical.
      ev(s, dir)
        .groupBy(window($"ts", "1 hour").getField("start").as("hour_start"),
          $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"hour_start", $"event_type")
    },

    "e33_trending_types" -> { (s, dir) =>
      import s.implicits._
      // TRENDING per window — the dashboard analytic e01's counts feed:
      // each hour's top-3 event types by volume, with the RANK
      // MOVEMENT against the previous hour (prev_rnk null = a new
      // entrant; positive delta = climbing). Scale shapes: the heavy
      // lifting is e01's hourly agg (map-side partials to a
      // |hours|×|types| frame); the rank window partitions on the
      // real hour key with |types|-bounded partitions; the
      // previous-hour comparison is an equi-join on (hour+1h, type) —
      // a shifted self-join of the tiny ranked frame, never a lag
      // window over the event stream.
      val hourly = ev(s, dir)
        .groupBy(window($"ts", "1 hour").getField("start")
          .as("hour_start"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"hour_start")
        .orderBy($"n".desc, $"event_type")
      val ranked = hourly.withColumn("rnk", row_number().over(w))
        .localCheckpoint() // tiny; consumed twice (top + prev)
      val prev = ranked.select(
        ($"hour_start" + expr("INTERVAL 1 HOUR")).as("hour_start"),
        $"event_type", $"rnk".as("prev_rnk"))
      ranked.filter($"rnk" <= 3)
        .join(prev, Seq("hour_start", "event_type"), "left")
        .select($"hour_start", $"event_type", $"n", $"rnk",
          $"prev_rnk", ($"prev_rnk" - $"rnk").as("rank_delta"))
        .orderBy($"hour_start", $"rnk")
    },

    "e02_json_stats" -> { (s, dir) =>
      import s.implicits._
      // JSON extraction from the props payload (schema-on-read).
      ev(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg($"k"), 4).as("avg_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },

    "e32_session_gap_curve" -> { (s, dir) =>
      import s.implicits._
      // The SESSION-GAP operating curve — the d23/s25/p17/s28
      // measured-knob discipline applied to the session family's one
      // tunable: every candidate inactivity gap (5/15/30/60/120 min,
      // bracketing the shipped 30) sessionized in ONE query, reporting
      // session count, events per session, and mean session duration.
      // This is the table an analyst reads before moving GapUs over
      // 100 TB of events: too small fragments real visits, too large
      // fuses distinct ones; the curve's elbow is the argument.
      // Scale shapes: the per-user gap stream (lag) is computed ONCE;
      // the 5-row config axis fans out the NARROW (user, us, gap)
      // projection, and every window downstream is partitioned by
      // (gap_min, user_id) — the e03 sessionization shape, five
      // plans-worth of windows sharing one shuffle of the fanned
      // stream. Parity: all-integer gap/duration arithmetic in epoch
      // micros; (us, event_id) total order under both windows so tie
      // placement can't drift; one double division per reported mean.
      val base = ev(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      val byUser = Window.partitionBy($"user_id")
        .orderBy($"us", $"event_id")
      val gaps = base.withColumn("prev_us", lag($"us", 1).over(byUser))
      val fan = gaps.crossJoin(broadcast(SessionGapsMin.toDF("gap_min")))
      val byCfgUser = Window.partitionBy($"gap_min", $"user_id")
        .orderBy($"us", $"event_id")
      val sess = fan.withColumn("new_s",
          when($"prev_us".isNull ||
            $"us" - $"prev_us" >= $"gap_min" * lit(60000000L), 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"new_s").over(byCfgUser))
      val per = sess.groupBy($"gap_min", $"user_id", $"sid")
        .agg(count(lit(1)).as("n_ev"),
          (max($"us") - min($"us")).as("dur_us"))
      per.groupBy($"gap_min")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"n_ev").as("n_events"), sum($"dur_us").as("sum_dur"))
        .select($"gap_min", $"n_sessions",
          round($"n_events" / $"n_sessions".cast("double"), 6)
            .as("events_per_session"),
          round($"sum_dur".cast("double") /
            ($"n_sessions" * lit(1000000L)).cast("double"), 6)
            .as("mean_duration_s"),
          ($"gap_min" === 30).as("shipped"))
        .orderBy($"gap_min")
    },

    "e03_user_sessions" -> { (s, dir) =>
      import s.implicits._
      // Islands sessionization: new session when the gap to the previous
      // event of the same user is >= 30 min. One shuffle (by user), two
      // window passes — no per-user driver state, scales with users.
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev(s, dir)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
        .withColumn("new_sess",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" >= GapUs, 1).otherwise(0))
        .withColumn("sess_id", sum($"new_sess")
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id")
        .agg(
          max($"sess_id").as("n_sessions"),
          count(lit(1)).as("n_events"),
          round(sum($"value"), 2).as("total_value"))
        .orderBy($"user_id")
    },

    "e04_session_window" -> { (s, dir) =>
      import s.implicits._
      // Spark-native session_window: sessions close after a 30-min gap;
      // window.start is the first event's ts (µs-exact on both engines).
      // The session_window call must be the grouping column itself —
      // projecting .start before the agg defeats the merge phase and
      // yields one "session" per event.
      ev(s, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"session_window.start".as("session_start"), $"user_id",
          $"n_events")
        .orderBy($"user_id", $"session_start")
    },

    "e28_dynamic_gap_sessions" -> { (s, dir) =>
      import s.implicits._
      // Session windows with a DYNAMIC, per-event gap — the
      // session_window surface e04's fixed 30 minutes doesn't cover:
      // click bursts close after 10 idle minutes, everything else after
      // 30 (engagement-weighted sessionization, the common production
      // form). Spark merges the per-event intervals [ts, ts + gap);
      // with a NON-constant gap the session end is the RUNNING MAX of
      // prior interval ends, not last-event + gap — a long-gap event
      // can keep a session open across several short-gap events, which
      // is exactly the case the oracle's running-max formulation pins
      // (the fixed-gap lag() oracle would split those). Same grouping
      // discipline as e04: session_window IS the grouping column.
      ev(s, dir)
        .groupBy(session_window($"ts",
          when($"event_type" === "click", "10 minutes")
            .otherwise("30 minutes")), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"session_window.start".as("session_start"), $"user_id",
          $"n_events")
        .orderBy($"user_id", $"session_start")
    },

    "e05_daily_type_share" -> { (s, dir) =>
      import s.implicits._
      // Two-level aggregation + window share-of-total.
      val daily = ev(s, dir)
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"))
      daily
        .withColumn("day_total", sum($"n").over(Window.partitionBy($"day")))
        .select($"day", $"event_type", $"n",
          round($"n" / $"day_total", 6).as("share"))
        .orderBy($"day", $"event_type")
    },

    "e06_top_users_by_value" -> { (s, dir) =>
      import s.implicits._
      // Per-type top-3 users by purchase value: agg + ranked window.
      val sums = ev(s, dir)
        .groupBy($"event_type", $"user_id")
        .agg(round(sum($"value"), 2).as("total_value"),
          count(lit(1)).as("n"))
      // bounded-heap cut before the rank window (the e05/q07 round-14
      // discipline — the per-user aggregate frame is corpus-scaled)
      val w = Window.partitionBy($"event_type")
        .orderBy($"total_value".desc, $"user_id")
      graft.plans.TopKPerKey(sums, Seq("event_type"),
          struct($"total_value" * -1, $"user_id"), 3)
        .withColumn("rnk", row_number().over(w))
        .orderBy($"event_type", $"rnk")
    },

    "e08_asof_attribution" -> { (s, dir) =>
      import s.implicits._
      // AS-OF join (purchase → latest strictly-prior click of the same
      // user), composed from built-ins per SURVEY §4.3 preference (a):
      // one shuffle on user_id, then a running last-click window — no
      // custom plan node needed, and it scales as an ordinary
      // partition-sorted window. Oracle uses DuckDB's native ASOF JOIN,
      // pinning our composition to the standard operator's semantics.
      val ev2 = ev(s, dir).filter($"event_type".isin("click", "purchase"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev2
        .withColumn("prev_click",
          last(when($"event_type" === "click",
            struct($"event_id", $"ts")), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select(
          $"event_id".as("purchase_id"),
          $"user_id",
          $"prev_click.event_id".as("click_id"),
          (unix_micros($"ts") - unix_micros($"prev_click.ts")).as("gap_us"))
        .orderBy($"purchase_id")
    },

    "e07_stream_hourly_counts" -> { (s, dir) =>
      import s.implicits._
      // The SAME aggregation as e01, computed through Structured
      // Streaming: file-stream source over the fixture, complete-mode
      // window aggregation into a memory sink, then returned as a
      // DataFrame the driver hash-compares against the batch oracle.
      // Proves batch/streaming result parity on the engine's own gate.
      graft.streaming.MemoryGate.complete(s,
        Tables.loadStream(s, dir, "events")
          .groupBy(window($"ts", "1 hour").getField("start").as("hour_start"),
            $"event_type")
          .agg(count(lit(1)).as("n")),
        "e07_out_" + Integer.toHexString(dir.hashCode))
        .orderBy($"hour_start", $"event_type")
    },

    "e19_stream_interval_join" -> { (s, dir) =>
      import s.implicits._
      // Stream–STREAM interval join — the remaining Structured Streaming
      // join shape (e18 covers stream–static): clicks joined to the same
      // user's purchases within [click, click + 30 min]. Both sides
      // carry watermarks and the range predicate is on the raw event-time
      // columns, so Spark derives the state-retention bound and evicts
      // join state as the watermark advances — at 100 TB/day the state
      // store holds one watermark-window of keys, not the stream. Inner
      // join in append mode: each matched pair emits exactly once.
      // Gated against the identical batch join in DuckDB — the streaming
      // execution must produce the batch answer. (events.ts is µs-exact
      // in both engines — verified zero sub-µs components — so raw ts
      // range bounds agree.)
      val clicks = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      graft.streaming.MemoryGate.append(s,
        clicks.join(purchases,
          $"user_id" === $"p_user" && $"p_ts" >= $"c_ts" &&
            $"p_ts" <= $"c_ts" + expr("INTERVAL 30 MINUTES")),
        "e19_out_" + Integer.toHexString(dir.hashCode))
        .select($"click_id", $"purchase_id", $"user_id",
          (unix_micros($"p_ts") - unix_micros($"c_ts")).as("gap_us"))
        .orderBy($"click_id", $"purchase_id")
    },

    "e21_stream_outer_join" -> { (s, dir) =>
      import s.implicits._
      // Stream-stream LEFT OUTER interval join — e19's shape plus the
      // null-emitting side, which is where streaming semantics genuinely
      // diverge from batch: an unmatched click can only be emitted once
      // the watermark proves no matching purchase can still arrive, so
      // clicks inside the final watermark horizon (max_ts − 1 h delay −
      // 30 min range) are withheld at stream end — measured: 209 vs 210
      // rows on the raw join at sf0.001. The gate therefore compares the
      // CLOSED-horizon region (c_ts ≤ max_ts − 2 h) on both engines —
      // the honest statement of the outer-join contract: results are
      // batch-equal exactly where the watermark has closed, and that is
      // the only region a correct streaming engine may emit.
      // The final watermark is min over the two sides of (side's max
      // event time − 1 h delay); emission of an unmatched click needs
      // c_ts + 30 min < watermark. Cutoff = min(side maxima) − 2 h
      // restates exactly that with 30 min to spare — computed from the
      // same fixture both engines read, so the gate region is identical.
      // The cutoff stays IN-PLAN as a broadcast one-row join against the
      // gate output (a scalar subquery in DataFrame clothing) — the r4
      // form collect()ed it to a driver literal, which ran an extra
      // eager events scan as its own job before the streaming run.
      val horizonDf = ev(s, dir)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type").agg(max($"ts").as("m"))
        .agg((min($"m") - expr("INTERVAL 2 HOURS")).as("cutoff"))
      val clicks = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      graft.streaming.MemoryGate.append(s,
        clicks.join(purchases,
          $"user_id" === $"p_user" && $"p_ts" >= $"c_ts" &&
            $"p_ts" <= $"c_ts" + expr("INTERVAL 30 MINUTES"),
          "left_outer"),
        "e21_out_" + Integer.toHexString(dir.hashCode))
        .join(broadcast(horizonDf), $"c_ts" <= $"cutoff")
        .select($"click_id", $"user_id", $"purchase_id",
          (unix_micros($"p_ts") - unix_micros($"c_ts")).as("gap_us"))
        .orderBy($"click_id", $"purchase_id".asc_nulls_first)
    },

    "e26_stream_full_outer_join" -> { (s, dir) =>
      import s.implicits._
      // Stream-stream FULL OUTER interval join — completes e19
      // (inner) / e21 (left): BOTH null-emitting sides at once.
      // Emission finality per row class: matched rows emit on sight
      // (inner semantics); an unmatched click needs the watermark past
      // c_ts + 30 min; an unmatched purchase needs it past p_ts (its
      // click window is [p_ts − 30 min, p_ts], so no match can still
      // arrive once the watermark clears p_ts). The shared cutoff
      // min(side max ts) − 2 h closes every class with ≥ 30 min to
      // spare, and the gate condition `coalesce(c_ts, p_ts) ≤ cutoff`
      // picks each row's DRIVING timestamp — c_ts when a click is
      // present (matched or purchase-null), p_ts for click-null rows —
      // so both engines restrict to the identical watermark-closed
      // region (e21's honesty contract, both directions). user_id is
      // coalesced across sides: a full outer row always has exactly one
      // origin for it.
      val horizonDf = ev(s, dir)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type").agg(max($"ts").as("m"))
        .agg((min($"m") - expr("INTERVAL 2 HOURS")).as("cutoff"))
      val clicks = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      graft.streaming.MemoryGate.append(s,
        clicks.join(purchases,
          $"user_id" === $"p_user" && $"p_ts" >= $"c_ts" &&
            $"p_ts" <= $"c_ts" + expr("INTERVAL 30 MINUTES"),
          "full_outer"),
        "e26_out_" + Integer.toHexString(dir.hashCode))
        .join(broadcast(horizonDf), coalesce($"c_ts", $"p_ts") <= $"cutoff")
        .select($"click_id",
          coalesce($"user_id", $"p_user").as("user_id"),
          $"purchase_id",
          (unix_micros($"p_ts") - unix_micros($"c_ts")).as("gap_us"))
        .orderBy($"click_id".asc_nulls_first, $"purchase_id".asc_nulls_first)
    },

    "e27_stream_chained_agg" -> { (s, dir) =>
      import s.implicits._
      // CHAINED stateful operators in ONE streaming query — Spark's
      // multi-stateful-operator support (3.5+): a 10-minute windowed
      // count feeding an HOURLY rollup of those counts (bucket count,
      // peak bucket, hour total), both levels stateful, both evicting
      // on the same watermark. This is the streaming form of the
      // pre-aggregation ladder every metrics pipeline runs; doing it in
      // one query means the 10-min partials never land in a sink to be
      // re-read — at 100 TB/day the intermediate topic this replaces IS
      // the cost. The second groupBy keys on window_time(window), the
      // in-window event timestamp Spark requires for the chained
      // watermark to propagate. Append mode: an hour emits once the
      // watermark (max ts − 1 h delay) passes its end, so the gate
      // compares the closed-horizon region (end ≤ max ts − 2 h, the
      // e21/e26 contract) — computed in-plan as a broadcast one-row
      // aggregate over the same fixture both engines read.
      val horizonDf = ev(s, dir)
        .agg((max($"ts") - expr("INTERVAL 2 HOURS")).as("cutoff"))
      val buckets = Tables.loadStream(s, dir, "events")
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val hourly = buckets
        .groupBy(window(window_time($"window"), "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_buckets"), max($"n").as("peak_10m"),
          sum($"n").as("n_events"))
      graft.streaming.MemoryGate.append(s, hourly,
        "e27_out_" + Integer.toHexString(dir.hashCode))
        .join(broadcast(horizonDf), $"window.end" <= $"cutoff")
        .select($"window.start".as("hour_start"), $"event_type",
          $"n_buckets", $"peak_10m", $"n_events")
        .orderBy($"hour_start", $"event_type")
    },

    "e29_stream_join_rollup" -> { (s, dir) =>
      import s.implicits._
      // Stream-stream JOIN feeding a windowed AGGREGATION in one query —
      // the other multi-stateful combination (e27 chains agg→agg): e19's
      // click→purchase interval join rolled up to attributed-conversion
      // counts per click hour, without landing the joined stream in an
      // intermediate topic first. Both operators are stateful and evict
      // on the propagated watermark; the aggregation windows on the
      // JOINED row's click time, which still carries its watermark
      // through the join. Append mode: an hour finalizes once the
      // propagated watermark (min over sides of max ts − 1 h, minus the
      // 30-min join range) passes its end — the gate compares the
      // closed-horizon region with a 3-hour cutoff (1 h delay + 30 min
      // range + margin), computed in-plan from the same fixture.
      val horizonDf = ev(s, dir)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type").agg(max($"ts").as("m"))
        .agg((min($"m") - expr("INTERVAL 3 HOURS")).as("cutoff"))
      val clicks = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = Tables.loadStream(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val rollup = clicks.join(purchases,
          $"user_id" === $"p_user" && $"p_ts" >= $"c_ts" &&
            $"p_ts" <= $"c_ts" + expr("INTERVAL 30 MINUTES"))
        .groupBy(window($"c_ts", "1 hour"))
        .agg(count(lit(1)).as("n_attributed"),
          sum(unix_micros($"p_ts") - unix_micros($"c_ts"))
            .as("gap_us_total"))
      graft.streaming.MemoryGate.append(s, rollup,
        "e29_out_" + Integer.toHexString(dir.hashCode))
        .join(broadcast(horizonDf), $"window.end" <= $"cutoff")
        .select($"window.start".as("hour_start"), $"n_attributed",
          $"gap_us_total")
        .orderBy($"hour_start")
    },

    "e30_stream_drift_monitor" -> { (s, dir) =>
      import s.implicits._
      // STREAMING DRIFT MONITOR — p09's Population Stability Index
      // moved to INGEST TIME: per closed hourly window, the event-type
      // mix vs the whole-corpus baseline, Laplace-smoothed, with the
      // standard thresholds (<=0.1 stable, <=0.25 watch, else
      // investigate) as an explicit status column. This is the alert a
      // pipeline fires the hour its traffic mix shifts, not at the
      // next batch audit. Scale shape: the windowed count is the only
      // stateful operator (watermark-evicted, RocksDB-backed like
      // every gate); the baseline, type universe, and per-window
      // totals are tiny broadcasts; the full (window x type) grid is
      // built explicitly so both engines agree on cell membership; PSI
      // terms are one dialect-shared expression rounded to DECIMAL
      // before the per-window sum (p09's discipline), so term order
      // cannot leak into the gate.
      // ONE corpus pass for the three batch-side scalars (r16): the
      // per-type counts, the corpus totals, and the watermark horizon
      // previously each re-scanned events (3 full scans); they all
      // derive from one narrow per-type aggregation, checkpointed at
      // |event types| rows (guide §2.4 — re-deriving a reused bounded
      // intermediate re-pays its scan). n_base = sum of group counts
      // (= count(*)); n_types = count of non-null type groups
      // (= countDistinct); cutoff = max over group maxima.
      val baseAgg = ev(s, dir).groupBy($"event_type")
        .agg(count(lit(1)).as("c_base"), max($"ts").as("m"))
        .localCheckpoint()
      val base = baseAgg.select($"event_type", $"c_base")
      val baseTot = baseAgg.agg(sum($"c_base").as("n_base"),
        count($"event_type").as("n_types"))
      val horizonDf = baseAgg
        .agg((max($"m") - expr("INTERVAL 2 HOURS")).as("cutoff"))
      val windowed = Tables.loadStream(s, dir, "events")
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("c_w"))
      val gated = graft.streaming.MemoryGate.append(s, windowed,
        "e30_out_" + Integer.toHexString(dir.hashCode))
        .join(broadcast(horizonDf), $"window.end" <= $"cutoff")
        .select($"window.start".as("hour_start"), $"event_type", $"c_w")
      val hours = gated.select($"hour_start").distinct()
      val wTot = gated.groupBy($"hour_start")
        .agg(sum($"c_w").as("n_w"))
      val cells = hours.crossJoin(broadcast(base))
        .join(gated, Seq("hour_start", "event_type"), "left")
        .select($"hour_start", $"event_type", $"c_base",
          coalesce($"c_w", lit(0L)).as("c_w"))
      cells.join(broadcast(wTot), "hour_start")
        .crossJoin(broadcast(baseTot))
        .withColumn("term", expr(PsiWindowTermSql))
        .groupBy($"hour_start")
        .agg(sum($"c_w").as("n_events"), sum($"term").as("psi_d"))
        .select($"hour_start", $"n_events",
          expr("round(cast(psi_d as double), 6)").as("psi"))
        .withColumn("drift_status",
          when($"psi" > 0.25, lit("investigate"))
            .when($"psi" > 0.1, lit("watch"))
            .otherwise(lit("stable")))
        .orderBy($"hour_start")
    },

    "e31_trailing_drift" -> { (s, dir) =>
      trailingDriftCore(s, Tables.loadStream(s, dir, "events"), ev(s, dir),
        "e31_out_" + Integer.toHexString(dir.hashCode))
    },

    "e24_stream_dedup_watermark" -> { (s, dir) =>
      import s.implicits._
      // BOUNDED-STATE streaming dedup — the production form d10's plain
      // stateful dropDuplicates is not: dropDuplicatesWithinWatermark
      // keeps a key's state only until the watermark passes it, so at
      // 100 TB/day the state store holds one watermark window of keys,
      // not the stream's history (the at-least-once replay window is
      // exactly what needs deduplicating, and it is watermark-bounded
      // by construction). Input is the event stream unioned with
      // itself — every event arrives twice, the connector-replay
      // worst case — and the gate requires the deduped per-type counts
      // to equal the batch counts over the ORIGINAL stream.
      val stream = () => Tables.loadStream(s, dir, "events")
        .select($"event_id", $"event_type", $"ts")
      graft.streaming.MemoryGate.complete(s,
        stream().union(stream())
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n")),
        "e24_out_" + Integer.toHexString(dir.hashCode))
        .orderBy($"event_type")
    },

    "e25_rolling_range_window" -> { (s, dir) =>
      import s.implicits._
      // Time-RANGE window frame: each event's trailing-1-hour count and
      // value sum for the same user — the rolling-rate feature
      // (velocity checks, rate limits, per-entity activity features)
      // computed WITHOUT materializing bucket grids: e10's sliding
      // windows quantize to fixed buckets, a RANGE frame is exact per
      // row. One shuffle on user_id + a partition sort; the frame is
      // bounded (1 h), so the running state per partition is the
      // in-window rows, not the history. Sum in DECIMAL: exact and
      // order-insensitive, so frame-internal order differences between
      // engines cannot leak into the gate.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000 * 1000, 0)
      ev(s, dir)
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("val_1h",
          sum($"value".cast("decimal(18,2)")).over(w).cast("double"))
        .select($"event_id", $"user_id", $"n_1h", $"val_1h")
        .orderBy($"event_id")
    },

    "e22_gap_fill" -> { (s, dir) =>
      import s.implicits._
      // Time-spine gap fill: hourly counts per type over the COMPLETE
      // corpus span, absent hours materialized as 0 — downstream
      // time-series consumers (anomaly detection, rate charts) need the
      // dense grid, and "no rows" is not "zero" after an outer join.
      // The spine generates distributively from one (min, max) agg row
      // via sequence+explode — no driver-side loop, and the spine is
      // |hours|x|types| rows, microscopic next to the event stream at
      // any scale. At sf0.01: 3,600 grid rows, 215 of them gap rows.
      // Span and type set both derive from the (tiny) hourly aggregate,
      // not the raw stream — the corpus is scanned ONCE; three
      // independent subtrees over raw events would be three full scans
      // at 100 TB for numbers the aggregate already contains.
      val hourly = ev(s, dir)
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val spine = hourly
        .agg(min($"h").as("lo"), max($"h").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val types = hourly.select($"event_type").distinct()
      spine.crossJoin(types)
        .join(hourly, Seq("h", "event_type"), "left")
        .select($"h".as("hour_start"), $"event_type",
          coalesce($"n", lit(0L)).as("n"))
        .orderBy($"hour_start", $"event_type")
    },

    "e23_kll_quantile_merge" -> { (s, dir) =>
      import s.implicits._
      // The quantile member of the mergeable-sketch trilogy (e15 HLL
      // cardinality, t15 frequent items): per-day KLL sketches of
      // `value` merged per type WITHOUT re-touching raw events, the
      // daily-rollup shape that answers any date-range quantile from
      // partials. kll_sketch_merge_double is a binary scalar, so the
      // per-type union folds over the collected day sketches (≤31 tiny
      // states per group — the fold input is day-count-sized, never
      // event-count-sized). Gate discipline (the e11/e15 lesson):
      // sketch values stay OUT of the hashed columns — hash-gated are
      // the exact interpolated median and a boolean asserting the
      // MERGED sketch's median sits within ±0.05 empirical rank of 0.5
      // (KLL k=200 rank error is ~1.7%, so 0.05 is ~3x headroom; if
      // merging partials ever degraded rank accuracy, the gate goes
      // red).
      val daily = ev(s, dir)
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
      val merged = daily.groupBy($"event_type")
        .agg(collect_list($"sk").as("sks"))
        .withColumn("msk", expr(
          "aggregate(slice(sks, 2, size(sks) - 1), sks[0], " +
            "(acc, x) -> kll_sketch_merge_double(acc, x))"))
        .select($"event_type",
          expr("kll_sketch_get_quantile_double(msk, 0.5d)").as("m_med"))
      val rank = ev(s, dir).join(merged, "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          round(percentile($"value", lit(0.5)), 4).as("exact_med"),
          (sum(when($"value" <= $"m_med", 1L).otherwise(0L)) /
            count(lit(1)).cast("double")).as("m_rank"))
      rank.select($"event_type", $"n", $"exact_med",
        (abs($"m_rank" - 0.5) <= 0.05).as("merge_rank_ok"))
        .orderBy($"event_type")
    },

    "e20_incremental_rollup" -> { (s, dir) =>
      import s.implicits._
      // Incremental-aggregate maintenance: the per-day partials an
      // ingest pipeline persists (one small row per (day, type)) merged
      // into the global rollup WITHOUT rescanning raw data — count and
      // decimal sum are algebraic, so merge-of-partials must equal the
      // direct aggregate, which is exactly what the oracle computes.
      // The exact-counter complement of e15's sketch-mergeability gate:
      // together they cover both the algebraic and the sketch halves of
      // "aggregate 100 TB once, answer from rollups forever".
      val daily = ev(s, dir)
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("pn"),
          sum($"value".cast("decimal(18,2)")).as("pv"))
      daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          sum($"pn").as("n"),
          sum($"pv").cast("double").as("total_value"))
        .orderBy($"event_type")
    },

    "e18_stream_static_join" -> { (s, dir) =>
      import s.implicits._
      // Stream–STATIC join — the enrichment shape: a live stream joined
      // per micro-batch against a batch-computed dimension (here the
      // per-user cohort day, e17's first aggregation). Spark broadcasts
      // the static side into every micro-batch; no stream-side state is
      // kept for the join itself (unlike stream-stream joins), so the
      // only stateful operator is the downstream complete-mode count.
      // Gated against the plain batch formulation in DuckDB — streaming
      // enrichment must produce the batch answer.
      val cohorts = ev(s, dir)
        .groupBy($"user_id").agg(to_date(min($"ts")).as("cohort_day"))
      graft.streaming.MemoryGate.complete(s,
        Tables.loadStream(s, dir, "events")
          .select($"user_id", $"event_type")
          .join(cohorts, "user_id")
          .groupBy($"cohort_day", $"event_type")
          .agg(count(lit(1)).as("n")),
        "e18_out_" + Integer.toHexString(dir.hashCode))
        .orderBy($"cohort_day", $"event_type")
    })

  /** Session-window sessions via the islands formulation — shared by
    * e04 (batch) and e16 (streaming): one contract, two execution paths.
    */
  private val SessionWindowOracleSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged)
      |SELECT min(ts) AS session_start, user_id, count(*) AS n_events
      |FROM sess GROUP BY user_id, sess_id
      |ORDER BY user_id, session_start""".stripMargin

  def oracle: Map[String, String] = Map(
    "e09_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |round(sum(value), 2) AS total_value,
        |round(avg(value), 2) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e40_skew_salt_decision" ->
      """WITH keyed AS (
        |  SELECT 'day' AS axis, CAST(CAST(ts AS DATE) AS VARCHAR) AS k
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_type', coalesce(event_type, '<null>') FROM events
        |  UNION ALL
        |  SELECT 'user_id', coalesce(CAST(user_id AS VARCHAR), '<null>')
        |  FROM events),
        |kc AS (SELECT axis, k, count(*) AS cnt FROM keyed GROUP BY 1, 2),
        |ax AS (
        |  SELECT axis, count(*) AS n_keys,
        |    CAST(sum(cnt) AS BIGINT) AS total_rows,
        |    max(cnt) AS max_key_rows
        |  FROM kc GROUP BY axis),
        |d AS (
        |  SELECT axis, n_keys, total_rows, max_key_rows,
        |    round(max_key_rows / CAST(total_rows AS DOUBLE), 6)
        |      AS max_share,
        |    round((max_key_rows * n_keys) / CAST(total_rows AS DOUBLE), 6)
        |      AS skew_factor,
        |    (total_rows + 31) // 32 AS target_task_rows
        |  FROM ax),
        |sn AS (
        |  SELECT *,
        |    (max_key_rows + target_task_rows - 1) // target_task_rows
        |      AS salt_n
        |  FROM d)
        |SELECT axis, n_keys, total_rows, max_key_rows, max_share,
        |  skew_factor,
        |  CAST(target_task_rows AS BIGINT) AS target_task_rows,
        |  CAST(salt_n AS BIGINT) AS salt_n,
        |  CAST((max_key_rows + salt_n - 1) // salt_n AS BIGINT)
        |    AS post_salt_max_rows,
        |  CASE WHEN salt_n > 1 THEN 'salt' ELSE 'direct' END AS decision
        |FROM sn ORDER BY axis""".stripMargin,

    // e44: the SQL TVF surface over the same card — single axis
    // (event_type) at the same pinned budget, so the twin is e40's
    // arithmetic restricted to one axis
    "e44_skew_card_sql" ->
      """WITH kc AS (
        |  SELECT coalesce(event_type, '<null>') AS k, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |ax AS (
        |  SELECT 'event_type' AS axis, count(*) AS n_keys,
        |    CAST(sum(cnt) AS BIGINT) AS total_rows,
        |    max(cnt) AS max_key_rows
        |  FROM kc),
        |d AS (
        |  SELECT axis, n_keys, total_rows, max_key_rows,
        |    round(max_key_rows / CAST(total_rows AS DOUBLE), 6)
        |      AS max_share,
        |    round((max_key_rows * n_keys) / CAST(total_rows AS DOUBLE), 6)
        |      AS skew_factor,
        |    (total_rows + 31) // 32 AS target_task_rows
        |  FROM ax),
        |sn AS (
        |  SELECT *,
        |    (max_key_rows + target_task_rows - 1) // target_task_rows
        |      AS salt_n
        |  FROM d)
        |SELECT axis, n_keys, total_rows, max_key_rows, max_share,
        |  skew_factor,
        |  CAST(target_task_rows AS BIGINT) AS target_task_rows,
        |  CAST(salt_n AS BIGINT) AS salt_n,
        |  CAST((max_key_rows + salt_n - 1) // salt_n AS BIGINT)
        |    AS post_salt_max_rows,
        |  CASE WHEN salt_n > 1 THEN 'salt' ELSE 'direct' END AS decision
        |FROM sn""".stripMargin,

    // e46: the card round trip must land on the exact direct-form
    // answer — same oracle family as e09 (sans the avg column, which
    // e09 owns)
    "e46_salted_agg_card" ->
      """SELECT event_type, count(*) AS n,
        |round(sum(value), 2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e45: the TVF is a bounded-heap top-k; the oracle is the window
    // form it replaces — identical multisets because ties on
    // (key, ord) are interchangeable at the heap boundary and in rank
    // assignment, and the projection carries no other columns
    "e45_topk_sql" ->
      """SELECT key, ord, CAST(rnk AS INTEGER) AS rnk FROM (
        |  SELECT coalesce(CAST(event_type AS VARCHAR), '<null>') AS key,
        |    CAST(value AS DOUBLE) AS ord,
        |    row_number() OVER (
        |      PARTITION BY coalesce(CAST(event_type AS VARCHAR), '<null>')
        |      ORDER BY CAST(value AS DOUBLE) DESC) AS rnk
        |  FROM events WHERE value IS NOT NULL)
        |WHERE rnk <= 3""".stripMargin,

    "e41_watermark_delay_curve" ->
      """WITH e2 AS (
        |  SELECT event_id, ts_us, arr_us, arr_us // 3600000000 AS bucket
        |  FROM (
        |    SELECT event_id, ts_us, ts_us + delay_s * 1000000 AS arr_us
        |    FROM (
        |      SELECT event_id, epoch_us(ts) AS ts_us,
        |        ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
        |          ::BIGINT % 1800 AS delay_s
        |      FROM events))),
        |bk AS (SELECT bucket, max(ts_us) AS bmax FROM e2 GROUP BY bucket),
        |bp AS (
        |  SELECT bucket, max(bmax) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM bk),
        |w AS (
        |  SELECT bucket, ts_us,
        |    max(ts_us) OVER (PARTITION BY bucket ORDER BY arr_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevb
        |  FROM e2),
        |lat AS (
        |  SELECT greatest(0,
        |    greatest(coalesce(prevb, -1), coalesce(pmax, -1)) - ts_us)
        |    AS late_us
        |  FROM w JOIN bp USING (bucket)),
        |c AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS c60,
        |    sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END) AS c300,
        |    sum(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END) AS c900,
        |    sum(CASE WHEN late_us > 1800000000 THEN 1 ELSE 0 END) AS c1800
        |  FROM lat),
        |cur AS (
        |  SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
        |    CAST(CASE d.delay_s WHEN 0 THEN c0 WHEN 60 THEN c60
        |      WHEN 300 THEN c300 WHEN 900 THEN c900 ELSE c1800 END
        |      AS BIGINT) AS n_dropped,
        |    n
        |  FROM c, (VALUES (0), (60), (300), (900), (1800)) d(delay_s)),
        |sh AS (
        |  SELECT delay_s, n_dropped,
        |    round(n_dropped / CAST(n AS DOUBLE), 6) AS drop_share
        |  FROM cur),
        |fl AS (SELECT *, drop_share <= 0.005 AS meets_slo FROM sh)
        |SELECT delay_s, n_dropped, drop_share, meets_slo,
        |  coalesce(delay_s = min(CASE WHEN meets_slo THEN delay_s END)
        |    OVER (), FALSE) AS is_recommended
        |FROM fl ORDER BY delay_s""".stripMargin,

    "e42_state_peak_card" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |m AS (
        |  SELECT *, lag(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS prev
        |  FROM o),
        |sgl AS (
        |  SELECT *, CASE WHEN prev IS NULL OR us - prev >= 1800000000
        |    THEN 1 ELSE 0 END AS ns
        |  FROM m),
        |sid AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM sgl),
        |iv AS (
        |  SELECT user_id, sess, min(us) AS start_us,
        |    max(us) + 1800000000 AS expire_us
        |  FROM sid GROUP BY 1, 2),
        |d AS (
        |  SELECT start_us AS t, CAST(1 AS BIGINT) AS dd FROM iv
        |  UNION ALL
        |  SELECT expire_us, -1 FROM iv),
        |r AS (
        |  SELECT t, sum(dd) OVER (ORDER BY t, dd
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM d),
        |pb AS (
        |  SELECT t // 86400000000 AS day_id,
        |    CAST(max(run) AS BIGINT) AS delta_peak
        |  FROM r GROUP BY 1),
        |ds AS (
        |  SELECT t // 86400000000 AS day_id,
        |    CAST(sum(dd) AS BIGINT) AS d_sum
        |  FROM d GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(min(day_id), max(day_id)))
        |    AS day_id
        |  FROM ds),
        |ent AS (
        |  SELECT day_id,
        |    CAST(coalesce(sum(coalesce(d_sum, 0)) OVER (ORDER BY day_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS entering
        |  FROM spine LEFT JOIN ds USING (day_id)),
        |st AS (
        |  SELECT start_us // 86400000000 AS day_id,
        |    count(*) AS n_started
        |  FROM iv GROUP BY 1),
        |ex AS (
        |  SELECT expire_us // 86400000000 AS day_id,
        |    count(*) AS n_expired
        |  FROM iv GROUP BY 1),
        |pk AS (
        |  SELECT day_id,
        |    greatest(coalesce(delta_peak, 0), entering) AS peak_open
        |  FROM ent LEFT JOIN pb USING (day_id)),
        |g AS (SELECT max(peak_open) AS gp FROM pk)
        |SELECT DATE '1970-01-01' + CAST(day_id AS INT) AS day,
        |  coalesce(n_started, 0) AS n_started,
        |  coalesce(n_expired, 0) AS n_expired,
        |  peak_open,
        |  peak_open * 4 AS state_kb,
        |  CAST((gp + 511) // 512 AS BIGINT) AS rec_partitions
        |FROM pk LEFT JOIN st USING (day_id) LEFT JOIN ex USING (day_id)
        |CROSS JOIN g
        |ORDER BY day""".stripMargin,

    "e43_admission_backlog_curve" ->
      """WITH sparse AS (
        |  SELECT epoch_us(ts) // 600000000 AS epoch, count(*) AS a
        |  FROM events GROUP BY 1),
        |bnd AS (
        |  SELECT min(epoch) AS e0, max(epoch) AS e1,
        |    CAST(sum(a) AS BIGINT) AS total
        |  FROM sparse),
        |dense AS (
        |  SELECT d.total, d.n_epochs, d.epoch,
        |    CAST(coalesce(s.a, 0) AS BIGINT) AS a
        |  FROM (SELECT total, e1 - e0 + 1 AS n_epochs,
        |          unnest(range(e0, e1 + 1)) AS epoch
        |        FROM bnd) d
        |  LEFT JOIN sparse s ON s.epoch = d.epoch),
        |caps AS (
        |  SELECT t.total, t.n_epochs, mm.m,
        |    (t.total * mm.m + 10 * t.n_epochs - 1)
        |      // (10 * t.n_epochs) AS cap
        |  FROM (SELECT DISTINCT total, n_epochs FROM dense) t,
        |    (VALUES (9), (11), (15)) mm(m)),
        |r AS (
        |  SELECT c.m, c.cap, c.total, c.n_epochs, d.epoch,
        |    sum(d.a - c.cap) OVER (PARTITION BY c.m ORDER BY d.epoch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM dense d CROSS JOIN caps c),
        |bl AS (
        |  SELECT m, cap, total, n_epochs, epoch,
        |    p - least(min(p) OVER (PARTITION BY m ORDER BY epoch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |      AS b
        |  FROM r)
        |SELECT round(CAST(m AS DOUBLE) / 10.0, 1) AS cap_x_mean,
        |  CAST(cap AS BIGINT) AS cap_rows,
        |  CAST(max(b) AS BIGINT) AS peak_backlog,
        |  CAST(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS backlogged_epochs,
        |  CAST(arg_max(b, epoch) AS BIGINT) AS final_backlog,
        |  CAST(arg_max(b, epoch) AS BIGINT) = 0 AS drained,
        |  round(any_value(total)
        |    / CAST(cap * any_value(n_epochs) AS DOUBLE), 6)
        |    AS utilization
        |FROM bl GROUP BY m, cap ORDER BY cap_x_mean""".stripMargin,

    "e10_sliding_windows" ->
      """SELECT win_start, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |    to_timestamp(
        |      (floor(epoch(ts) / 1800) - off) * 1800)::TIMESTAMP AS win_start
        |  FROM events, unnest([0, 1]) AS t(off)) x
        |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin,

    "e13_funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view_users,
        |  (SELECT count(*) FROM c) AS n_click_after_view,
        |  (SELECT count(*) FROM p) AS n_purchase_funnel,
        |  round((SELECT count(*) FROM p) /
        |        CAST((SELECT count(*) FROM v) AS DOUBLE), 6) AS conversion""".stripMargin,

    "e14_kinesis_roundtrip_agg" ->
      """SELECT event_type, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e34 must converge to the SAME truth as e14: the quarantine +
    // replay legs are delivery plumbing, invisible to the aggregate
    // when the loop closes correctly
    "e34_dlq_replay_agg" ->
      """SELECT event_type, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e35: two quarantine GENERATIONS (the replay itself faulted) must
    // still converge to the e14 truth — same oracle, harder path
    "e35_dlq_replay_under_fault" ->
      """SELECT event_type, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e15_sketch_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |TRUE AS merge_consistent
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e36_sketch_rollup_serving" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |TRUE AS rollup_consistent
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-21'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e37_quantile_rollup_serving" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS exact_med,
        |  TRUE AS rollup_rank_ok
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-21'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e38_topk_rollup_serving" ->
      """SELECT event_type, user_id, n, rnk, TRUE AS sketch_ok FROM (
        |  SELECT event_type, user_id, count(*) AS n, row_number() OVER (
        |    PARTITION BY event_type ORDER BY count(*) DESC, user_id)
        |    AS rnk
        |  FROM events
        |  WHERE CAST(ts AS DATE) BETWEEN '2024-01-08' AND '2024-01-21'
        |  GROUP BY event_type, user_id) t
        |WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin,

    "e11b_exact_cardinality" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |count(DISTINCT props) AS n_props
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e12_props_map" ->
      """SELECT event_type, k, count(*) AS n,
        |CAST(sum(v) AS BIGINT) AS total_v FROM (
        |  SELECT event_type, k,
        |    CAST(json_extract_string(props, '$.' || k) AS INT) AS v
        |  FROM (SELECT event_type, props, unnest(json_keys(props)) AS k
        |        FROM events)) x
        |GROUP BY event_type, k ORDER BY event_type, k""".stripMargin,

    "e19_stream_interval_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "e21_stream_outer_join" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  p.event_id AS purchase_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events c LEFT JOIN events p
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |WHERE c.event_type = 'click'
        |  AND c.ts <= (SELECT min(m) - INTERVAL 2 HOUR FROM (
        |        SELECT event_type, max(ts) AS m FROM events
        |        WHERE event_type IN ('click', 'purchase')
        |        GROUP BY event_type) x)
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,

    "e27_stream_chained_agg" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS b_start,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |h AS (
        |  SELECT time_bucket(INTERVAL '1 hour', b_start) AS hour_start,
        |    event_type, count(*) AS n_buckets, max(n) AS peak_10m,
        |    CAST(sum(n) AS BIGINT) AS n_events
        |  FROM b GROUP BY 1, 2)
        |SELECT hour_start, event_type, n_buckets, peak_10m, n_events
        |FROM h
        |WHERE hour_start + INTERVAL 1 HOUR <=
        |  (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
        |ORDER BY hour_start, event_type""".stripMargin,

    "e30_stream_drift_monitor" ->
      s"""WITH base AS (
         |  SELECT event_type, count(*) AS c_base FROM events GROUP BY 1),
         |bt AS (
         |  SELECT count(*) AS n_base,
         |    count(DISTINCT event_type) AS n_types FROM events),
         |w AS (
         |  SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
         |    event_type, count(*) AS c_w
         |  FROM events GROUP BY 1, 2),
         |wk AS (
         |  SELECT * FROM w WHERE hour_start + INTERVAL 1 HOUR <=
         |    (SELECT max(ts) - INTERVAL 2 HOUR FROM events)),
         |wt AS (
         |  SELECT hour_start, CAST(sum(c_w) AS BIGINT) AS n_w
         |  FROM wk GROUP BY 1),
         |cells AS (
         |  SELECT h.hour_start, b.event_type, b.c_base,
         |    coalesce(k.c_w, 0) AS c_w
         |  FROM (SELECT DISTINCT hour_start FROM wk) h
         |  CROSS JOIN base b
         |  LEFT JOIN wk k ON k.hour_start = h.hour_start
         |    AND k.event_type = b.event_type),
         |terms AS (
         |  SELECT c.hour_start, c.c_w,
         |    ${PsiWindowTermSql} AS term
         |  FROM cells c JOIN wt ON wt.hour_start = c.hour_start
         |  CROSS JOIN bt),
         |agg AS (
         |  SELECT hour_start, CAST(sum(c_w) AS BIGINT) AS n_events,
         |    round(CAST(sum(term) AS DOUBLE), 6) AS psi
         |  FROM terms GROUP BY 1)
         |SELECT hour_start, n_events, psi,
         |  CASE WHEN psi > 0.25 THEN 'investigate'
         |       WHEN psi > 0.1 THEN 'watch'
         |       ELSE 'stable' END AS drift_status
         |FROM agg ORDER BY hour_start""".stripMargin,

    "e31_trailing_drift" ->
      s"""WITH w AS (
         |  SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
         |    event_type, count(*) AS c_w
         |  FROM events GROUP BY 1, 2),
         |cut AS (SELECT max(ts) - INTERVAL 2 HOUR AS cutoff FROM events),
         |wk AS (
         |  SELECT w.* FROM w, cut
         |  WHERE hour_start + INTERVAL 1 HOUR <= cutoff),
         |tb AS (
         |  SELECT h.hour_start, w2.event_type,
         |    CAST(sum(w2.c_w) AS BIGINT) AS c_base
         |  FROM (SELECT DISTINCT hour_start FROM wk) h
         |  JOIN w w2 ON w2.hour_start >= h.hour_start - INTERVAL 3 HOUR
         |           AND w2.hour_start < h.hour_start
         |  GROUP BY 1, 2),
         |hrs AS (
         |  SELECT DISTINCT hour_start FROM wk
         |  INTERSECT SELECT DISTINCT hour_start FROM tb),
         |grid AS (
         |  SELECT DISTINCT g.hour_start, g.event_type FROM (
         |    SELECT hour_start, event_type FROM wk
         |    UNION SELECT hour_start, event_type FROM tb) g
         |  JOIN hrs USING (hour_start)),
         |cells AS (
         |  SELECT g.hour_start, g.event_type,
         |    coalesce(k.c_w, 0) AS c_w, coalesce(t.c_base, 0) AS c_base
         |  FROM grid g
         |  LEFT JOIN wk k USING (hour_start, event_type)
         |  LEFT JOIN tb t USING (hour_start, event_type)),
         |tot AS (
         |  SELECT hour_start, CAST(sum(c_w) AS BIGINT) AS n_w,
         |    CAST(sum(c_base) AS BIGINT) AS n_base,
         |    count(*) AS n_types
         |  FROM cells GROUP BY 1),
         |terms AS (
         |  SELECT c.hour_start, c.c_w,
         |    ${PsiWindowTermSql} AS term
         |  FROM cells c JOIN tot USING (hour_start)),
         |agg AS (
         |  SELECT hour_start, CAST(sum(c_w) AS BIGINT) AS n_events,
         |    round(CAST(sum(term) AS DOUBLE), 6) AS psi
         |  FROM terms GROUP BY 1)
         |SELECT hour_start, n_events, psi,
         |  CASE WHEN psi > 0.25 THEN 'investigate'
         |       WHEN psi > 0.1 THEN 'watch'
         |       ELSE 'stable' END AS drift_status
         |FROM agg ORDER BY hour_start""".stripMargin,

    "e29_stream_join_rollup" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c_ts, epoch_us(p_ts) - epoch_us(c_ts) AS gap
        |  FROM c JOIN p ON p_user = c_user AND p_ts >= c_ts
        |    AND p_ts <= c_ts + INTERVAL 30 MINUTE),
        |h AS (
        |  SELECT time_bucket(INTERVAL '1 hour', c_ts) AS hour_start,
        |    count(*) AS n_attributed,
        |    CAST(sum(gap) AS BIGINT) AS gap_us_total
        |  FROM j GROUP BY 1)
        |SELECT hour_start, n_attributed, gap_us_total FROM h
        |WHERE hour_start + INTERVAL 1 HOUR <=
        |  (SELECT min(m) - INTERVAL 3 HOUR FROM (
        |     SELECT event_type, max(ts) AS m FROM events
        |     WHERE event_type IN ('click', 'purchase')
        |     GROUP BY event_type) x)
        |ORDER BY hour_start""".stripMargin,

    "e26_stream_full_outer_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT * FROM c FULL JOIN p
        |    ON p_user = c_user AND p_ts >= c_ts
        |   AND p_ts <= c_ts + INTERVAL 30 MINUTE)
        |SELECT click_id, coalesce(c_user, p_user) AS user_id,
        |  purchase_id, epoch_us(p_ts) - epoch_us(c_ts) AS gap_us
        |FROM j
        |WHERE coalesce(c_ts, p_ts) <= (SELECT min(m) - INTERVAL 2 HOUR
        |  FROM (SELECT event_type, max(ts) AS m FROM events
        |        WHERE event_type IN ('click', 'purchase')
        |        GROUP BY event_type) x)
        |ORDER BY click_id NULLS FIRST, purchase_id NULLS FIRST""".stripMargin,

    "e24_stream_dedup_watermark" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e25_rolling_range_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS val_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "e22_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo,
        |         date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM span),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT s.h AS hour_start, t.event_type, coalesce(hh.n, 0) AS n
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN hourly hh ON hh.h = s.h AND hh.event_type = t.event_type
        |ORDER BY 1, 2""".stripMargin,

    "e23_kll_quantile_merge" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS exact_med,
        |  TRUE AS merge_rank_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e20_incremental_rollup" ->
      """SELECT event_type,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e18_stream_static_join" ->
      """WITH c AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id)
        |SELECT cohort_day, event_type, count(*) AS n
        |FROM events e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e17_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM e JOIN c USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e01_hourly_type_counts" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e33_trending_types" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY hour_start ORDER BY n DESC, event_type) AS rnk
        |  FROM hourly),
        |prev AS (
        |  SELECT hour_start + INTERVAL 1 HOUR AS hour_start,
        |    event_type, rnk AS prev_rnk
        |  FROM ranked)
        |SELECT r.hour_start, r.event_type, r.n, r.rnk, p.prev_rnk,
        |  p.prev_rnk - r.rnk AS rank_delta
        |FROM ranked r LEFT JOIN prev p
        |  ON p.hour_start = r.hour_start AND p.event_type = r.event_type
        |WHERE r.rnk <= 3 ORDER BY r.hour_start, r.rnk""".stripMargin,

    "e02_json_stats" ->
      """SELECT event_type, count(*) AS n,
        |round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
        |min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e03_user_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged)
        |SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e04_session_window" -> SessionWindowOracleSql,

    // e16 is the STREAMING computation of exactly e04's aggregation —
    // one oracle contract, gated twice (batch path and streaming path).
    "e16_stream_sessions" -> SessionWindowOracleSql,

    "e28_dynamic_gap_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'click' THEN 600000000
        |         ELSE 1800000000 END AS gap_us
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id,
        |    max(epoch_us(ts) + gap_us) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_end
        |  FROM g),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_end IS NULL OR epoch_us(ts) >= prev_end
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM m),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged)
        |SELECT min(ts) AS session_start, user_id, count(*) AS n_events
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start""".stripMargin,

    "e05_daily_type_share" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY day) AS DOUBLE), 6) AS share
        |FROM daily ORDER BY day, event_type""".stripMargin,

    "e06_top_users_by_value" ->
      """SELECT event_type, user_id, total_value, n, rnk FROM (
        |  SELECT event_type, user_id,
        |         round(sum(value), 2) AS total_value, count(*) AS n,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY round(sum(value), 2) DESC, user_id) AS rnk
        |  FROM events GROUP BY event_type, user_id) x
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,

    "e32_session_gap_curve" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |g AS (
         |  SELECT user_id, us, event_id,
         |    lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |      AS prev_us
         |  FROM e),
         |cfg AS (SELECT unnest([${SessionGapsMin.mkString(", ")}])
         |          AS gap_min),
         |f AS (
         |  SELECT cfg.gap_min, g.user_id, g.us, g.event_id,
         |    CASE WHEN g.prev_us IS NULL OR g.us - g.prev_us >=
         |        gap_min * CAST(60000000 AS BIGINT)
         |      THEN 1 ELSE 0 END AS new_s
         |  FROM g CROSS JOIN cfg),
         |si AS (
         |  SELECT gap_min, user_id, us,
         |    sum(new_s) OVER (PARTITION BY gap_min, user_id
         |      ORDER BY us, event_id) AS sid
         |  FROM f),
         |per AS (
         |  SELECT gap_min, user_id, sid, count(*) AS n_ev,
         |    max(us) - min(us) AS dur_us
         |  FROM si GROUP BY 1, 2, 3),
         |a AS (
         |  SELECT gap_min, count(*) AS n_sessions,
         |    CAST(sum(n_ev) AS BIGINT) AS n_events,
         |    CAST(sum(dur_us) AS BIGINT) AS sum_dur
         |  FROM per GROUP BY 1)
         |SELECT gap_min, n_sessions,
         |  round(n_events / CAST(n_sessions AS DOUBLE), 6)
         |    AS events_per_session,
         |  round(CAST(sum_dur AS DOUBLE)
         |    / CAST(n_sessions * 1000000 AS DOUBLE), 6)
         |    AS mean_duration_s,
         |  gap_min = 30 AS shipped
         |FROM a ORDER BY gap_min""".stripMargin,

    "e08_asof_attribution" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       c.event_id AS click_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts > c.ts
        |ORDER BY purchase_id""".stripMargin,

    // e39: the streamed as-of must converge to e08's batch truth —
    // identical oracle
    "e39_stream_asof_attribution" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       c.event_id AS click_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts > c.ts
        |ORDER BY purchase_id""".stripMargin,

    "e07_stream_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
