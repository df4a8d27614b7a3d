package graft

import org.apache.spark.sql.functions._

import graft.ops.AnnIndex

/** The split ANN lifecycle (AnnIndex.build / AnnIndex.search): the
  * SCALE.md claim "at 100 TB the build half runs once and the
  * recurring search reads artifacts, not the corpus", proven:
  *
  *  - search over the written artifacts reproduces the one-plan s19
  *    ranking EXACTLY (same model code → same index → same top-k);
  *  - the search plan contains ZERO corpus (embeddings) scans;
  *  - the probe's cell filter PRUNES the partitioned inverted lists
  *    (partition filters in the scan, fewer partitions read than
  *    exist) — the on-disk payoff of IVF;
  *  - re-building is byte-deterministic (the resumability contract).
  */
class AnnIndexSpec extends SparkTestBase {

  test("search over written artifacts == the one-plan s19 ranking; " +
      "no corpus scan; invlist partitions pruned; rebuild is " +
      "deterministic") {
    import spark.implicits._
    val indexDir = tmpDir("ann-index") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir)

    // query frame materialized to literals: the search input carries
    // no lineage back to the corpus, so any embeddings scan in the
    // search plan would be the INDEX's fault
    val qRows = Tables.load(spark, sfVerify, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val queries = qRows.toSeq.toDF("q_id", "qv")

    val got = AnnIndex.search(spark, indexDir, queries, 5)
      .select($"q_id", $"n_id", $"adc".cast("double").as("adc"), $"rnk")
    val want = SparkEntry.queries("s19_ivfpq_topk")(spark, sfVerify)

    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val wantRows = want.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(gotRows.nonEmpty && gotRows.sameElements(wantRows),
      s"artifact search must equal the one-plan ranking; got " +
        s"${gotRows.take(3).mkString(",")} vs ${wantRows.take(3).mkString(",")}")

    // ---- plan properties of the artifact search -----------------------
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    val searched = AnnIndex.search(spark, indexDir, queries, 5)
    searched.collect()
    val ss = scans(searched.queryExecution.executedPlan)
    assert(!ss.exists(_.relation.location.rootPaths.mkString
        .contains("embeddings")),
      "the artifact search must never scan the vector corpus")
    val invScan = ss.find(_.relation.location.rootPaths.mkString
      .contains("invlists"))
    assert(invScan.isDefined, "search must read the inverted lists")
    assert(invScan.get.partitionFilters.nonEmpty,
      s"the probe's cell cut must be a PARTITION filter (pruned at " +
        s"listing time): ${invScan.get}")
    val totalCells = new java.io.File(s"$indexDir/invlists").listFiles()
      .count(_.getName.startsWith("cell="))
    val readCells = invScan.get.selectedPartitions.partitionCount
    assert(readCells < totalCells,
      s"probe must read fewer cells than exist ($readCells of $totalCells)")
    assert(readCells <= 10 * 2, // NQueries x NProbe upper bound
      s"probed cells must bound the partitions read: $readCells")

    // ---- rebuild determinism -----------------------------------------
    def fingerprint(): String = {
      val inv = spark.read.parquet(s"$indexDir/invlists")
        .select(concat_ws(":", $"cell", $"vec_id").as("r"))
      val codes = spark.read.parquet(s"$indexDir/codes")
        .select(concat_ws(":", $"vec_id", $"sub", $"code").as("r"))
      inv.union(codes)
        .agg(md5(concat_ws(",", sort_array(collect_list($"r")))))
        .head().getString(0)
    }
    val before = fingerprint()
    AnnIndex.build(spark, sfVerify, indexDir)
    assert(fingerprint() == before,
      "re-building the index must reproduce identical artifacts")
  }

  test("residual index lifecycle: build(byResidual) artifacts " +
      "reproduce the one-plan s23 ranking with no corpus scan and " +
      "pruned invlists; rebuild deterministic; upsert encodes the " +
      "delta's residuals against its assigned cells") {
    import spark.implicits._
    val indexDir = tmpDir("ann-res") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir, byResidual = true)

    val qRows = Tables.load(spark, sfVerify, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val queries = qRows.toSeq.toDF("q_id", "qv")

    val t0 = System.nanoTime()
    val got = AnnIndex.search(spark, indexDir, queries, 5)
      .select($"q_id", $"n_id", $"adc".cast("double").as("adc"), $"rnk")
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    info(f"residual artifact search: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val wantRows = SparkEntry.queries("s23_ivfpq_residual_topk")(
        spark, sfVerify).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(gotRows.nonEmpty && gotRows.sameElements(wantRows),
      s"residual artifact search must equal s23's one-plan ranking; got " +
        s"${gotRows.take(3).mkString(",")} vs ${wantRows.take(3).mkString(",")}")

    // plan properties: zero corpus scans; cell cut is a partition filter
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    val searched = AnnIndex.search(spark, indexDir, queries, 5)
    searched.collect()
    val ss = scans(searched.queryExecution.executedPlan)
    assert(!ss.exists(_.relation.location.rootPaths.mkString
        .contains("embeddings")),
      "the residual artifact search must never scan the vector corpus")
    val invScan = ss.find(_.relation.location.rootPaths.mkString
      .contains("invlists"))
    assert(invScan.isDefined && invScan.get.partitionFilters.nonEmpty,
      s"probe cut must prune the invlists at listing time: $invScan")

    // rebuild determinism (same fingerprint discipline as the raw test)
    def fingerprint(): String = {
      val inv = spark.read.parquet(s"$indexDir/invlists")
        .select(concat_ws(":", $"cell", $"vec_id").as("r"))
      val codes = spark.read.parquet(s"$indexDir/codes")
        .select(concat_ws(":", $"vec_id", $"sub", $"code").as("r"))
      inv.union(codes)
        .agg(md5(concat_ws(",", sort_array(collect_list($"r")))))
        .head().getString(0)
    }
    val before = fingerprint()
    AnnIndex.build(spark, sfVerify, indexDir, byResidual = true)
    assert(fingerprint() == before,
      "re-building the residual index must reproduce identical artifacts")

    // upsert: exact duplicates must land in their twins' cells AND get
    // their twins' codes — which for a residual index proves the delta
    // was encoded as r = v − c(v) against the JUST-assigned cell (raw
    // encoding of a duplicate would yield different codes whenever the
    // codebooks differ between raw and residual space)
    val Shift = 1000000L
    val emb = Tables.load(spark, sfVerify, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val delta = emb.filter($"vec_id" >= 100 && $"vec_id" < 120)
      .select(($"vec_id" + Shift).as("vec_id"), $"v")
    AnnIndex.upsert(spark, indexDir, delta)
    val inv = spark.read.parquet(s"$indexDir/invlists")
      .select($"vec_id", $"cell".cast("long").as("cell"))
    val codes = spark.read.parquet(s"$indexDir/codes")
    val twinCells = inv.filter($"vec_id" >= Shift)
      .select(($"vec_id" - Shift).as("vec_id"), $"cell".as("d_cell"))
      .join(inv, "vec_id").filter($"d_cell" =!= $"cell")
    val twinCodes = codes.filter($"vec_id" >= Shift)
      .select(($"vec_id" - Shift).as("vec_id"), $"sub", $"code".as("d_code"))
      .join(codes, Seq("vec_id", "sub")).filter($"d_code" =!= $"code")
    assert(twinCells.count() == 0 && twinCodes.count() == 0,
      "residual upsert must reproduce the twin's cell and codes")
    // and a search sees the upserted twin at the original's distance
    val q100 = emb.filter($"vec_id" === 100)
      .select(lit(0L).as("q_id"), $"v".as("qv"))
    val res = AnnIndex.search(spark, indexDir, q100, 50)
      .select($"n_id", $"adc".cast("double").as("adc")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res.contains(100L + Shift),
      s"search must surface the residual-upserted twin")
    // idempotence
    val nInv = spark.read.parquet(s"$indexDir/invlists").count()
    AnnIndex.upsert(spark, indexDir, delta)
    assert(spark.read.parquet(s"$indexDir/invlists").count() == nInv,
      "re-upserting the same delta must change nothing")
  }

  test("buildFrom indexes ANY (vec_id, v) frame: the multimodal codec " +
      "vectors go through the same lifecycle, and search stays " +
      "artifact-only") {
    import spark.implicits._
    val indexDir = tmpDir("ann-media") + "/idx"
    val vecs = graft.multimodal.Multimodal.mediaVectors(spark, sfVerify)
    AnnIndex.buildFrom(spark, vecs, indexDir, byResidual = true)

    // query with a known corpus vector under a fresh id: its source
    // item must rank FIRST (ADC distance to itself is the minimum —
    // exact-duplicate media share content, hence codes, and tie).
    // Materialized to literals: the query input carries no lineage to
    // the media fixture, so any fixture scan in the search plan would
    // be the INDEX's fault (same discipline as the raw-index test).
    val probeRows = vecs.filter($"vec_id" === 42L)
      .select(lit(0L).as("q_id"), $"v".as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val probe = probeRows.toSeq.toDF("q_id", "qv")
    val top = AnnIndex.search(spark, indexDir, probe, 5)
      .orderBy($"rnk")
      .select($"n_id", $"adc".cast("double").as("adc")).collect()
    assert(top.length == 5, s"5 neighbors expected: ${top.length}")
    val minAdc = top.map(_.getDouble(1)).min
    val firstIds = top.filter(_.getDouble(1) == minAdc)
      .map(_.getLong(0)).toSet
    assert(firstIds.contains(42L),
      s"the query's own source item must sit in the minimum-ADC tie: " +
        s"${top.mkString(",")}")

    // lifecycle parity: upsert a twin of item 42; it must become
    // searchable with the same ADC as 42 itself
    val delta = vecs.filter($"vec_id" === 42L)
      .select(lit(5000000L).as("vec_id"), $"v")
    AnnIndex.upsert(spark, indexDir, delta)
    val res = AnnIndex.search(spark, indexDir, probe, 50)
      .select($"n_id", $"adc".cast("double").as("adc")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res.contains(5000000L) && res(5000000L) == res(42L),
      s"media twin must score exactly like its source: $res")

    // search never re-reads media bytes or the documents fixture
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    val searched = AnnIndex.search(spark, indexDir, probe, 5)
    searched.collect()
    assert(!scans(searched.queryExecution.executedPlan)
        .exists(_.relation.location.rootPaths.mkString
          .contains("documents")),
      "artifact search must not re-read the media fixture")
  }

  test("upsert indexes a delta against the existing model: duplicates " +
      "land in their twins' cells with identical codes, searches see " +
      "them, and re-upserting is a no-op") {
    import spark.implicits._
    val indexDir = tmpDir("ann-upsert") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir)
    val nInv0 = spark.read.parquet(s"$indexDir/invlists").count()
    val nCodes0 = spark.read.parquet(s"$indexDir/codes").count()

    // delta = EXACT DUPLICATES of corpus vectors 100-119 under new ids:
    // same model + same vector must mean same cell and same codes —
    // the sharpest check that upsert runs the index's own assignment
    val Shift = 1000000L
    val emb = Tables.load(spark, sfVerify, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val delta = emb.filter($"vec_id" >= 100 && $"vec_id" < 120)
      .select(($"vec_id" + Shift).as("vec_id"), $"v")
    AnnIndex.upsert(spark, indexDir, delta)

    val inv = spark.read.parquet(s"$indexDir/invlists")
      .select($"vec_id", $"cell".cast("long").as("cell"))
    val codes = spark.read.parquet(s"$indexDir/codes")
    assert(inv.count() == nInv0 + 20 &&
      codes.count() == nCodes0 + 20 * 8,
      "delta must append one list entry and PqM codes per vector")
    // twin equality: cell and all 8 codes match the original vector's
    val twinCells = inv.filter($"vec_id" >= Shift)
      .select(($"vec_id" - Shift).as("vec_id"), $"cell".as("d_cell"))
      .join(inv, "vec_id")
      .filter($"d_cell" =!= $"cell")
    assert(twinCells.count() == 0, "duplicate must land in its twin's cell")
    val twinCodes = codes.filter($"vec_id" >= Shift)
      .select(($"vec_id" - Shift).as("vec_id"), $"sub", $"code".as("d_code"))
      .join(codes, Seq("vec_id", "sub"))
      .filter($"d_code" =!= $"code")
    assert(twinCodes.count() == 0, "duplicate must encode to its twin's codes")

    // a search sees the upserted vectors: query = vector 100; its twin
    // must appear with EXACTLY the ADC of the original (tie on distance)
    val q = emb.filter($"vec_id" === 100)
      .select(lit(0L).as("q_id"), $"v".as("qv"))
    val res = AnnIndex.search(spark, indexDir, q, 50)
      .select($"n_id", $"adc".cast("double").as("adc")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res.contains(100L + Shift),
      s"search must surface the upserted twin: ${res.keys.toSeq.sorted}")
    assert(res.get(100L + Shift) == res.get(100L) ||
      (res.contains(100L + Shift) && !res.contains(100L)),
      "twin must score exactly like the original when both rank")

    // resumability: the same upsert again is a no-op (anti-join)
    AnnIndex.upsert(spark, indexDir, delta)
    assert(spark.read.parquet(s"$indexDir/invlists").count() == nInv0 + 20 &&
      spark.read.parquet(s"$indexDir/codes").count() == nCodes0 + 20 * 8,
      "re-upserting the same delta must change nothing")

    // TORN-APPEND healing: simulate a crash between the two artifact
    // writes (codes landed, the invlist append did not) by stripping
    // the delta's list rows, then re-run the SAME upsert. Because each
    // artifact anti-joins its OWN membership, the re-run must write
    // exactly the missing half: lists restored, codes NOT duplicated
    // (a duplicated code row would double the vector's ADC sum — a
    // silently wrong ranking, the worst failure mode of this module).
    val invPath = new org.apache.hadoop.fs.Path(s"$indexDir/invlists")
    val fs = invPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val kept = spark.read.parquet(invPath.toString)
      .filter($"vec_id" < Shift)
      .select($"vec_id", $"cell".cast("long").as("cell"))
      .localCheckpoint()
    fs.delete(invPath, true)
    kept.write.partitionBy("cell").parquet(invPath.toString)
    AnnIndex.upsert(spark, indexDir, delta)
    assert(spark.read.parquet(s"$indexDir/invlists").count() == nInv0 + 20,
      "healing upsert must restore the missing list rows")
    assert(spark.read.parquet(s"$indexDir/codes").count() == nCodes0 + 20 * 8,
      "healing upsert must not duplicate the already-written codes")
    val healed = AnnIndex.search(spark, indexDir, q, 50)
      .select($"n_id").collect().map(_.getLong(0)).toSet
    assert(healed.contains(100L + Shift),
      "the healed twin must rank in searches again")
  }

  test("delete/compact lifecycle: tombstoned ids vanish from searches " +
      "immediately, deletion is idempotent, compaction physically " +
      "removes the bytes without changing any surviving ranking, and " +
      "a compacted id is insertable again") {
    import spark.implicits._
    val indexDir = tmpDir("ann-delete") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir, byResidual = true)
    val nInv0 = spark.read.parquet(s"$indexDir/invlists").count()
    val nCodes0 = spark.read.parquet(s"$indexDir/codes").count()

    val emb = Tables.load(spark, sfVerify, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val qRows = emb.filter($"vec_id" === 100)
      .select(lit(0L).as("q_id"), $"v".as("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val probe = qRows.toSeq.toDF("q_id", "qv")

    def topIds(k: Int): Seq[Long] = AnnIndex
      .search(spark, indexDir, probe, k)
      .orderBy($"rnk").select($"n_id").as[Long].collect().toSeq

    // delete the query's current top-2 neighbors: they must vanish and
    // the REMAINING ranking must be exactly the old one minus them
    // (tombstoning prunes candidates, it cannot reorder survivors)
    val before = topIds(10)
    val dead = before.take(2)
    AnnIndex.delete(spark, indexDir, dead.toDF("vec_id"))
    val after = topIds(8)
    assert(dead.forall(!after.contains(_)),
      s"deleted ids must not surface: $dead in $after")
    assert(after == before.filterNot(dead.contains),
      s"survivors must keep their relative order: $after vs $before")

    // idempotence: deleting the same ids again adds nothing
    AnnIndex.delete(spark, indexDir, dead.toDF("vec_id"))
    assert(spark.read.parquet(s"$indexDir/tombstones").count() ==
      dead.size, "re-deleting must not grow the tombstone set")

    // register filter: deleting an id the index never held writes no
    // tombstone (an orphan would shadow the id's future upsert)
    AnnIndex.delete(spark, indexDir, Seq(77777777L).toDF("vec_id"))
    assert(spark.read.parquet(s"$indexDir/tombstones").count() ==
      dead.size, "deleting a never-indexed id must be a no-op")

    // a deleted-but-not-compacted id cannot sneak back in via upsert
    val revive = emb.filter($"vec_id" === dead.head).select($"vec_id", $"v")
    AnnIndex.upsert(spark, indexDir, revive)
    assert(!topIds(10).contains(dead.head),
      "tombstone must outrank a pre-compaction re-upsert")

    // compact: bytes physically gone, tombstones cleared, surviving
    // ranking identical
    AnnIndex.compact(spark, indexDir)
    assert(spark.read.parquet(s"$indexDir/invlists").count() ==
      nInv0 - dead.size &&
      spark.read.parquet(s"$indexDir/codes").count() ==
        nCodes0 - dead.size * 8,
      "compaction must remove exactly the tombstoned rows")
    assert(!new java.io.File(s"$indexDir/tombstones").exists(),
      "compaction must clear the tombstone table")
    assert(topIds(8) == after,
      "compaction must not change any surviving ranking")

    // revival, in the documented order: compact then upsert
    AnnIndex.upsert(spark, indexDir, revive)
    assert(topIds(10).contains(dead.head),
      "a compacted id must be insertable again")
  }

  test("streaming ingestion: a vector stream upserts into the index " +
      "via foreachBatch; at-least-once redelivery is absorbed because " +
      "upsert is idempotent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val indexDir = tmpDir("ann-stream") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir)
    val nInv0 = spark.read.parquet(s"$indexDir/invlists").count()

    val Shift = 2000000L
    val emb = Tables.load(spark, sfVerify, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    def twins(lo: Long, hi: Long) = emb
      .filter($"vec_id" >= lo && $"vec_id" < hi)
      .select(($"vec_id" + Shift).as("vec_id"), $"v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))

    val src = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ckpt-ann-stream").toString
    def run(): Unit = {
      val q = src.toDF().toDF("vec_id", "v")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          AnnIndex.upsert(spark, indexDir,
            b.select($"vec_id", $"v".cast("array<double>").as("v")))
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    }

    src.addData(twins(200, 210).toSeq: _*)
    run()
    assert(spark.read.parquet(s"$indexDir/invlists").count() == nInv0 + 10)

    // redelivery: the SAME rows again (the at-least-once case a
    // foreachBatch sink must survive) plus genuinely new ones
    src.addData(twins(200, 210).toSeq: _*)
    src.addData(twins(210, 215).toSeq: _*)
    run()
    assert(spark.read.parquet(s"$indexDir/invlists").count() == nInv0 + 15,
      "replayed rows must be absorbed; new rows indexed")

    // the streamed vectors are searchable at their twins' distances
    val q205 = emb.filter($"vec_id" === 205)
      .select(lit(0L).as("q_id"), $"v".as("qv"))
    val res = AnnIndex.search(spark, indexDir, q205, 50)
      .select($"n_id").as[Long].collect().toSet
    assert(res.contains(205L + Shift),
      s"streamed twin must be searchable: ${res.toSeq.sorted.take(10)}")
  }

  test("refined search: exact re-scoring of ADC's top-depth from the " +
      "vectors artifact — an exact copy scores 0.0 regardless of its " +
      "quantization; the refine read prunes to the candidate ids") {
    import spark.implicits._
    val indexDir = tmpDir("ann-refined") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir, byResidual = false,
      storeVectors = true)
    val qRows = Tables.load(spark, sfVerify, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val queries = qRows.toSeq.toDF("q_id", "qv")

    // expected: re-score ADC's top-depth against the corpus embeddings
    // directly (the spec-side oracle), same distance definition
    val depth = 20
    // same probe depth as the refined chain's default — the spec-side
    // oracle must re-score exactly the candidate set searchRefined sees
    val cand = AnnIndex.search(spark, indexDir, queries, depth, None,
        graft.ops.Similarity.RefineNProbe)
      .select($"q_id", $"n_id")
    val emb = Tables.load(spark, sfVerify, "embeddings")
      .select($"vec_id".as("n_id"),
        $"embedding".cast("array<double>").as("v"))
    val want = cand.join(queries.toDF("q_id", "qv"), "q_id")
      .join(emb, "n_id")
      .withColumn("d2", graft.ops.Similarity
        .kmDist2($"qv", $"v").cast("decimal(14,6)"))
      .select($"q_id", $"n_id", $"d2".cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(t => (BigDecimal(t._3), t._2)).take(5)
          .zipWithIndex.map { case ((q, n, d), i) => (q, n, d, i + 1) }
      }.sortBy(t => (t._1, t._4))
    val got = AnnIndex.searchRefined(spark, indexDir, queries, 5, depth)
      .select($"q_id", $"n_id", $"d2".cast("string"), $"rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(got.nonEmpty && got.sameElements(want),
      s"refined ranking must equal exact re-scoring of the ADC " +
        s"candidates; got ${got.take(3).mkString(",")} vs " +
        s"${want.take(3).mkString(",")}")

    // the headline property: an exact copy of an indexed vector
    // refines to distance 0.0 at rank 1, however its codes quantize —
    // the cure for the raw-ADC distortion caveat AdmissionStackSpec
    // pins on out-of-distribution vectors
    val twinQ = Seq((-5L, qRows.find(_._1 == 7L).get._2))
      .toDF("q_id", "qv")
    val twinTop = AnnIndex.searchRefined(spark, indexDir, twinQ, 1, depth)
      .select($"n_id", $"d2".cast("double")).head()
    assert(twinTop.getLong(0) == 7L && twinTop.getDouble(1) == 0.0,
      s"an exact copy must refine to its twin at 0.0: $twinTop")

    // plan: the refine read must prune by the candidate IN-filter and
    // never scan the embeddings corpus
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    val refined = AnnIndex.searchRefined(spark, indexDir, queries, 5, depth)
    refined.collect()
    val ss = scans(refined.queryExecution.executedPlan)
    assert(!ss.exists(_.relation.location.rootPaths.mkString
        .contains("embeddings")),
      "the refined search must never scan the vector corpus")
    val vecScan = ss.find(_.relation.location.rootPaths.mkString
      .contains("vectors"))
    assert(vecScan.isDefined &&
      vecScan.get.dataFilters.mkString.contains("vec_id"),
      s"the refine read must carry the candidate id filter into the " +
        s"scan: ${vecScan.map(_.dataFilters)}")
  }

  test("probe plan switch: above the probe literal budget the " +
      "driver-side cell resolve drops out — identical ranking through " +
      "the raw-partition-column join") {
    import spark.implicits._
    val indexDir = tmpDir("ann-probe-switch") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir, byResidual = false)
    val queries = Tables.load(spark, sfVerify, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.toDF("q_id", "qv")

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    def run(): (Seq[(Long, Long, String, Int)], String) = {
      val df = AnnIndex.search(spark, indexDir, queries, 5)
      val rows = df.select($"q_id", $"n_id", $"adc".cast("string"), $"rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getInt(3))).toSeq.sortBy(t => (t._1, t._4))
      val invFilters = scans(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.mkString.contains("invlists"))
        .flatMap(f => f.partitionFilters ++ f.dataFilters).mkString(";")
      (rows, invFilters)
    }

    // 10 queries × default nprobe ≤ the default budget: bounded shape,
    // probed cells resolved into a partition IN-literal on the scan
    val (small, smallF) = run()
    assert(smallF.matches("(?s).*\\b(INSET|IN)\\b.*cell.*") ||
        smallF.matches("(?s).*cell.*\\b(INSET|IN)\\b.*"),
      s"bounded batch must prune the invlist listing with the probed-" +
        s"cell literal: $smallF")

    // force the large-batch plan: budget below 10 × nprobe — identical
    // ranking with NO driver-resolved cell literal on the scan. The
    // join path's pruning is DYNAMIC partition pruning (a runtime
    // subquery filter Spark plants on the partition column from the
    // probe side of the join) — that IS the designed replacement for
    // the literal, so the spec pins its presence and bans only
    // STATIC (driver-resolved) IN/INSET literals.
    withConfs("spark.graft.ann.probe.literalBudget" -> "1") {
      val (large, largeF) = run()
      assert(large == small,
        s"both probe plans must produce the identical ranking: " +
          s"${large.take(3)} vs ${small.take(3)}")
      assert(largeF.contains("dynamicpruning"),
        s"the join path should prune the invlist scan via DPP: $largeF")
      val static = largeF
        .replaceAll("dynamicpruningexpression\\([^)]*\\)", "")
      assert(!static.matches("(?s).*\\b(INSET|IN)\\b.*"),
        s"large batch must not carry a driver-resolved cell literal: " +
          s"$largeF")
    }
  }

  test("refined search plan switch: above the literal budget the " +
      "driver-side IN resolve and the forced query broadcast drop out " +
      "— identical ranking through the distributed semi-join shape") {
    import spark.implicits._
    val indexDir = tmpDir("ann-refined-switch") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir, byResidual = false,
      storeVectors = true)
    val queries = Tables.load(spark, sfVerify, "embeddings")
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.toDF("q_id", "qv")
    val depth = 20

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
    }
    def run(): (Seq[(Long, Long, String, Int)], Seq[FileSourceScanExec]) = {
      val df = AnnIndex.searchRefined(spark, indexDir, queries, 5, depth)
      val rows = df.select($"q_id", $"n_id", $"d2".cast("string"), $"rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getInt(3))).toSeq.sortBy(t => (t._1, t._4))
      (rows, scans(df.queryExecution.executedPlan))
    }
    def vecFilters(ss: Seq[FileSourceScanExec]): String =
      ss.filter(_.relation.location.rootPaths.mkString.contains("vectors"))
        .flatMap(_.dataFilters).mkString(";")

    // 10 queries x depth 20 = 200 <= the default budget: bounded shape,
    // candidate IN-literal pushed into the refine read
    val (small, smallScans) = run()
    assert(vecFilters(smallScans).matches("(?s).*\\b(INSET|IN)\\b.*"),
      s"bounded batch must prune the refine read with the candidate " +
        s"IN-literal: ${vecFilters(smallScans)}")

    // force the large-batch plan: same queries, budget below 200 —
    // the ranking must be bit-identical with NO id IN-literal anywhere
    // on the refine read (nothing |batch x depth|-sized reaches the
    // driver) and no forced broadcast of the query frame
    spark.conf.set("spark.graft.ann.refine.literalBudget", "1")
    try {
      val (large, largeScans) = run()
      assert(large == small,
        s"both plans must produce the identical refined ranking: " +
          s"${large.take(3)} vs ${small.take(3)}")
      val vf = vecFilters(largeScans)
      assert(largeScans.exists(_.relation.location.rootPaths.mkString
          .contains("vectors")),
        "large batch still reads the refine artifact")
      assert(!vf.matches("(?s).*\\b(INSET|IN)\\b.*"),
        s"large batch must not carry a driver-resolved id literal: $vf")
    } finally spark.conf.unset("spark.graft.ann.refine.literalBudget")
  }

  test("filtered search: an allowlist excises ids from the ranking " +
      "BEFORE the top-k cut (never post-filter under-return)") {
    import spark.implicits._
    val indexDir = tmpDir("ann-filtered") + "/idx"
    AnnIndex.build(spark, sfVerify, indexDir)
    val qv = Tables.load(spark, sfVerify, "embeddings")
      .filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0)
    val q = Seq((0L, qv)).toDF("q_id", "qv")

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"n_id", $"adc".cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // unfiltered top-6; disallow exactly its rank-1 id: the filtered
    // top-5 must be ranks 2..6 re-ranked 1..5 with identical distances
    // — the candidate set shrank by the excised id and nothing else,
    // which is precisely what a post-filter-after-top-k gets wrong
    // when the cut already discarded the would-be replacements.
    val unfiltered = AnnIndex.search(spark, indexDir, q, 6)
      .orderBy($"rnk")
    val top1 = unfiltered.head().getLong(1)
    val allow = Tables.load(spark, sfVerify, "embeddings")
      .select($"vec_id").filter($"vec_id" =!= top1)
    val filtered = AnnIndex.search(spark, indexDir, q, 5, Some(allow))
      .orderBy($"rnk")
    val got = rows(filtered)
    val want = rows(unfiltered).filter(_._1 != top1)
    assert(got.nonEmpty && got.sameElements(want),
      s"filtered ranking must be the unfiltered one with the " +
        s"disallowed id excised: got ${got.mkString(",")} vs " +
        s"${want.mkString(",")}")
    assert(filtered.select("rnk").as[Int].collect().toSeq == (1 to 5),
      "ranks must be reassigned within the filtered result")
  }
}
