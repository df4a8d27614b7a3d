package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DedupIndex

/** The persisted dedup-admission lifecycle (DedupIndex.build / probe /
  * append): the SCALE.md claim "an ingest service probes a WRITTEN
  * index, it does not recompute the corpus fingerprint/band index per
  * admission run", proven:
  *
  *  - probe decisions over the written artifacts reproduce BOTH board
  *    funnels — d13's exact admission and d17's near admission — on
  *    the same corpus/batch split those queries gate;
  *  - the probe plan scans NO corpus text (documents.parquet absent)
  *    and hits both artifact scans with PARTITION filters;
  *  - a small batch prunes to its collision buckets (fewer partitions
  *    read than exist — the listing-time payoff of the fpb/pb layout);
  *  - append is idempotent (anti-join on the membership register) and
  *    appended docs become probe-rejecting, closing the ingest loop.
  */
class DedupIndexSpec extends SparkTestBase {

  private def fixtureDocs: DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfVerify, "documents")
      .select($"doc_id", $"text", $"source")
  }

  private def literalBatch(filter: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    // materialized to literals: the probe input carries no lineage back
    // to the fixture, so any documents scan in the probe plan would be
    // the INDEX's fault (the AnnIndexSpec discipline)
    fixtureDocs.filter(filter)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("doc_id", "text")
  }

  test("probe over a written index reproduces the d13 exact and d17 " +
      "near admission funnels; no corpus text in the plan; both " +
      "artifact scans partition-filtered") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-index") + "/idx"
    DedupIndex.build(spark, fixtureDocs.filter($"doc_id" % 5 =!= 4), indexDir)

    val batch = literalBatch($"doc_id" % 5 === 4)
    val decisions = DedupIndex.probe(spark, indexDir, batch)
      .localCheckpoint() // reused by two funnels + the plan audit below
    val withSource = decisions
      .join(fixtureDocs.select($"doc_id", $"source"), "doc_id")

    def rows(df: DataFrame): Seq[(String, Long, Long, Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

    // d13 parity: exact fingerprints, corpus rejection outranks batch
    val gotExact = rows(withSource.groupBy($"source")
      .agg(count(lit(1)).as("n_incoming"),
        sum(when(!$"fp_in_corpus" && $"fp_batch_rn" === 1, 1L)
          .otherwise(0L)).as("n_admitted"),
        sum(when($"fp_in_corpus", 1L).otherwise(0L)).as("n_rej_corpus"),
        sum(when(!$"fp_in_corpus" && $"fp_batch_rn" > 1, 1L)
          .otherwise(0L)).as("n_rej_batch"))
      .select($"source", $"n_incoming", $"n_admitted", $"n_rej_corpus",
        $"n_rej_batch"))
    val wantExact = rows(
      SparkEntry.queries("d13_incremental_dedup")(spark, sfVerify)
        .select($"source", $"n_incoming", $"n_admitted", $"n_rej_corpus",
          $"n_rej_batch"))
    assert(gotExact.nonEmpty && gotExact == wantExact,
      s"probe must reproduce d13's funnel: $gotExact vs $wantExact")

    // d17 parity: near admission, corpus rejection takes precedence
    val gotNear = rows(withSource.groupBy($"source")
      .agg(count(lit(1)).as("n_incoming"),
        sum(when($"near_rej_corpus", 1L).otherwise(0L)).as("n_rej_corpus"),
        sum(when(!$"near_rej_corpus" && $"near_rej_batch", 1L)
          .otherwise(0L)).as("n_rej_batch"),
        sum(when(!$"near_rej_corpus" && !$"near_rej_batch", 1L)
          .otherwise(0L)).as("n_admitted"))
      .select($"source", $"n_incoming", $"n_rej_corpus", $"n_rej_batch",
        $"n_admitted"))
    val wantNear = rows(
      SparkEntry.queries("d17_incremental_near_dedup")(spark, sfVerify)
        .select($"source", $"n_incoming", $"n_rej_corpus", $"n_rej_batch",
          $"n_admitted"))
    assert(gotNear == wantNear,
      s"probe must reproduce d17's funnel: $gotNear vs $wantNear")

    // plan audit on a FRESH probe (the checkpointed one above has its
    // lineage severed): no fixture scan; partition filters on both
    // artifact scans
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
    val probed = DedupIndex.probe(spark, indexDir, batch)
    probed.collect()
    val ss = scans(probed.queryExecution.executedPlan)
    assert(!ss.exists(_.relation.location.rootPaths.mkString
        .contains("documents")),
      "the probe plan must never scan corpus text")
    for (artifact <- Seq("fps", "bands")) {
      val sc = ss.filter(_.relation.location.rootPaths.mkString
        .contains(artifact))
      assert(sc.nonEmpty && sc.forall(_.partitionFilters.nonEmpty),
        s"$artifact scan must carry a partition filter: $sc")
    }
  }

  test("a small batch prunes both artifact scans to its collision " +
      "buckets: fewer partitions read than exist") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-prune") + "/idx"
    DedupIndex.build(spark, fixtureDocs.filter($"doc_id" % 5 =!= 4), indexDir)

    // 4 docs → ≤12 band rows and ≤4 fingerprint nibbles: strictly
    // fewer buckets than the corpus populates
    val batch = literalBatch($"doc_id" % 5 === 4 && $"doc_id" < 20)
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
    // inspect the PRE-execution plan: a tiny batch can make a probe
    // branch runtime-empty, and AQE then replaces the (already pruned,
    // already listed) scan with an empty relation in the final plan —
    // the pruning decision under test happens at listing time, before
    // any of that
    val probed = DedupIndex.probe(spark, indexDir, batch)
    val ss = scans(probed.queryExecution.executedPlan)
    for (artifact <- Seq("fps", "bands")) {
      val dirs = new java.io.File(s"$indexDir/$artifact").listFiles()
        .count(f => f.getName.contains("="))
      val sc = ss.filter(_.relation.location.rootPaths.mkString
        .contains(artifact))
      assert(sc.nonEmpty, s"$artifact must be scanned")
      val read = sc.map(_.selectedPartitions.partitionCount).max
      assert(read < dirs,
        s"$artifact: probe must read fewer buckets than exist " +
          s"($read of $dirs)")
    }
  }

  test("rebuild is byte-deterministic (the AnnIndex resumability " +
      "contract): re-building over the same corpus reproduces " +
      "identical artifact content") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-rebuild") + "/idx"
    val corpus = fixtureDocs.filter($"doc_id" % 5 =!= 4)
    DedupIndex.build(spark, corpus, indexDir)
    def fingerprint(): String = {
      val fps = spark.read.parquet(s"$indexDir/fps")
        .select(concat_ws(":", $"doc_id", $"fp").as("r"))
      val bands = spark.read.parquet(s"$indexDir/bands")
        .select(concat_ws(":", $"band", $"doc_id",
          concat_ws(",", (0 until 6).map(j => col(s"mh$j")): _*)).as("r"))
      fps.union(bands)
        .agg(md5(concat_ws(";", sort_array(collect_list($"r")))))
        .head().getString(0)
    }
    val before = fingerprint()
    DedupIndex.build(spark, corpus, indexDir)
    assert(fingerprint() == before,
      "re-building the dedup index must reproduce identical artifacts")
  }

  test("streaming ingest loop: a document stream probes and appends " +
      "via foreachBatch; at-least-once redelivery is absorbed because " +
      "probe rejects what append already indexed") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val indexDir = tmpDir("dedup-stream") + "/idx"
    DedupIndex.build(spark, fixtureDocs.filter($"doc_id" % 5 =!= 4), indexDir)
    val n0 = spark.read.parquet(s"$indexDir/fps").count()

    val batchRows = fixtureDocs.filter($"doc_id" % 5 === 4)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ckpt-dedup-stream").toString
    def run(): Unit = {
      val q = src.toDF().toDF("doc_id", "text")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // the ingest tick: probe, admit by the exact-then-near
          // policy, append the admissions
          val batch = b.select($"doc_id", $"text").localCheckpoint()
          val d = DedupIndex.probe(spark, indexDir, batch)
          val admit = d.filter(!$"fp_in_corpus" && $"fp_batch_rn" === 1 &&
              !$"near_rej_corpus" && !$"near_rej_batch")
            .select($"doc_id")
          DedupIndex.append(spark, indexDir, batch.join(admit, "doc_id"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    }

    src.addData(batchRows.take(40): _*)
    run()
    val n1 = spark.read.parquet(s"$indexDir/fps").count()
    assert(n1 > n0, "first tick must admit something")

    // redelivery of the SAME rows (at-least-once worst case) plus new
    // ones: replays must change nothing, new rows process normally
    src.addData(batchRows.take(40): _*)
    src.addData(batchRows.drop(40): _*)
    run()
    val n2 = spark.read.parquet(s"$indexDir/fps").count()
    assert(n2 >= n1, "later ticks only add")
    // every admitted doc now rejects its own re-ingest — the closed
    // loop, end to end through the streaming path
    val reprobe = DedupIndex.probe(spark, indexDir,
      literalBatch($"doc_id" % 5 === 4))
    assert(reprobe.filter(!$"fp_in_corpus" && $"fp_batch_rn" === 1 &&
        !$"near_rej_corpus" && !$"near_rej_batch").count() == 0,
      "nothing admitted on re-ingest after the stream indexed the batch")
  }

  test("append upserts admitted docs idempotently, and appended docs " +
      "become probe-rejecting — the closed ingest loop") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-append") + "/idx"
    DedupIndex.build(spark, fixtureDocs.filter($"doc_id" % 5 =!= 4), indexDir)
    val batch = literalBatch($"doc_id" % 5 === 4)

    val d0 = DedupIndex.probe(spark, indexDir, batch)
    // exact-then-near admission policy
    val admittedIds = d0.filter(!$"fp_in_corpus" && $"fp_batch_rn" === 1 &&
        !$"near_rej_corpus" && !$"near_rej_batch")
      .select($"doc_id").as[Long].collect().toSet
    assert(admittedIds.nonEmpty, "fixture split must admit something")
    val admitted = batch.filter($"doc_id".isin(admittedIds.toSeq: _*))

    DedupIndex.append(spark, indexDir, admitted)
    val nFp = spark.read.parquet(s"$indexDir/fps").count()
    val nBands = spark.read.parquet(s"$indexDir/bands").count()
    // idempotence: the same append again changes nothing
    DedupIndex.append(spark, indexDir, admitted)
    assert(spark.read.parquet(s"$indexDir/fps").count() == nFp &&
      spark.read.parquet(s"$indexDir/bands").count() == nBands,
      "re-appending the same docs must be a no-op")
    assert(nBands >= nFp, "every indexed doc carries its band rows")

    // the loop closes: re-probing the same batch now rejects every
    // previously admitted doc as an exact corpus dup
    val d1 = DedupIndex.probe(spark, indexDir, batch)
    val stillAdmitted = d1.filter(!$"fp_in_corpus" && $"fp_batch_rn" === 1 &&
        !$"near_rej_corpus" && !$"near_rej_batch")
      .select($"doc_id").as[Long].collect().toSet
    assert(stillAdmitted.isEmpty,
      s"appended docs must reject their own re-ingest: $stillAdmitted")
    val rejectedExact = d1.filter($"fp_in_corpus")
      .select($"doc_id").as[Long].collect().toSet
    assert(admittedIds.subsetOf(rejectedExact),
      "every appended doc must now hit the fingerprint table")

    // TORN-APPEND healing: simulate a crash between the two artifact
    // writes (bands landed, the fps register did not) by stripping the
    // admitted docs' fps rows, then re-run the SAME append. The
    // register is written LAST precisely so this state HEALS: the
    // anti-join sees the docs unregistered and rewrites both halves —
    // the duplicate band rows that leaves are absorbed by probe's
    // existence-check distinct. (The reverse order would skip the docs
    // forever, and near-dups of them would sail through admission.)
    val fpsPath = new org.apache.hadoop.fs.Path(s"$indexDir/fps")
    val fs = fpsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keptFps = spark.read.parquet(fpsPath.toString)
      .filter(!$"doc_id".isin(admittedIds.toSeq: _*))
      .select($"doc_id", $"fp", $"fpb".cast("string").as("fpb"))
      .localCheckpoint()
    fs.delete(fpsPath, true)
    keptFps.write.partitionBy("fpb").parquet(fpsPath.toString)
    DedupIndex.append(spark, indexDir, admitted)
    assert(spark.read.parquet(s"$indexDir/fps").count() == nFp,
      "healing append must restore the missing register rows")
    val d2 = DedupIndex.probe(spark, indexDir, batch)
    assert(admittedIds.subsetOf(d2.filter($"fp_in_corpus")
        .select($"doc_id").as[Long].collect().toSet),
      "healed docs must reject their own re-ingest again")
    assert(d2.count() == d1.count() &&
      d2.filter($"near_rej_corpus").count() ==
        d1.filter($"near_rej_corpus").count(),
      "duplicate band rows from the healed append must change no verdict")

    // a deletion landing IN the torn window must stick: the doc sits
    // in bands only, so a register filter that consulted fps alone
    // would silently drop the acknowledged erasure and the append
    // retry would resurrect the doc (deleteIds unions BOTH
    // memberships precisely for this window)
    val tornDoc = admittedIds.min
    val keptFps2 = spark.read.parquet(fpsPath.toString)
      .filter($"doc_id" =!= tornDoc)
      .select($"doc_id", $"fp", $"fpb".cast("string").as("fpb"))
      .localCheckpoint()
    fs.delete(fpsPath, true)
    keptFps2.write.partitionBy("fpb").parquet(fpsPath.toString)
    DedupIndex.delete(spark, indexDir, Seq(tornDoc).toDF("doc_id"))
    assert(spark.read.parquet(s"$indexDir/tombstones")
        .filter($"doc_id" === tornDoc).count() == 1,
      "a delete during a torn append must record its tombstone")
  }

  test("delete/compact lifecycle: a deleted doc immediately stops " +
      "rejecting its duplicates, deletion is idempotent, compaction " +
      "physically erases the rows without changing any other verdict, " +
      "and the doc's text is re-admittable after compaction") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-delete") + "/idx"
    val corpus = fixtureDocs.filter($"doc_id" % 5 =!= 4)
    DedupIndex.build(spark, corpus, indexDir)
    // the batch carries a CRAFTED exact duplicate of a corpus doc (the
    // fixture split has no cross-split exact dups of its own), so the
    // delete/compact story runs against a guaranteed rejection
    val victimSrc = corpus.orderBy($"doc_id")
      .select($"doc_id", $"text").head()
    val victimBatchId = 9000000L
    val batch = literalBatch($"doc_id" % 5 === 4)
      .union(Seq((victimBatchId, victimSrc.getString(1)))
        .toDF("doc_id", "text"))
    val d0 = DedupIndex.probe(spark, indexDir, batch).localCheckpoint()
    assert(d0.filter($"doc_id" === victimBatchId)
        .head().getAs[Boolean]("fp_in_corpus"),
      "the crafted duplicate must exact-reject before the deletion")
    val victimFp = Seq(victimSrc.getString(1)).toDF("text")
      .select(md5(lower($"text"))).head().getString(0)
    val corpusTwins = spark.read.parquet(s"$indexDir/fps")
      .filter($"fp" === victimFp).select($"doc_id").as[Long].collect().toSet
    assert(corpusTwins.nonEmpty, "an fp-rejected doc must have a corpus twin")

    DedupIndex.delete(spark, indexDir,
      corpusTwins.toSeq.toDF("doc_id"))
    val nTomb = spark.read.parquet(s"$indexDir/tombstones").count()
    DedupIndex.delete(spark, indexDir, corpusTwins.toSeq.toDF("doc_id"))
    assert(spark.read.parquet(s"$indexDir/tombstones").count() == nTomb,
      "re-deleting the same docs must be a no-op")
    // register filter: deleting an id the index never held must write
    // NOTHING — an orphan tombstone would silently shadow the id's
    // future append until the next compact
    DedupIndex.delete(spark, indexDir, Seq(77777777L).toDF("doc_id"))
    assert(spark.read.parquet(s"$indexDir/tombstones").count() == nTomb,
      "deleting a never-indexed id must be a no-op")

    // the deleted twins no longer exact-reject the victim; every OTHER
    // doc's exact verdict is untouched
    val d1 = DedupIndex.probe(spark, indexDir, batch).localCheckpoint()
    assert(!d1.filter($"doc_id" === victimBatchId)
        .head().getAs[Boolean]("fp_in_corpus"),
      "deleting the corpus twin must clear the exact rejection")
    val exceptVictim = ($"doc_id" =!= victimBatchId)
    assert(d1.filter(exceptVictim).select($"doc_id", $"fp_in_corpus")
        .except(d0.filter(exceptVictim)
          .select($"doc_id", $"fp_in_corpus")).count() == 0,
      "no other exact verdict may change")

    // compact: rows physically gone, tombstones cleared, verdicts
    // EXACTLY as under the logical deletion
    DedupIndex.compact(spark, indexDir)
    assert(spark.read.parquet(s"$indexDir/fps")
        .filter($"doc_id".isin(corpusTwins.toSeq: _*)).count() == 0 &&
      spark.read.parquet(s"$indexDir/bands")
        .filter($"doc_id".isin(corpusTwins.toSeq: _*)).count() == 0,
      "compaction must erase the deleted docs' fps and band rows")
    assert(!new java.io.File(s"$indexDir/tombstones").exists(),
      "compaction must clear the tombstone table")
    val d2 = DedupIndex.probe(spark, indexDir, batch)
    assert(d2.select($"doc_id", $"fp_in_corpus", $"near_rej_corpus")
        .except(d1.select($"doc_id", $"fp_in_corpus", $"near_rej_corpus"))
        .count() == 0,
      "physical erasure must reproduce the logical-deletion verdicts")

    // the loop reopens: the victim's text is admittable and appendable
    // again under the exact rule (near rules may still fire off OTHER
    // surviving corpus docs — assert only the exact path)
    val victim = batch.filter($"doc_id" === victimBatchId)
    DedupIndex.append(spark, indexDir, victim)
    assert(spark.read.parquet(s"$indexDir/fps")
        .filter($"doc_id" === victimBatchId).count() == 1,
      "the re-admitted doc must land in the register")
    assert(DedupIndex.probe(spark, indexDir, victim)
        .head().getAs[Boolean]("fp_in_corpus"),
      "the re-admitted doc must exact-reject its own re-ingest")
  }

  test("tombstone hygiene: an orphan left by a compact that died " +
      "before its tombstone clear is healed by the next append, and a " +
      "rebuild carries only tombstones the new snapshot still masks") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-orphan") + "/idx"
    val corpus = fixtureDocs.filter($"doc_id" % 5 =!= 4)
    DedupIndex.build(spark, corpus, indexDir)

    // manufacture the orphan state a crashed compact leaves: a
    // tombstone whose doc has NO rows in any artifact
    val orphanId = 88888888L
    Seq(orphanId).toDF("doc_id")
      .write.mode("append").parquet(s"$indexDir/tombstones")
    // re-admitting that very id: append clears the orphan FIRST, so
    // the fresh rows are not shadowed and the doc rejects its own
    // duplicates again
    val newDoc = Seq((orphanId, "wholly novel text payload qqq zzz"))
      .toDF("doc_id", "text")
    DedupIndex.append(spark, indexDir, newDoc)
    assert(spark.read.parquet(s"$indexDir/tombstones")
        .filter($"doc_id" === orphanId).count() == 0,
      "the orphan tombstone must be cleared by the admitting append")
    assert(DedupIndex.probe(spark, indexDir, newDoc)
        .head().getAs[Boolean]("fp_in_corpus"),
      "the re-admitted doc must reject its own duplicate (not be shadowed)")

    // rebuild-carry filtering: delete a live doc, then rebuild from a
    // corpus WITHOUT it — its tombstone must not survive into the new
    // index (nothing left to mask; an unfiltered carry would shadow a
    // future re-admission). A doc still IN the rebuild source keeps
    // its tombstone (must not be resurrected).
    val goneId = corpus.orderBy($"doc_id").select($"doc_id").head().getLong(0)
    val keptId = corpus.orderBy($"doc_id".desc).select($"doc_id")
      .head().getLong(0)
    DedupIndex.delete(spark, indexDir, Seq(goneId, keptId).toDF("doc_id"))
    DedupIndex.build(spark, corpus.filter($"doc_id" =!= goneId), indexDir)
    val carried = spark.read.parquet(s"$indexDir/tombstones")
      .select($"doc_id").as[Long].collect().toSet
    assert(!carried.contains(goneId),
      "a tombstone for a doc absent from the rebuild source must drop")
    assert(carried.contains(keptId),
      "a tombstone for a doc still in the rebuild source must carry")
  }

  test("a torn artifact swap heals on ANY entry point, not just the " +
      "writer that crashed: probe over a mid-swap index restores the " +
      "artifacts and returns the same verdicts") {
    import spark.implicits._
    val indexDir = tmpDir("dedup-recover") + "/idx"
    DedupIndex.build(spark, fixtureDocs.filter($"doc_id" % 5 =!= 4), indexDir)
    val batch = literalBatch($"doc_id" % 5 === 4)
    val before = DedupIndex.probe(spark, indexDir, batch).localCheckpoint()

    // simulate a driver death between swapDirs' two renames during a
    // compact of fps/: the live dir is gone, the fully-written marked
    // temp tree is not yet renamed in
    val fps = new org.apache.hadoop.fs.Path(s"$indexDir/fps")
    val fs = fps.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/fps.tmp")
    assert(fs.rename(fps, tmp), "test setup: set the mid-swap state")
    fs.create(new org.apache.hadoop.fs.Path(tmp, "_SWAP_READY")).close()

    val after = DedupIndex.probe(spark, indexDir, batch)
    assert(after.except(before).count() == 0 &&
      before.except(after).count() == 0,
      "the healed probe must return the pre-crash verdicts")
    assert(fs.exists(fps) && !fs.exists(tmp),
      "recovery must have renamed the marked temp tree back in")

    // the OTHER torn state — a crashed build-in-progress (unmarked
    // temp tree, no live dir) — must NOT be promoted: serving a
    // partial index silently under-rejects
    val dir2 = tmpDir("dedup-recover2") + "/idx"
    DedupIndex.build(spark, fixtureDocs.filter($"doc_id" % 5 =!= 4), dir2)
    val fps2 = new org.apache.hadoop.fs.Path(s"$dir2/fps")
    val tmp2 = new org.apache.hadoop.fs.Path(s"$dir2/fps.tmp")
    assert(fs.rename(fps2, tmp2), "test setup: unmarked partial state")
    intercept[Exception] {
      DedupIndex.probe(spark, indexDir = dir2, batch).collect()
    }
  }

  test("maintenanceDecision flips across the delete → compact cycle " +
      "(the d35 contract is a live decision, not a snapshot)") {
    val idx = tmpDir("dedup-maint-flip") + "/idx"
    val docs = Tables.load(spark, sfSmoke, "documents")
      .select(col("doc_id"), col("text"))
    DedupIndex.build(spark, docs.filter(col("doc_id") % 5 =!= 4), idx)
    DedupIndex.delete(spark, idx,
      docs.filter(col("doc_id") % 20 === 3).select(col("doc_id")))
    val before = DedupIndex.maintenanceDecision(spark, idx).head()
    assert(before.getAs[Boolean]("tomb_exceeded") &&
      before.getAs[Boolean]("compact"),
      s"pending tombstones above the knob must fire the go: $before")
    assert(!before.getAs[Boolean]("band_exceeded"),
      s"fixture band buckets are healthy (λ ≈ 1.05): $before")
    DedupIndex.compact(spark, idx)
    val after = DedupIndex.maintenanceDecision(spark, idx).head()
    assert(after.getAs[Long]("n_tomb") == 0L &&
      !after.getAs[Boolean]("compact"),
      s"a just-compacted index must decide no-go: $after")
  }
}
