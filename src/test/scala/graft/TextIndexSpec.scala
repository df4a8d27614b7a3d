package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TextIndex}

/** The split lexical-retrieval lifecycle (TextIndex.build / search /
  * append / delete / compact) — the SCALE.md claim "a retrieval
  * service probes a WRITTEN inverted index; a query costs its terms'
  * postings, never the corpus", proven:
  *
  *  - search over the written artifacts reproduces the one-plan s09
  *    BM25 ranking EXACTLY (same score expression → same top-k, same
  *    decimal scores);
  *  - the search plan contains ZERO corpus (documents) scans and the
  *    query terms' bucket cut PRUNES the partitioned postings scan;
  *  - re-building is byte-deterministic (resumability);
  *  - append converges to the full build bit-for-bit, re-append is a
  *    no-op, and a crash-torn append (artifacts written, register not)
  *    heals on retry — duplicates absorbed, scores unchanged;
  *  - delete + stat correction equals a FRESH BUILD on the reduced
  *    corpus bit-for-bit (df, n_corpus and avgdl all follow the
  *    erasure, not just the candidate set), and compact preserves it.
  */
class TextIndexSpec extends SparkTestBase {

  private def docs() = {
    import spark.implicits._
    Tables.load(spark, sfVerify, "documents").select($"doc_id", $"text")
  }

  /** Rank rows as comparable tuples (scores as exact decimal strings —
    * bit-for-bit, not within-epsilon).
    */
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("n_terms"),
        col("bm25d").cast("decimal(22,6)").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("search over written artifacts == the one-plan s09 ranking; " +
      "no corpus scan; postings partitions pruned; rebuild " +
      "deterministic") {
    import spark.implicits._
    val indexDir = tmpDir("text-index") + "/idx"
    TextIndex.build(spark, docs(), indexDir)

    val got = TextIndex.search(spark, indexDir, Similarity.BmTerms, 10)
    val want = SparkEntry.queries("s09_bm25_topk")(spark, sfVerify)
      .select($"doc_id", $"n_terms", $"bm25".cast("decimal(22,6)")
        .cast("string"))
    val gotRows = rows(got)
    val wantRows = want.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(gotRows.nonEmpty && gotRows.sameElements(wantRows),
      s"artifact search must equal the one-plan s09 ranking; got " +
        s"${gotRows.take(3).mkString(",")} vs " +
        s"${wantRows.take(3).mkString(",")}")

    // ---- plan properties of the artifact search ----------------------
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
    val searched = TextIndex.search(spark, indexDir, Similarity.BmTerms, 10)
    searched.collect()
    val ss = scans(searched.queryExecution.executedPlan)
    assert(!ss.exists(_.relation.location.rootPaths.mkString
        .contains("documents")),
      "the artifact search must never scan the text corpus")
    val postScan = ss.find(_.relation.location.rootPaths.mkString
      .contains("postings"))
    assert(postScan.isDefined, "search must read the postings")
    assert(postScan.get.partitionFilters.nonEmpty,
      s"the terms' bucket cut must be a PARTITION filter (pruned at " +
        s"listing time): ${postScan.get}")
    val totalBuckets = new java.io.File(s"$indexDir/postings").listFiles()
      .count(_.getName.startsWith("tb="))
    val readBuckets = postScan.get.selectedPartitions.partitionCount
    assert(readBuckets < totalBuckets && readBuckets <= 3,
      s"3 query terms must prune to <=3 of $totalBuckets buckets " +
        s"(read $readBuckets)")

    // ---- rebuild determinism -----------------------------------------
    def fingerprint(): String = {
      val post = spark.read.parquet(s"$indexDir/postings")
        .select(concat_ws(":", $"term", $"doc_id", $"tf", $"len").as("r"))
      val dreg = spark.read.parquet(s"$indexDir/docs")
        .select(concat_ws(":", $"doc_id", $"len").as("r"))
      val st = spark.read.parquet(s"$indexDir/stats")
        .select(concat_ws(":", $"batch_id", $"n_docs", $"sum_len").as("r"))
      post.union(dreg).union(st)
        .agg(md5(concat_ws(",", sort_array(collect_list($"r")))))
        .head().getString(0)
    }
    val before = fingerprint()
    TextIndex.build(spark, docs(), indexDir)
    assert(fingerprint() == before,
      "re-building the index must reproduce identical artifacts")
  }

  test("append converges to the full build; re-append is a no-op; a " +
      "crash-torn append heals on retry") {
    import spark.implicits._
    val base = tmpDir("text-index-append")
    val full = base + "/full"
    val inc = base + "/inc"
    val d = docs()
    val first = d.filter($"doc_id" % 5 =!= 0)
    val rest = d.filter($"doc_id" % 5 === 0)
    TextIndex.build(spark, d, full)
    TextIndex.build(spark, first, inc)
    TextIndex.append(spark, inc, rest)
    val wantRows = rows(TextIndex.search(spark, full, Similarity.BmTerms, 10))
    assert(rows(TextIndex.search(spark, inc, Similarity.BmTerms, 10))
        .sameElements(wantRows),
      "build+append must equal the one-shot full build bit-for-bit")

    // re-append: the register anti-join absorbs the whole batch
    val nPost = spark.read.parquet(s"$inc/postings").count()
    val nStats = spark.read.parquet(s"$inc/stats").count()
    TextIndex.append(spark, inc, rest)
    assert(spark.read.parquet(s"$inc/postings").count() == nPost &&
      spark.read.parquet(s"$inc/stats").count() == nStats,
      "re-running the same append must write nothing")

    // crash-torn append: postings + stats landed, the register write
    // did not (simulated by restoring the pre-append docs/ tree). The
    // RETRY must finish the job — and the duplicate postings and stats
    // rows it writes must be absorbed (per-(doc, term) collapse;
    // batch_id dedup), leaving search bit-identical to the clean build.
    def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
        ()
      }
    }
    def wipeDir(p: java.nio.file.Path): Unit = {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      del(p.toFile)
    }
    val torn = base + "/torn"
    TextIndex.build(spark, first, torn)
    val docsDir = java.nio.file.Paths.get(s"$torn/docs")
    val saved = java.nio.file.Paths.get(s"$base/docs-saved")
    copyDir(docsDir, saved)
    TextIndex.append(spark, torn, rest)
    wipeDir(docsDir)
    copyDir(saved, docsDir) // docs register rolled back = the torn state
    TextIndex.append(spark, torn, rest) // the retry
    assert(rows(TextIndex.search(spark, torn, Similarity.BmTerms, 10))
        .sameElements(wantRows),
      "the healed torn append must score bit-identically to the clean " +
        "build (duplicates absorbed, stats not double-counted)")
    // the duplicate stats row exists physically but never double-counts
    val st = spark.read.parquet(s"$torn/stats")
    assert(st.count() > st.dropDuplicates("batch_id").count(),
      "the simulation must actually have produced a duplicate stats row")
  }

  test("batch-query search matches the single-query form per query; " +
      "an allowlist excises docs WITHOUT changing surviving scores " +
      "(corpus-global stats)") {
    import spark.implicits._
    val indexDir = tmpDir("text-index-many") + "/idx"
    TextIndex.build(spark, docs(), indexDir)

    // ---- searchMany == search, per query -----------------------------
    val batch = Seq((1L, Similarity.BmTerms),
      (2L, Similarity.BmTerms.take(1))).toDF("q_id", "terms")
    val many = TextIndex.searchMany(spark, indexDir, batch, 10)
      .select($"q_id", $"doc_id", $"n_terms",
        $"bm25d".cast("decimal(22,6)").cast("string"), $"rnk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getInt(4)))
      .sortBy(t => (t._1, t._5))
    def single(terms: Seq[String], qid: Long) =
      rows(TextIndex.search(spark, indexDir, terms, 10))
        .zipWithIndex
        .map { case ((d, n, s), i) => (qid, d, n, s, i + 1) }
    val want = (single(Similarity.BmTerms, 1L) ++
      single(Similarity.BmTerms.take(1), 2L)).sortBy(t => (t._1, t._5))
    assert(many.nonEmpty && many.sameElements(want),
      s"batch search must equal per-query singles; got " +
        s"${many.take(3).mkString(",")} vs ${want.take(3).mkString(",")}")

    // ---- filter semantics: excision, not re-scoring -------------------
    val unfiltered = rows(TextIndex.search(spark, indexDir,
      Similarity.BmTerms, 6))
    val top1 = unfiltered.head._1
    val allow = docs().select($"doc_id").filter($"doc_id" =!= top1)
    val filtered = rows(TextIndex.search(spark, indexDir,
      Similarity.BmTerms, 5, Some(allow)))
    assert(filtered.sameElements(unfiltered.filter(_._1 != top1)),
      "the filtered ranking must be the unfiltered one with the " +
        "disallowed doc excised and every surviving score IDENTICAL " +
        "(df/avgdl stay corpus-global — a filter scopes candidates, " +
        "it does not retrain the model)")
  }

  test("phrase search: positional adjacency over the pruned postings " +
      "equals a brute-force sliding-window count; conjunctive filter " +
      "by construction") {
    import spark.implicits._
    val indexDir = tmpDir("text-index-phrase") + "/idx"
    TextIndex.build(spark, docs(), indexDir)
    val toks = docs().filter($"text".isNotNull)
      .select($"doc_id", split($"text", " ").as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    // phrases drawn from REAL text, so presence is guaranteed: the
    // lowest doc's first bigram and first trigram
    val first = toks.minBy(_._1)._2
    for (m <- Seq(2, 3)) {
      val phrase = first.take(m)
      val want = toks
        .map { case (id, ts) =>
          (id, ts.sliding(m).count(_ == phrase).toLong)
        }
        .filter(_._2 > 0)
        .sortBy { case (id, n) => (-n, id) }.take(10)
      val got = TextIndex.searchPhrase(spark, indexDir, phrase, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.nonEmpty && got.sameElements(want),
        s"phrase '$phrase' ranking must equal the sliding-window " +
          s"truth; got ${got.take(5).mkString(",")} vs " +
          s"${want.take(5).mkString(",")}")
    }
    // a phrase whose terms co-occur nowhere adjacently returns empty
    // (the conjunctive join + adjacency filter, not an error)
    val bogus = Seq(first.head, "zzz-not-a-token")
    assert(TextIndex.searchPhrase(spark, indexDir, bogus, 10).isEmpty)
  }

  test("streaming ingest: a document stream appends via foreachBatch; " +
      "at-least-once redelivery is absorbed; the final search equals " +
      "the one-shot full build") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = tmpDir("text-index-stream")
    val idx = base + "/idx"
    val full = base + "/full"
    val d = docs()
    TextIndex.build(spark, d, full)
    TextIndex.build(spark, d.filter($"doc_id" % 5 =!= 0), idx)

    val batchRows = d.filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ckpt-text-stream").toString
    def run(): Unit = {
      val q = src.toDF().toDF("doc_id", "text")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          TextIndex.append(spark, idx,
            b.select($"doc_id", $"text").localCheckpoint())
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop(); q.awaitTermination(30000)
    }
    src.addData(batchRows.take(40): _*)
    run()
    // redelivery of the SAME rows (at-least-once worst case) plus the
    // remainder: replays anti-join away, new rows index normally
    src.addData(batchRows.take(40): _*)
    src.addData(batchRows.drop(40): _*)
    run()
    assert(rows(TextIndex.search(spark, idx, Similarity.BmTerms, 10))
        .sameElements(
          rows(TextIndex.search(spark, full, Similarity.BmTerms, 10))),
      "the streamed index must score bit-identically to the one-shot " +
        "full build after redelivery")
  }

  test("delete corrects df and avgdl exactly (== fresh build on the " +
      "reduced corpus); compact preserves the result and clears " +
      "tombstones") {
    import spark.implicits._
    val base = tmpDir("text-index-delete")
    val idx = base + "/idx"
    val reduced = base + "/reduced"
    val d = docs()
    TextIndex.build(spark, d, idx)
    val victim = TextIndex.search(spark, idx, Similarity.BmTerms, 1)
      .head().getLong(0)
    TextIndex.delete(spark, idx, Seq(victim).toDF("doc_id"))
    TextIndex.build(spark, d.filter($"doc_id" =!= victim), reduced)
    val want = rows(TextIndex.search(spark, reduced, Similarity.BmTerms, 10))
    val gotDel = rows(TextIndex.search(spark, idx, Similarity.BmTerms, 10))
    assert(!gotDel.exists(_._1 == victim), "deleted doc must not surface")
    assert(gotDel.sameElements(want),
      "post-delete search must equal a fresh build on the reduced " +
        "corpus bit-for-bit (stats correction, not just the anti-join)")
    TextIndex.compact(spark, idx)
    assert(rows(TextIndex.search(spark, idx, Similarity.BmTerms, 10))
        .sameElements(want),
      "compaction must preserve the corrected ranking")
    assert(!new java.io.File(s"$idx/tombstones").exists(),
      "compaction must clear the tombstone table")
  }

  test("maintenanceDecision flips across the delete → compact cycle " +
      "(the s51 contract is a live decision, not a snapshot)") {
    val idx = tmpDir("text-maint-flip") + "/idx"
    val docs = Tables.load(spark, sfSmoke, "documents")
      .select(col("doc_id"), col("text"))
    TextIndex.build(spark, docs.filter(col("doc_id") % 5 =!= 4), idx)
    TextIndex.delete(spark, idx,
      docs.filter(col("doc_id") % 20 === 3).select(col("doc_id")))
    val before = TextIndex.maintenanceDecision(spark, idx).head()
    // erasure rule hits 1/16 of the split ≈ 0.0625 ≥ the 0.05 knob
    assert(before.getAs[Boolean]("tomb_exceeded") &&
      before.getAs[Boolean]("compact"),
      s"pending tombstones above the knob must fire the go: $before")
    assert(!before.getAs[Boolean]("frag_exceeded"),
      "a single-build index is not fragmented")
    TextIndex.compact(spark, idx)
    val after = TextIndex.maintenanceDecision(spark, idx).head()
    assert(after.getAs[Long]("n_tomb") == 0L &&
      after.getAs[Long]("n_batches") == 1L &&
      !after.getAs[Boolean]("compact"),
      s"a just-compacted index must decide no-go: $after")
  }
}
