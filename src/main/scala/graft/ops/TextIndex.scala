package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted BM25 postings index — the third leg of the lifecycle
  * trilogy ([[AnnIndex]] for vectors, [[DedupIndex]] for admission,
  * this for LEXICAL retrieval): the board's s09/s10 formulations
  * tokenize the corpus and rebuild tf/df/avgdl inside every query plan
  * (build+search gated together), but at 100 TB a retrieval service
  * probes a WRITTEN inverted index — tf rows land on disk once, and a
  * query's cost is proportional to its TERMS' postings, never to the
  * corpus. This module is that split (TextIndexSpec): [[build]] writes
  * the postings/doc/stat artifacts, [[search]] reproduces s09's exact
  * BM25 ranking from the artifacts alone — its plan contains zero
  * corpus-text scans and prunes the postings scan to the query terms'
  * hash buckets — and [[append]]/[[delete]]/[[compact]] maintain it
  * incrementally under the crash-safety discipline the other two
  * indexes share ([[ArtifactSwap]]).
  *
  * Artifact layout (parquet under `indexDir`):
  *
  *  - `postings/` tb=<hash(term) % NPt>/ (term, doc_id, tf, len) —
  *    one row per (doc, term), DIRECTORY-PARTITIONED by a NPt-way hash
  *    of the term so a query's `tb IN (...)` filter prunes at listing
  *    time (all of a term's postings colocate in its bucket, so the
  *    pruned scan sees EXACT df too). Each row CARRIES its document's
  *    length — the DedupIndex carry-the-signature trade: scoring needs
  *    no second per-doc lookup.
  *  - `docs/` db=<hash(doc_id) % NDb>/ (doc_id, len) — the membership
  *    REGISTER (one row per indexed doc, null-text docs included) and
  *    the erasure ledger's stat base; hash-partitioned by doc_id so
  *    the append's anti-join and the tombstone stat correction prune
  *    to the ids they actually carry.
  *  - `stats/` (batch_id, n_docs, sum_len) — one row per successful
  *    build/append, summed at search into the LIVE (n_corpus, avgdl).
  *    Keyed by a deterministic batch id so a crash-torn re-append's
  *    duplicate row is absorbed by a `dropDuplicates` at read (see
  *    [[append]]'s write-order contract).
  *  - `tombstones/` (doc_id) — logically deleted docs; searches
  *    anti-join it AND correct the corpus stats by the deleted rows'
  *    exact (count, len), so a post-delete search equals a fresh build
  *    on the reduced corpus BIT-FOR-BIT (the spec pins that
  *    equivalence); [[compact]] folds and clears.
  *
  * Scale shape of [[search]]: the query's term buckets resolve
  * driver-side (|terms| tiny rows) into the partition IN-filter; df
  * and the corpus stats are term-/single-row-sized broadcasts; the
  * only corpus-proportional bytes in the plan are the PRUNED postings
  * of the query's own terms. Global top-k is orderBy().limit() — a
  * TakeOrderedAndProject (bounded per-partition heaps), never a full
  * sort.
  */
object TextIndex {

  /** Term-hash partition fan-out (the DedupIndex NPb rationale: cheap
    * listing, while a few-term query prunes to a strict subset).
    */
  private val NPt = 32

  /** Doc-hash fan-out for the register. */
  private val NDb = 16

  /** The board's shared length definition (bm25Core): whitespace token
    * count, null text = 0. Search-vs-s09 equality depends on reusing
    * it verbatim.
    */
  private def withLen(d: DataFrame): DataFrame =
    d.withColumn("len",
      when(col("text").isNull, lit(0L))
        .otherwise(size(split(col("text"), " ")).cast("long")))

  /** (doc_id, term, tf, len, pos) — the POSITIONAL postings rows of a
    * (doc_id, text) frame: `pos` is the sorted 0-based token positions
    * of the term in its document, the column phrase search verifies
    * adjacency against. explode(split(null)) drops null-text docs,
    * which is right: they have no postings, and the `docs` register
    * still records them (their len-0 rows shape avgdl exactly as
    * bm25Core's corpus count does). BM25 scoring never reads `pos` —
    * parquet column pruning keeps the score path's bytes unchanged.
    */
  private def postingsOf(d: DataFrame): DataFrame = {
    val lens = withLen(d)
    lens.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p", "term")))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p").cast("long"))).as("pos"))
      .join(lens.select(col("doc_id"), col("len")), "doc_id")
  }

  private def termBucket(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(NPt))

  private def docBucket(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(NDb))

  /** Build (or REBUILD) from a (doc_id, text) corpus snapshot, whole
    * tree under `indexDir.build.tmp` swapped in as one unit
    * ([[ArtifactSwap.buildSwap]]) — a torn rebuild can never leave new
    * postings next to old stats (scores silently wrong by a factor of
    * avgdl). Deterministic content, so re-building is a no-op
    * byte-wise (the AnnIndex resumability contract).
    */
  def build(s: SparkSession, corpus: DataFrame, indexDir: String): Unit =
    ArtifactSwap.buildSwap(s, indexDir, "doc_id", tmp => {
      val c = corpus.select(col("doc_id"), col("text"))
      postingsOf(c)
        .withColumn("tb", termBucket(col("term")))
        .write.mode("overwrite").partitionBy("tb")
        .parquet(s"$tmp/postings")
      withLen(c).select(col("doc_id"), col("len"))
        .withColumn("db", docBucket(col("doc_id")))
        .write.mode("overwrite").partitionBy("db")
        .parquet(s"$tmp/docs")
      withLen(c)
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .withColumn("batch_id", lit("build"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
    }, tmp => s.read.parquet(s"$tmp/docs"))

  private def tombstones(s: SparkSession, indexDir: String): DataFrame =
    ArtifactSwap.tombstones(s, indexDir, "doc_id")

  /** Logical deletion (takedown/right-to-erasure for the RETRIEVAL
    * path): the doc stops surfacing in any search immediately — and
    * stops shaping df/avgdl, because [[search]] corrects the corpus
    * stats by the tombstoned rows' exact counts — without rewriting
    * the corpus-sized postings. Idempotent and FILTERED TO THE
    * REGISTERS (both artifacts' memberships, so a delete landing while
    * an append is torn sticks — `ArtifactSwap.deleteIds`). The
    * postings membership pass is a one-column scan; acceptable on the
    * rare-deletion path, and the price of never orphaning a tombstone.
    */
  def delete(s: SparkSession, indexDir: String, ids: DataFrame): Unit = {
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/postings", s"$indexDir/docs")
    ArtifactSwap.deleteIds(s, indexDir, "doc_id", Seq(
      s.read.parquet(s"$indexDir/docs").select(col("doc_id")),
      s.read.parquet(s"$indexDir/postings").select(col("doc_id"))), ids)
  }

  /** Fold accumulated tombstones in: rewrite postings and docs WITHOUT
    * the deleted ids, REPLACE stats with one fresh row recomputed from
    * the surviving register (exact integers — the post-compact search
    * stays bit-identical to the tombstone-corrected one), clear
    * tombstones LAST so a re-run after any crash re-filters and
    * finishes. Every replacement is durable-temp + swap, never
    * overwrite-in-place.
    */
  /** The COMPACT GO/NO-GO an operator acts on (s46's postings
    * sibling, driver-gated as s51), computed from the artifacts alone
    * — zero corpus bytes. One row:
    *
    *  - `n_batches` — stats rows (one per build/append; compaction
    *    folds them — each batch is also a postings file set, so this
    *    is the fragmentation metric);
    *  - `n_tomb`/`tomb_frac` — pending tombstones: every search pays
    *    the anti-join and the dead postings bytes until a compact;
    *  - `avgdl_indexed`/`avgdl_live`/`avgdl_drift` — what compaction's
    *    stats rewrite would change. Searches already CORRECT stats
    *    via tombstones, so drift quantifies the correction, not an
    *    error;
    *  - `tomb_exceeded`/`frag_exceeded`/`compact` — the decision,
    *    both legs exposed (the s46 contract). Thresholds are a
    *    fraction and a count-of-batches — scale-invariant knobs.
    *
    * Torn-append duplicate stats rows are absorbed by the same
    * per-batch_id collapse [[search]] uses; an index with no
    * tombstones (fresh, or just compacted) reads as n_tomb = 0 and
    * decides on the fragmentation leg alone (the spec pins the flip
    * across a delete → compact cycle).
    */
  def maintenanceDecision(s: SparkSession, indexDir: String,
      tombMax: Double = Similarity.TextTombMax,
      fragMax: Long = Similarity.TextFragMax): DataFrame = {
    import s.implicits._
    val st = s.read.parquet(s"$indexDir/stats")
      .groupBy($"batch_id")
      .agg(max($"n_docs").as("n_docs"), max($"sum_len").as("sum_len"))
      .agg(count(lit(1)).as("n_batches"),
        sum($"n_docs").as("n_docs"), sum($"sum_len").as("sum_len"))
    val tombs = tombstones(s, indexDir).select($"doc_id".as("t_id"))
    val tl = s.read.parquet(s"$indexDir/docs")
      .join(broadcast(tombs), $"doc_id" === $"t_id", "left_semi")
      .agg(count(lit(1)).as("n_tomb"),
        coalesce(sum($"len"), lit(0L)).as("tomb_len"))
    val tombFrac = $"n_tomb".cast("double") / $"n_docs".cast("double")
    st.crossJoin(broadcast(tl))
      .withColumn("avgdl_indexed",
        round($"sum_len".cast("double") / $"n_docs".cast("double"), 6))
      .withColumn("avgdl_live",
        round(($"sum_len" - $"tomb_len").cast("double") /
          ($"n_docs" - $"n_tomb").cast("double"), 6))
      .select($"n_batches", $"n_docs", $"n_tomb",
        round(tombFrac, 6).as("tomb_frac"),
        $"avgdl_indexed", $"avgdl_live",
        round(abs($"avgdl_live" / $"avgdl_indexed" - 1.0d), 6)
          .as("avgdl_drift"),
        (tombFrac >= lit(tombMax)).as("tomb_exceeded"),
        ($"n_batches" >= lit(fragMax)).as("frag_exceeded"),
        (tombFrac >= lit(tombMax) ||
          $"n_batches" >= lit(fragMax)).as("compact"))
  }

  def compact(s: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val postDst = new Path(s"$indexDir/postings")
    val docsDst = new Path(s"$indexDir/docs")
    val statsDst = new Path(s"$indexDir/stats")
    val fs = postDst.getFileSystem(s.sparkContext.hadoopConfiguration)
    ArtifactSwap.recover(s, indexDir)
    Seq(postDst, docsDst, statsDst).foreach(p =>
      ArtifactSwap.recoverSwap(fs, p, new Path(p.toString + ".tmp")))
    val tomb = tombstones(s, indexDir)
    if (tomb.isEmpty) return
    val postTmp = new Path(postDst.toString + ".tmp")
    val docsTmp = new Path(docsDst.toString + ".tmp")
    val statsTmp = new Path(statsDst.toString + ".tmp")
    val post = s.read.parquet(postDst.toString)
    post.join(tomb, Seq("doc_id"), "left_anti")
      .select((post.columns.filter(_ != "tb").map(col) :+
        col("tb").cast("long").as("tb")): _*)
      .write.mode("overwrite").partitionBy("tb").parquet(postTmp.toString)
    val docs = s.read.parquet(docsDst.toString)
    val kept = docs.join(tomb, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("len"), col("db").cast("long").as("db"))
    kept.write.mode("overwrite").partitionBy("db").parquet(docsTmp.toString)
    // recomputed from the TEMP register: the swapped-in stats row must
    // describe exactly the doc rows that swap in beside it
    s.read.parquet(docsTmp.toString)
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
      .withColumn("batch_id", lit("compact"))
      .coalesce(1).write.mode("overwrite").parquet(statsTmp.toString)
    ArtifactSwap.swapDirs(fs, postTmp, postDst)
    ArtifactSwap.swapDirs(fs, docsTmp, docsDst)
    ArtifactSwap.swapDirs(fs, statsTmp, statsDst)
    fs.delete(new Path(s"$indexDir/tombstones"), true)
  }

  /** Incremental ingest: index a (doc_id, text) delta. doc_ids already
    * registered are skipped (one anti-join against the PRUNED register
    * buckets the batch hashes into), so re-running the same append is
    * a no-op — the at-least-once absorption contract.
    *
    * Write ORDER is the crash-safety contract, and it differs from
    * DedupIndex's because postings rows feed a SUM (a duplicate would
    * corrupt scores, not just re-confirm existence): postings FIRST,
    * stats second, the docs register LAST. A crash anywhere before the
    * register leaves the batch unregistered, so the re-run recomputes
    * the SAME `fresh` set and rewrites — producing byte-identical
    * duplicate postings rows (absorbed by [[search]]'s per-(doc, term)
    * collapse) and a duplicate stats row with the SAME deterministic
    * batch_id (absorbed by its dropDuplicates). The registered state
    * is only ever reached with both other artifacts complete.
    */
  def append(s: SparkSession, indexDir: String, batch: DataFrame): Unit = {
    import s.implicits._
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/postings", s"$indexDir/docs")
    ArtifactSwap.clearOrphanTombstones(s, indexDir, "doc_id", Seq(
      s.read.parquet(s"$indexDir/docs").select($"doc_id"),
      s.read.parquet(s"$indexDir/postings").select($"doc_id")))
    val docsTbl = s.read.parquet(s"$indexDir/docs")
    // register lookup pruned to the batch's own hash buckets (tiny
    // driver-side key set → listing-time partition filter)
    val dbs = batch.select(docBucket($"doc_id")).distinct()
      .collect().map(_.getLong(0))
    val dbLits: Seq[Any] =
      if (docsTbl.schema("db").dataType ==
          org.apache.spark.sql.types.IntegerType) dbs.toSeq.map(_.toInt)
      else dbs.toSeq
    val existing = docsTbl
      .filter(if (dbLits.isEmpty) lit(false) else $"db".isin(dbLits: _*))
      .select($"doc_id")
    // eager: all three writes below must see the PRE-append membership
    // and the same fresh set (the AnnIndex.upsert corruption mode)
    val fresh = batch.select($"doc_id", $"text")
      .join(existing, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (fresh.isEmpty) return
    // deterministic batch id: same unregistered fresh set -> same id,
    // so the torn-retry duplicate stats row deduplicates at read
    val batchId = fresh
      .agg(md5(concat_ws(",", sort_array(collect_list($"doc_id")))))
      .head().getString(0)
    postingsOf(fresh)
      .withColumn("tb", termBucket($"term"))
      .write.mode("append").partitionBy("tb").parquet(s"$indexDir/postings")
    withLen(fresh)
      .agg(count(lit(1)).as("n_docs"), sum($"len").as("sum_len"))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1).write.mode("append").parquet(s"$indexDir/stats")
    withLen(fresh).select($"doc_id", $"len")
      .withColumn("db", docBucket($"doc_id"))
      .write.mode("append").partitionBy("db").parquet(s"$indexDir/docs")
  }

  /** Search the written index: the s09 BM25 ranking (same score
    * expression, same exact-DECIMAL cross-term sum, ties to the lowest
    * doc_id) for `terms`, global top-`k`, computed from the artifacts
    * alone. Returns (doc_id, n_terms, bm25d DECIMAL) ordered by rank.
    *
    * `allow` is the filtered-search leg (the AnnIndex.search contract,
    * Lucene's filter semantics): the allowlist restricts which docs
    * may SURFACE, but df/n_corpus/avgdl stay corpus-global — a filter
    * scopes the candidate set, it does not retrain the scoring model,
    * so an allowed doc's score is IDENTICAL with or without the
    * filter (the spec pins exactly that). Applied before the per-doc
    * aggregation and the top-k cut — post-filtering under-returns at
    * selective filters, the s08 argument.
    */
  def search(s: SparkSession, indexDir: String, terms: Seq[String],
      k: Int, allow: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    scoredPostings(s, indexDir, terms, allow)
      .groupBy($"doc_id")
      .agg(sum($"sc").as("bm25d"), count(lit(1)).as("n_terms"))
      .orderBy($"bm25d".desc, $"doc_id").limit(k)
      .select($"doc_id", $"n_terms", $"bm25d")
  }

  /** Batch-query search — the request-batch form every serving tier
    * actually runs (and [[AnnIndex.search]]'s shape): `queries` is
    * (q_id, terms ARRAY<STRING>), output is each query's top-`k` as
    * (q_id, doc_id, n_terms, bm25d, rnk). The scoring core is shared
    * with the single-query form verbatim, computed ONCE over the
    * UNION of the batch's terms (the pruned postings scan amortizes
    * across queries hitting the same buckets); the per-query cut is
    * the bounded-heap TopKPerKey (k rows per query, no per-query
    * sort), ranked by one window partitioned on the real q_id key.
    * The batch's term list resolves driver-side — a request batch is
    * tiny by definition (the AnnIndex probed-cells discipline).
    */
  def searchMany(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, allow: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val qt = queries
      .select($"q_id", explode($"terms").as("term")).distinct()
      .localCheckpoint() // consumed twice: term-list resolve + the join
    val termList = qt.select($"term").distinct()
      .collect().map(_.getString(0)).toSeq
    val perQueryDoc = qt
      .join(scoredPostings(s, indexDir, termList, allow), "term")
      .groupBy($"q_id", $"doc_id")
      .agg(sum($"sc").as("bm25d"), count(lit(1)).as("n_terms"))
    val top = graft.plans.TopKPerKey(perQueryDoc, Seq("q_id"),
      struct((-$"bm25d").as("nb"), $"doc_id"), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"bm25d".desc, $"doc_id")
    top.withColumn("rnk", row_number().over(w))
      .select($"q_id", $"doc_id", $"n_terms", $"bm25d", $"rnk")
  }

  /** PHRASE search over the positional postings: top-`k` documents
    * containing the exact consecutive token sequence `phrase`, ranked
    * by occurrence count (overlapping starts count; ties to the lowest
    * doc_id). Output (doc_id, phrase_tf) in rank order. The classic
    * positional-index query BM25's bag-of-words scoring cannot
    * express: "spark window" as a phrase is NOT `spark AND window`.
    *
    * Scale shape: the postings scan prunes to the phrase terms'
    * buckets exactly like [[search]]; each phrase slot contributes one
    * per-doc positions row, the |phrase|-way join is keyed on doc_id
    * and only docs containing ALL terms survive it (the inner join IS
    * the conjunctive filter), and adjacency verification is per-row
    * array arithmetic — `array_contains(pos_i, start + i)` — never an
    * explode of more than the first slot's occurrences. Nothing
    * touches corpus text.
    */
  def searchPhrase(s: SparkSession, indexDir: String, phrase: Seq[String],
      k: Int): DataFrame = {
    import s.implicits._
    require(phrase.nonEmpty, "phrase must be non-empty")
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/postings", s"$indexDir/docs")
    val postTbl = s.read.parquet(s"$indexDir/postings")
    val tbs = phrase.distinct.toDF("term").select(termBucket($"term"))
      .distinct().collect().map(_.getLong(0))
    val tbLits: Seq[Any] =
      if (postTbl.schema("tb").dataType ==
          org.apache.spark.sql.types.IntegerType) tbs.toSeq.map(_.toInt)
      else tbs.toSeq
    val tomb = broadcast(tombstones(s, indexDir)
      .withColumnRenamed("doc_id", "del_id"))
    // torn-dup collapse: duplicate rows carry identical position
    // arrays, so max() restores the single-write value (the search
    // discipline); eagerly checkpointed (every phrase slot forks here;
    // eager closes the pending-checkpoint window AQE sub-jobs race on)
    val pruned = postTbl
      .filter(if (tbLits.isEmpty) lit(false) else $"tb".isin(tbLits: _*))
      .filter($"term".isin(phrase.distinct: _*))
      .join(tomb, $"doc_id" === $"del_id", "left_anti")
      .groupBy($"doc_id", $"term").agg(max($"pos").as("pos"))
      .localCheckpoint()
    val joined = phrase.zipWithIndex.map { case (t, i) =>
      pruned.filter($"term" === t).select($"doc_id", $"pos".as(s"pos_$i"))
    }.reduce((a, b) => a.join(b, "doc_id"))
    val adjacent = (1 until phrase.size)
      .map(i => array_contains(col(s"pos_$i"), $"st" + i))
      .foldLeft(lit(true))(_ && _)
    joined
      .withColumn("st", explode($"pos_0"))
      .filter(adjacent)
      .groupBy($"doc_id").agg(count(lit(1)).as("phrase_tf"))
      .orderBy($"phrase_tf".desc, $"doc_id").limit(k)
      .select($"doc_id", $"phrase_tf")
  }

  /** The shared scoring core: per-(doc, term) BM25 contributions for
    * `terms`, from the artifacts alone — pruned postings scan,
    * tombstone anti-join, torn-duplicate collapse, exact df,
    * stat-partial summation with exact tombstone correction, one
    * codegen'd score expression. Both search forms aggregate this.
    */
  private def scoredPostings(s: SparkSession, indexDir: String,
      terms: Seq[String], allow: Option[DataFrame]): DataFrame = {
    import s.implicits._
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/postings", s"$indexDir/docs")
    val postTbl = s.read.parquet(s"$indexDir/postings")
    // the query terms' buckets, resolved driver-side (|terms| rows)
    // into the listing-time partition filter — the read-path payoff of
    // the tb=<bucket>/ layout (the AnnIndex probed-cells discipline)
    val tbs = terms.toDF("term").select(termBucket($"term"))
      .distinct().collect().map(_.getLong(0))
    // IN-literal type must match the inferred partition column type or
    // the filter demotes to post-scan (the shared literal-type guard)
    val tbLits: Seq[Any] =
      if (postTbl.schema("tb").dataType ==
          org.apache.spark.sql.types.IntegerType) tbs.toSeq.map(_.toInt)
      else tbs.toSeq
    val tomb = broadcast(tombstones(s, indexDir)
      .withColumnRenamed("doc_id", "del_id"))
    // per-(doc, term) collapse: torn-retry duplicates are byte-identical
    // rows, so max() restores exactly the single-write values
    val tf = postTbl
      .filter(if (tbLits.isEmpty) lit(false) else $"tb".isin(tbLits: _*))
      .filter($"term".isin(terms: _*))
      .join(tomb, $"doc_id" === $"del_id", "left_anti")
      .groupBy($"doc_id", $"term")
      .agg(max($"tf").as("tf"), max($"len").as("len"))
    // exact df: a term's postings all live in its bucket, so the pruned
    // scan sees every one of them
    val df = tf.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    // live corpus stats: the summed batch partials (duplicate batch
    // rows dropped by key) minus the tombstoned docs' exact rows — all
    // integer arithmetic, so the corrected avgdl is BIT-IDENTICAL to a
    // fresh build on the reduced corpus (the spec's equivalence)
    val raw = s.read.parquet(s"$indexDir/stats")
      .dropDuplicates("batch_id")
      .agg(sum($"n_docs").as("n_raw"), sum($"sum_len").as("len_raw"))
    val docsTbl = s.read.parquet(s"$indexDir/docs")
    val tombIds = tombstones(s, indexDir)
    val delBuckets = tombIds.select(docBucket($"doc_id"))
      .distinct().collect().map(_.getLong(0))
    val dbLits: Seq[Any] =
      if (docsTbl.schema("db").dataType ==
          org.apache.spark.sql.types.IntegerType)
        delBuckets.toSeq.map(_.toInt)
      else delBuckets.toSeq
    val corr = docsTbl
      .filter(if (dbLits.isEmpty) lit(false) else $"db".isin(dbLits: _*))
      .join(broadcast(tombIds), Seq("doc_id"), "left_semi")
      .agg(coalesce(sum(lit(1L)), lit(0L)).as("n_del"),
        coalesce(sum($"len"), lit(0L)).as("len_del"))
    val stats = raw.crossJoin(corr)
      .select(($"n_raw" - $"n_del").as("n_corpus"),
        (($"len_raw" - $"len_del").cast("double") /
          ($"n_raw" - $"n_del").cast("double")).as("avgdl"))
    // the filter leg: AFTER df (the scoring model stays corpus-global
    // — see search's doc), BEFORE scoring aggregation and the cut
    val tfAllowed = allow
      .map(a => tf.join(a.select($"doc_id"), Seq("doc_id"), "left_semi"))
      .getOrElse(tf)
    tfAllowed.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("sc", expr(Similarity.bm25ScoreSql))
      .select($"doc_id", $"term", $"sc")
  }
}
