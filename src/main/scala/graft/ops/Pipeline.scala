package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Composed training-data curation pipeline (SURVEY.md §2.4): the point
  * of the individual operators is that they CHAIN — quality gate →
  * text normalization → exact dedup on the normalized fingerprint →
  * per-source accounting — in one declarative plan Catalyst optimizes
  * end to end. No counterpart in the reference (its pipeline is
  * message-in/Kinesis-out, §2.1).
  *
  * Scale posture (100 TB): the quality filter and normalization are
  * narrow maps fused into the scan's codegen stage (no materialization
  * between "stages" — a pipeline of separate jobs would pay a full
  * write+read per step); dedup is the pipeline's ONE raw-data shuffle
  * (hash on the fingerprint, with map-side partial min/count); the
  * per-source summaries shuffle only already-aggregated partials —
  * at most one row per (task, source) — and their final join is over
  * two source-keyed aggregates Catalyst broadcasts. Raw-data movement
  * is one shuffle for a four-stage pipeline, independent of corpus
  * size.
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Minimum token count for the quality gate (a real pipeline would
    * also threshold stopword/punctuation ratios — t04 computes those;
    * the gate here keeps the oracle SQL focused on the composition).
    */
  private val MinTokens = 5

  /** p10's token budget — the mixture is expressed as an allocation out
    * of a fixed sampling budget so epochs-per-source is dimensionless.
    */
  private val MixBudget = 1000000L

  /** p01's curation plan, shared by the registered query (no
    * observations — CollectMetrics is an optimizer barrier, and the
    * gated plan's pushdown/fusion shape must not depend on auditing)
    * and [[curationWithAudit]] (both observation points attached). ONE
    * definition, so the audited variant can never silently report on a
    * different pipeline than the gated one.
    *
    * Stage 1 (quality): drop docs under MinTokens whitespace tokens.
    * Stage 2 (normalize): lowercase, strip non-alphanumerics, collapse
    *   runs of spaces — the canonical near-exact-dedup normalization
    *   (catches case/punctuation-only copies d01's raw-text
    *   fingerprint misses).
    * Stage 3 (dedup): md5 fingerprint of the normalized text, keep the
    *   lowest doc_id per fingerprint (min(struct) carries the
    *   survivor's source/tokens through the same aggregation — no
    *   second join back to the corpus).
    * Stage 4 (report): per-source pass/kept/removed/token totals.
    */
  private def curationPlan(s: SparkSession, dir: String,
      gate: Option[org.apache.spark.sql.Observation],
      report: Option[org.apache.spark.sql.Observation]): DataFrame = {
    import s.implicits._
    val gated = docs(s, dir)
      .withColumn("n_toks", size(split($"text", " ")))
      .filter($"n_toks" >= MinTokens)
    val base = gate.fold(gated)(o =>
      gated.observe(o, count(lit(1)).as("n_pass_total"),
        sum($"n_toks").cast("long").as("tokens_pass_total")))
      .withColumn("fp", md5(
        trim(regexp_replace(
          regexp_replace(lower($"text"), "[^a-z0-9 ]", ""),
          " +", " "))))
    val survivors = base
      .groupBy($"fp")
      .agg(min(struct($"doc_id", $"source", $"n_toks")).as("keep"))
      .select($"keep.source".as("source"), $"keep.n_toks".as("n_toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"),
        sum($"n_toks").cast("long").as("total_tokens_kept"))
    val passed = base.groupBy($"source")
      .agg(count(lit(1)).as("n_pass"))
    // left join + coalesce: a source whose every doc lost dedup to
    // another source still reports (n_kept = 0), as the oracle does
    val rep = passed.join(survivors, Seq("source"), "left")
      .select($"source", $"n_pass",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        ($"n_pass" - coalesce($"n_kept", lit(0L))).as("n_dups_removed"),
        coalesce($"total_tokens_kept", lit(0L)).as("total_tokens_kept"))
      // report metrics attach ABOVE the presentation sort: a range
      // exchange SAMPLES its child to pick partition boundaries, so a
      // CollectMetrics below it is executed twice and double-counts
      .orderBy($"source")
    report.fold(rep)(o =>
      rep.observe(o, count(lit(1)).as("n_sources"),
        sum($"n_kept").cast("long").as("n_kept_total")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curation_pipeline" -> { (s, dir) =>
      curationPlan(s, dir, None, None)
    },

    "p02_quality_filter" -> { (s, dir) =>
      import s.implicits._
      // Gopher-style quality gate as a per-source funnel report: every
      // doc is scored on length, top-token share, and duplicate-2-gram
      // share (t11's signals), and each source reports how many docs it
      // keeps and WHY the rest fail — the accounting a curation run
      // over 100 TB must emit per shard/source to be auditable. Same
      // shuffle shape as t11 (one wordcount agg + agg-sized rejoin);
      // the funnel itself is a map-side-partial count per source. The
      // signal columns come from TextAnalysis.repetitionSignals — the
      // SAME definition t11 publishes, so the gate can never drift from
      // the published score.
      // len_fail coalesces null→true: a null-text doc (null signals
      // after repetitionSignals' left join) counts as a degenerate
      // length failure, keeping the funnel additive — every doc lands
      // in exactly one of kept/len_fail/rep_fail
      TextAnalysis.repetitionSignals(docs(s, dir))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"n_tokens" >= MinQualityTokens &&
              $"tts" <= MaxTopShare && $"dup2" <= MaxDupShare, 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(coalesce($"n_tokens" < MinQualityTokens, lit(true)), 1L)
            .otherwise(0L)).as("n_len_fail"),
          sum(when($"n_tokens" >= MinQualityTokens &&
              ($"tts" > MaxTopShare || $"dup2" > MaxDupShare), 1L)
            .otherwise(0L)).as("n_rep_fail"))
        .orderBy($"source")
    },

    "p04_full_curation" -> { (s, dir) =>
      import s.implicits._
      // The FULL curation run, one declarative plan: Gopher-style
      // quality gate (p02's thresholds, t11's shared signal
      // definitions) → normalization fingerprint dedup (p01's stage) →
      // eval-set decontamination (d12's shingle-overlap rule, src0 as
      // the held-out benchmark) → per-source terminal accounting, every
      // doc landing in exactly one of {q_fail, dup, contaminated,
      // kept}. Shapes at 100 TB: signals + fingerprints are narrow maps
      // over the scan; dedup is one fp-keyed shuffle (q_fail docs get a
      // unique synthetic fp, so no join back is needed to carry them);
      // the eval shingle set broadcasts (benchmarks are tiny at any
      // corpus scale) and only dedup WINNERS pay the shingle explode.
      // src0 filtered BEFORE the signal computation: the source column
      // does not survive into repetitionSignals' wordcount subtree, so
      // a post-filter could not push below the explode+agg and the
      // pipeline's one raw-data shuffle would aggregate eval-source
      // docs only to drop them at the rejoin
      val d = TextAnalysis.repetitionSignals(
        docs(s, dir).filter($"source" =!= "src0"))
        // coalesce keeps the one-bucket-per-doc invariant even for a
        // null-text row (signals go null -> q_pass must be FALSE, not null)
        .withColumn("q_pass", coalesce($"n_tokens" >= MinQualityTokens &&
          $"tts" <= MaxTopShare && $"dup2" <= MaxDupShare, lit(false)))
      val withFp = d.withColumn("fp",
        when($"q_pass", md5(trim(regexp_replace(
          regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))))
          .otherwise(concat(lit("uniq-"), $"doc_id")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"fp").orderBy($"doc_id")))
      val evalSet = docs(s, dir).filter($"source" === "src0")
        .withColumn("toks", split($"text", " "))
        .select(explode(graft.functions.Shingle3($"toks")).as("sh"))
        .distinct()
      val ratios = withFp.filter($"q_pass" && $"rn" === 1)
        .select($"doc_id",
          explode(graft.functions.Shingle3($"toks")).as("sh"))
        .join(broadcast(evalSet.withColumn("hit", lit(1))), Seq("sh"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce($"hit", lit(0))).as("n_shared"))
      withFp.join(ratios, Seq("doc_id"), "left")
        .withColumn("winner", $"q_pass" && $"rn" === 1)
        .withColumn("contaminated", $"winner" &&
          ($"n_shared" / $"n_sh".cast("double") > MaxContamRatio))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!$"q_pass", 1L).otherwise(0L)).as("n_q_fail"),
          sum(when($"q_pass" && !$"winner", 1L).otherwise(0L))
            .as("n_dups_removed"),
          sum(when($"contaminated", 1L).otherwise(0L)).as("n_contaminated"),
          sum(when($"winner" && !$"contaminated", 1L).otherwise(0L))
            .as("n_kept"),
          sum(when($"winner" && !$"contaminated", $"n_tokens".cast("long"))
            .otherwise(0L)).as("total_tokens_kept"))
        .orderBy($"source")
    },

    "p05_skew_report" -> { (s, dir) =>
      import s.implicits._
      // Join-key skew audit — the pre-flight check that decides between
      // a plain shuffle join, e09/d09-style salting, or AQE skew
      // handling (RuntimeAdaptiveSpec): per-key occupancy of the
      // prospective join key, hottest keys ranked, each with its share
      // of all rows and its ratio to the mean key load (the salting
      // fan-out you'd need). One wordcount-shaped aggregation; the
      // per-key result is |keys|-sized, and the global totals ride
      // along as a broadcast single row.
      val counts = Tables.load(s, dir, "events").groupBy($"user_id")
        .agg(count(lit(1)).as("n"))
      val totals = counts.agg(sum($"n").as("total"),
        count(lit(1)).as("n_keys"))
      counts.crossJoin(broadcast(totals))
        .select($"user_id", $"n",
          round($"n" / $"total".cast("double"), 6).as("share"),
          round($"n" * $"n_keys" / $"total".cast("double"), 4)
            .as("x_mean"))
        .orderBy($"n".desc, $"user_id")
        .limit(10)
    },

    "p06_sequence_pack" -> { (s, dir) =>
      import s.implicits._
      // Concat-and-chunk sequence packing accounting — the shaping step
      // that turns a curated corpus into fixed-length training samples
      // (m06 is the binary twin): within each (source, shard) cell,
      // documents are concatenated in deterministic (doc_id) order and
      // cut into PackLen-token chunks; the per-source report rolls the
      // shards up — chunks yielded, documents straddling a chunk
      // boundary (they lose attention continuity), padding wasted at
      // shard tails. All integer arithmetic — the gate is exact by
      // construction. Scale: the running offset is a windowed sum
      // partitioned by (source, shard), NOT source alone — a single
      // giant source (the CommonCrawl case, ~90% of tokens) would
      // otherwise serialize its whole cumsum through one partition;
      // sharding inside the source is what production packers do, at
      // the documented cost of one padded tail PER SHARD instead of
      // per source.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source", $"shard").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs(s, dir)
        .select($"doc_id", $"source",
          expr(s"doc_id div $ShardDocs").as("shard"),
          when($"text".isNull, lit(0L))
            .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
        .withColumn("cum", sum($"n_toks").over(w))
        .withColumn("split_doc", $"n_toks" > 0 &&
          expr(s"(cum - n_toks) div $PackLen") =!=
          expr(s"(cum - 1) div $PackLen"))
        .groupBy($"source", $"shard")
        .agg(count(lit(1)).as("s_docs"),
          sum($"n_toks").as("s_tokens"),
          expr(s"(sum(n_toks) + $PackLen - 1) div $PackLen").as("s_chunks"),
          sum(when($"split_doc", 1L).otherwise(0L)).as("s_splits"),
          (expr(s"(sum(n_toks) + $PackLen - 1) div $PackLen") * PackLen -
            sum($"n_toks")).as("s_pad"))
        .groupBy($"source")
        .agg(sum($"s_docs").as("n_docs"),
          sum($"s_tokens").as("total_tokens"),
          sum($"s_chunks").as("n_chunks"),
          sum($"s_splits").as("n_split_docs"),
          sum($"s_pad").as("tail_pad"))
        .orderBy($"source")
    },

    "p07_source_mixture" -> { (s, dir) =>
      import s.implicits._
      // Token-budget mixture sampling — the step that turns "keep
      // everything" into a TRAINING MIX: every source is allotted an
      // equal share of the corpus token budget (the uniform case of
      // temperature-weighted mixing), oversized sources are sampled
      // down to their allotment, undersized ones keep everything. Doc
      // selection is a deterministic md5 coin per doc_id against an
      // integer threshold — reproducible across runs/engines, no RNG
      // state, and the SAME docs are chosen no matter how the corpus is
      // partitioned (the property a resumable 100 TB sampling pass
      // needs). Shapes: per-source totals are one map-side-partial agg;
      // the threshold table is sources-sized and broadcasts back; the
      // sample pass is a narrow filter over the scan.
      // the token-count frame feeds both the threshold computation and
      // the sampling pass; materialized once (3 narrow columns — far
      // below the text it derives from), so the corpus text is read
      // and tokenized a single time
      val d = docs(s, dir).select($"doc_id", $"source",
        when($"text".isNull, lit(0L))
          .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
        .localCheckpoint()
      val per = d.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("tok_s"))
      val tot = per.agg(sum($"tok_s").as("t_total"),
        count(lit(1)).as("n_src"))
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("target", expr("t_total div n_src"))
        // coin scale 2^20: md5's 8-hex-digit prefix spans 16^8 =
        // 4096 * 2^20 values, so the modulo is EXACTLY uniform — a
        // range not divisible by the scale (e.g. 16^6 mod 1e6) makes
        // low coin values ~6% likelier and over-samples every capped
        // source, and engine parity hides it (both engines compute the
        // same biased coin)
        .withColumn("thresh",
          when($"tok_s" <= $"target", lit(CoinScale)).otherwise(
            floor($"target".cast("double") / $"tok_s".cast("double") *
              lit(CoinScale.toDouble)).cast("long")))
        .select($"source", $"n_docs", $"tok_s", $"thresh")
      val kept = d.join(broadcast(rates.select($"source", $"thresh")), "source")
        .filter(expr(
          "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) " +
            s"as bigint) % $CoinScale") < $"thresh")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_sampled"),
          sum($"n_toks").as("tokens_sampled"))
      // both sides are |sources|-sized; the broadcast hint matters only
      // to the PRE-adaptive plan (the crossJoin above inflates size
      // estimates enough that static planning picks a sort-merge join)
      rates.join(broadcast(kept), Seq("source"), "left")
        .select($"source", $"n_docs", $"tok_s".as("total_tokens"),
          $"thresh",
          coalesce($"n_sampled", lit(0L)).as("n_sampled"),
          coalesce($"tokens_sampled", lit(0L)).as("tokens_sampled"))
        .orderBy($"source")
    },

    "p08_train_val_test" -> { (s, dir) =>
      import s.implicits._
      // Deterministic TRAIN/VAL/TEST assignment — the split every
      // training run needs pinned BEFORE any shuffling/packing, so that
      // re-runs, resumed jobs, and a different engine all agree on
      // which documents are held out. Same md5 coin as p07 (partition-
      // layout-independent, no RNG state); the bucket is coin % 16 with
      // a 12/2/2 carve (75 / 12.5 / 12.5 %) — 16 divides the 16⁸ coin
      // range, so the split is EXACTLY uniform, where a %-10 carve
      // inherits the 16ᵏ mod 10 = 6 remainder bias p07's comment
      // documents. Report: per (split, source) doc and char totals —
      // the table a mixture-aware training config is written from.
      // Shapes at 100 TB: one narrow projection over the scan plus one
      // (split × source)-keyed agg with map-side partials; no joins.
      docs(s, dir)
        .withColumn("b", expr(
          "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) " +
            "as bigint) % 16"))
        .withColumn("split",
          when($"b" < 12, "train").when($"b" < 14, "val").otherwise("test"))
        .groupBy($"split", $"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"split", $"source")
    },

    "p09_snapshot_drift" -> { (s, dir) =>
      import s.implicits._
      // SNAPSHOT DRIFT report — the audit run between two corpus
      // manifests before a retrain: per language, volume and length
      // shifts plus a POPULATION STABILITY INDEX over the source
      // distribution (the standard drift scalar: Σ (p_new − p_old) ·
      // ln(p_new / p_old); <0.1 stable, >0.25 investigate). The two
      // snapshots here are the even/odd doc_id halves — deterministic
      // stand-ins for yesterday's and today's manifest, which is what
      // this operator diffs in production. Laplace-smoothed shares
      // ((cnt + 1) / (n + |sources|)) keep empty cells finite, and the
      // full lang × source grid is built explicitly so both engines
      // agree on cell membership. Shapes at 100 TB: one (lang, source)
      // conditional-count agg with map-side partials; the grid, the
      // per-lang totals, and the source count are all tiny and
      // broadcast; PSI terms round to DECIMAL before the per-lang sum
      // (the t16 discipline) so term order cannot leak into the gate.
      val d = docs(s, dir).select($"lang", $"source",
        ($"doc_id" % 2 === 0).as("is_old"), $"n_chars")
      val cell = d.groupBy($"lang", $"source").agg(
        sum(when($"is_old", 1L).otherwise(0L)).as("c_old"),
        sum(when(!$"is_old", 1L).otherwise(0L)).as("c_new"))
      val grid = docs(s, dir).select($"lang").distinct()
        .crossJoin(docs(s, dir).select($"source").distinct())
      val cells = grid.join(cell, Seq("lang", "source"), "left")
        .select($"lang", $"source",
          coalesce($"c_old", lit(0L)).as("c_old"),
          coalesce($"c_new", lit(0L)).as("c_new"))
      val langTot = d.groupBy($"lang").agg(
        sum(when($"is_old", 1L).otherwise(0L)).as("n_old"),
        sum(when(!$"is_old", 1L).otherwise(0L)).as("n_new"),
        round(avg(when($"is_old", $"n_chars")), 4).as("avg_chars_old"),
        round(avg(when(!$"is_old", $"n_chars")), 4).as("avg_chars_new"))
      val nSrc = docs(s, dir)
        .agg(countDistinct($"source").as("n_src"))
      val psi = cells
        .join(broadcast(langTot.select($"lang", $"n_old", $"n_new")), "lang")
        .crossJoin(broadcast(nSrc))
        .withColumn("term", expr(psiTermSql))
        .groupBy($"lang").agg(sum($"term").as("psi_d"))
      langTot.join(psi, "lang")
        .select($"lang", $"n_old", $"n_new",
          $"avg_chars_old", $"avg_chars_new",
          round($"avg_chars_new" - $"avg_chars_old", 4).as("chars_drift"),
          expr("round(cast(psi_d as double), 6)").as("psi_sources"))
        .orderBy($"lang")
    },

    "p10_domain_mixture" -> { (s, dir) =>
      import s.implicits._
      // DOMAIN MIXTURE reweighting — the sampling table a training run
      // reads: per-source token counts, α-tempered weights
      // w ∝ tokens^α (α = 1/2: the standard temperature between
      // proportional α=1, which lets a mega-crawl drown curated
      // sources, and uniform α=0, which over-samples tiny ones), the
      // token allocation out of a fixed budget, and the implied epochs
      // over each source (>1 ⇒ that source repeats — the signal data
      // teams watch for memorization risk). Shapes at 100 TB: ONE
      // wordcount-shaped agg (map-side partials, |sources| rows out);
      // the weight normalization is a broadcast one-row total. Parity:
      // per-source sqrt is a single correctly-rounded IEEE op on an
      // exact BIGINT, rounded to DECIMAL before the cross-source sum
      // (order-insensitive); the budget allocation multiplies a
      // 6-dp-rounded weight by the integer budget in DECIMAL — exact,
      // so the BIGINT cast can't straddle engines' round-vs-truncate
      // difference; epochs is one double division rounded at the end.
      val toks = docs(s, dir)
        .groupBy($"source")
        .agg(sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
        .withColumn("w_raw", expr(
          "cast(round(sqrt(cast(n_tokens as double)), 6) " +
            "as decimal(18,6))"))
      val tot = toks.agg(sum($"w_raw").as("w_tot"))
      toks.crossJoin(broadcast(tot))
        .withColumn("weight", expr(
          "round(cast(w_raw as double) / cast(w_tot as double), 6)"))
        .withColumn("alloc_tokens", expr(
          s"cast(cast(weight as decimal(10,6)) * $MixBudget as bigint)"))
        .withColumn("epochs", expr(
          "round(cast(alloc_tokens as double) / cast(n_tokens as double), 4)"))
        .select($"source", $"n_tokens", $"weight", $"alloc_tokens",
          $"epochs")
        .orderBy($"source")
    },

    "p11_sequence_pack_bpe" -> { (s, dir) =>
      import s.implicits._
      // p06's packing arithmetic fed by TOKENIZER token counts (t23's
      // BPE merge application) instead of whitespace counts — the form
      // a real training run budgets with: chunk counts, boundary
      // splits, and tail padding all shift once ~3% of adjacent pairs
      // fuse, and THIS is the number the batch scheduler sees. Same
      // scale shape as p06 (windowed cumsum per (source, shard), never
      // per source alone); the merge application itself is a narrow
      // per-row fold (see TextAnalysis.bpeTokenCounts).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source", $"shard").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      TextAnalysis.bpeTokenCounts(s, dir)
        .select($"doc_id", $"source",
          expr(s"doc_id div $ShardDocs").as("shard"),
          $"n_bpe".as("n_toks"))
        .withColumn("cum", sum($"n_toks").over(w))
        .withColumn("split_doc", $"n_toks" > 0 &&
          expr(s"(cum - n_toks) div $PackLen") =!=
          expr(s"(cum - 1) div $PackLen"))
        .groupBy($"source", $"shard")
        .agg(count(lit(1)).as("s_docs"),
          sum($"n_toks").as("s_tokens"),
          expr(s"(sum(n_toks) + $PackLen - 1) div $PackLen").as("s_chunks"),
          sum(when($"split_doc", 1L).otherwise(0L)).as("s_splits"),
          (expr(s"(sum(n_toks) + $PackLen - 1) div $PackLen") * PackLen -
            sum($"n_toks")).as("s_pad"))
        .groupBy($"source")
        .agg(sum($"s_docs").as("n_docs"),
          sum($"s_tokens").as("total_tokens"),
          sum($"s_chunks").as("n_chunks"),
          sum($"s_splits").as("n_split_docs"),
          sum($"s_pad").as("tail_pad"))
        .orderBy($"source")
    },

    "p12_pack_manifest" -> { (s, dir) =>
      import s.implicits._
      // The packing MANIFEST — p06 reports the totals, this emits the
      // per-document assignment a packer actually writes out: which
      // chunk a doc starts in, which it ends in, its token offset
      // inside the first chunk, and whether it straddles a boundary
      // (the attention-continuity loss p06 counts). A resumable 100 TB
      // packing job is driven by exactly this table: deterministic
      // under any partitioning (windowed cumsum over a total
      // per-(source, shard) order), all-integer so the gate is exact.
      // Zero-token docs (null text) are excluded — they occupy no
      // chunk space and have no well-defined offset.
      // NOTE: chunk ids are scoped to their (source, shard) cumsum
      // partition — the manifest KEY is (source, shard, chunk), and a
      // consumer joining on chunk alone would collide across shards.
      // That scoping is deliberate: it is what keeps the manifest
      // deterministic under any partitioning AND lets shards pack in
      // parallel with no cross-shard coordination; a globally unique id
      // is one concat away for consumers that need it.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source", $"shard").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs(s, dir)
        .select($"doc_id", $"source",
          expr(s"doc_id div $ShardDocs").as("shard"),
          when($"text".isNull, lit(0L))
            .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
        .withColumn("cum", sum($"n_toks").over(w))
        .filter($"n_toks" > 0)
        .select($"doc_id", $"source", $"shard", $"n_toks",
          expr(s"(cum - n_toks) div $PackLen").as("chunk_first"),
          expr(s"(cum - 1) div $PackLen").as("chunk_last"),
          expr(s"(cum - n_toks) % $PackLen").as("offset_in_chunk"))
        .withColumn("spans_boundary", $"chunk_first" =!= $"chunk_last")
        .orderBy($"doc_id")
    },

    "p21_pack_artifact_serving" -> { (s, dir) =>
      import s.implicits._
      // The PHYSICAL pack under the driver's gate: Layout.packWrite
      // materialized p13's slice manifest once per JVM
      // (ServingIndexes.pack), and this row aggregates the WRITTEN
      // files — per-chunk slice count, token sum, and an
      // order-insensitive content fingerprint (md5 over the sorted
      // per-slice digests, packReconcile's audit columns) — against
      // the manifest arithmetic recomputed from raw documents. A
      // dropped, duplicated or corrupted slice in the physical layout
      // flips the hash. Scale: one aggregation over the pack files,
      // grouped on the (source, shard, chunk) key they are sorted by.
      s.read.parquet(ServingIndexes.pack(s, dir))
        .groupBy($"source", $"shard", $"chunk")
        .agg(count(lit(1)).as("n_slices"),
          sum($"n_slice_toks").as("n_toks"),
          md5(concat_ws(",", sort_array(collect_list(concat_ws(":",
            $"doc_id", $"chunk_off", $"slice_md5"))))).as("chunk_fp"))
        .orderBy($"source", $"shard", $"chunk")
    },

    "p22_pack_balance_audit" -> { (s, dir) =>
      import s.implicits._
      // p21's OPERATIONAL sibling: the shard-balance audit a training
      // job reads before launching — per physical (source, shard)
      // group of the WRITTEN pack: chunk/slice/token totals and token
      // share, plus the global STRAGGLER RATIO (max shard tokens over
      // the mean) and its go/no-go flag. Data-parallel training steps
      // at the pace of the slowest shard, so the ratio IS the step-
      // time overhead a skewed pack costs (1.5 = "the slowest worker
      // runs 50% over the mean" — past that, repack). Balance here is
      // decided by packWrite's range partitioning on (source, shard,
      // chunk, chunk_off); a regression there (one range swallowing
      // two shards, a dropped group) moves counts, shares AND the
      // ratio — all hashed. Scale: one aggregation over the pack
      // files on their own sort key, a 1-row global, a broadcast.
      val per = s.read.parquet(ServingIndexes.pack(s, dir))
        .groupBy($"source", $"shard")
        .agg(countDistinct($"chunk").as("n_chunks"),
          count(lit(1)).as("n_slices"),
          sum($"n_slice_toks").as("n_toks"))
      val tot = per.agg(sum($"n_toks").as("tot_toks"),
        count(lit(1)).as("n_groups"),
        max($"n_toks").as("max_toks"))
      val ratio = $"max_toks".cast("double") /
        ($"tot_toks".cast("double") / $"n_groups".cast("double"))
      per.crossJoin(broadcast(tot))
        .select($"source", $"shard", $"n_chunks", $"n_slices", $"n_toks",
          round($"n_toks".cast("double") / $"tot_toks".cast("double"), 6)
            .as("tok_share"),
          round(ratio, 6).as("straggler_ratio"),
          (ratio <= lit(1.5)).as("balanced"))
        .orderBy($"source", $"shard")
    },

    "p24_ingest_file_curve" -> { (s, dir) =>
      import s.implicits._
      // THE SMALL-FILES LEVER — streaming ingest's trigger interval
      // priced as a gated curve. A micro-batch sink writes one file
      // per (day partition, trigger epoch) that saw data, so the
      // trigger is a latency-vs-file-count trade: per candidate
      // interval (1 min / 10 min / 1 h) the card reports the files a
      // day-partitioned events sink would write, mean rows per file,
      // the share of files under the compaction target, the
      // bin-packed file count a compaction pass would leave
      // (per-day ceil(rows/target) — rows can't cross the partition
      // boundary), and the write amplification a later OPTIMIZE pays
      // (written/packed). The latency SLO is the external input; the
      // curve is what each second of allowed latency buys in file
      // count — the number behind "compact hourly" runbooks. Scale
      // shapes: one narrow 2-column scan, per-row 3-way trigger
      // fan-out, then two map-side-partial aggregations whose group
      // counts are calendar-bounded (days x epochs), never
      // corpus-bounded; everything downstream of the first agg is
      // tiny. All-integer arithmetic plus 6-dp dyadic shares.
      val triggers = Seq(60L, 600L, 3600L)
      Tables.load(s, dir, "events")
        .select(to_date($"ts").cast("string").as("day"),
          unix_micros($"ts").as("us"))
        .select(explode(array(triggers.map(t =>
          struct(lit(t).as("trigger_s"),
            expr(s"us div ${t * 1000000L}").as("epoch"))): _*)).as("tk"),
          $"day")
        .groupBy($"tk.trigger_s".as("trigger_s"), $"day", $"tk.epoch")
        .agg(count(lit(1)).as("f_rows"))
        .groupBy($"trigger_s", $"day")
        .agg(count(lit(1)).as("d_files"), sum($"f_rows").as("d_rows"),
          sum(when($"f_rows" < IngestTargetRows, 1L).otherwise(0L))
            .as("d_small"),
          expr(s"(sum(f_rows) + $IngestTargetRows - 1) div " +
            s"$IngestTargetRows").as("d_packed"))
        .groupBy($"trigger_s")
        .agg(sum($"d_files").as("n_files"), sum($"d_rows").as("total_rows"),
          round(sum($"d_rows") / sum($"d_files").cast("double"), 6)
            .as("rows_per_file"),
          round(sum($"d_small") / sum($"d_files").cast("double"), 6)
            .as("small_share"),
          sum($"d_packed").as("packed_files"),
          round(sum($"d_files") / sum($"d_packed").cast("double"), 6)
            .as("amplification"))
        .orderBy($"trigger_s")
    },

    "p23_layout_scan_fraction" -> { (s, dir) =>
      import s.implicits._
      // The STORAGE-LAYOUT lever measured as a gated number — the
      // decision row behind Layout.zorderWrite. A 100 TB fact table is
      // queried along two independent axes (here the event stream's
      // two: time and user); the layout chosen at WRITE time decides
      // how many files a predicate on each axis must READ, because
      // parquet footer pruning works exactly when that column's
      // per-file [min,max] is tight. Model (all-integer, so the curve
      // hash-gates): both axes normalize into 16-bit buckets
      // (Layout.zorderValue's arithmetic, bounds from the data's own
      // min/max), 64 equal-width files are carved from the sort key of
      // each candidate layout — time-sorted (streaming ingest's natural
      // order), user-sorted, and Z-ORDER (the native ZOrder64 Morton
      // interleave the physical writer uses, top 6 of 32 z-bits) — and
      // each of 8 fixed probe ranges per axis (1/16 of the bucket
      // domain wide) counts the files whose [min,max] on that axis
      // overlap it. Scale shape: ONE narrow corpus scan (2 columns), a
      // per-row 3-way fan-out, one ≤192-group aggregation with map-side
      // partials; the probe join and the curve are broadcast-tiny. The
      // result is the standard one, now a measured fixture fact: each
      // single-column sort prunes hard on its own axis and reads ~every
      // file on the other, z-order pays a modest factor on each axis to
      // prune on BOTH — the quantified "why" for paying the
      // z-interleave at write time.
      val ev = Tables.load(s, dir, "events")
        .filter($"ts".isNotNull && $"user_id".isNotNull)
        .select(unix_micros($"ts").as("a"), $"user_id".as("b"))
      val bounds = ev.agg(min($"a").as("alo"), max($"a").as("ahi"),
        min($"b").as("blo"), max($"b").as("bhi"))
      def b16(c: Column, lo: Column, hi: Column): Column =
        floor((c - lo).cast("double") / greatest(hi - lo, lit(1L)) *
          65535.0).cast("long")
      val bk = ev.crossJoin(broadcast(bounds))
        .select(b16($"a", $"alo", $"ahi").as("a16"),
          b16($"b", $"blo", $"bhi").as("b16"))
        .withColumn("z", graft.functions.ZOrder64($"a16", $"b16"))
      val perFile = bk
        .select(explode(array(
          struct(lit("ts_sort").as("layout"),
            shiftright($"a16", 10).as("file_id")),
          struct(lit("user_sort").as("layout"),
            shiftright($"b16", 10).as("file_id")),
          struct(lit("zorder").as("layout"),
            shiftright($"z", 26).as("file_id")))).as("lf"),
          $"a16", $"b16")
        .select($"lf.layout".as("layout"), $"lf.file_id".as("file_id"),
          $"a16", $"b16")
        .groupBy($"layout", $"file_id")
        .agg(min($"a16").as("min_a"), max($"a16").as("max_a"),
          min($"b16").as("min_b"), max($"b16").as("max_b"))
      val nf = perFile.groupBy($"layout").agg(count(lit(1)).as("n_files"))
      val probes = (for { ax <- Seq("time", "user"); j <- 0 until 8 }
        yield (ax, j.toLong, j * 8192L, j * 8192L + 4095L))
        .toDF("axis", "probe", "plo", "phi")
      val hits = perFile.crossJoin(broadcast(probes))
        .select($"layout", $"axis", $"probe",
          when($"axis" === "time", $"min_a").otherwise($"min_b").as("mn"),
          when($"axis" === "time", $"max_a").otherwise($"max_b").as("mx"),
          $"plo", $"phi")
        .groupBy($"layout", $"axis", $"probe")
        .agg(sum(when($"mn" <= $"phi" && $"mx" >= $"plo", 1L)
          .otherwise(0L)).as("files_read"))
      hits.groupBy($"layout", $"axis")
        .agg(round(avg($"files_read"), 4).as("avg_files_read"))
        .join(nf, "layout")
        .select($"layout", $"axis", $"n_files", $"avg_files_read",
          round($"avg_files_read" / $"n_files", 6).as("read_frac"))
        .orderBy($"layout", $"axis")
    },

    "p13_pack_slices" -> { (s, dir) =>
      import s.implicits._
      // The physical packing p12 describes: ONE ROW PER (document ×
      // chunk) SLICE — the unit a pack writer materializes. A doc
      // spanning chunks [chunk_first..chunk_last] contributes one slice
      // per chunk; slice boundaries follow from the manifest arithmetic
      // alone (global token start g0 = chunk_first·PackLen +
      // offset_in_chunk), and each slice carries the md5 of its actual
      // token text, so a written pack can be reconciled against the
      // manifest byte-for-byte (Layout.packReconcile). Within a chunk,
      // slices tile [0, PackLen) contiguously: (source, shard, chunk,
      // chunk_off) is a unique key and every chunk except a shard's
      // last sums to exactly PackLen tokens — PackWriteSpec proves both
      // from written files. Scale shape: the explode fans each doc out
      // to its 1 + spans count slices (bounded by n_toks/PackLen), all
      // arithmetic is per-row after the one windowed cumsum p12 already
      // pays, and the slice md5 reads each doc's text once in task.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source", $"shard").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs(s, dir)
        .select($"doc_id", $"source",
          expr(s"doc_id div $ShardDocs").as("shard"), $"text",
          when($"text".isNull, lit(0L))
            .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
        .withColumn("cum", sum($"n_toks").over(w))
        .filter($"n_toks" > 0)
        .withColumn("g0", $"cum" - $"n_toks")
        .select($"doc_id", $"source", $"shard", $"text", $"n_toks", $"g0",
          explode(expr(
            s"sequence(g0 div $PackLen, (cum - 1) div $PackLen)"))
            .as("chunk"))
        .withColumn("lo",
          greatest(lit(0L), expr(s"chunk * $PackLen") - $"g0"))
        .withColumn("hi",
          least($"n_toks", expr(s"(chunk + 1) * $PackLen") - $"g0"))
        .withColumn("chunk_off",
          greatest(lit(0L), $"g0" - expr(s"chunk * $PackLen")))
        .withColumn("slice_md5", md5(array_join(expr(
          "slice(split(text, ' '), cast(lo + 1 as int), " +
            "cast(hi - lo as int))"), " ")))
        .select($"source", $"shard", $"chunk", $"chunk_off", $"doc_id",
          ($"hi" - $"lo").as("n_slice_toks"), $"slice_md5")
        .orderBy($"source", $"shard", $"chunk", $"chunk_off")
    },

    "p15_source_data_card" -> { (s, dir) =>
      import s.implicits._
      // The per-source DATA CARD — the one-table summary a data team
      // publishes (and a mixture designer reads) before any training
      // run touches a source: volume (docs/tokens/avg length), hygiene
      // (exact-dup rate by d01's global first-wins rule, within-doc
      // repetition by t25's ratio thresholds), and language makeup
      // (distinct langs + dominant-language share). One row per
      // source; every column re-derivable, so the card can never
      // drift from the corpus it describes. Scale: four independent
      // wordcount-shaped aggregates over one corpus read, joined on
      // the |sources|-sized key — the fp window is partitioned by
      // fingerprint (d01's shape), the shingle agg is t25's, nothing
      // is quadratic.
      val d = docs(s, dir)
        .select($"doc_id", $"source", $"lang", $"n_chars", $"text")
      val base = d.groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("n_tokens"),
        round(avg($"n_chars"), 2).as("avg_chars"))
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy($"fp").orderBy($"doc_id")
      val dup = d.select($"source", $"doc_id",
          md5(lower($"text")).as("fp"))
        .withColumn("rn", row_number().over(wFp))
        .filter($"rn" > 1)
        .groupBy($"source").agg(count(lit(1)).as("n_exact_dups"))
      // t25's scoring core verbatim (shared seam — the thresholds
      // live in ONE place, TextAnalysis.repetitionScoreOf)
      val rep = TextAnalysis.repetitionScoreOf(d, Seq("source", "doc_id"))
        .filter($"repetitive")
        .groupBy($"source").agg(count(lit(1)).as("n_repetitive"))
      val langs = d.groupBy($"source", $"lang")
        .agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_langs"), max($"c").as("top_lang_c"))
      base
        .join(dup, Seq("source"), "left")
        .join(rep, Seq("source"), "left")
        .join(langs, Seq("source"))
        .select($"source", $"n_docs", $"n_tokens", $"avg_chars",
          coalesce($"n_exact_dups", lit(0L)).as("n_exact_dups"),
          coalesce($"n_repetitive", lit(0L)).as("n_repetitive"),
          $"n_langs",
          round($"top_lang_c" / $"n_docs".cast("double"), 6)
            .as("top_lang_share"))
        .orderBy($"source")
    },

    "p16_curriculum_mixture" -> { (s, dir) =>
      import s.implicits._
      // CURRICULUM mixing — the per-EPOCH form of p10's temperature
      // table: public LLM practice ANNEALS the mixture over training
      // (start near the natural token distribution so abundant data
      // sets the early gradient, end flatter so curated sources
      // aren't drowned late). The alpha ladder 1 -> 1/2 -> 0
      // (proportional, sqrt-tempered, uniform) is deliberately the
      // engine-exact set — identity, one correctly-rounded IEEE sqrt,
      // constant (the p10/libm discipline; intermediate alphas need
      // pow, which does not cross engines). Each epoch draws an
      // INDEPENDENT deterministic sample: the md5 coin is keyed
      // (epoch, doc_id), so epoch composition is reproducible from
      // the schedule alone with no RNG state, and a doc can serve
      // some epochs and sit out others. Scale: ONE tokenize agg
      // (wordcount shape); the schedule math lives on a
      // |sources|x|epochs| frame; the sample pass fans the narrow
      // (doc_id, source, n_toks) projection out |epochs|x through a
      // broadcast threshold join — no shuffle grows with the corpus.
      val d = docs(s, dir).select($"doc_id", $"source",
        when($"text".isNull, lit(0L))
          .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
        .localCheckpoint()
      val toks = d.groupBy($"source").agg(sum($"n_toks").as("n_tokens"))
      // the per-epoch budget is CORPUS-RELATIVE (half the corpus
      // tokens), not an absolute count: an absolute budget saturates
      // every threshold at small SFs and starves them at large ones —
      // the t24 degeneracy — while a fraction keeps the sampling LIVE
      // (some sources capped, some kept whole) at any scale
      val tot = toks.agg(sum($"n_tokens").as("t_total"))
      val sched = toks.crossJoin(broadcast(
          s.createDataset(Seq(0, 1, 2)).toDF("epoch")))
        .withColumn("alpha", expr("cast(1.0 - epoch * 0.5 as double)"))
        .withColumn("w_raw", expr(
          """cast(round(CASE WHEN epoch = 0 THEN cast(n_tokens as double)
            |  WHEN epoch = 1 THEN sqrt(cast(n_tokens as double))
            |  ELSE 1.0 END, 6) as decimal(24,6))""".stripMargin))
      val et = sched.groupBy($"epoch").agg(sum($"w_raw").as("w_tot"))
      val plan = sched.join(broadcast(et), "epoch")
        .crossJoin(broadcast(tot))
        .withColumn("weight", expr(
          "round(cast(w_raw as double) / cast(w_tot as double), 6)"))
        // floor(weight * budget) in EXACT integer arithmetic: the 6-dp
        // weight scales to the integer w6 = weight*1e6, and the
        // two-term decomposition w6*(b div 1e6) + w6*(b mod 1e6) div
        // 1e6 equals floor(w6*b/1e6) exactly (first term is integer)
        // while keeping every product under 2^63 — no double rounding,
        // no decimal-cast round-vs-truncate straddle (the p10 lesson,
        // generalized to a non-constant budget)
        .withColumn("w6", expr(
          "cast(cast(weight as decimal(10,6)) * 1000000 as bigint)"))
        .withColumn("budget", expr("t_total div 2"))
        .withColumn("alloc_tokens", expr(
          "w6 * (budget div 1000000) + " +
            "(w6 * (budget % 1000000)) div 1000000"))
        .withColumn("thresh",
          when($"alloc_tokens" >= $"n_tokens", lit(CoinScale)).otherwise(
            floor($"alloc_tokens".cast("double") /
              $"n_tokens".cast("double") * lit(CoinScale.toDouble))
              .cast("long")))
      val kept = d
        .join(broadcast(plan.select($"epoch", $"source", $"thresh")),
          "source")
        .filter(expr(
          "cast(conv(substr(md5(concat(epoch, ':', doc_id)), 1, 8), " +
            s"16, 10) as bigint) % $CoinScale") < $"thresh")
        .groupBy($"epoch", $"source")
        .agg(count(lit(1)).as("n_sampled"),
          sum($"n_toks").as("tokens_sampled"))
      plan.join(kept, Seq("epoch", "source"), "left")
        .select($"epoch", $"alpha", $"source", $"n_tokens", $"weight",
          $"alloc_tokens", $"thresh",
          coalesce($"n_sampled", lit(0L)).as("n_sampled"),
          coalesce($"tokens_sampled", lit(0L)).as("tokens_sampled"))
        .orderBy($"epoch", $"source")
    },

    "p17_quality_operating_curve" -> { (s, dir) =>
      import s.implicits._
      // The QUALITY-GATE OPERATING CURVE — the d23/s25 measured-knob
      // discipline applied to p02's Gopher cuts: every combination of
      // halved/shipped/doubled thresholds for (min tokens, max
      // top-token share, max duplicate-2-gram share) scored corpus-
      // wide in ONE query, so the shipped (20, 0.15, 0.05) point is a
      // bracketed, measured choice with its neighbors' kept-fractions
      // on the table — the sensitivity report a data team reads
      // before tightening a gate over 100 TB. Scale: the signals pay
      // their single wordcount shuffle ONCE (the t11/p02 shared
      // definition); the 27-config fan-out rides the NARROW per-doc
      // signal projection and collapses immediately in a map-side
      // partial agg keyed by the 27-row config triple.
      val grid = for {
        mt <- Seq(MinQualityTokens / 2, MinQualityTokens,
          MinQualityTokens * 2)
        tc <- Seq(MaxTopShare * 0.5, MaxTopShare, MaxTopShare * 2)
        dc <- Seq(MaxDupShare * 0.5, MaxDupShare, MaxDupShare * 2)
      } yield (mt, tc, dc)
      val sig = TextAnalysis.repetitionSignals(docs(s, dir))
        .select($"doc_id", $"n_tokens", $"tts", $"dup2")
      sig.crossJoin(broadcast(
          grid.toDF("min_tokens", "max_tts", "max_dup2")))
        .groupBy($"min_tokens", $"max_tts", $"max_dup2")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"n_tokens" >= $"min_tokens" &&
              $"tts" <= $"max_tts" && $"dup2" <= $"max_dup2", 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(coalesce($"n_tokens" < $"min_tokens", lit(true)), 1L)
            .otherwise(0L)).as("n_len_fail"),
          sum(when($"n_tokens" >= $"min_tokens" &&
              ($"tts" > $"max_tts" || $"dup2" > $"max_dup2"), 1L)
            .otherwise(0L)).as("n_rep_fail"))
        .withColumn("kept_frac",
          round($"n_kept" / $"n_docs".cast("double"), 6))
        .withColumn("shipped",
          $"min_tokens" === MinQualityTokens &&
            $"max_tts" === MaxTopShare && $"max_dup2" === MaxDupShare)
        .select($"min_tokens", $"max_tts", $"max_dup2", $"n_docs",
          $"n_kept", $"kept_frac", $"n_len_fail", $"n_rep_fail",
          $"shipped")
        .orderBy($"min_tokens", $"max_tts", $"max_dup2")
    },

    "p18_token_budget_epochs" -> { (s, dir) =>
      import s.implicits._
      // TOKEN-BUDGET EPOCH PLANNING — the accounting a data-constrained
      // training run does before launch: given a total token budget
      // LARGER than the corpus (EpochBudgetX × corpus tokens — the
      // over-training regime where data repeats), split it across
      // sources by a temperature-weighted share (α = 1/2, i.e. sqrt —
      // upweights small sources; sqrt is the one temperature that is
      // IEEE-correctly-rounded in every engine, the t-family lesson),
      // and report how many EPOCHS of each source the plan implies.
      // Sources pushed past MaxSourceEpochs passes are capped there —
      // the public data-constrained-scaling guidance that value is
      // drawn from puts the knee where repeated data stops buying
      // loss — and the unfillable remainder is reported as shortfall
      // the operator must cover elsewhere. Shapes at 100 TB: one
      // token-count agg with map-side partials; everything after is
      // arithmetic on a |sources|-row frame against one broadcast
      // total. Parity: the sqrt weights round to DECIMAL before the
      // denominator sum (order-insensitive); the capped flag compares
      // INTEGER token counts (alloc > 4·tok_s), never the rounded
      // epochs float, so flag and shortfall can't disagree.
      val d = docs(s, dir).select($"lang",
        when($"text".isNull, lit(0L))
          .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
      val per = d.groupBy($"lang").agg(sum($"n_toks").as("tok_s"))
        .withColumn("sq",
          round(sqrt($"tok_s".cast("double")), 6).cast("decimal(28,6)"))
      val tot = per.agg(sum($"sq").as("denom"), sum($"tok_s").as("t_total"))
      per.crossJoin(broadcast(tot))
        .withColumn("w_share",
          round($"sq".cast("double") / $"denom".cast("double"), 6))
        .withColumn("alloc_tokens",
          floor($"w_share" *
            ($"t_total" * lit(EpochBudgetX)).cast("double")).cast("long"))
        .withColumn("capped",
          $"alloc_tokens" > $"tok_s" * lit(MaxSourceEpochs))
        .withColumn("achieved_tokens",
          least($"alloc_tokens", $"tok_s" * lit(MaxSourceEpochs)))
        .select($"lang", $"tok_s".as("total_tokens"), $"w_share",
          $"alloc_tokens",
          round($"alloc_tokens" / $"tok_s".cast("double"), 4).as("epochs"),
          $"capped", $"achieved_tokens",
          ($"alloc_tokens" - $"achieved_tokens").as("shortfall_tokens"))
        .orderBy($"lang")
    },

    "p14_epoch_shuffle" -> { (s, dir) =>
      import s.implicits._
      // SEEDED EPOCH SHUFFLE — the dataloader's data-order contract:
      // each training epoch consumes the packed chunks in a fresh
      // deterministic permutation, reproducible from the manifest
      // alone (epoch-keyed md5 of the chunk's identity; changing the
      // epoch reshuffles, re-running doesn't). The ORDER IS THE KEY:
      // consumption order is ORDER BY (epoch, skey), which
      // range-partitions at any scale — deliberately NO materialized
      // rank column, because ranking per epoch would be a
      // |epochs|-partition window whose two giant sorted tasks are
      // exactly the shape the board bans; a loader that wants ranks
      // zips them per range shard (the SortedExport pattern). Chunk
      // identities derive from p06's packing arithmetic (one agg per
      // (source, shard), then a sequence explode), so the manifest is
      // a pure function of the corpus, spec-pinned deterministic under
      // repartitioning (PipelineSpec).
      epochShuffleStream(s, dir).orderBy($"epoch", $"skey")
    },

    "p20_length_bucket_curve" -> { (s, dir) =>
      import s.implicits._
      // SEQUENCE-LENGTH BUCKETING CURVE — the measured-knob table for
      // the batching trick every trainer uses: group documents into
      // length buckets before batching, because a batch pads every
      // sequence to its longest member and mixed-length batches burn
      // compute on pad tokens. The padding cost of a bucketing is
      // BOUNDED ANALYTICALLY — within a bucket, any batch pads to at
      // most the bucket's max length, so padded <= n_docs·max_len per
      // bucket regardless of which docs land in which batch — and that
      // bound is exactly what this query measures per bucket width
      // (none / 64-token / 16-token): real tokens, worst-case padded
      // tokens, waste fraction, plus bucket/batch counts for the
      // scheduler. Deliberately NO batch assignment and NO rank: the
      // bound needs only per-bucket (count, max, sum) — three
      // map-side-partial aggregates on a narrow length frame fanned
      // out over a 3-row broadcast config table; the no-bucketing row
      // degenerates to the corpus-wide 1 − mean/max, the number that
      // justifies bucketing at all. The tail-batch inflation real
      // loaders see on top of this bound is batch-size policy, not
      // bucketing, and stays out of the measurement on purpose.
      val lens = docs(s, dir).filter($"text".isNotNull)
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("len"))
      val cfgs = Seq(("none", 1073741824L), ("w64", 64L), ("w16", 16L))
        .toDF("config", "bucket_width")
      lens.crossJoin(broadcast(cfgs))
        .withColumn("bucket", expr("len div bucket_width"))
        .groupBy($"config", $"bucket_width", $"bucket")
        .agg(count(lit(1)).as("n"), max($"len").as("mx"),
          sum($"len").as("rl"))
        .groupBy($"config", $"bucket_width")
        .agg(count(lit(1)).as("n_buckets"),
          sum($"n").as("n_docs"),
          sum(expr(s"(n + $BucketBatchDocs - 1) div $BucketBatchDocs"))
            .as("n_batches"),
          sum($"rl").as("real_tokens"),
          sum($"n" * $"mx").as("padded_tokens"))
        .withColumn("waste_frac", round(lit(1.0) -
          $"real_tokens" / $"padded_tokens".cast("double"), 6))
        .orderBy($"config")
    },

    "p19_resume_plan" -> { (s, dir) =>
      import s.implicits._
      // TRAINING-RUN RESUME PLAN — the crash-recovery arithmetic p14's
      // shuffle contract enables: a synchronous data-parallel run with
      // ResumeWorkers loaders crashed after ResumeSteps completed
      // steps; each worker owns a deterministic HASH SLICE of the
      // chunk stream (md5-coin of the chunk's identity — not its
      // position, so a chunk keeps its worker across epochs and
      // corpus appends don't reshuffle old slices) and consumes its
      // slice in p14's (epoch, skey) order, one chunk per step. The
      // resume point per worker is therefore the (steps+1)-th smallest
      // (epoch, skey) in its slice — an ORDER STATISTIC, computed with
      // the board's bounded-heap TopKPerKey (heap of steps+1 rows per
      // worker, no global rank, no per-worker sort of the whole
      // stream) and finished by one max(struct) argmax. Exhausted
      // workers (slice shorter than steps+1 — end of the data) emit no
      // row, identically in both engines. This is the piece that makes
      // the p14 discipline operational: reproducible order AND
      // O(W · steps) recovery, no loader-state archaeology.
      val stream = epochShuffleStream(s, dir)
        .withColumn("worker", expr(
          "cast(conv(substr(md5(concat_ws(':', 'w', source, shard, " +
            s"chunk)), 1, 8), 16, 10) as bigint) % $ResumeWorkers"))
      val firstN = graft.plans.TopKPerKey(stream, Seq("worker"),
        struct($"epoch", $"skey"), ResumeSteps + 1)
      firstN.groupBy($"worker")
        .agg(count(lit(1)).as("n_avail"),
          max(struct($"epoch", $"skey", $"source", $"shard", $"chunk"))
            .as("r"))
        .filter($"n_avail" === ResumeSteps + 1)
        .select($"worker",
          $"r.epoch".as("resume_epoch"), $"r.skey".as("resume_skey"),
          $"r.source".as("resume_source"), $"r.shard".as("resume_shard"),
          $"r.chunk".as("resume_chunk"),
          lit(ResumeSteps.toLong).as("steps_done"))
        .orderBy($"worker")
    },

    "p03_corpus_profile" -> { (s, dir) =>
      import s.implicits._
      // Corpus profiling in ONE pass — the data-quality snapshot every
      // curation run starts from: row/null counts, key cardinalities,
      // and the length distribution. All partial-aggregable; the two
      // countDistincts expand map-side and combine at the reducer, so
      // the pass stays a single scan at any corpus size (HLL sketch
      // variants of the cardinalities are e11's territory when exact
      // counts stop being worth their shuffle width).
      docs(s, dir).agg(
        count(lit(1)).as("n_docs"),
        sum(when($"text".isNull, 1L).otherwise(0L)).as("n_null_text"),
        countDistinct($"lang").as("n_langs"),
        countDistinct($"source").as("n_sources"),
        min($"n_chars").as("min_chars"),
        percentile($"n_chars", lit(0.5)).as("med_chars"),
        max($"n_chars").as("max_chars"),
        round(avg(size(split($"text", " "))), 4).as("avg_tokens"))
    })

  /** p02 gate thresholds: token floor, max top-token share, max
    * duplicate-2-gram share (Gopher-style repetition rules; tuned to
    * split the fixture non-trivially — 344 kept / 43 length-fail /
    * 113 repetition-fail at sf0.01).
    */
  private val MinQualityTokens = 20
  private val MaxTopShare = 0.15
  private val MaxDupShare = 0.05

  /** p04's decontamination rule: a dedup winner is dropped when more
    * than this fraction of its distinct 3-shingles appear in the eval
    * source (d12's contamination measure as a gate).
    */
  private val MaxContamRatio = 0.5

  /** p06's training-sample length in tokens (a small stand-in for the
    * usual 2k–8k context windows; the arithmetic is length-agnostic).
    */
  private val PackLen = 512

  /** p24's compaction target in rows per file (a fixture-scaled stand-
    * in for the usual 128 MB-1 GB file target; the arithmetic is
    * target-agnostic).
    */
  private val IngestTargetRows = 500L

  /** p07's sampling-coin modulus. A power of two that divides the
    * md5-prefix range exactly (16^8 = 4096 * 2^20), so the coin is
    * uniform; see the threshold comment in p07.
    */
  private val CoinScale = 1048576L

  /** p18's budget multiple: total training-token budget as a multiple
    * of the corpus (the over-training / data-constrained regime where
    * planning epochs matters at all). At 4x, the sqrt temperature
    * pushes the skew-disadvantaged languages past the repeat ceiling
    * while the dominant language stays under it — the cap is LIVE at
    * every gated SF (the t24 degeneracy lesson applied forward).
    */
  private val EpochBudgetX = 4L

  /** p18's per-source repeat ceiling. Public data-constrained-scaling
    * results put the value of repeated data near fresh-data parity up
    * to ~4 epochs with rapidly diminishing returns beyond — the knee,
    * not a fixture fit.
    */
  private val MaxSourceEpochs = 4L

  /** p09's per-cell PSI contribution — one dialect-shared expression
    * over exact integer inputs (c_old/c_new cell counts, n_old/n_new
    * lang totals, n_src the smoothing denominator), so both engines
    * compute identical doubles; rounded to DECIMAL before the per-lang
    * sum so term order cannot leak into the gate.
    */
  private val psiTermSql =
    """cast(round(
      |  (cast(c_new + 1 as double) / cast(n_new + n_src as double) -
      |   cast(c_old + 1 as double) / cast(n_old + n_src as double)) *
      |  ln((cast(c_new + 1 as double) / cast(n_new + n_src as double)) /
      |     (cast(c_old + 1 as double) / cast(n_old + n_src as double))), 6)
      |as decimal(14,6))""".stripMargin

  /** p06's intra-source shard width in documents (production packers
    * shard by file/block; a doc_id block is the deterministic stand-in,
    * sized to thousands of docs in production). 200 here is
    * fixture-scaled ON PURPOSE: fixture doc_ids interleave sources
    * (doc_id mod |sources|), so a 200-wide shard boundary splits every
    * source into several shards at the GATED scales and the oracle gate
    * actually exercises the shard-restart cumsum and per-shard tail
    * rollup — a width larger than the fixture would make the
    * multi-shard path dead code until the ungated bench scale.
    */
  private val ShardDocs = 200L

  /** p19's data-parallel world size and completed-steps-at-crash. 4
    * workers and 10 steps are fixture-scaled; the recovery cost is
    * O(workers × steps) by construction, independent of corpus size.
    */
  private val ResumeWorkers = 4
  private val ResumeSteps = 10

  /** p20's batch size in documents (batch-count context only; the
    * waste bound itself is batch-size-free — see the query doc).
    */
  private val BucketBatchDocs = 32L

  /** p14's shuffled chunk stream, UNSORTED — (epoch, skey, source,
    * shard, chunk), one row per (chunk identity, epoch) with the
    * epoch-keyed shuffle key. p14 presents it in consumption order;
    * p19 computes resume order statistics over worker slices of it.
    * Chunk identities derive from p06's packing arithmetic (one agg
    * per (source, shard), then a sequence explode), so the stream is a
    * pure function of the corpus.
    */
  private def epochShuffleStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"source", expr(s"doc_id div $ShardDocs").as("shard"),
        when($"text".isNull, lit(0L))
          .otherwise(size(split($"text", " ")).cast("long")).as("n_toks"))
      .groupBy($"source", $"shard")
      .agg(expr(s"(sum(n_toks) + $PackLen - 1) div $PackLen")
        .as("n_chunks"))
      .filter($"n_chunks" > 0)
      .select($"source", $"shard",
        explode(expr("sequence(cast(0 as bigint), n_chunks - 1)"))
          .as("chunk"))
      .select($"source", $"shard", $"chunk",
        explode(array(lit(0), lit(1))).as("epoch"))
      .withColumn("skey", md5(concat_ws(":",
        $"epoch", $"source", $"shard", $"chunk")))
      .select($"epoch", $"skey", $"source", $"shard", $"chunk")
  }

  /** p01's curation plan with ZERO-EXTRA-PASS audit instrumentation:
    * Spark's CollectMetrics (`observe`) attaches named aggregates to
    * plan nodes that are computed DURING the normal action — no second
    * job, no extra scan — and surfaces them through `Observation` /
    * `QueryExecutionListener`. At 100 TB this is how a curation run
    * reports "docs seen / docs past the gate" without paying another
    * corpus pass for the counts. The observation points sit AFTER the
    * quality filter (post-gate count + token sum) and ON the final
    * report (sources emitted), so the numbers audit the exact rows the
    * plan processed — not a re-computation that could drift.
    *
    * Kept OUT of the registered p01 query: CollectMetrics is an
    * optimizer barrier, and the gated plan's pushdown/fusion shape
    * (PlanShapeSpec) must not depend on whether auditing is attached.
    */
  def curationWithAudit(s: SparkSession, dir: String,
      gate: org.apache.spark.sql.Observation,
      report: org.apache.spark.sql.Observation): DataFrame =
    curationPlan(s, dir, Some(gate), Some(report))

  /** p13's oracle (shared by p21's written-pack audit). */
  private def p13Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, doc_id // $ShardDocs AS shard, text,
       |    CAST(CASE WHEN text IS NULL THEN 0
       |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, shard, text, n_toks,
       |    sum(n_toks) OVER (PARTITION BY source, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d),
       |m AS (
       |  SELECT doc_id, source, shard, text, n_toks,
       |    CAST(cum - n_toks AS BIGINT) AS g0,
       |    unnest(generate_series(
       |      CAST((cum - n_toks) // $PackLen AS BIGINT),
       |      CAST((cum - 1) // $PackLen AS BIGINT))) AS chunk
       |  FROM c WHERE n_toks > 0),
       |x AS (
       |  SELECT source, shard, chunk,
       |    greatest(0, g0 - chunk * $PackLen) AS chunk_off, doc_id,
       |    greatest(0, chunk * $PackLen - g0) AS lo,
       |    least(n_toks, (chunk + 1) * $PackLen - g0) AS hi, text
       |  FROM m)
       |SELECT source, shard, CAST(chunk AS BIGINT) AS chunk,
       |  CAST(chunk_off AS BIGINT) AS chunk_off, doc_id,
       |  CAST(hi - lo AS BIGINT) AS n_slice_toks,
       |  md5(array_to_string(list_slice(string_split(text, ' '),
       |    CAST(lo + 1 AS BIGINT), CAST(hi AS BIGINT)), ' ')) AS slice_md5
       |FROM x ORDER BY source, shard, chunk, chunk_off""".stripMargin

  def oracle: Map[String, String] = Map(
    "p15_source_data_card" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, lang, n_chars, text FROM documents),
         |base AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |      AS n_tokens,
         |    round(avg(n_chars), 2) AS avg_chars
         |  FROM d GROUP BY 1),
         |dup AS (
         |  SELECT source, count(*) AS n_exact_dups FROM (
         |    SELECT source, row_number() OVER (
         |      PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
         |    FROM d) WHERE rn > 1 GROUP BY 1),
         |shc AS (
         |  SELECT source, doc_id, sh, count(*) AS c FROM (
         |    SELECT source, doc_id, unnest(${Dedup.shingleSql}) AS sh
         |    FROM (SELECT source, doc_id, string_split(text, ' ') AS toks
         |          FROM d))
         |  GROUP BY 1, 2, 3),
         |rep AS (
         |  SELECT source, count(*) AS n_repetitive FROM (
         |    SELECT source, doc_id, CAST(sum(c) AS BIGINT) AS n_sh,
         |      count(*) AS n_di, CAST(max(c) AS BIGINT) AS top_c
         |    FROM shc GROUP BY 1, 2)
         |  WHERE round((n_sh - n_di) / CAST(n_sh AS DOUBLE), 6)
         |      > ${TextAnalysis.RepDupFracCut}
         |     OR round(top_c / CAST(n_sh AS DOUBLE), 6)
         |      > ${TextAnalysis.RepTopShareCut}
         |  GROUP BY 1),
         |lng AS (
         |  SELECT source, count(*) AS n_langs,
         |    CAST(max(c) AS BIGINT) AS top_lang_c
         |  FROM (SELECT source, lang, count(*) AS c FROM d GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT b.source, b.n_docs, b.n_tokens, b.avg_chars,
         |  coalesce(dup.n_exact_dups, 0) AS n_exact_dups,
         |  coalesce(rep.n_repetitive, 0) AS n_repetitive,
         |  lng.n_langs,
         |  round(lng.top_lang_c / CAST(b.n_docs AS DOUBLE), 6)
         |    AS top_lang_share
         |FROM base b
         |LEFT JOIN dup USING (source)
         |LEFT JOIN rep USING (source)
         |JOIN lng USING (source)
         |ORDER BY b.source""".stripMargin,

    "p01_curation_pipeline" ->
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |    len(string_split(text, ' ')) AS n_toks,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) >= $MinTokens),
         |ranked AS (
         |  SELECT source, n_toks,
         |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM base)
         |SELECT source, count(*) AS n_pass,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_dups_removed,
         |  CAST(sum(CASE WHEN rn = 1 THEN n_toks ELSE 0 END) AS BIGINT)
         |    AS total_tokens_kept
         |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "p02_quality_filter" ->
      s"""WITH ${TextAnalysis.repetitionSignalsSql}
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_tokens >= $MinQualityTokens
         |                 AND tts <= $MaxTopShare AND dup2 <= $MaxDupShare
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN coalesce(n_tokens < $MinQualityTokens, TRUE)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_len_fail,
         |  CAST(sum(CASE WHEN n_tokens >= $MinQualityTokens
         |                 AND (tts > $MaxTopShare OR dup2 > $MaxDupShare)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_fail
         |FROM g GROUP BY source ORDER BY source""".stripMargin,

    "p04_full_curation" ->
      s"""WITH ${TextAnalysis.repetitionSignalsSql},
         |q AS (
         |  SELECT g.doc_id, g.source, g.n_tokens, d.text,
         |    string_split(d.text, ' ') AS toks,
         |    coalesce(g.n_tokens >= $MinQualityTokens
         |             AND g.tts <= $MaxTopShare
         |             AND g.dup2 <= $MaxDupShare, FALSE) AS q_pass
         |  FROM g JOIN documents d USING (doc_id)
         |  WHERE g.source <> 'src0'),
         |f AS (
         |  SELECT *, CASE WHEN q_pass THEN
         |      md5(trim(regexp_replace(regexp_replace(lower(text),
         |        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
         |    ELSE 'uniq-' || doc_id END AS fp
         |  FROM q),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
         |    AS rn
         |  FROM f),
         |ev AS (
         |  SELECT DISTINCT t.sh FROM (
         |    SELECT string_split(text, ' ') AS toks FROM documents
         |    WHERE source = 'src0') e, unnest(${Dedup.shingleSql}) AS t(sh)),
         |wsh AS (
         |  SELECT doc_id, t.sh FROM (
         |    SELECT doc_id, toks FROM r WHERE q_pass AND rn = 1) w,
         |    unnest(list_distinct(${Dedup.shingleSql})) AS t(sh)),
         |ratio AS (
         |  SELECT w.doc_id, count(*) AS n_sh,
         |    sum(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
         |  FROM wsh w LEFT JOIN ev e ON w.sh = e.sh GROUP BY w.doc_id),
         |st AS (
         |  SELECT r.source, r.n_tokens, r.q_pass,
         |    (r.q_pass AND r.rn = 1) AS winner,
         |    (r.q_pass AND r.rn = 1 AND
         |     rt.n_shared / CAST(rt.n_sh AS DOUBLE) > $MaxContamRatio)
         |      AS contaminated
         |  FROM r LEFT JOIN ratio rt ON rt.doc_id = r.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN NOT q_pass THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_q_fail,
         |  CAST(sum(CASE WHEN q_pass AND NOT winner THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_dups_removed,
         |  CAST(sum(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  CAST(sum(CASE WHEN winner AND NOT contaminated THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN winner AND NOT contaminated THEN n_tokens
         |           ELSE 0 END) AS BIGINT) AS total_tokens_kept
         |FROM st GROUP BY source ORDER BY source""".stripMargin,

    "p05_skew_report" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |totals AS (
        |  SELECT sum(n) AS total, count(*) AS n_keys FROM counts)
        |SELECT user_id, n,
        |  round(n / CAST(total AS DOUBLE), 6) AS share,
        |  round(n * n_keys / CAST(total AS DOUBLE), 4) AS x_mean
        |FROM counts CROSS JOIN totals
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin,

    "p06_sequence_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, doc_id // $ShardDocs AS shard,
         |    CAST(CASE WHEN text IS NULL THEN 0
         |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT source, shard, n_toks,
         |    sum(n_toks) OVER (PARTITION BY source, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |sh AS (
         |  SELECT source, shard, count(*) AS s_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS s_tokens,
         |    CAST((sum(n_toks) + $PackLen - 1) // $PackLen AS BIGINT)
         |      AS s_chunks,
         |    CAST(sum(CASE WHEN n_toks > 0 AND
         |        (cum - n_toks) // $PackLen <> (cum - 1) // $PackLen
         |      THEN 1 ELSE 0 END) AS BIGINT) AS s_splits,
         |    CAST(((sum(n_toks) + $PackLen - 1) // $PackLen) * $PackLen
         |      - sum(n_toks) AS BIGINT) AS s_pad
         |  FROM c GROUP BY source, shard)
         |SELECT source,
         |  CAST(sum(s_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(s_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(s_chunks) AS BIGINT) AS n_chunks,
         |  CAST(sum(s_splits) AS BIGINT) AS n_split_docs,
         |  CAST(sum(s_pad) AS BIGINT) AS tail_pad
         |FROM sh GROUP BY source ORDER BY source""".stripMargin,

    "p11_sequence_pack_bpe" ->
      s"""WITH ${TextAnalysis.bpeCountsSqlCtes},
         |d AS (
         |  SELECT doc_id, source, doc_id // $ShardDocs AS shard,
         |    n_bpe AS n_toks
         |  FROM bpec),
         |c AS (
         |  SELECT source, shard, n_toks,
         |    sum(n_toks) OVER (PARTITION BY source, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |sh AS (
         |  SELECT source, shard, count(*) AS s_docs,
         |    CAST(sum(n_toks) AS BIGINT) AS s_tokens,
         |    CAST((sum(n_toks) + $PackLen - 1) // $PackLen AS BIGINT)
         |      AS s_chunks,
         |    CAST(sum(CASE WHEN n_toks > 0 AND
         |        (cum - n_toks) // $PackLen <> (cum - 1) // $PackLen
         |      THEN 1 ELSE 0 END) AS BIGINT) AS s_splits,
         |    CAST(((sum(n_toks) + $PackLen - 1) // $PackLen) * $PackLen
         |      - sum(n_toks) AS BIGINT) AS s_pad
         |  FROM c GROUP BY source, shard)
         |SELECT source,
         |  CAST(sum(s_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(s_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(s_chunks) AS BIGINT) AS n_chunks,
         |  CAST(sum(s_splits) AS BIGINT) AS n_split_docs,
         |  CAST(sum(s_pad) AS BIGINT) AS tail_pad
         |FROM sh GROUP BY source ORDER BY source""".stripMargin,

    "p12_pack_manifest" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, doc_id // $ShardDocs AS shard,
         |    CAST(CASE WHEN text IS NULL THEN 0
         |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, shard, n_toks,
         |    sum(n_toks) OVER (PARTITION BY source, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d)
         |SELECT doc_id, source, shard, n_toks,
         |  CAST((cum - n_toks) // $PackLen AS BIGINT) AS chunk_first,
         |  CAST((cum - 1) // $PackLen AS BIGINT) AS chunk_last,
         |  CAST((cum - n_toks) % $PackLen AS BIGINT) AS offset_in_chunk,
         |  (cum - n_toks) // $PackLen <> (cum - 1) // $PackLen
         |    AS spans_boundary
         |FROM c WHERE n_toks > 0 ORDER BY doc_id""".stripMargin,

    "p13_pack_slices" -> p13Sql,

    // p21: the PHYSICAL pack gated — per-chunk slice counts, token
    // sums and an order-insensitive content fingerprint of the
    // WRITTEN files must match the manifest arithmetic recomputed
    // from raw documents (p13's oracle aggregated per chunk)
    "p21_pack_artifact_serving" ->
      s"""SELECT source, shard, chunk, count(*) AS n_slices,
         |  CAST(sum(n_slice_toks) AS BIGINT) AS n_toks,
         |  md5(string_agg(doc_id || ':' || chunk_off || ':' || slice_md5,
         |    ',' ORDER BY doc_id || ':' || chunk_off || ':' || slice_md5))
         |    AS chunk_fp
         |FROM ($p13Sql) sl
         |GROUP BY source, shard, chunk
         |ORDER BY source, shard, chunk""".stripMargin,

    // p22: per-(source, shard) balance over the same manifest
    // arithmetic; straggler ratio composed from exact-integer totals
    // through identical IEEE divisions in both engines
    "p22_pack_balance_audit" ->
      s"""WITH per AS (
         |  SELECT source, shard, count(DISTINCT chunk) AS n_chunks,
         |    count(*) AS n_slices,
         |    CAST(sum(n_slice_toks) AS BIGINT) AS n_toks
         |  FROM ($p13Sql) sl GROUP BY source, shard),
         |tot AS (
         |  SELECT CAST(sum(n_toks) AS BIGINT) AS tot_toks,
         |    count(*) AS n_groups, max(n_toks) AS max_toks
         |  FROM per)
         |SELECT source, shard, n_chunks, n_slices, n_toks,
         |  round(CAST(n_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE), 6)
         |    AS tok_share,
         |  round(CAST(max_toks AS DOUBLE)
         |    / (CAST(tot_toks AS DOUBLE) / CAST(n_groups AS DOUBLE)), 6)
         |    AS straggler_ratio,
         |  (CAST(max_toks AS DOUBLE)
         |    / (CAST(tot_toks AS DOUBLE) / CAST(n_groups AS DOUBLE))
         |    <= CAST(1.5 AS DOUBLE)) AS balanced
         |FROM per CROSS JOIN tot
         |ORDER BY source, shard""".stripMargin,

    // p23's z-value in portable SQL: the bit-by-bit Morton interleave
    // ZOrder64 is bit-identical to (LayoutSpec proves the parity of the
    // fused kernel against exactly this composed form).
    "p24_ingest_file_curve" ->
      s"""WITH k AS (
         |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         |    epoch_us(ts) AS us
         |  FROM events),
         |f AS (
         |  SELECT t.trigger_s, day,
         |    us // (CAST(t.trigger_s AS BIGINT) * 1000000) AS epoch,
         |    count(*) AS f_rows
         |  FROM k, (VALUES (60), (600), (3600)) t(trigger_s)
         |  GROUP BY 1, 2, 3),
         |d AS (
         |  SELECT trigger_s, day, count(*) AS d_files,
         |    CAST(sum(f_rows) AS BIGINT) AS d_rows,
         |    sum(CASE WHEN f_rows < $IngestTargetRows THEN 1 ELSE 0 END)
         |      AS d_small,
         |    (sum(f_rows) + ${IngestTargetRows - 1}) // $IngestTargetRows
         |      AS d_packed
         |  FROM f GROUP BY 1, 2)
         |SELECT CAST(trigger_s AS BIGINT) AS trigger_s,
         |  CAST(sum(d_files) AS BIGINT) AS n_files,
         |  CAST(sum(d_rows) AS BIGINT) AS total_rows,
         |  round(sum(d_rows) / CAST(sum(d_files) AS DOUBLE), 6)
         |    AS rows_per_file,
         |  round(sum(d_small) / CAST(sum(d_files) AS DOUBLE), 6)
         |    AS small_share,
         |  CAST(sum(d_packed) AS BIGINT) AS packed_files,
         |  round(sum(d_files) / CAST(sum(d_packed) AS DOUBLE), 6)
         |    AS amplification
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "p23_layout_scan_fraction" -> {
      val zTerms = (0 until 16).map(i =>
        s"(((a16 >> $i) & 1) << ${2 * i}) + " +
          s"(((b16 >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
      val probeRows = (for { ax <- Seq("time", "user"); j <- 0 until 8 }
        yield s"('$ax', CAST($j AS BIGINT), CAST(${j * 8192} AS BIGINT), " +
          s"CAST(${j * 8192 + 4095} AS BIGINT))").mkString(", ")
      s"""WITH e AS (
         |  SELECT epoch_us(ts) AS a, user_id AS b FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |bounds AS (
         |  SELECT min(a) AS alo, max(a) AS ahi,
         |    min(b) AS blo, max(b) AS bhi FROM e),
         |bk AS (
         |  SELECT
         |    CAST(floor(CAST(a - alo AS DOUBLE) / greatest(ahi - alo, 1)
         |      * 65535.0) AS BIGINT) AS a16,
         |    CAST(floor(CAST(b - blo AS DOUBLE) / greatest(bhi - blo, 1)
         |      * 65535.0) AS BIGINT) AS b16
         |  FROM e CROSS JOIN bounds),
         |z AS (SELECT a16, b16, $zTerms AS zv FROM bk),
         |fan AS (
         |  SELECT 'ts_sort' AS layout, a16 >> 10 AS file_id, a16, b16
         |  FROM z
         |  UNION ALL
         |  SELECT 'user_sort', b16 >> 10, a16, b16 FROM z
         |  UNION ALL
         |  SELECT 'zorder', zv >> 26, a16, b16 FROM z),
         |pf AS (
         |  SELECT layout, file_id, min(a16) AS min_a, max(a16) AS max_a,
         |    min(b16) AS min_b, max(b16) AS max_b
         |  FROM fan GROUP BY layout, file_id),
         |nf AS (SELECT layout, count(*) AS n_files FROM pf
         |  GROUP BY layout),
         |probes AS (SELECT * FROM (VALUES $probeRows)
         |  AS v(axis, probe, plo, phi)),
         |hits AS (
         |  SELECT p.layout, pr.axis, pr.probe,
         |    sum(CASE WHEN
         |        (CASE WHEN pr.axis = 'time' THEN p.min_a
         |              ELSE p.min_b END) <= pr.phi
         |        AND (CASE WHEN pr.axis = 'time' THEN p.max_a
         |             ELSE p.max_b END) >= pr.plo
         |      THEN 1 ELSE 0 END) AS files_read
         |  FROM pf p CROSS JOIN probes pr
         |  GROUP BY p.layout, pr.axis, pr.probe),
         |curve AS (
         |  SELECT layout, axis,
         |    round(avg(files_read), 4) AS avg_files_read
         |  FROM hits GROUP BY layout, axis)
         |SELECT c.layout, c.axis, n.n_files, c.avg_files_read,
         |  round(c.avg_files_read / n.n_files, 6) AS read_frac
         |FROM curve c JOIN nf n USING (layout)
         |ORDER BY c.layout, c.axis""".stripMargin
    },

    "p20_length_bucket_curve" ->
      s"""WITH lens AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len
         |  FROM documents WHERE text IS NOT NULL),
         |cfgs(config, bucket_width) AS (VALUES
         |  ('none', CAST(1073741824 AS BIGINT)),
         |  ('w64', CAST(64 AS BIGINT)), ('w16', CAST(16 AS BIGINT))),
         |perb AS (
         |  SELECT config, bucket_width, len // bucket_width AS bucket,
         |    count(*) AS n, max(len) AS mx,
         |    CAST(sum(len) AS BIGINT) AS rl
         |  FROM lens CROSS JOIN cfgs
         |  GROUP BY 1, 2, 3)
         |SELECT config, bucket_width,
         |  count(*) AS n_buckets,
         |  CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(sum((n + $BucketBatchDocs - 1) // $BucketBatchDocs)
         |    AS BIGINT) AS n_batches,
         |  CAST(sum(rl) AS BIGINT) AS real_tokens,
         |  CAST(sum(n * mx) AS BIGINT) AS padded_tokens,
         |  round(1.0 - CAST(sum(rl) AS DOUBLE)
         |    / CAST(sum(n * mx) AS DOUBLE), 6) AS waste_frac
         |FROM perb GROUP BY 1, 2 ORDER BY config""".stripMargin,

    "p19_resume_plan" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, doc_id // $ShardDocs AS shard,
         |    CAST(CASE WHEN text IS NULL THEN 0
         |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
         |  FROM documents),
         |shd AS (
         |  SELECT source, shard,
         |    CAST((sum(n_toks) + $PackLen - 1) // $PackLen AS BIGINT)
         |      AS n_chunks
         |  FROM d GROUP BY 1, 2),
         |ch AS (
         |  SELECT source, shard,
         |    unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1))
         |      AS chunk
         |  FROM shd WHERE n_chunks > 0),
         |ep AS (
         |  SELECT ch.source, ch.shard, ch.chunk, e.epoch
         |  FROM ch CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e),
         |st AS (
         |  SELECT epoch,
         |    md5(epoch || ':' || source || ':' || shard || ':' || chunk)
         |      AS skey,
         |    source, shard, chunk,
         |    ('0x' || substr(md5('w:' || source || ':' || shard || ':'
         |      || chunk), 1, 8))::BIGINT % $ResumeWorkers AS worker
         |  FROM ep),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY worker ORDER BY epoch, skey) AS rn
         |  FROM st)
         |SELECT worker, epoch AS resume_epoch, skey AS resume_skey,
         |  source AS resume_source, shard AS resume_shard,
         |  chunk AS resume_chunk,
         |  CAST($ResumeSteps AS BIGINT) AS steps_done
         |FROM r WHERE rn = ${ResumeSteps + 1} ORDER BY worker""".stripMargin,

    "p14_epoch_shuffle" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, doc_id // $ShardDocs AS shard,
         |    CAST(CASE WHEN text IS NULL THEN 0
         |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
         |  FROM documents),
         |shd AS (
         |  SELECT source, shard,
         |    CAST((sum(n_toks) + $PackLen - 1) // $PackLen AS BIGINT)
         |      AS n_chunks
         |  FROM d GROUP BY 1, 2),
         |ch AS (
         |  SELECT source, shard,
         |    unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1))
         |      AS chunk
         |  FROM shd WHERE n_chunks > 0),
         |ep AS (
         |  SELECT ch.source, ch.shard, ch.chunk, e.epoch
         |  FROM ch CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
         |SELECT epoch,
         |  md5(epoch || ':' || source || ':' || shard || ':' || chunk)
         |    AS skey,
         |  source, shard, chunk
         |FROM ep ORDER BY epoch, skey""".stripMargin,

    "p17_quality_operating_curve" -> {
      // the SQL grid is generated from the SAME Scala values as the
      // query's, so the two engines can never sweep different cuts
      val rows = (for {
        mt <- Seq(MinQualityTokens / 2, MinQualityTokens,
          MinQualityTokens * 2)
        tc <- Seq(MaxTopShare * 0.5, MaxTopShare, MaxTopShare * 2)
        dc <- Seq(MaxDupShare * 0.5, MaxDupShare, MaxDupShare * 2)
      } yield s"($mt, CAST($tc AS DOUBLE), CAST($dc AS DOUBLE))")
        .mkString(", ")
      s"""WITH ${TextAnalysis.repetitionSignalsSql},
         |grid(min_tokens, max_tts, max_dup2) AS (VALUES $rows)
         |SELECT min_tokens, max_tts, max_dup2,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_tokens >= min_tokens AND tts <= max_tts
         |    AND dup2 <= max_dup2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  round(CAST(sum(CASE WHEN n_tokens >= min_tokens
         |      AND tts <= max_tts AND dup2 <= max_dup2
         |      THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS kept_frac,
         |  CAST(sum(CASE WHEN coalesce(n_tokens < min_tokens, TRUE)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_len_fail,
         |  CAST(sum(CASE WHEN n_tokens >= min_tokens
         |    AND (tts > max_tts OR dup2 > max_dup2)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_fail,
         |  (min_tokens = $MinQualityTokens
         |    AND max_tts = CAST($MaxTopShare AS DOUBLE)
         |    AND max_dup2 = CAST($MaxDupShare AS DOUBLE)) AS shipped
         |FROM g CROSS JOIN grid
         |GROUP BY min_tokens, max_tts, max_dup2
         |ORDER BY min_tokens, max_tts, max_dup2""".stripMargin
    },

    "p18_token_budget_epochs" ->
      s"""WITH d AS (
        |  SELECT lang,
        |    CAST(CASE WHEN text IS NULL THEN 0
        |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
        |  FROM documents),
        |per AS (
        |  SELECT lang, CAST(sum(n_toks) AS BIGINT) AS tok_s,
        |    CAST(round(sqrt(CAST(sum(n_toks) AS DOUBLE)), 6)
        |      AS DECIMAL(28,6)) AS sq
        |  FROM d GROUP BY lang),
        |tot AS (
        |  SELECT sum(sq) AS denom, CAST(sum(tok_s) AS BIGINT) AS t_total
        |  FROM per),
        |w AS (
        |  SELECT lang, tok_s,
        |    round(CAST(sq AS DOUBLE) / CAST(denom AS DOUBLE), 6)
        |      AS w_share,
        |    t_total
        |  FROM per CROSS JOIN tot),
        |a AS (
        |  SELECT lang, tok_s, w_share,
        |    CAST(floor(w_share *
        |      CAST(t_total * $EpochBudgetX AS DOUBLE)) AS BIGINT) AS alloc
        |  FROM w)
        |SELECT lang, tok_s AS total_tokens, w_share,
        |  alloc AS alloc_tokens,
        |  round(alloc / CAST(tok_s AS DOUBLE), 4) AS epochs,
        |  alloc > tok_s * $MaxSourceEpochs AS capped,
        |  least(alloc, tok_s * $MaxSourceEpochs) AS achieved_tokens,
        |  alloc - least(alloc, tok_s * $MaxSourceEpochs)
        |    AS shortfall_tokens
        |FROM a ORDER BY lang""".stripMargin,

    "p16_curriculum_mixture" ->
      s"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN text IS NULL THEN 0
        |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
        |  FROM documents),
        |toks AS (
        |  SELECT source, CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total FROM toks),
        |sched AS (
        |  SELECT t.source, t.n_tokens, e.epoch,
        |    CAST(1.0 - e.epoch * 0.5 AS DOUBLE) AS alpha,
        |    CAST(round(CASE WHEN e.epoch = 0 THEN CAST(n_tokens AS DOUBLE)
        |      WHEN e.epoch = 1 THEN sqrt(CAST(n_tokens AS DOUBLE))
        |      ELSE 1.0 END, 6) AS DECIMAL(24,6)) AS w_raw
        |  FROM toks t CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e),
        |et AS (SELECT epoch, sum(w_raw) AS w_tot FROM sched GROUP BY 1),
        |plan3 AS (
        |  SELECT *, CASE WHEN alloc_tokens >= n_tokens THEN $CoinScale
        |    ELSE CAST(floor(CAST(alloc_tokens AS DOUBLE)
        |      / CAST(n_tokens AS DOUBLE) * $CoinScale.0) AS BIGINT)
        |    END AS thresh
        |  FROM (
        |    SELECT *, w6 * (budget // 1000000) +
        |        (w6 * (budget % 1000000)) // 1000000 AS alloc_tokens
        |    FROM (
        |      SELECT *,
        |        CAST(CAST(weight AS DECIMAL(10,6)) * 1000000 AS BIGINT)
        |          AS w6,
        |        t_total // 2 AS budget
        |      FROM (
        |        SELECT s.epoch, s.alpha, s.source, s.n_tokens, t_total,
        |          round(CAST(s.w_raw AS DOUBLE)
        |            / CAST(e.w_tot AS DOUBLE), 6) AS weight
        |        FROM sched s JOIN et e ON s.epoch = e.epoch
        |        CROSS JOIN tot)))),
        |kept AS (
        |  SELECT p.epoch, d.source, count(*) AS n_sampled,
        |    CAST(sum(d.n_toks) AS BIGINT) AS tokens_sampled
        |  FROM d JOIN plan3 p ON d.source = p.source
        |  WHERE ('0x' || substr(md5(CAST(p.epoch AS VARCHAR) || ':' ||
        |      CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % $CoinScale < p.thresh
        |  GROUP BY 1, 2)
        |SELECT p.epoch, p.alpha, p.source, p.n_tokens, p.weight,
        |  p.alloc_tokens, p.thresh,
        |  CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled,
        |  CAST(coalesce(k.tokens_sampled, 0) AS BIGINT) AS tokens_sampled
        |FROM plan3 p LEFT JOIN kept k
        |  ON p.epoch = k.epoch AND p.source = k.source
        |ORDER BY p.epoch, p.source""".stripMargin,

    "p07_source_mixture" ->
      s"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN text IS NULL THEN 0
        |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_toks
        |  FROM documents),
        |per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS tok_s
        |  FROM d GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(tok_s) AS BIGINT) AS t_total,
        |    count(*) AS n_src FROM per),
        |rates AS (
        |  SELECT source, n_docs, tok_s,
        |    CASE WHEN tok_s <= t_total // n_src THEN $CoinScale
        |         ELSE CAST(floor(CAST(t_total // n_src AS DOUBLE)
        |           / CAST(tok_s AS DOUBLE) * $CoinScale.0) AS BIGINT)
        |    END AS thresh
        |  FROM per CROSS JOIN tot),
        |kept AS (
        |  SELECT d.source, count(*) AS n_sampled,
        |    CAST(sum(d.n_toks) AS BIGINT) AS tokens_sampled
        |  FROM d JOIN rates r ON d.source = r.source
        |  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % $CoinScale < r.thresh
        |  GROUP BY d.source)
        |SELECT r.source, r.n_docs, r.tok_s AS total_tokens, r.thresh,
        |  CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled,
        |  CAST(coalesce(k.tokens_sampled, 0) AS BIGINT) AS tokens_sampled
        |FROM rates r LEFT JOIN kept k ON r.source = k.source
        |ORDER BY r.source""".stripMargin,

    "p08_train_val_test" ->
      """WITH a AS (
        |  SELECT source, n_chars,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 16 AS b
        |  FROM documents)
        |SELECT CASE WHEN b < 12 THEN 'train'
        |            WHEN b < 14 THEN 'val' ELSE 'test' END AS split,
        |  source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM a GROUP BY 1, 2 ORDER BY split, source""".stripMargin,

    "p09_snapshot_drift" ->
      s"""WITH d AS (
        |  SELECT lang, source, doc_id % 2 = 0 AS is_old, n_chars
        |  FROM documents),
        |cell AS (
        |  SELECT lang, source,
        |    CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_old,
        |    CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT)
        |      AS c_new
        |  FROM d GROUP BY lang, source),
        |grid AS (
        |  SELECT l.lang, s.source
        |  FROM (SELECT DISTINCT lang FROM documents) l
        |  CROSS JOIN (SELECT DISTINCT source FROM documents) s),
        |cells AS (
        |  SELECT g.lang, g.source, coalesce(c.c_old, 0) AS c_old,
        |    coalesce(c.c_new, 0) AS c_new
        |  FROM grid g LEFT JOIN cell c
        |    ON g.lang = c.lang AND g.source = c.source),
        |lt AS (
        |  SELECT lang,
        |    CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_old,
        |    CAST(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_new,
        |    round(avg(CASE WHEN is_old THEN n_chars END), 4)
        |      AS avg_chars_old,
        |    round(avg(CASE WHEN is_old THEN NULL ELSE n_chars END), 4)
        |      AS avg_chars_new
        |  FROM d GROUP BY lang),
        |ns AS (SELECT count(DISTINCT source) AS n_src FROM documents),
        |psi AS (
        |  SELECT c.lang, sum($psiTermSql) AS psi_d
        |  FROM cells c
        |  JOIN lt ON lt.lang = c.lang CROSS JOIN ns
        |  GROUP BY c.lang)
        |SELECT lt.lang, n_old, n_new, avg_chars_old, avg_chars_new,
        |  round(avg_chars_new - avg_chars_old, 4) AS chars_drift,
        |  round(CAST(psi_d AS DOUBLE), 6) AS psi_sources
        |FROM lt JOIN psi ON psi.lang = lt.lang
        |ORDER BY lt.lang""".stripMargin,

    "p10_domain_mixture" ->
      s"""WITH t AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_tokens,
        |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS w_raw
        |  FROM t),
        |tot AS (SELECT sum(w_raw) AS w_tot FROM w),
        |a AS (
        |  SELECT source, n_tokens,
        |    round(CAST(w_raw AS DOUBLE) / CAST(w_tot AS DOUBLE), 6)
        |      AS weight
        |  FROM w CROSS JOIN tot),
        |b AS (
        |  SELECT source, n_tokens, weight,
        |    CAST(CAST(weight AS DECIMAL(10,6)) * $MixBudget AS BIGINT)
        |      AS alloc_tokens
        |  FROM a)
        |SELECT source, n_tokens, weight, alloc_tokens,
        |  round(CAST(alloc_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
        |    AS epochs
        |FROM b ORDER BY source""".stripMargin,

    "p03_corpus_profile" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_text,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  min(n_chars) AS min_chars,
        |  quantile_cont(n_chars, 0.5) AS med_chars,
        |  max(n_chars) AS max_chars,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents""".stripMargin)
}
