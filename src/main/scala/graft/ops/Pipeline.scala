package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curation_pipeline" -> { (s, dir) =>
      import s.implicits._
      // Stage 1 (quality): drop docs under MinTokens whitespace tokens.
      // Stage 2 (normalize): lowercase, strip non-alphanumerics,
      //   collapse runs of spaces — the canonical near-exact-dedup
      //   normalization (catches case/punctuation-only copies d01's
      //   raw-text fingerprint misses).
      // Stage 3 (dedup): md5 fingerprint of the normalized text, keep
      //   the lowest doc_id per fingerprint (min(struct) carries the
      //   survivor's source/tokens through the same aggregation —
      //   no second join back to the corpus).
      // Stage 4 (report): per-source pass/kept/removed/token totals.
      val base = docs(s, dir)
        .withColumn("n_toks", size(split($"text", " ")))
        .filter($"n_toks" >= MinTokens)
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
      passed.join(survivors, Seq("source"), "left")
        .select($"source", $"n_pass",
          coalesce($"n_kept", lit(0L)).as("n_kept"),
          ($"n_pass" - coalesce($"n_kept", lit(0L))).as("n_dups_removed"),
          coalesce($"total_tokens_kept", lit(0L)).as("total_tokens_kept"))
        .orderBy($"source")
    })

  def oracle: Map[String, String] = Map(
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
         |FROM ranked GROUP BY source ORDER BY source""".stripMargin)
}
