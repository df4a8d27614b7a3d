package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval served ENTIRELY from written indexes — the
  * production form of the board's s10: reciprocal-rank fusion of the
  * lexical ranking ([[TextIndex.search]] over the postings artifacts)
  * and the vector ranking ([[AnnIndex.search]] over the IVF-PQ
  * artifacts). The board query fuses two in-plan retrievers that
  * re-derive their models from the corpus every run; this fuses two
  * artifact probes — so the whole hybrid stack (the thing a serving
  * tier actually runs per query) touches ZERO corpus bytes, which
  * HybridIndexSpec pins on the executed plan.
  *
  * Fusion is RRF (Cormack et al.), the s10 rationale: ranks are
  * integers, so the fusion is exact regardless of either side's score
  * scale, and no normalization couples the two indexes. Ranking
  * discipline mirrors s10's scale fix verbatim: each side is already
  * bounded (top-`n` retrieved sets from the index probes), and the
  * ONE window that assigns ranks partitions on the retrieval SIDE — a
  * real non-foldable key, never a constant-foldable literal that
  * would degrade WindowExec to its unpartitioned class.
  */
object HybridIndex {

  private val RrfK = 60

  /** Top-`k` fused results for ONE query — `terms` for the lexical
    * side, `qv` for the vector side — each side retrieving its top-`n`
    * from its artifacts. Returns (doc_id, n_sides, rrf) in fused rank
    * order (rrf = Σ 1/(RrfK + rank_side), ties to the lowest doc_id);
    * no materialized rank column — that would cost a window whose only
    * honest partition key is a constant, the degenerate WindowExec
    * shape the board bans, for a value the row order already carries.
    */
  def search(s: SparkSession, textDir: String, annDir: String,
      terms: Seq[String], qv: Seq[Double], n: Int, k: Int,
      allow: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val (allowText, allowAnn) = splitAllow(allow)
    // the vector side's ADC distance is ASC-better already (and
    // re-ranking it here by (adc, id) reproduces AnnIndex's own rnk
    // definition exactly)
    val annSide = AnnIndex.search(s, annDir,
        Seq((-1L, qv)).toDF("q_id", "qv"), n, allowAnn)
      .select(lit("ann").as("side"), $"n_id".as("doc_id"),
        $"adc".cast("double").as("sortv"))
    fuse(s, TextIndex.search(s, textDir, terms, n, allowText),
      annSide, k)
  }

  /** [[search]] with the REFINED vector side — the quality
    * configuration a deployment should serve (ADC proposes, exact
    * full-precision vectors dispose; the AnnIndex refine-stage
    * rationale): the ann leg ranks by exact squared L2 from the
    * stored-vectors artifact at the shipped (RefineNProbe,
    * RefineDepth) elbow, so the fused ranking inherits the refined
    * chain's measured recall instead of raw ADC ordering. Requires
    * the index built with storeVectors = true.
    */
  def searchRefined(s: SparkSession, textDir: String, annDir: String,
      terms: Seq[String], qv: Seq[Double], n: Int, k: Int,
      allow: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val (allowText, allowAnn) = splitAllow(allow)
    val annSide = AnnIndex.searchRefined(s, annDir,
        Seq((-1L, qv)).toDF("q_id", "qv"), n, allow = allowAnn)
      .select(lit("ann").as("side"), $"n_id".as("doc_id"),
        $"d2".cast("double").as("sortv"))
    fuse(s, TextIndex.search(s, textDir, terms, n, allowText),
      annSide, k)
  }

  /** One allowlist scopes BOTH sides (the fixture id space is shared;
    * a deployment passes the same entity-id set) — pushed into each
    * index's own pre-top-k filter leg, never post-filtered here:
    * post-filtering the fused list under-returns exactly like
    * post-filtering either side (the s08 argument, squared).
    */
  private def splitAllow(allow: Option[DataFrame])
      : (Option[DataFrame], Option[DataFrame]) =
    (allow.map(a => a.select(col(a.columns.head).as("doc_id"))),
      allow.map(a => a.select(col(a.columns.head).as("vec_id"))))

  /** Both sides normalized to (side, doc_id, sortv) with ASC-better
    * sort values, so one side-partitioned window ranks both: the
    * lexical side negates its DESC-better score; vector sides arrive
    * ASC-better (ADC distance or exact squared L2).
    */
  private def fuse(s: SparkSession, bm: DataFrame, annSide: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    val bmSide = bm.select(lit("bm").as("side"), $"doc_id",
      (-$"bm25d".cast("double")).as("sortv"))
    val w = Window.partitionBy($"side").orderBy($"sortv", $"doc_id")
    bmSide.union(annSide)
      .withColumn("rnk_side", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_sides"),
        round(sum(lit(1.0) / ($"rnk_side" + lit(RrfK))), 6).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id").limit(k)
      .select($"doc_id", $"n_sides", $"rrf")
  }
}
